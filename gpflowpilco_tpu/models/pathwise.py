"""Pathwise (decoupled) GP sampling: RFF prior + canonical data/inducing update.

Replaces the external `gpflow-sampling` package the reference leans on
(SURVEY.md §2.3; consumed at reference models/svgp.py:124-130 and loops/pilco.py:
282-294 via ``generate_paths`` / ``set_temporary_paths``). Method from "Efficiently
Sampling Functions from Gaussian Process Posteriors" (Wilson et al., 2020) and the
companion JMLR paper:

  prior   f_s(x) ~= sqrt(2 sigma^2 / B) * sum_b w_sb cos(omega_b . x + phi_b),
            omega_b ~ N(0, diag(1/lengthscales^2)), phi_b ~ U[0, 2pi), w_sb ~ N(0,1)
  update  f_s(x) += k(x, Z) v_s,   v_s = Kuu^{-1} (u_s - f_s(Z)),  u_s ~ q(u)

Each sample path is a *deterministic differentiable function* of x, fixed across an
optimizer step — that is what makes particle-rollout policy gradients pathwise
("reparameterized", reference pilco.py §3.5). TF's context-manager statefulness
(`set_temporary_paths`) becomes an explicit ``PathState`` pytree argument threaded
through the rollout (SURVEY.md §7 hard part 4).

Everything is one batched einsum per evaluation: features (S, L, B), canonical
gram (S, L, M) — MXU-shaped contractions over the basis and inducing axes, which
is where the pathwise FLOPs live (SURVEY.md §2.4 "Fourier bases" axis).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .. import config
from ..moments import pytree_dataclass
from ..ops.linalg import bcho_solve, safe_cholesky
from .gp import GPR, SVGP, chol_kuu, kuu
from .kernels import RBF


@pytree_dataclass
class PathState:
    """A batch of S sampled posterior functions (for one latent-stacked model)."""

    omega: jax.Array  # (L, B, D) RFF frequencies
    phase: jax.Array  # (L, B)
    w: jax.Array  # (S, L, B) prior basis weights
    v: jax.Array  # (S, L, M) canonical update weights

    @property
    def num_samples(self) -> int:
        return self.w.shape[0]

    @property
    def num_bases(self) -> int:
        return self.w.shape[-1]


def _rff_features(kernel: RBF, omega, phase, x):
    """sqrt(2 sigma^2 / B) cos(x . omega^T + phi): x (S, D) -> (S, L, B)."""
    num_bases = omega.shape[-2]
    proj = jnp.einsum("sd,lbd->slb", x, omega) + phase  # (S, L, B)
    scale = jnp.sqrt(2.0 * kernel.variance / num_bases)  # (L,)
    return scale[:, None] * jnp.cos(proj)


def _prior_at(kernel: RBF, omega, phase, w, x):
    """Prior sample values at per-sample inputs x (S, D) -> (S, L)."""
    feats = _rff_features(kernel, omega, phase, x)
    return jnp.einsum("slb,slb->sl", feats, w)


def _prior_at_shared(kernel: RBF, omega, phase, w, z):
    """Prior sample values at shared inputs z (L, M, D) -> (S, L, M)."""
    num_bases = omega.shape[-2]
    proj = jnp.einsum("lmd,lbd->lmb", z, omega) + phase[:, None, :]  # (L, M, B)
    scale = jnp.sqrt(2.0 * kernel.variance / num_bases)
    feats = scale[:, None, None] * jnp.cos(proj)  # (L, M, B)
    return jnp.einsum("lmb,slb->slm", feats, w)


def generate_paths_svgp(
    model: SVGP, key: jax.Array, num_samples: int, num_bases: int
) -> PathState:
    """Draw S decoupled posterior sample functions (reference pilco.py:282-284)."""
    kern = model.kernel
    ls = kern.lengthscales  # (L, D)
    num_latent, m, d = model.z.shape
    dtype = model.z.dtype

    k_omega, k_phase, k_w, k_u = jax.random.split(key, 4)
    omega = jax.random.normal(k_omega, (num_latent, num_bases, d), dtype) / ls[:, None, :]
    phase = jax.random.uniform(
        k_phase, (num_latent, num_bases), dtype, maxval=2.0 * math.pi
    )
    w = jax.random.normal(k_w, (num_samples, num_latent, num_bases), dtype)

    # sample u ~ q(u) per path
    eps = jax.random.normal(k_u, (num_samples, num_latent, m), dtype)
    q_sqrt = jnp.tril(model.q_sqrt)  # (L, M, M)
    q_mu = jnp.swapaxes(model.q_mu, -1, -2)  # (L, M)
    v_sample = q_mu + jnp.einsum("lmn,sln->slm", q_sqrt, eps)  # (S, L, M)
    luu = chol_kuu(model)  # (L, M, M)
    if model.whiten:
        u_sample = jnp.einsum("lmn,sln->slm", luu, v_sample)
    else:
        u_sample = v_sample

    f_prior_z = _prior_at_shared(kern, omega, phase, w, model.z)  # (S, L, M)
    resid = u_sample - f_prior_z
    # one batched solve per latent with S right-hand sides (never broadcast the
    # (M, M) factor over the sample axis — that materializes S*L*M^2 floats)
    resid_t = jnp.moveaxis(resid, 0, -1)  # (L, M, S)
    v_t = bcho_solve(luu, resid_t)  # (L, M, S)
    v = jnp.moveaxis(v_t, -1, 0)  # (S, L, M)
    return PathState(omega=omega, phase=phase, w=w, v=v)


def eval_paths_svgp(model: SVGP, paths: PathState, x: jax.Array) -> jax.Array:
    """Evaluate sample s at its own input x[s]: x (S, D) -> (S, P).

    This is the pathwise drift call inside Euler particle rollouts (reference
    forward_sde.py:23-31 with the sampled-path drift, svgp.py:124-130).
    """
    kern = model.kernel
    f_lat = _prior_at(kern, paths.omega, paths.phase, paths.w, x)  # (S, L)

    # canonical update: k(x_s, Z_l) v_sl — inner-product gram so the S x M
    # contraction rides the MXU instead of materializing (S, L, M, D)
    ls = kern.lengthscales  # (L, D)
    xs = x[:, None, :] / ls[None, :, :]  # (S, L, D)
    zs = model.z / ls[:, None, :]  # (L, M, D)
    x2 = jnp.sum(xs * xs, axis=-1)  # (S, L)
    z2 = jnp.sum(zs * zs, axis=-1)  # (L, M)
    # full f32 accumulation: TPU default matmul precision corrupts the
    # |x|^2+|z|^2-2xz cancellation
    xz = jnp.einsum("sld,lmd->slm", xs, zs, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(x2[..., None] + z2[None] - 2.0 * xz, 0.0)  # (S, L, M)
    kxz = kern.variance[None, :, None] * jnp.exp(-0.5 * d2)
    f_lat = f_lat + jnp.einsum("slm,slm->sl", kxz, paths.v)

    if model.w is not None:
        out = f_lat @ model.w.T
    else:
        out = f_lat
    return out + model.mean_const


@pytree_dataclass(meta_fields=("fused",))
class PathwiseSVGPTransform:
    """Drift callable carrying explicit path state (replaces the reference's
    `set_temporary_paths` context manager with functional state).

    fused=True routes through the Pallas kernel (ops/path_eval_pallas.py) — use
    only where drift/path parameters are frozen w.r.t. the loss (policy
    optimization): its VJP emits zeros for them.
    """

    model: SVGP
    paths: PathState
    fused: bool = False

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.fused:
            from ..ops.path_eval_pallas import eval_paths_svgp_fused

            return eval_paths_svgp_fused(self.model, self.paths, x)
        return eval_paths_svgp(self.model, self.paths, x)


@pytree_dataclass
class PathwiseGPRTransform:
    """GPR counterpart of PathwiseSVGPTransform (reference PathwiseGPR,
    models/gpr.py:58-64)."""

    model: GPR
    paths: PathState

    def __call__(self, x: jax.Array) -> jax.Array:
        return eval_paths_gpr(self.model, self.paths, x)


def generate_paths_gpr(
    model: GPR, key: jax.Array, num_samples: int, num_bases: int
) -> PathState:
    """Decoupled sampling for exact GPR: canonical update solves (Knn + noise I)
    against (y - f_prior(X) - noise draw); supports the PathwiseGPR surface of
    reference models/gpr.py:58-64."""
    kern = model.kernel
    xdata = model.x
    n, d = xdata.shape
    p = model.y.shape[-1]
    dtype = xdata.dtype
    ls = jnp.broadcast_to(kern.lengthscales, (d,))

    k_omega, k_phase, k_w, k_e = jax.random.split(key, 4)
    # one shared frequency set; per-output prior weights stack on the "latent" axis
    omega = jax.random.normal(k_omega, (p, num_bases, d), dtype) / ls
    phase = jax.random.uniform(k_phase, (p, num_bases), dtype, maxval=2.0 * math.pi)
    w = jax.random.normal(k_w, (num_samples, p, num_bases), dtype)

    kern_stacked = RBF(
        raw_variance=jnp.broadcast_to(kern.raw_variance, (p,)),
        raw_lengthscales=jnp.broadcast_to(kern.raw_lengthscales, (p, d)),
        ls_low=kern.ls_low,
        ls_high=kern.ls_high,
    )
    f_prior_x = _prior_at_shared(
        kern_stacked, omega, phase, w, jnp.broadcast_to(xdata, (p, n, d))
    )  # (S, P, N)

    noise = model.noise_variance
    eps = jnp.sqrt(noise) * jax.random.normal(k_e, (num_samples, p, n), dtype)
    target = jnp.swapaxes(model.y - model.mean_const, -1, -2)  # (P, N)
    resid = target - f_prior_x - eps  # (S, P, N)

    # jitter floor + escalating retries for near-interpolating (tiny-noise)
    # posteriors in f32
    kyy = kern.gram(xdata) + noise * jnp.eye(n, dtype=dtype)
    lyy = safe_cholesky(kyy, config.default_jitter(dtype))
    rhs = resid.reshape(-1, n).T  # (N, S*P): one solve, many right-hand sides
    v = bcho_solve(lyy, rhs).T.reshape(num_samples, p, n)
    return PathState(omega=omega, phase=phase, w=w, v=v)


def eval_paths_gpr(model: GPR, paths: PathState, x: jax.Array) -> jax.Array:
    """x (S, D) -> (S, P)."""
    kern = model.kernel
    d = x.shape[-1]
    p = model.y.shape[-1]
    kern_stacked = RBF(
        raw_variance=jnp.broadcast_to(kern.raw_variance, (p,)),
        raw_lengthscales=jnp.broadcast_to(kern.raw_lengthscales, (p, d)),
        ls_low=kern.ls_low,
        ls_high=kern.ls_high,
    )
    f = _prior_at(kern_stacked, paths.omega, paths.phase, paths.w, x)  # (S, P)
    ls = jnp.broadcast_to(kern.lengthscales, (d,))
    d2 = jnp.sum(((x[:, None, :] - model.x[None]) / ls) ** 2, -1)  # (S, N)
    kxz = kern.variance * jnp.exp(-0.5 * d2)
    f = f + jnp.einsum("sn,spn->sp", kxz, paths.v)
    return f + model.mean_const
