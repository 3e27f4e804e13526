"""GP regression models as parameter pytrees + pure functions.

TPU-native replacement for the reference's GPflow-backed models
(/root/reference/gpflow_pilco/models/gpr.py, svgp.py and the GPflow GPR/SVGP they
subclass; SURVEY.md §2.3). Models are frozen dataclass pytrees; training objectives
(LML / ELBO) and predictions are pure functions of (params, data), so any optax
optimizer or HMC kernel drives them directly.

Multioutput design: an SVGP holds one latent-stacked RBF kernel (variance (L,),
lengthscales (L, D)) and stacked inducing inputs z (L, M, D) — the analogue of
GPflow's SeparateIndependent + SeparateIndependentInducingVariables; an optional
mixing matrix ``w`` (P, L) gives LinearCoregionalization. All per-latent linear
algebra is vmapped over L so XLA sees one fused batched computation.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from ..ops.linalg import bsolve_triangular as solve_triangular
from ..ops.linalg import safe_cholesky

from .. import config
from ..moments import pytree_dataclass
from ..utils import bijectors as bij
from .kernels import RBF

_LOG2PI = math.log(2.0 * math.pi)


# ==================================================================================
# SVGP
# ==================================================================================
@pytree_dataclass(meta_fields=("whiten",))
class SVGP:
    """Sparse variational GP with Gaussian likelihood.

    q(u_l) = N(q_mu[:, l], tril(q_sqrt[l]) tril(q_sqrt[l])^T), whitened by default
    (u = Luu v): whitening keeps Kuu^{-1} out of the variational terms, which is the
    main f32-conditioning lever on TPU (SURVEY.md §7).
    """

    kernel: RBF  # latent-stacked: variance (L,), lengthscales (L, D)
    z: jax.Array  # (L, M, D)
    q_mu: jax.Array  # (M, L)
    q_sqrt: jax.Array  # (L, M, M); lower triangle used
    mean_const: jax.Array  # (P,)
    # () shared likelihood variance (reference gpflow Gaussian likelihood), or
    # (P,) per-output: required when output scales differ by orders of
    # magnitude (e.g. angle vs velocity deltas at small dt) — a shared noise
    # floor at the largest output's residual scale drowns the smaller outputs'
    # signal entirely. Positive-constrained. Broadcasts through the ELBO,
    # natgrad and SNR-penalty math.
    raw_noise: jax.Array
    w: Optional[jax.Array] = None  # (P, L) coregionalization mixing, or None

    @property
    def noise_variance(self) -> jax.Array:
        return bij.positive(self.raw_noise)

    @property
    def num_latent(self) -> int:
        return self.z.shape[0]

    @property
    def num_inducing(self) -> int:
        return self.z.shape[1]

    whiten: bool = True


def kuu(model: SVGP, jitter: Optional[float] = None) -> jax.Array:
    """(L, M, M) inducing covariances with jitter."""
    if jitter is None:
        jitter = config.default_jitter(model.z.dtype)
    k = model.kernel.gram(model.z)  # (L, M, M)
    eye = jnp.eye(model.num_inducing, dtype=k.dtype)
    return k + jitter * eye


def chol_kuu(model: SVGP) -> jax.Array:
    """(L, M, M) Cholesky of the jittered inducing covariances, with
    escalating-jitter retries (TPU f32 robustness; see ops.linalg)."""
    k = model.kernel.gram(model.z)
    return safe_cholesky(k, config.default_jitter(model.z.dtype))


def _tril(q_sqrt):
    return jnp.tril(q_sqrt)


def svgp_predict_f(model: SVGP, x: jax.Array, full_output_cov: bool = False):
    """Posterior marginals at x (..., N, D) -> mean (..., N, P), var.

    var is (..., N, P) when full_output_cov=False else (..., N, P, P) (latents are
    independent; output covariance only arises through the mixing matrix).
    """
    luu = chol_kuu(model)  # (L, M, M)
    kxu = model.kernel.gram(x[..., None, :, :], model.z)  # (..., L, N, M)
    a = solve_triangular(luu, jnp.swapaxes(kxu, -1, -2), lower=True)  # (..., L, M, N)

    q_mu = jnp.moveaxis(model.q_mu, -1, 0)[..., None]  # (L, M, 1)
    q_sqrt = _tril(model.q_sqrt)  # (L, M, M)
    if model.whiten:
        proj_mu = q_mu
        proj_sqrt = q_sqrt
    else:
        proj_mu = solve_triangular(luu, q_mu, lower=True)
        proj_sqrt = solve_triangular(luu, q_sqrt, lower=True)

    mean_lat = jnp.einsum("...lmn,lmo->...nl", a, proj_mu)  # (..., N, L)

    kdiag = model.kernel.variance  # (L,)
    sqrt_t_a = jnp.einsum("lmk,...lmn->...lkn", proj_sqrt, a)  # q_sqrt^T a
    var_lat = (
        kdiag[..., None, :]
        - jnp.einsum("...lmn,...lmn->...nl", a, a)
        + jnp.einsum("...lkn,...lkn->...nl", sqrt_t_a, sqrt_t_a)
    )

    if model.w is not None:
        mean = mean_lat @ model.w.T
        if full_output_cov:
            var = jnp.einsum("pl,...nl,ql->...npq", model.w, var_lat, model.w)
        else:
            var = var_lat @ (model.w**2).T
    else:
        mean = mean_lat
        var = var_lat
        if full_output_cov:
            var = jnp.eye(var.shape[-1], dtype=var.dtype) * var[..., None, :]
    return mean + model.mean_const, var


def svgp_elbo(
    model: SVGP,
    x: jax.Array,
    y: jax.Array,
    num_data: Optional[int] = None,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Evidence lower bound for a Gaussian likelihood (reference svgp.py:41-45 +
    GPflow's SVGP.elbo, re-derived).

    ``weights`` (N,) lets callers pad the data to a fixed bucket size with
    zero-weight rows, so the training executable is reused as the episode buffer
    grows instead of recompiling per episode.
    """
    mean, var = svgp_predict_f(model, x, full_output_cov=False)
    noise = model.noise_variance
    err = y - mean
    var_exp = -0.5 * (_LOG2PI + jnp.log(noise) + (err**2 + var) / noise)
    if weights is not None:
        var_exp = var_exp * weights[..., None]
    scale = 1.0 if num_data is None else num_data / x.shape[-2]
    return scale * jnp.sum(var_exp) - kl_qu_pu(model)


def kl_qu_pu(model: SVGP) -> jax.Array:
    """KL(q(u) || p(u)) summed over latents."""
    q_sqrt = _tril(model.q_sqrt)  # (L, M, M)
    q_mu = jnp.moveaxis(model.q_mu, -1, 0)[..., None]  # (L, M, 1)
    m = model.num_inducing
    diag = jnp.diagonal(q_sqrt, axis1=-2, axis2=-1)
    tiny = 1e-300 if diag.dtype == jnp.float64 else 1e-36
    log_det_q = jnp.sum(jnp.log(diag**2 + tiny), axis=-1)

    if model.whiten:
        trace = jnp.sum(q_sqrt**2, axis=(-2, -1))
        mahal = jnp.sum(q_mu[..., 0] ** 2, axis=-1)
        log_det_p = jnp.zeros_like(log_det_q)
    else:
        luu = chol_kuu(model)
        iluu_sqrt = solve_triangular(luu, q_sqrt, lower=True)
        iluu_mu = solve_triangular(luu, q_mu, lower=True)
        trace = jnp.sum(iluu_sqrt**2, axis=(-2, -1))
        mahal = jnp.sum(iluu_mu[..., 0] ** 2, axis=-1)
        log_det_p = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(luu, axis1=-2, axis2=-1)), axis=-1
        )

    kl = 0.5 * jnp.sum(trace + mahal - m + log_det_p - log_det_q)
    return kl


# ==================================================================================
# GPR (exact GP, shared kernel across output columns — like gpflow.models.GPR)
# ==================================================================================
@pytree_dataclass
class GPR:
    kernel: RBF  # single-output: variance (), lengthscales (D,)
    x: jax.Array  # (N, D)
    y: jax.Array  # (N, P)
    mean_const: jax.Array  # (P,)
    raw_noise: jax.Array  # ()

    @property
    def noise_variance(self) -> jax.Array:
        return bij.positive(self.raw_noise)


@pytree_dataclass(meta_fields=("num_members",))
class GPREnsemble:
    """A posterior ensemble of GPR models sharing data but with hyperparameters
    drawn from an HMC posterior (BASELINE.md north-star config; no reference
    counterpart — the reference only ever point-estimates hyperparameters).

    ``members`` is a single GPR pytree whose every leaf carries a leading
    ensemble axis K, so downstream consumers vmap over it directly:
    posterior-averaged moment matching and per-particle hyperparameter draws in
    pathwise rollouts (see loops/pilco.py policy losses).
    """

    members: GPR
    num_members: int = 1


def gpr_lml(model: GPR) -> jax.Array:
    """Log marginal likelihood summed over output columns (reference gpr.py:33-37)."""
    n = model.x.shape[0]
    knn = model.kernel.gram(model.x)
    # jitter floor + escalating retries: keeps f32 Cholesky alive when the
    # fitted/sampled noise is tiny (deterministic-sim data drives sigma^2
    # toward ~1e-5)
    kyy = knn + model.noise_variance * jnp.eye(n, dtype=knn.dtype)
    lyy = safe_cholesky(kyy, config.default_jitter(knn.dtype))
    err = model.y - model.mean_const
    il_err = solve_triangular(lyy, err, lower=True)
    p = model.y.shape[-1]
    half_logdet = jnp.sum(jnp.log(jnp.diagonal(lyy)))
    return -0.5 * jnp.sum(il_err**2) - p * half_logdet - 0.5 * n * p * _LOG2PI


def gpr_predict_f(model: GPR, xs: jax.Array, full_cov: bool = False):
    n = model.x.shape[0]
    knn = model.kernel.gram(model.x)
    # jitter floor + escalating retries: keeps f32 Cholesky alive when the
    # fitted/sampled noise is tiny (deterministic-sim data drives sigma^2
    # toward ~1e-5)
    kyy = knn + model.noise_variance * jnp.eye(n, dtype=knn.dtype)
    lyy = safe_cholesky(kyy, config.default_jitter(knn.dtype))
    kxs = model.kernel.gram(model.x, xs)  # (N, S)
    a = solve_triangular(lyy, kxs, lower=True)  # (N, S)
    err = model.y - model.mean_const
    il_err = solve_triangular(lyy, err, lower=True)  # (N, P)
    mean = a.T @ il_err + model.mean_const  # (S, P)
    if full_cov:
        cov = model.kernel.gram(xs) - a.T @ a  # (S, S)
        return mean, cov
    var = model.kernel.kdiag(xs) - jnp.sum(a * a, axis=0)  # (S,)
    return mean, var[:, None] * jnp.ones_like(mean)
