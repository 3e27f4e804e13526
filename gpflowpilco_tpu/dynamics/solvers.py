"""Trajectory solvers as `lax.scan` bodies with in-scan accumulation.

TPU-native counterparts of the reference's solvers
(/root/reference/gpflow_pilco/dynamics/solvers.py). The reference threads a
(state, callback_args) tuple through tf.scan/tf.foldl (solvers.py:67-105); here the
accumulator is an explicit scan carry. The 30-step horizon is inherently serial
(SURVEY.md §5) and stays a `lax.scan`; parallelism comes from the particle batch
inside each step.

The reference's MomentMatchingEuler noise branch reuses `match_drift` where
`match_noise` is intended (solvers.py:131-132, latent bug, dead in practice since
PILCO asserts diffusion is None); here diffusion is handled correctly when given.

Euler covariance update (reference solvers.py:108-135):
    m'  = m + dt E[f]
    S'  = S + dt (Sxf + Sxf^T) + dt^2 Sff   (+ dt Szz for diffusion noise z)
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..moments import GaussianMatch, GaussianMoments


def euler_rollout(
    f: Callable,
    x0: jax.Array,
    dt: float,
    num_steps: int,
    accumulate: Optional[Callable] = None,
    acc_init=None,
    diffusion: Optional[Callable] = None,
    key: Optional[jax.Array] = None,
    unroll: int = 1,
    remat: bool = False,
):
    """Fixed-step (stochastic) Euler rollout.

    f(t, x) -> dx/dt. ``accumulate(t, x, acc)`` folds a statistic over the visited
    states (e.g. expected cost); returns (final_state, acc, states).

    remat=True checkpoints the step body: the backward pass recomputes per-step
    activations instead of saving them, trading ~1/3 extra FLOPs for not
    round-tripping the (particles x bases) intermediates of all steps through
    HBM — the dominant cost of differentiated pathwise rollouts at 1024x1024.
    """
    ts = dt * (1.0 + jnp.arange(num_steps, dtype=x0.dtype))

    def body(carry, t):
        x, acc, k = carry
        dx = f(t, x)
        x_new = x + dt * dx
        if diffusion is not None:
            k, sub = jax.random.split(k)
            sqrt_cov = diffusion(t, x)
            rvs = jax.random.normal(sub, x_new.shape, dtype=x_new.dtype)
            x_new = x_new + jnp.sqrt(dt) * jnp.einsum(
                "...ij,...j->...i", sqrt_cov, rvs
            )
        if accumulate is not None:
            acc = accumulate(t, x_new, acc)
        return (x_new, acc, k), x_new

    if key is None:
        key = jax.random.PRNGKey(0)
    step_fn = jax.checkpoint(body) if remat else body
    (xf, acc, _), xs = jax.lax.scan(
        step_fn, (x0, acc_init, key), ts, unroll=unroll
    )
    return xf, acc, xs


def moment_matching_euler_rollout(
    forward: Callable,
    x0: GaussianMoments,
    dt: float,
    num_steps: int,
    accumulate: Optional[Callable] = None,
    acc_init=None,
    unroll: int = 1,
    noise: Optional[Callable] = None,
    cov_jitter: Optional[float] = None,
    fused_update: bool = False,
):
    """Propagate (mean, cov) through `num_steps` moment-matched Euler steps.

    forward(t, x: GaussianMoments) -> GaussianMatch (the drift match).
    ``accumulate(t, x: GaussianMoments, acc)`` folds a statistic (e.g. the expected
    cost of reference pilco.py:199-205) over post-step state moments.
    ``noise(t, x)`` (optional) returns the diffusion GaussianMatch; its
    contribution is sqrt(dt)(Sxz + Szx) + dt Szz — the corrected form of the
    reference's dead noise branch (solvers.py:125-133 reuses the drift match
    where the noise match is intended).
    The covariance carry is re-symmetrized with a small dtype-scaled diagonal
    jitter each step: the linearized cross-covariance term can push the matrix
    slightly indefinite, which in f32 cascades into NaN Cholesky factorizations
    (observed at episode 3 of the TPU swing-up run).
    Returns (final GaussianMoments, acc, per-step means, per-step covs).
    """
    ts = dt * (1.0 + jnp.arange(num_steps, dtype=x0.mean.dtype))
    if cov_jitter is None:
        cov_jitter = 1e-6 if x0.mean.dtype == jnp.float32 else 0.0

    def body(carry, t):
        mean, cov, acc = carry
        x = GaussianMoments(mean=mean, cov=cov)
        match = forward(t, x)
        mf = match.y.mean
        sff = match.y.cov
        sxf = match.cross_covariance(preinv=False)

        if fused_update and noise is None:
            # one Pallas op: Euler update + symmetrize + (stop-grad) PSD boost
            # with in-kernel Jacobi eigenvalues (ops/mm_glue_pallas.py)
            from ..ops.mm_glue_pallas import fused_euler_update

            new_mean, new_cov = fused_euler_update(
                mean, cov, mf, sff, sxf, dt, cov_jitter or 0.0
            )
            new_x = GaussianMoments(mean=new_mean, cov=new_cov)
            if accumulate is not None:
                acc = accumulate(t, new_x, acc)
            return (new_mean, new_cov, acc), (new_mean, new_cov)

        new_mean = mean + dt * mf
        new_cov = cov + dt * (sxf + jnp.swapaxes(sxf, -1, -2)) + (dt**2) * sff
        if noise is not None:
            match_noise = noise(t, x)
            sxz = match_noise.cross_covariance(preinv=False)
            szz = match_noise.y.cov
            new_cov = (
                new_cov
                + jnp.sqrt(dt) * (sxz + jnp.swapaxes(sxz, -1, -2))
                + dt * szz
            )
        new_cov = 0.5 * (new_cov + jnp.swapaxes(new_cov, -1, -2))
        if cov_jitter:
            # PSD projection: the one-step moment match (dt=1: reference
            # pilco.py:184 semantics) linearizes the cross term, which can leave
            # the covariance strongly indefinite early in policy training; a
            # stop-gradient eigenvalue boost keeps downstream Cholesky NaN-free
            # without perturbing the optimization geometry (D <= 8: eigvalsh is
            # a few VPU ops).
            lam_min = jnp.min(jnp.linalg.eigvalsh(new_cov), axis=-1)
            boost = jax.lax.stop_gradient(
                jnp.maximum(-lam_min, 0.0) + cov_jitter
            )
            new_cov = new_cov + boost[..., None, None] * jnp.eye(
                new_cov.shape[-1], dtype=new_cov.dtype
            )
        new_x = GaussianMoments(mean=new_mean, cov=new_cov)
        if accumulate is not None:
            acc = accumulate(t, new_x, acc)
        return (new_mean, new_cov, acc), (new_mean, new_cov)

    (mean_f, cov_f, acc), (means, covs) = jax.lax.scan(
        body, (x0.mean, x0.cov, acc_init), ts, unroll=unroll
    )
    return GaussianMoments(mean=mean_f, cov=cov_f), acc, means, covs


def rk4_step(f: Callable, x: jax.Array, dt: float) -> jax.Array:
    """Classic fourth-order Runge-Kutta step for time-invariant dynamics."""
    k1 = f(x)
    k2 = f(x + 0.5 * dt * k1)
    k3 = f(x + 0.5 * dt * k2)
    k4 = f(x + dt * k3)
    out = x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    return out.astype(x.dtype)  # keep the scan carry dtype-stable


def rk4_integrate(f: Callable, x: jax.Array, dt_total: float, substeps: int):
    """Integrate dx/dt = f(x) over dt_total with fixed RK4 substeps.

    Replaces the reference's scipy `solve_ivp` env integration
    (ordinary_differential_env.py:42-53) with a jittable fixed-step scheme so real
    environment rollouts vmap/shard on device (SURVEY.md §7 design stance).
    """
    h = dt_total / substeps

    def body(x, _):
        return rk4_step(f, x, h), None

    out, _ = jax.lax.scan(body, x, None, length=substeps)
    return out
