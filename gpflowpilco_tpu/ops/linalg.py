"""Small batched linear-algebra helpers.

JAX's `solve_triangular`/`cho_solve` require operands with identical batch ranks;
these wrappers broadcast batch dimensions numpy-style first (matching the TF
semantics the reference relies on throughout its Cholesky pipelines).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular as _solve_triangular


def bsolve_triangular(a, b, **kwargs):
    """solve_triangular with numpy-style broadcasting of leading batch dims."""
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    a = jnp.broadcast_to(a, batch + a.shape[-2:])
    b = jnp.broadcast_to(b, batch + b.shape[-2:])
    return _solve_triangular(a, b, **kwargs)


def bcho_solve(chol_lower, b):
    """cho_solve((L, lower=True), b) with broadcasting."""
    y = bsolve_triangular(chol_lower, b, lower=True)
    return bsolve_triangular(chol_lower, y, lower=True, trans=1)


def safe_cholesky(a, extra_jitter, max_escalations: int = 2, factor: float = 100.0):
    """``chol(a + extra_jitter * I)`` with escalating-jitter retries.

    TPU's blocked f32 Cholesky can return non-finite factors for gram matrices
    the CPU factorizes cleanly (observed: a fitted drift Kuu at M=240 NaN'd
    every pathwise rollout on the chip while the identical f32 graph was
    finite on CPU). On a non-finite result the jitter escalates by ``factor``,
    up to ``max_escalations`` times — the standard robust-GP fallback. Under
    plain jit the retries stay off the hot path (``lax.cond``); under vmap the
    conds lower to selects, so use this in per-update sites, not per-step ones.
    """
    import jax

    eye = jnp.eye(a.shape[-1], dtype=a.dtype)

    def attempt(j):
        return jnp.linalg.cholesky(a + j * eye)

    chol = attempt(extra_jitter)
    for level in range(1, max_escalations + 1):
        jit_level = extra_jitter * factor**level
        chol = jax.lax.cond(
            jnp.all(jnp.isfinite(chol)),
            lambda c: c,
            lambda c, j=jit_level: attempt(j),
            chol,
        )
    return chol
