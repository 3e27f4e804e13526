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
