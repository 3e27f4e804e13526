"""Model initializers: median-heuristic lengthscales, k-means inducing points.

JAX re-implementations of /root/reference/gpflow_pilco/models/initializers.py
(which used scipy.pdist + sklearn MiniBatchKMeans). These run once per episode
boundary — outside the jit hot path — so they favour clarity; k-means itself is a
jitted Lloyd iteration so it still runs on-device for large episode buffers.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def lengthscales_median(
    x: jax.Array, lower: float = 0.01, upper: float = 100.0
) -> jax.Array:
    """Median-of-pairwise-distances heuristic, clipped away from the constraint
    bounds (reference initializers.py:29-50)."""
    n = x.shape[0]
    if n > 2048:  # subsample for the O(n^2) distance matrix
        idx = np.random.default_rng(0).choice(n, 2048, replace=False)
        x = x[idx]
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    iu = jnp.triu_indices(x.shape[0], k=1)
    med = jnp.median(jnp.sqrt(d2[iu]))
    init = jnp.sqrt(0.5) * med
    lo = None if lower is None else 1.1 * lower
    hi = None if upper is None else 0.9 * upper
    init = jnp.clip(init, lo, hi)
    return jnp.full((x.shape[-1],), init, dtype=x.dtype)


@partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def _lloyd(x: jax.Array, init_centers: jax.Array, num_clusters: int, num_iters: int):
    def body(centers, _):
        d2 = (
            jnp.sum(x**2, -1)[:, None]
            - 2.0 * x @ centers.T
            + jnp.sum(centers**2, -1)[None, :]
        )
        assign = jnp.argmin(d2, axis=-1)  # (N,)
        one_hot = jax.nn.one_hot(assign, num_clusters, dtype=x.dtype)  # (N, K)
        counts = one_hot.sum(0)  # (K,)
        sums = one_hot.T @ x  # (K, D)
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers
        )
        return new_centers, None

    centers, _ = jax.lax.scan(body, init_centers, None, length=num_iters)
    return centers


def inducing_points_kmeans(
    x: np.ndarray,
    num_inducing: int,
    key: Optional[jax.Array] = None,
    num_iters: int = 50,
) -> np.ndarray:
    """k-means cluster centres as inducing inputs (reference initializers.py:53-84).

    n <= num_inducing returns the data itself (the caller sizes M = min(M, n),
    mirroring reference pilco.py:67-68 semantics).
    """
    x = np.asarray(x)
    n = x.shape[0]
    if n <= num_inducing:
        return np.array(x)
    if key is None:
        key = jax.random.PRNGKey(0)

    # k-means++ style seeding: greedy farthest-point from a random start
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    centers = [x[rng.integers(n)]]
    d2 = np.sum((x - centers[0]) ** 2, -1)
    for _ in range(num_inducing - 1):
        probs = d2 / max(d2.sum(), 1e-12)
        centers.append(x[rng.choice(n, p=probs)])
        d2 = np.minimum(d2, np.sum((x - centers[-1]) ** 2, -1))
    init = np.stack(centers)

    out = _lloyd(jnp.asarray(x), jnp.asarray(init), num_inducing, num_iters)
    return np.asarray(out)


def replace_duplicates(
    points: np.ndarray,
    variance: float,
    lengthscales: np.ndarray,
    tol: float,
    num_attempts: int = 32,
    seed: int = 0,
) -> np.ndarray:
    """Perturb points whose RBF correlation with any other exceeds ``tol``
    (reference initializers.py:87-124) — PILCO's defence against singular Kuu,
    kept for f32 conditioning (SURVEY.md §7 hard part 1)."""
    if tol >= 1:
        return points
    points = np.array(points, copy=True)
    ls = np.asarray(lengthscales)
    rng = np.random.default_rng(seed)

    def corr_row(a, b):
        d2 = np.sum(((a - b) / ls) ** 2, -1)
        return np.exp(-0.5 * d2)

    corr = corr_row(points[:, None], points[None, :])
    np.fill_diagonal(corr, -np.inf)
    hits = np.sum(corr > tol, axis=-1)
    while np.any(hits > 0):
        index = int(np.argmax(hits))
        original = points[index].copy()
        for attempt in range(num_attempts):
            alt = original + 1e-3 * (1.1**attempt) * rng.normal(size=original.shape)
            xorr = corr_row(points, alt[None])
            xorr[index] = -np.inf
            if not np.any(xorr >= tol):
                points[index] = alt
                corr[index, :] = xorr
                corr[:, index] = xorr
                break
            if attempt + 1 == num_attempts:
                corr[index, :] = -np.inf
                corr[:, index] = -np.inf
        hits = np.sum(corr > tol, axis=-1)
    return points
