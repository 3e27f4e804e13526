"""Shared fixtures for Monte-Carlo parity tests.

Mirrors the reference's statistical test strategy (/root/reference/tests/utils.py):
rtol is derived from MC error as 10/sqrt(num_samples) (utils.py:43-44); covariance
matrices are drawn from -log U eigenvalues with a random orthogonal basis, rescaled
to a target marginal scale (utils.py:99-121).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class TestConfig:
    __test__ = False

    def __init__(self, seed, num_samples=None, rtol=None, atol=1e-8, dtype=jnp.float64):
        if rtol is None:
            rtol = 1e-5 if num_samples is None else 10.0 * num_samples**-0.5
        self.seed = seed
        self.num_samples = num_samples
        self.rtol = rtol
        self.atol = atol
        self.dtype = dtype
        self.key = jax.random.PRNGKey(seed)

    def next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub


def allclose(a, b, rtol=1e-5, atol=1e-8):
    return bool(jnp.all(jnp.abs(a - b) <= rtol + atol * jnp.abs(b)))


def max_rel_err(a, b, atol=1e-8):
    return float(jnp.max(jnp.abs(a - b) / (atol + jnp.abs(b))))


def draw_samples_mvn(key, mu, cov, num_samples, sqrt=None):
    if sqrt is None:
        sqrt = jnp.linalg.cholesky(cov)
    rvs = jax.random.normal(
        key, (num_samples,) + tuple(cov.shape[:-2]) + (mu.shape[-1],), dtype=mu.dtype
    )
    return mu + jnp.einsum("...ij,s...j->s...i", sqrt, rvs)


def empirical_covariance(a, b=None, center=True):
    _a = a - jnp.mean(a, axis=0, keepdims=True) if center else a
    _b = _a if b is None else (b - jnp.mean(b, axis=0, keepdims=True) if center else b)
    return jnp.einsum("ni,nj->ij", _a, _b) / (a.shape[0] - 1)


def generate_covariance(key, ndims, batch_shape=(), scale=None, dtype=jnp.float64):
    k1, k2 = jax.random.split(key)
    eigen_vals = -jnp.log(
        jax.random.uniform(k1, tuple(batch_shape) + (1, ndims), dtype=dtype)
    )
    gauss = jax.random.normal(k2, tuple(batch_shape) + (ndims, ndims), dtype=dtype)
    _, _, vt = jnp.linalg.svd(gauss)
    sqrt_cov = jnp.sqrt(eigen_vals) * vt
    cov = sqrt_cov @ jnp.swapaxes(sqrt_cov, -1, -2)
    if scale is not None:
        istd = 1.0 / jnp.sqrt(jnp.diagonal(cov, axis1=-2, axis2=-1))
        cov = (scale**2) * cov * istd[..., None] * istd[..., None, :]
    return cov


def rbf_gram(variance, lengthscales, a, b):
    sa = a / lengthscales
    sb = b / lengthscales
    d2 = (
        jnp.sum(sa * sa, -1)[..., :, None]
        + jnp.sum(sb * sb, -1)[..., None, :]
        - 2.0 * jnp.einsum("...nd,...md->...nm", sa, sb)
    )
    return variance * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))


def np_seed_from(config):
    return np.random.default_rng(config.seed)
