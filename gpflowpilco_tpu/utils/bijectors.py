"""Parameter constraint bijectors (functional).

Parameters are stored *unconstrained* inside model pytrees and mapped to their
constrained values on read. This replaces GPflow's Parameter+bijector machinery
(reference models/initializers.py:36-41 uses Sigmoid(0.01, 100) for lengthscales and
gpflow's shifted-softplus `positive` elsewhere) with plain functions, so every model
is an ordinary pytree that any optax optimizer can drive.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.nn import softplus


def softplus_inv(y):
    # log(exp(y) - 1), stable: y + log1p(-exp(-y))
    return y + jnp.log(-jnp.expm1(-y))


def positive(raw, lower: float = 1e-6):
    return softplus(raw) + lower


def positive_inv(value, lower: float = 1e-6):
    return softplus_inv(jnp.maximum(value - lower, 1e-12))


def sigmoid_interval(raw, low: float, high: float):
    return low + (high - low) * jnp.reciprocal(1.0 + jnp.exp(-raw))


def sigmoid_interval_inv(value, low: float, high: float):
    p = (value - low) / (high - low)
    p = jnp.clip(p, 1e-12, 1.0 - 1e-12)
    return jnp.log(p) - jnp.log1p(-p)
