"""Global numeric configuration.

The reference stack (GPflow) runs float64 everywhere via ``gpflow.config.default_float``
(see /root/reference/gpflow_pilco/loops/core.py:123). TPUs are float32-native, so this
framework is dtype-polymorphic: all math derives its dtype from its inputs. This module
only fixes the *default* dtype used when creating new parameters/states and the jitter
used to stabilise Cholesky factorizations.

On CPU test runs we enable x64 for Monte-Carlo parity against the f64 reference; on TPU
we run f32 with whitened parameterizations + jitter (SURVEY.md §7 "f32 parity" plan).
"""
from __future__ import annotations

import jax.numpy as jnp

_DEFAULT_FLOAT = None  # resolved lazily so tests can flip jax_enable_x64 first
_DEFAULT_JITTER = None  # None => dtype-dependent default


def default_float():
    global _DEFAULT_FLOAT
    if _DEFAULT_FLOAT is not None:
        return _DEFAULT_FLOAT
    # float64 iff x64 is enabled, else float32
    return jnp.zeros([], dtype=jnp.float64).dtype


def set_default_float(dtype):
    global _DEFAULT_FLOAT
    _DEFAULT_FLOAT = None if dtype is None else jnp.dtype(dtype)


def default_jitter(dtype=None) -> float:
    """Cholesky jitter. f32 needs ~100x more than the f64 reference default:
    at M=256 inducing points a 1e-6 jitter underflows against f32 rounding in
    Kuu and the factorization goes NaN (observed on TPU; SURVEY.md §7 hard
    part 1)."""
    if _DEFAULT_JITTER is not None:
        return _DEFAULT_JITTER
    if dtype is not None and jnp.dtype(dtype) == jnp.float32:
        return 1e-4
    return 1e-6


def set_default_jitter(jitter):
    global _DEFAULT_JITTER
    _DEFAULT_JITTER = None if jitter is None else float(jitter)
