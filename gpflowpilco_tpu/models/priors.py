"""Hyperpriors: PILCO's signal-to-noise-ratio penalty.

Re-implementation of /root/reference/gpflow_pilco/models/priors.py:22-55:
penalty = -sum((log_snr / log_threshold)^power); with an even power this punishes
SNRs beyond the threshold in either direction. Used with threshold=1e5, power=30
(reference swingup_loops.py:66).
"""
from __future__ import annotations

import jax.numpy as jnp

from .gp import SVGP


def log_snr(model) -> jnp.ndarray:
    """Per-output log signal-to-noise ratio."""
    log_noise = jnp.log(model.noise_variance)
    variance = model.kernel.variance
    if isinstance(model, SVGP) and model.w is not None:
        # LCK: signal per output mixes latent variances through W^2
        signal = (model.w**2) @ variance
        return jnp.log(signal) - log_noise
    return jnp.log(jnp.atleast_1d(variance)) - log_noise


def pilco_snr_penalty(model, threshold: float = 1e5, power: float = 30.0):
    snr = log_snr(model)
    log_thresh = jnp.log(jnp.asarray(threshold, snr.dtype))
    return -jnp.sum((snr / log_thresh) ** power)
