"""Systematic particle resampling, local and sharded.

BASELINE.md north-star: "moment reduction, step-size adaptation, and resampling
via psum/all_gather collectives". PILCO's pathwise rollouts are unweighted, but
weighted-particle extensions (SMC-style dynamics posteriors, risk-sensitive
objectives) need low-variance resampling that works across a particle-sharded
mesh.

Systematic resampling: one uniform u0 ~ U[0, 1/S); positions (i + u0)/S are
inverted through the weight CDF. Sharded: weights and states all_gather (tiny —
S x D floats for PILCO states), each shard computes its local output slab;
the only collectives are one psum (normalization) and one all_gather.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def systematic_resample_indices(key: jax.Array, weights: jax.Array) -> jax.Array:
    """(S,) normalized-or-not weights -> (S,) ancestor indices."""
    s = weights.shape[0]
    w = weights / jnp.sum(weights)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), weights.dtype, minval=0.0, maxval=1.0 / s)
    positions = u0 + jnp.arange(s, dtype=weights.dtype) / s
    return jnp.clip(jnp.searchsorted(cdf, positions), 0, s - 1)


def systematic_resample(key: jax.Array, weights: jax.Array, particles):
    """Resample a particle pytree (leading axis S) by systematic resampling."""
    idx = systematic_resample_indices(key, weights)
    return jax.tree.map(lambda a: a[idx], particles)


def systematic_resample_sharded(
    key: jax.Array,
    local_weights: jax.Array,
    local_particles,
    axis_name: str = "dp",
):
    """Inside `shard_map`: local (S_local,) weights + (S_local, ...) particles,
    globally-consistent systematic resampling; returns the local output slab.

    Every shard must receive the same `key`.
    """
    num_shards = jax.lax.psum(1, axis_name)
    shard_idx = jax.lax.axis_index(axis_name)
    s_local = local_weights.shape[0]
    s_global = s_local * num_shards

    # all_gather the (small) weight vector and compute the global CDF
    weights = jax.lax.all_gather(local_weights, axis_name).reshape(-1)
    w = weights / jnp.sum(weights)
    cdf = jnp.cumsum(w)

    u0 = jax.random.uniform(
        key, (), local_weights.dtype, minval=0.0, maxval=1.0 / s_global
    )
    # this shard's output positions
    offs = shard_idx * s_local + jnp.arange(s_local, dtype=local_weights.dtype)
    positions = u0 + offs / s_global
    src = jnp.clip(jnp.searchsorted(cdf, positions), 0, s_global - 1)

    # gather source particles: states are tiny, all_gather then index
    def fetch(a):
        full = jax.lax.all_gather(a, axis_name).reshape((s_global,) + a.shape[1:])
        return full[src]

    return jax.tree.map(fetch, local_particles)
