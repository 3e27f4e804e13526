"""Device-mesh helpers for multi-chip PILCO.

The reference has no parallelism at all (SURVEY.md §2.4); the TPU build's natural
axes are *particles* (data-parallel: each particle rides its own sampled dynamics
function) and *Fourier bases* (tensor-parallel: the RFF contraction splits over
bases and reduces with a psum). Layout: particles on the outer mesh axis (spans
DCN across hosts — rollouts are embarrassingly parallel), bases inner (ICI —
the per-step psum is latency-bound).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Mesh with axes ('dp', 'tp'): dp = particle data-parallel, tp = basis
    tensor-parallel. dp defaults to (num_devices // tp)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp <= n, (dp, tp, n)
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def particle_sharding(mesh: Mesh, ndim_tail: int = 0) -> NamedSharding:
    """Shard the leading (particle) axis over dp."""
    return NamedSharding(mesh, P("dp", *([None] * ndim_tail)))
