"""Episode containers and specs.

Counterpart of /root/reference/gpflow_pilco/loops/core.py:27-41. The initial-state
distribution is explicit (mean, scale_tril) instead of a TFP object so episode specs
are jit-friendly pytrees.
"""
from __future__ import annotations

import math
from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class EpisodeSpec(NamedTuple):
    state_mean: np.ndarray  # (D,)
    state_scale_tril: np.ndarray  # (D, D)
    horizon: float
    step_size: float
    initial_time: float = 0.0

    @property
    def num_steps(self) -> int:
        return int(math.ceil(self.horizon / self.step_size))

    def sample(self, key: jax.Array, shape=()):
        mean = jnp.asarray(self.state_mean)
        tril = jnp.asarray(self.state_scale_tril, mean.dtype)
        rvs = jax.random.normal(key, tuple(shape) + mean.shape, mean.dtype)
        return mean + jnp.einsum("ij,...j->...i", tril, rvs)

    def covariance(self):
        tril = jnp.asarray(self.state_scale_tril)
        return tril @ tril.T


class EpisodeData(NamedTuple):
    states: np.ndarray  # (T+1, D)
    actions: np.ndarray  # (T, U)
    metrics: Dict[str, float]


def stack_episodes(episodes: List[EpisodeData]):
    """(E, T+1, D), (E, T, U) state/action stacks (reference loops/core.py:127-136)."""
    states = np.stack([ep.states for ep in episodes])
    actions = np.stack([ep.actions for ep in episodes])
    return states, actions
