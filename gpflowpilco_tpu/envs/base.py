"""Gym-free environments as jittable pure state-transition functions.

The reference wraps `scipy.integrate.solve_ivp` inside gym Envs
(/root/reference/gpflow_pilco/envs/ordinary_differential_env.py), forcing a
TF<->numpy boundary on every control step and making validation rollouts serial
(reference metrics.py:56-83 runs 100 python-loop unrolls). Here an environment is a
parameter pytree with a pure ``step(state, action, key)``; rollouts are `lax.scan`
and batch via `vmap` / shard via `shard_map`, so the 100-rollout validation metric
is one device launch (SURVEY.md §2.4 "MC validation unrolls").

Integration is fixed-step RK4 at a finer substep than the control interval
(default 10 substeps per control step, i.e. 0.01 s at the cartpole's dt=0.1),
replacing adaptive RK45.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..dynamics.solvers import rk4_integrate


class Box(NamedTuple):
    """Static action/observation bounds."""

    low: tuple
    high: tuple

    def clip(self, x):
        return jnp.clip(
            x, jnp.asarray(self.low, x.dtype), jnp.asarray(self.high, x.dtype)
        )

    def sample(self, key, dtype=jnp.float32):
        lo = jnp.asarray(self.low, dtype)
        hi = jnp.asarray(self.high, dtype)
        return jax.random.uniform(key, lo.shape, dtype, minval=lo, maxval=hi)


def clip_derivative(deriv, state, low, high):
    """Clip state derivatives so integration cannot leave the observation box
    (reference cart_pole.py:81-83, mountain_car.py:70-73)."""
    lo = jnp.asarray(low, deriv.dtype)
    hi = jnp.asarray(high, deriv.dtype)
    return jnp.clip(deriv, lo - state, hi - state)


def env_step(env, state, action, dt: float, substeps: int = 10):
    """One control step: clip action, integrate the ODE for dt with RK4."""
    action = env.action_space.clip(action)
    return rk4_integrate(lambda s: env.ode(s, action), state, dt, substeps)


def rollout(
    env,
    policy: Callable,
    x0: jax.Array,
    dt: float,
    num_steps: int,
    substeps: int = 10,
):
    """Unroll ``num_steps`` control steps from x0; policy maps raw state -> action.

    Returns (states incl. x0: (T+1, D), actions: (T, U)). vmap over x0 for batched
    validation rollouts.
    """

    def body(state, _):
        action = policy(state)
        new_state = env_step(env, state, action, dt, substeps)
        return new_state, (new_state, action)

    _, (states, actions) = jax.lax.scan(body, x0, None, length=num_steps)
    states = jnp.concatenate([x0[None], states], axis=0)
    return states, actions
