"""Cartpole swing-up experiment harness.

Re-design of /root/reference/examples/cartpole_swingup/{experiment,swingup_loops,
metrics}.py: task components, metrics (incl. fully-vmapped validation rollouts),
and the outer loop. Defaults mirror the reference workload (BASELINE.md): 3.0 s
horizon at dt=0.1 (30 steps), 10 episodes with 1 random-init episode, N([0, pi, 0,
0], 0.1^2 I) initial-state distribution, 100-rollout validation.
"""
from __future__ import annotations

import math
from typing import Optional, Type

import jax
import jax.numpy as jnp
import numpy as np

from gpflowpilco_tpu.components import GaussianObjective, trigonometric_encoder
from gpflowpilco_tpu.envs.cartpole import CartPole
from gpflowpilco_tpu.loops import metrics as shared_metrics
from gpflowpilco_tpu.loops.core import EpisodeSpec
from gpflowpilco_tpu.loops.pilco import (
    DriftSpec,
    MomentMatchingPILCO,
    PILCOBase,
    PolicySpec,
)


def build_task(dtype=jnp.float64, step_size: float = 0.1, horizon: float = 3.0):
    """Env, encoder, objective, episode spec (reference swingup_loops.py:39-54)."""
    env = CartPole()
    encoder = trigonometric_encoder(active_dims=(1,))

    target = encoder(jnp.zeros(4, dtype))  # upright: [0, 1, 0, 0, 0]
    h = float(env.pole_height)
    precis = 16.0 * jnp.asarray(
        [
            [h * h, 0, -h, 0, 0],
            [0, h * h, 0, 0, 0],
            [-h, 0, 1, 0, 0],
            [0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0],
        ],
        dtype,
    )
    objective = GaussianObjective.create(target=target, precis=precis)

    spec = EpisodeSpec(
        state_mean=np.asarray([0.0, math.pi, 0.0, 0.0]),
        state_scale_tril=0.1 * np.eye(4),
        horizon=horizon,
        step_size=step_size,
    )
    return env, encoder, objective, spec


# ----------------------------------------------------------------------- metrics
def success_mask(env: CartPole, states, prox_threshold=0.2, num_consecutive=10):
    """Pole tip within prox_threshold * pole-length of the upright goal for >=
    num_consecutive steps (reference metrics.py:28-44), as a jittable reduction."""
    radius = env.pole_height
    x, y = env.get_tip_coordinates(states)
    prox = jnp.sqrt(x**2 + (y - radius) ** 2) < prox_threshold * radius
    window = jnp.ones((num_consecutive,), states.dtype)
    runs = jnp.convolve(prox.astype(states.dtype), window, mode="valid")
    return jnp.any(runs >= num_consecutive)


def _success(loop, states):
    return success_mask(loop.env, states)


metric_rewards = shared_metrics.metric_rewards
metric_success = shared_metrics.make_success_metric(_success)
metric_expected_reward = shared_metrics.metric_expected_reward


def make_validation_metrics(num_samples: int = 100):
    """Batched real-env validation of the deployed controller (reference
    metrics.py:56-83 runs these as 100 serial python rollouts; here they are
    one vmapped device program — see loops/metrics.py)."""
    return shared_metrics.make_validation_metrics(_success, num_samples)


# ----------------------------------------------------------------------- driver
def build_loop(
    loop_cls: Type[PILCOBase],
    directory: Optional[str],
    seed: int,
    dtype=jnp.float64,
    drift_spec: DriftSpec = DriftSpec(),
    policy_spec: PolicySpec = PolicySpec(),
    step_size: float = 0.1,
    horizon: float = 3.0,
    validation_samples: int = 100,
) -> PILCOBase:
    env, encoder, objective, spec = build_task(dtype, step_size, horizon)
    loop = loop_cls(
        env=env,
        episode_spec=spec,
        objective=objective,
        encoder=encoder,
        directory=directory,
        seed=seed,
        dtype=dtype,
        drift_spec=drift_spec,
        policy_spec=policy_spec,
        metrics={
            "rewards": metric_rewards,
            "success": metric_success,
            "eReward": metric_expected_reward,
            "validation": make_validation_metrics(validation_samples),
        },
    )
    loop.restore_or_initialize()
    return loop


# task-agnostic driver, shared with the other task harnesses
from gpflowpilco_tpu.loops.driver import outer_loop  # noqa: E402


def main(
    dest: Optional[str],
    seed: int,
    loop_cls: Type[PILCOBase] = MomentMatchingPILCO,
    num_episodes: int = 10,
    num_episodes_init: int = 1,
    **build_kwargs,
) -> PILCOBase:
    loop = build_loop(loop_cls, dest, seed, **build_kwargs)
    return outer_loop(loop, num_episodes, num_episodes_init, save=dest is not None)
