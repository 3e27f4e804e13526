"""Mountain-car PILCO experiment — a second end-to-end task on the framework.

The reference ships the MountainCar *environment* but no experiment harness for
it (SURVEY.md §2.2 covers cartpole only); this demonstrates the loop layer is
task-agnostic: no encoder (no angular dims), 2-D state (x, dx), 1-D force in
[-4, 4], Gaussian cost around the hilltop goal x = 0.6.
"""
from __future__ import annotations

from typing import Optional, Type

import jax
import jax.numpy as jnp
import numpy as np

from gpflowpilco_tpu.components import GaussianObjective
from gpflowpilco_tpu.envs.mountain_car import MountainCar
from gpflowpilco_tpu.loops import metrics as shared_metrics
from gpflowpilco_tpu.loops.core import EpisodeSpec
from gpflowpilco_tpu.loops.driver import outer_loop
from gpflowpilco_tpu.loops.pilco import (
    DriftSpec,
    MomentMatchingPILCO,
    PILCOBase,
    PolicySpec,
)

GOAL_X = 0.6


def build_task(dtype=jnp.float64, step_size: float = 0.1, horizon: float = 5.0):
    env = MountainCar()
    target = jnp.asarray([GOAL_X, 0.0], dtype)
    precis = jnp.asarray([[16.0, 0.0], [0.0, 0.25]], dtype)
    objective = GaussianObjective.create(target=target, precis=precis)
    spec = EpisodeSpec(
        # reference resets x ~ U[-0.6, -0.4] (mountain_car.py:76-80); the loop's
        # initial distribution is Gaussian, so match mean/std
        state_mean=np.asarray([-0.5, 0.0]),
        state_scale_tril=np.diag([0.058, 0.01]),
        horizon=horizon,
        step_size=step_size,
    )
    return env, objective, spec


def success_mask(states, prox: float = 0.05, num_consecutive: int = 5):
    near = jnp.abs(states[..., 0] - GOAL_X) < prox
    window = jnp.ones((num_consecutive,), states.dtype)
    runs = jnp.convolve(near.astype(states.dtype), window, mode="valid")
    return jnp.any(runs >= num_consecutive)


def build_loop(
    loop_cls: Type[PILCOBase],
    directory: Optional[str],
    seed: int,
    dtype=jnp.float64,
    drift_spec: DriftSpec = DriftSpec(num_centers=128),
    policy_spec: PolicySpec = PolicySpec(num_centers=20, action_scale=4.0),
    validation_samples: int = 30,
) -> PILCOBase:
    env, objective, spec = build_task(dtype)

    def _success(loop, states):
        return success_mask(states)

    loop = loop_cls(
        env=env,
        episode_spec=spec,
        objective=objective,
        encoder=None,  # raw 2-D state; no trig features needed
        directory=directory,
        seed=seed,
        dtype=dtype,
        drift_spec=drift_spec,
        policy_spec=policy_spec,
        metrics={
            "rewards": shared_metrics.metric_rewards,
            "success": shared_metrics.make_success_metric(_success),
            "eReward": shared_metrics.metric_expected_reward,
            "validation": shared_metrics.make_validation_metrics(
                _success, validation_samples
            ),
        },
    )
    loop.restore_or_initialize()
    return loop


def main(dest, seed, loop_cls=MomentMatchingPILCO, num_episodes=8, **kwargs):
    loop = build_loop(loop_cls, dest, seed, **kwargs)
    return outer_loop(loop, num_episodes, save=dest is not None)
