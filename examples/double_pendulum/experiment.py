"""Double-pendulum swing-up experiment — third end-to-end task on the framework.

The reference ships the DoublePendulum *environment* (reference
envs/double_pendulum.py) but no experiment harness; this follows the cartpole
pattern (examples/cartpole_swingup) with the bits the other tasks don't
exercise: two angular dims through the trig encoder (6-D feature space), a 2-D
torque through the squashed policy, and LinearCoregionalization (W-mixed
latents) on both the policy and — optionally — the dynamics model.

Task: both links start hanging (absolute angles a0 = a1 = pi from upright) and
must be swung up and balanced. Cost is a Gaussian in the distance between the
outer-link tip and the upright goal point (0, l0 + l1), expressed exactly in
the encoded features:

  tip = (-l0 sin a0 - l1 sin a1, l0 cos a0 + l1 cos a1)
  d^2 = err^T Q err,  err = [sin a0, sin a1, cos a0 - 1, cos a1 - 1]
  Q   = [[l0^2, l0 l1], [l0 l1, l1^2]] (x)) I_2   (sin block, cos block)
"""
from __future__ import annotations

import math
from typing import Optional, Type

import jax
import jax.numpy as jnp
import numpy as np

from gpflowpilco_tpu.components import GaussianObjective, trigonometric_encoder
from gpflowpilco_tpu.envs.double_pendulum import DoublePendulum
from gpflowpilco_tpu.loops import metrics as shared_metrics
from gpflowpilco_tpu.loops.core import EpisodeSpec
from gpflowpilco_tpu.loops.pilco import (
    DriftSpec,
    MomentMatchingPILCO,
    PILCOBase,
    PolicySpec,
)


def build_task(dtype=jnp.float64, step_size: float = 0.1, horizon: float = 4.0):
    env = DoublePendulum()
    encoder = trigonometric_encoder(active_dims=(0, 1))

    # feature layout: [sin a0, sin a1, cos a0, cos a1, da0, da1]
    target = encoder(jnp.zeros(4, dtype))  # upright: [0, 0, 1, 1, 0, 0]
    l0, l1 = float(env.length0), float(env.length1)
    q = np.asarray([[l0 * l0, l0 * l1], [l0 * l1, l1 * l1]])
    precis = np.zeros((6, 6))
    precis[:2, :2] = q  # sin block
    precis[2:4, 2:4] = q  # cos block
    # cost length-scale 0.5 m over a reach of l0+l1 = 1 m (the classic PILCO
    # double-pendulum setting; cartpole's 0.25 m over 0.6 m is comparable)
    precis = jnp.asarray(4.0 * precis, dtype)
    objective = GaussianObjective.create(target=target, precis=precis)

    spec = EpisodeSpec(
        # match env.reset (double_pendulum.py:67-71): hanging, nearly at rest
        state_mean=np.asarray([math.pi, math.pi, 0.0, 0.0]),
        state_scale_tril=np.diag([0.01, 0.01, 0.1, 0.1]),
        horizon=horizon,
        step_size=step_size,
    )
    return env, encoder, objective, spec


HOLD_SECONDS = 1.0  # balance-hold requirement, in seconds (dt-independent)


def success_mask(env: DoublePendulum, states, step_size, prox_threshold=0.2):
    """Outer tip within prox_threshold * reach of the upright goal for >=
    HOLD_SECONDS of consecutive sim time (cartpole metrics pattern, but
    expressed in seconds so the criterion does not weaken at finer control
    rates), jittable."""
    num_consecutive = max(1, round(HOLD_SECONDS / step_size))
    reach = env.length0 + env.length1
    (_, _), (x1, y1) = env.get_vertex_coordinates(states)
    prox = jnp.sqrt(x1**2 + (y1 - reach) ** 2) < prox_threshold * reach
    window = jnp.ones((num_consecutive,), states.dtype)
    runs = jnp.convolve(prox.astype(states.dtype), window, mode="valid")
    return jnp.any(runs >= num_consecutive)


def _success(loop, states):
    return success_mask(loop.env, states, loop.episode_spec.step_size)


metric_rewards = shared_metrics.metric_rewards
metric_success = shared_metrics.make_success_metric(_success)
metric_expected_reward = shared_metrics.metric_expected_reward


def make_validation_metrics(num_samples: int = 100):
    """Batched real-env validation of the deployed controller: one vmapped
    device program feeding both vReward and vSuccess (see loops/metrics.py)."""
    return shared_metrics.make_validation_metrics(_success, num_samples)


def build_loop(
    loop_cls: Type[PILCOBase],
    directory: Optional[str],
    seed: int,
    dtype=jnp.float64,
    # LCK dynamics: 4 outputs W-mixed from 4 latent GPs (W init identity,
    # trained with the other hyperparameters); per-output noise is essential
    # here — Delta-angle std ~0.3 vs Delta-velocity std ~5 at dt=0.05, and a
    # shared noise floor erases the angle signal entirely
    drift_spec: DriftSpec = DriftSpec(
        coregionalize=True, per_output_noise=True
    ),
    # policy: 2 torque outputs from 2 latent GPs through an identity W (the
    # deterministic kernel-regressor policy keeps its mixing fixed), squashed
    policy_spec: PolicySpec = PolicySpec(
        num_centers=40, action_scale=2.0, coregionalize=True
    ),
    step_size: float = 0.1,
    horizon: float = 4.0,
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


def main(
    dest: Optional[str],
    seed: int,
    loop_cls: Type[PILCOBase] = MomentMatchingPILCO,
    num_episodes: int = 15,
    num_episodes_init: int = 2,
    fused: bool = False,
    fused_match: bool = False,
    fused_rollout: bool = False,
    **build_kwargs,
) -> PILCOBase:
    from gpflowpilco_tpu.loops.driver import outer_loop

    loop = build_loop(loop_cls, dest, seed, **build_kwargs)
    if fused:
        loop.use_fused_paths = True
        loop.use_fused_mm = True
    if fused_match:
        loop.use_fused_match = True
    if fused_rollout:
        loop.use_fused_rollout = True
    return outer_loop(loop, num_episodes, num_episodes_init, save=dest is not None)
