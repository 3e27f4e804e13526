"""Shared episode metrics for the task harnesses.

Re-design of /root/reference/examples/cartpole_swingup/metrics.py: the
reference runs 100 serial python validation rollouts per episode; here the
whole validation batch is ONE vmapped device program whose policy model enters
as a traced argument (compiles once per model-shape bucket, not per episode).

These lived duplicated in the three example harnesses; hoisted because every
task shares them and because validation must consistently score the DEPLOYED
controller (``loop.acting_model``): with the retain_best_policy acting gate,
the policy that acted in the real environment may be the best-validated
snapshot rather than the freshly trained one, and vReward/vSuccess report the
controller a user would actually run.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..envs.base import rollout as env_rollout
from .pilco import PILCOBase


def deployed_policy(loop: PILCOBase):
    """The controller that acted in the latest real episode (trained policy or
    best-validated snapshot), falling back to the trained policy before any
    episode has been collected."""
    return loop.acting_model if loop.acting_model is not None else loop.policy_model


def metric_rewards(loop: PILCOBase, states, actions):
    """Realized episode reward: -sum of per-step objective costs over the
    encoded trajectory (reference metrics.py:16-25)."""
    feats = loop.encode(jnp.asarray(states, loop.dtype))
    return float(-jnp.sum(loop.objective(feats)))


def metric_expected_reward(loop: PILCOBase, states, actions):
    """Model-predicted expected reward of the freshly TRAINED policy under the
    current drift — deliberately not the deployed one, so the gap between
    eReward and vReward diagnoses drift-model error and acting-gate fallbacks."""
    return loop.expected_reward()


def make_success_metric(success_fn: Callable):
    """Boolean episode-success metric from a jittable per-trajectory predicate
    ``success_fn(loop, states) -> bool array``."""

    def metric_success(loop: PILCOBase, states, actions):
        return bool(success_fn(loop, jnp.asarray(states, loop.dtype)))

    return metric_success


def make_validation_metrics(success_fn: Optional[Callable], num_samples: int = 100):
    """Batched real-env validation of the deployed controller: ``num_samples``
    initial states rolled out as one vmapped program, feeding vReward and
    (when ``success_fn`` is given) vSuccess.

    ``success_fn(loop, states) -> bool array`` must be jittable over a single
    (T+1, D) trajectory; it is vmapped over the validation batch.
    """

    def _run(loop: PILCOBase, model):
        spec = loop.episode_spec
        fn = loop.__dict__.get("_jit_validation")
        if fn is None:
            # policy model enters as a traced arg so the whole validation
            # program compiles once per model shape, not once per episode
            @jax.jit
            def fn(policy_model, x0):
                chain = loop.policy_chain(policy_model)

                def policy(state):
                    return chain(loop.encode(state)[None])[0]

                states, _ = jax.vmap(
                    lambda x: env_rollout(
                        loop.env, policy, x, spec.step_size, spec.num_steps,
                        loop.env_substeps,
                    )
                )(x0)
                feats = loop.encode(states)
                rewards = -jnp.sum(loop.objective(feats), axis=-1)  # (S,)
                if success_fn is None:
                    succ = jnp.zeros((x0.shape[0],), bool)
                else:
                    succ = jax.vmap(lambda s: success_fn(loop, s))(states)
                return rewards, succ

            loop._jit_validation = fn
        key = jax.random.fold_in(loop.iteration_key(), 99)
        x0 = jnp.asarray(spec.sample(key, (num_samples,)), loop.dtype)
        return fn(model, x0)

    def validation(loop: PILCOBase, states, actions):
        """One batched rollout program feeding both metrics (the loop merges a
        dict-valued metric result, so no call-order coupling)."""
        model = deployed_policy(loop)
        if model is None:
            out = {"vReward": float("nan")}
            if success_fn is not None:
                out["vSuccess"] = float("nan")
            return out
        rewards, succ = _run(loop, model)
        out = {"vReward": float(jnp.mean(rewards))}
        if success_fn is not None:
            out["vSuccess"] = float(jnp.mean(succ.astype(jnp.float32)))
        return out

    return validation
