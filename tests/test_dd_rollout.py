"""Compensated (dd) MM rollout loss vs the f64 island truth.

The decisive check for PolicySpec.loss_compensated: at identical f32
parameters, the dd loss value must track the loss_dtype=f64 +
loss_policy_f32 island loss, and the policy GRADIENT must align (cosine) —
the quantity that decides whether the MM policy optimization works on chip
(docs/perf_notes.md round-3 island study)."""
import dataclasses
import pathlib
import sys

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0, str(pathlib.Path(__file__).resolve().parents[1] / "examples" / "cartpole_swingup")
)

from gpflowpilco_tpu.loops.pilco import (
    DriftSpec,
    MomentMatchingPILCO,
    PolicySpec,
)


def _loop(policy_overrides):
    from experiment import build_loop

    return build_loop(
        MomentMatchingPILCO,
        None,
        seed=11,
        dtype=jnp.float32,
        drift_spec=DriftSpec(num_centers=8, max_iters=40, pad_data_multiple=0),
        policy_spec=dataclasses.replace(
            PolicySpec(
                num_centers=5, step_limit=10, batch_size=8, num_bases=16,
                num_restarts=1, mm_unroll=1,
            ),
            **policy_overrides,
        ),
        horizon=1.5,  # 15 MM steps: enough recursion to be meaningful
        validation_samples=2,
    )


def _grad(loop):
    from gpflowpilco_tpu.ops import dd as ddops

    drift = loop.policy_loss_drift()

    def loss(pm):
        return loop.policy_loss_fn(pm, jax.random.PRNGKey(0), drift=drift)

    kw = {}
    if loop.policy_spec.loss_compensated:
        opts = ddops.eft_compiler_options()
        if opts:
            kw["compiler_options"] = opts
    v, g = jax.jit(jax.value_and_grad(loss), **kw)(loop.policy_model)
    flat = jax.flatten_util.ravel_pytree(g)[0]
    return np.float64(v), np.asarray(flat, np.float64)


def test_dd_rollout_loss_matches_f64_island():
    # one real episode + fits so the drift is a FITTED model (the regime
    # where precision matters), shared across both loss variants
    base = _loop({"loss_compensated": True})
    base.step()
    base.update_dynamics()
    base.policy_model = base.build_policy()

    v_dd, g_dd = _grad(base)

    island = _loop({"loss_dtype": jnp.float64, "loss_policy_f32": True})
    island.episodes = base.episodes
    island.drift_model = base.drift_model
    island.policy_model = base.policy_model
    v_64, g_64 = _grad(island)

    assert np.isfinite(v_dd) and np.isfinite(v_64)
    # same trajectory family: losses agree tightly, gradients align
    assert abs(v_dd - v_64) < 2e-4 * max(1.0, abs(v_64)), (v_dd, v_64)
    cos = float(g_dd @ g_64 / (np.linalg.norm(g_dd) * np.linalg.norm(g_64) + 1e-30))
    assert cos > 0.999, cos
    ratio = np.linalg.norm(g_dd) / (np.linalg.norm(g_64) + 1e-30)
    assert 0.99 < ratio < 1.01, ratio


def test_dd_rollout_trains_end_to_end():
    """A full tiny PILCO iteration under loss_compensated: update_policy runs
    the multi-start optimizer through the dd loss and produces finite results."""
    loop = _loop({"loss_compensated": True})
    loop.step()
    loop.update_dynamics()
    info = loop.update_policy()
    assert np.isfinite(info["loss"])
    ep = loop.step()
    assert np.isfinite(ep.metrics["rewards"])
