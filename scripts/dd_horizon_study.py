#!/usr/bin/env python
"""Gradient-cosine vs rollout horizon at a fitted checkpoint: is the dd loss
equivalent to the f64 island (both limited by the f32 policy-chain island's
chaos-amplified rounding), or does dd have an extra defect?

Run on CPU: python scripts/dd_horizon_study.py [ckpt_dir]
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples", "cartpole_swingup"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from experiment import build_loop
from gpflowpilco_tpu.loops.pilco import DriftSpec, MomentMatchingPILCO, PolicySpec
from gpflowpilco_tpu.ops.dd import eft_compiler_options

CKPT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/swingup_mm_r4"


PER_OUTPUT_NOISE = os.environ.get("DD_STUDY_PER_OUTPUT_NOISE", "0") == "1"


def build(horizon, loss_dtype=None, policy_f32=False, compensated=False,
          policy_f32_off=False):
    loop = build_loop(
        MomentMatchingPILCO, CKPT, seed=3, dtype=jnp.float32,
        drift_spec=DriftSpec(
            num_centers=64, max_iters=1000,
            # match the checkpoint's noise shape: the round-5 evidence-run
            # checkpoints carry per-output (P,) raw_noise
            per_output_noise=PER_OUTPUT_NOISE,
        ),
        policy_spec=PolicySpec(
            step_limit=2000, loss_dtype=loss_dtype,
            loss_policy_f32=(policy_f32 if not compensated else not policy_f32_off),
            loss_compensated=compensated, mm_unroll=1,
        ),
        validation_samples=2,
    )
    assert loop.restore_or_initialize(), f"no checkpoint under {CKPT}"
    loop.episode_spec = loop.episode_spec._replace(horizon=horizon)
    return loop


def grad_at(loop):
    drift = loop.policy_loss_drift()

    def loss(pm):
        return loop.policy_loss_fn(pm, jax.random.PRNGKey(0), drift=drift)

    kw = {}
    if loop.policy_spec.loss_compensated:
        opts = eft_compiler_options()
        if opts:
            kw["compiler_options"] = opts
    v, g = jax.jit(jax.value_and_grad(loss), **kw)(loop.policy_model)
    return np.float64(v), np.asarray(jax.flatten_util.ravel_pytree(g)[0], np.float64)


def main():
    print(f"{'T':>3} {'variant':<11} {'loss':>14} {'cos':>10} {'|g|/|gt|':>10}")
    for horizon in (0.5, 1.0, 2.0, 3.0):
        vt, gt = grad_at(build(horizon, jnp.float64))
        for name, loop in (
            ("island", build(horizon, jnp.float64, policy_f32=True)),
            ("dd", build(horizon, compensated=True)),
            ("dd-full", build(horizon, compensated=True, policy_f32_off=True)),
            ("f32", build(horizon)),
        ):
            v, g = grad_at(loop)
            cos = float(g @ gt / (np.linalg.norm(g) * np.linalg.norm(gt) + 1e-30))
            ratio = float(np.linalg.norm(g) / (np.linalg.norm(gt) + 1e-30))
            print(f"{int(horizon*10):>3} {name:<11} {v:>14.8f} {cos:>10.6f} {ratio:>10.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
