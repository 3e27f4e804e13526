#!/usr/bin/env python
"""MM f32 gradient quality at a REAL fitted point, before/after the expm1 fix.

The synthetic-point study (scripts/mm_precision_study.py) showed the f32 MM
rollout gradient is already well-aligned (cos 0.996) at a random, vague
drift — but the production failure mode is a FITTED drift: once the posterior
is confident, eKuffu -> eKfu (x) eKfu and the direct f2 - f1^2 covariance
loses all relative f32 precision (the late-PILCO regime where the on-chip
f32 MM run plateaued while CPU-f64 solved). It also exposed that the old
probe's "0.78 cosine" was a methodology artifact: jax.random draws different
values per dtype, so build_mm_loss(f64) built a *different* model than the
f32 run — the truth gradient belonged to another function.

Protocol here (the fixed one): load the final checkpoint of the round-3
on-chip mm_small run (/tmp/swingup_mm_small_r3/ckpt-10.pkl — f32 fitted drift
M=64 + trained policy + episodes), build the loop EXACTLY as run_tpu_full
does, and compare the policy gradient of:

  f32            the chip status quo
  f64+polf32     the production mixed lever: f64 carry + f64 drift match with
                 the policy chain fenced in an f32 island
                 (PolicySpec.loss_dtype=f64, loss_policy_f32=True)
  f64 truth      loss_dtype=f64, island off (identical f32 parameters)

Run on CPU: python scripts/mm_realistic_grad_study.py [ckpt_dir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "examples", "cartpole_swingup")
)

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


def build(loss_dtype, policy_f32=False, compensated=False, per_output_noise=False):
    loop = build_loop(
        MomentMatchingPILCO,
        CKPT,
        seed=3,
        dtype=jnp.float32,
        drift_spec=DriftSpec(
            num_centers=64, max_iters=1000, per_output_noise=per_output_noise
        ),
        policy_spec=PolicySpec(
            step_limit=2000, loss_dtype=loss_dtype, loss_policy_f32=policy_f32,
            loss_compensated=compensated, mm_unroll=1,
        ),
        validation_samples=2,
    )
    assert loop.restore_or_initialize(), f"no checkpoint under {CKPT}"
    return loop


def grad_at(loop):
    drift = loop.policy_loss_drift()

    def loss(pm):
        return loop.policy_loss_fn(pm, jax.random.PRNGKey(0), drift=drift)

    # jit (with the dd EFT compiler options where applicable, mirroring
    # tests/test_dd_rollout.py::_grad): the eager 30-step rollout AD was
    # ~30+ min per variant on a contended host, vs ~1 min jitted
    kw = {}
    if loop.policy_spec.loss_compensated:
        opts = eft_compiler_options()
        if opts:
            kw["compiler_options"] = opts
    v, g = jax.jit(jax.value_and_grad(loss), **kw)(loop.policy_model)
    return np.float64(v), np.asarray(jax.flatten_util.ravel_pytree(g)[0], np.float64)


def main():
    import os as _os

    pon = _os.environ.get("DD_STUDY_PER_OUTPUT_NOISE", "0") == "1"
    results = {}
    # f64 truth: mixed-precision loss (f32 params, f64 rollout) — the loop's
    # own loss_dtype machinery, island off
    results["f64-truth"] = grad_at(build(jnp.float64, per_output_noise=pon))
    results["f32"] = grad_at(build(None, per_output_noise=pon))
    # the production mixed-precision v2 lever: f64 carry + f64 drift match,
    # policy chain fenced in an f32 island (PolicySpec.loss_policy_f32)
    results["f64+polf32"] = grad_at(
        build(jnp.float64, policy_f32=True, per_output_noise=pon)
    )
    # round-4 compensated lever: dd (double-float f32) carry + drift match
    # (PolicySpec.loss_compensated) — pure f32 ops, no x64 anywhere.
    # loss_policy_f32=True -> dd with the f32 policy ISLAND;
    # False -> the FULL-dd chain (traced dd policy cache + dd squash), the
    # production --mm-loss-dd configuration (round-4 horizon study)
    results["dd+polf32"] = grad_at(
        build(None, compensated=True, policy_f32=True, per_output_noise=pon)
    )
    results["dd-full"] = grad_at(
        build(None, compensated=True, policy_f32=False, per_output_noise=pon)
    )

    _, gt = results["f64-truth"]
    print(f"{'variant':<12} {'loss':>14} {'grad-cosine':>12} {'|g|/|gt|':>10}")
    for name, (v, g) in results.items():
        cos = float(g @ gt / (np.linalg.norm(g) * np.linalg.norm(gt) + 1e-30))
        ratio = float(np.linalg.norm(g) / (np.linalg.norm(gt) + 1e-30))
        print(f"{name:<12} {v:>14.8f} {cos:>12.6f} {ratio:>10.4f}")


if __name__ == "__main__":
    main()
