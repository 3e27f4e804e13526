#!/usr/bin/env python
"""dd gradient quality at a FITTED (solved-run) checkpoint, measured ON-CHIP.

The round-5 CPU grad study (scripts/mm_realistic_grad_study.py) at the solved
round-5 checkpoint showed the CPU-evaluated dd loss collapsing to f32-grade
(-1.58 vs the f64 truth's -11.32) while the LIVE RUN's on-chip dd loss
matched the truth to ~1e-4 at the same checkpoint (eReward 11.316 in the run
log vs truth loss -11.31645) — i.e. the XLA:CPU backend miscompiles the dd
EFT chains at this graph size even with its fusion pass disabled, while TPU
codegen is exact (the round-4 finding, now reproduced at production scale).
The CPU study therefore cannot score the dd variants; this probe measures
them on the hardware that runs them:

  on-chip:  dd-full (production --mm-loss-dd), dd+island, plain f32
  CPU-f64:  truth (loss_dtype=f64, island off) and the f64+island lever

at IDENTICAL restored f32 parameters, reporting loss values, gradient
cosines vs the truth, and on-chip loss+grad latency.

Run after any queued TPU job drains (single-chip tunnel; serialize):
    python scripts/dd_fitted_probe.py [ckpt_dir]   # default /tmp/dd_study_ckpt
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "examples", "cartpole_swingup")
)

import jax

jax.config.update("jax_enable_x64", True)  # CPU truth legs only
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from experiment import build_loop
from gpflowpilco_tpu.loops.pilco import (
    DriftSpec,
    MomentMatchingPILCO,
    PolicySpec,
)
from gpflowpilco_tpu.ops.dd import eft_compiler_options

CKPT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dd_study_ckpt"


def build(loss_dtype=None, policy_f32=False, compensated=False):
    loop = build_loop(
        MomentMatchingPILCO,
        CKPT,
        seed=3,
        dtype=jnp.float32,
        drift_spec=DriftSpec(
            num_centers=64, max_iters=1000, per_output_noise=True
        ),
        policy_spec=PolicySpec(
            step_limit=2000, loss_dtype=loss_dtype,
            loss_policy_f32=policy_f32, loss_compensated=compensated,
            mm_unroll=1,
        ),
        validation_samples=2,
    )
    assert loop.restore_or_initialize(), f"no checkpoint under {CKPT}"
    return loop


def grad_at(loop, device=None, reps=0):
    drift = loop.policy_loss_drift()

    def loss(pm):
        return loop.policy_loss_fn(pm, jax.random.PRNGKey(0), drift=drift)

    kw = {}
    if loop.policy_spec.loss_compensated:
        opts = eft_compiler_options()
        if opts:
            kw["compiler_options"] = opts
    fn = jax.jit(jax.value_and_grad(loss), **kw)

    def run():
        if device is None:
            return fn(loop.policy_model)
        with jax.default_device(device):
            return fn(loop.policy_model)

    v, g = run()
    jax.block_until_ready(v)
    ms = None
    if reps:
        t0 = time.perf_counter()
        for _ in range(reps):
            v, g = run()
        jax.block_until_ready(v)
        ms = (time.perf_counter() - t0) / reps * 1e3
    flat = np.asarray(
        jax.flatten_util.ravel_pytree(
            jax.tree.map(lambda a: np.asarray(a, np.float64), g)
        )[0]
    )
    return np.float64(v), flat, ms


def main():
    print(f"backend: {jax.devices()}", file=sys.stderr)
    cpu = jax.devices("cpu")[0]

    legs = {}
    # CPU truth first (the reference for every cosine)
    with jax.default_device(cpu):
        legs["cpu_f64_truth"] = grad_at(build(jnp.float64, policy_f32=False))
        legs["cpu_f64_island"] = grad_at(build(jnp.float64, policy_f32=True))
    # on-chip legs (default device = the TPU)
    legs["tpu_dd_full"] = grad_at(
        build(compensated=True, policy_f32=False), reps=20
    )
    legs["tpu_dd_island"] = grad_at(
        build(compensated=True, policy_f32=True), reps=20
    )
    legs["tpu_f32"] = grad_at(build(None), reps=20)

    _, gt, _ = legs["cpu_f64_truth"]
    out = {}
    for name, (v, g, ms) in legs.items():
        cos = float(g @ gt / (np.linalg.norm(g) * np.linalg.norm(gt) + 1e-30))
        out[name] = {
            "loss": round(float(v), 6),
            "grad_cos_vs_truth": round(cos, 6),
            "grad_norm_ratio": round(
                float(np.linalg.norm(g) / (np.linalg.norm(gt) + 1e-30)), 4
            ),
            **({"ms_per_loss_grad": round(ms, 1)} if ms else {}),
        }
        print(json.dumps({"leg": name, **out[name]}))

    ok = (
        out["tpu_dd_full"]["grad_cos_vs_truth"] > 0.99
        and abs(out["tpu_dd_full"]["loss"] - out["cpu_f64_truth"]["loss"])
        < 1e-3 * max(1.0, abs(out["cpu_f64_truth"]["loss"]))
    )
    print("PASS" if ok else "FAIL (tpu_dd_full must track cpu_f64_truth)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
