#!/usr/bin/env python
"""On-chip validation of the compensated (dd) MM loss: speed + gradient truth.

For the bench model at the production (M=64) and flagship (M=240) shapes:
  1. time dd loss+grad on the TPU (the number that must beat the 107 ms
     f64-island lever, VERDICT r3 #2 target <= ~15 ms);
  2. compute the CPU-f64 truth loss+grad for the SAME f32 parameters (x64 on
     the host CPU device) and report value error + gradient cosine of the
     ON-CHIP dd gradient against it.

Run AFTER any queued TPU job drains (single-chip tunnel; serialize).
    python scripts/dd_onchip_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)  # CPU truth leg only
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.flatten_util
import jax.numpy as jnp
import numpy as np


def flat64(tree):
    return np.asarray(
        jax.flatten_util.ravel_pytree(jax.tree.map(lambda a: np.asarray(a, np.float64), tree))[0]
    )


def main():
    from bench import build_mm_loss, build_mm_loss_dd

    print(f"backend: {jax.devices()}", file=sys.stderr)
    cpu = jax.devices("cpu")[0]
    failures = []
    for name, m_drift, reps in (("production_M64", 64, 30), ("flagship_M240", 240, 30)):
        # --- dd on chip
        policy, pack, vg = build_mm_loss_dd(m_drift=m_drift, unroll=1)
        t0 = time.perf_counter()
        v, g = vg(policy, pack)
        jax.block_until_ready(v)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            v, g = vg(policy, pack)
        jax.block_until_ready(v)
        dd_ms = (time.perf_counter() - t0) / reps * 1e3
        g_dd = flat64(g)

        # --- CPU f64 truth at identical f32 parameters
        with jax.default_device(cpu):
            policy_t, vg_t = build_mm_loss(jnp.float64, m_drift=m_drift, unroll=1)
            v_t, g_t = vg_t(policy_t)
            v_t = float(v_t)
            g_t = flat64(g_t)

        cos = float(g_dd @ g_t / (np.linalg.norm(g_dd) * np.linalg.norm(g_t) + 1e-30))
        ratio = float(np.linalg.norm(g_dd) / (np.linalg.norm(g_t) + 1e-30))
        verr = abs(float(v) - v_t) / max(1e-9, abs(v_t))
        ok = bool(cos > 0.99 and 0.9 < ratio < 1.1 and verr < 1e-3 and np.isfinite(g_dd).all())
        if not ok:
            failures.append(name)
        print(json.dumps({
            "shape": name,
            "dd_ms": round(dd_ms, 3),
            "compile_s": round(compile_s, 1),
            "loss_dd": round(float(v), 8),
            "loss_f64_truth": round(v_t, 8),
            "loss_rel_err": float(verr),
            "grad_cos_vs_f64": round(cos, 6),
            "grad_norm_ratio": round(ratio, 4),
            "vs_island_107ms": round(107.0 / dd_ms, 2),
            "ok": ok,
        }))
    print("ALL PASS" if not failures else f"FAILURES: {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
