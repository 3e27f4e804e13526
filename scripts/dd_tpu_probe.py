#!/usr/bin/env python
"""Verify ops/dd.py double-float semantics on the REAL TPU chip.

The CPU investigation (tests/conftest.py note) showed two compiler-level ways
EFT arithmetic can be silently destroyed: LLVM-backend float reassociation
(CPU -O2) and the HLO constant-folding + algsimp pair around literal
constants. TPU codegen (no LLVM fast-math path) must be validated
independently — this runs the same accuracy battery on-chip and prints one
JSON line per check plus a PASS/FAIL summary. f64 references are computed on
the host in numpy (no x64 needed on device).

Run: python scripts/dd_tpu_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpflowpilco_tpu.ops import dd

RNG = np.random.default_rng(0)


def rel(got, want, denom=None):
    g = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
    d = np.abs(want) if denom is None else denom
    return float(np.max(np.abs(g - want) / np.maximum(d, 1e-30)))


def main():
    print(f"backend: {jax.devices()}", file=sys.stderr)
    checks = []

    def check(name, err, tol):
        ok = bool(np.isfinite(err) and err < tol)
        checks.append((name, ok))
        print(json.dumps({"check": name, "err": float(err), "tol": tol, "ok": ok}))

    n = 4096
    x64 = RNG.standard_normal(n)
    y64 = RNG.standard_normal(n)
    x, y = dd.from_f64(x64), dd.from_f64(y64)
    x64 = np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)
    y64 = np.asarray(y.hi, np.float64) + np.asarray(y.lo, np.float64)

    # composed chain — the pattern that broke on CPU (two ops in one module)
    comp = jax.jit(lambda x, y: dd.add(dd.mul(x, x), dd.mul(y, y)))
    check("mul_add_chain", rel(comp(x, y), x64**2 + y64**2, denom=np.abs(x64**2) + np.abs(y64**2)), 1e-12)

    z64 = np.abs(y64) + 0.5
    z = dd.from_f64(z64)
    check("div", rel(jax.jit(dd.div)(x, z), x64 / z64), 1e-12)
    w64 = np.abs(x64) + 0.1
    w = dd.from_f64(w64)
    check("sqrt", rel(jax.jit(dd.sqrt)(w), np.sqrt(w64)), 1e-12)

    e_in = dd.from_f64(x64 * 10.0)
    e64 = np.asarray(e_in.hi, np.float64) + np.asarray(e_in.lo, np.float64)
    check("exp", rel(jax.jit(dd.exp)(e_in), np.exp(e64)), 1e-12)

    t_in = dd.from_f64(x64 * 8.0)
    t64 = np.asarray(t_in.hi, np.float64) + np.asarray(t_in.lo, np.float64)
    s, c = jax.jit(dd.sincos)(t_in)
    s_g = np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64)
    c_g = np.asarray(c.hi, np.float64) + np.asarray(c.lo, np.float64)
    check("sin", float(np.max(np.abs(s_g - np.sin(t64)))), 1e-12)
    check("cos", float(np.max(np.abs(c_g - np.cos(t64)))), 1e-12)

    big = dd.from_f64(RNG.standard_normal((32, 4096)))
    bw = np.asarray(big.hi, np.float64) + np.asarray(big.lo, np.float64)
    got = jax.jit(lambda b: dd.dsum(b, -1))(big)
    g = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
    check("dsum", float(np.max(np.abs(g - bw.sum(-1)))), 1e-10)

    # grad through dd (f32-grade cotangents are the contract)
    def f(a):
        v = dd.lift(a)
        o = dd.exp(dd.mul(v, v))
        s, _ = dd.sincos(o)
        return (s.hi + s.lo).sum()

    a = jnp.asarray([0.3, 0.7], jnp.float32)
    ga = np.asarray(jax.jit(jax.grad(f))(a), np.float64)
    a64 = np.asarray(a, np.float64)
    want = np.cos(np.exp(a64**2)) * np.exp(a64**2) * 2 * a64
    check("grad", float(np.max(np.abs(ga - want) / np.abs(want))), 5e-5)

    # microbench: dd mul+add chain vs plain f32, vs emulated f64 if available
    big_f = jnp.asarray(RNG.standard_normal((256, 4096)), jnp.float32)
    big_d = dd.lift(big_f)

    def dd_work(b):
        acc = b
        for _ in range(8):
            acc = dd.add(dd.mul(acc, b), b)
        return acc.hi.sum() + acc.lo.sum()

    def f32_work(b):
        acc = b
        for _ in range(8):
            acc = acc * b + b
        return acc.sum()

    for name, fn, arg in (("dd", jax.jit(dd_work), big_d), ("f32", jax.jit(f32_work), big_f)):
        fn(arg).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(arg)
        out.block_until_ready()
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(json.dumps({"bench": f"{name}_mul_add_x8_256x4096", "ms": round(ms, 3)}))

    failures = [n for n, ok in checks if not ok]
    print("ALL PASS" if not failures else f"FAILURES: {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
