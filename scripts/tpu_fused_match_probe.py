#!/usr/bin/env python
"""On-chip validation of the whole-match fused Pallas kernels.

Two-phase: `--truth` runs on CPU with x64 (same f32 model parameters, f64
compute through the XLA match path) and saves ground truth; the default phase
runs on the real TPU at f32 and scores BOTH the fused kernels and the XLA
match path against that truth. The fused path passes when its error is within
a small factor of the XLA path's own f32 rounding error — the two are
different summation orders of the same math, so neither is privileged.

Usage:
    JAX_PLATFORMS=cpu python scripts/tpu_fused_match_probe.py --truth
    python scripts/tpu_fused_match_probe.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TRUTH = "--truth" in sys.argv
NPZ = "/tmp/fused_match_truth.npz"

import jax

if TRUTH:
    # sitecustomize pins jax_platforms=axon; flip before any computation
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from gpflowpilco_tpu.models.builders import build_gpr, build_svgp
from gpflowpilco_tpu.moments import GaussianMoments
from gpflowpilco_tpu.moment_matching.gp import GPRTransform, SVGPTransform

FAILURES = []


def _setup_svgp(num_latent=4, num_m=64, d=6, seed=0, coreg=False):
    """Built at f32 always (so truth and chip share exact parameters)."""
    dtype = jnp.float32
    keys = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = np.asarray(jax.random.normal(keys[0], (200, d), dtype=dtype))
    y = np.asarray(jax.random.normal(keys[1], (200, num_latent), dtype=dtype))
    model = build_svgp(x, y, num_inducing=num_m, key=keys[2],
                       coregionalize=coreg, noise_variance=0.1, dtype=dtype)
    q_mu = 0.5 * jax.random.normal(keys[3], model.q_mu.shape, dtype)
    model = dataclasses.replace(model, q_mu=q_mu)
    mx = 0.3 * jax.random.normal(keys[4], (1, d), dtype)
    a = jax.random.normal(keys[5], (d, d), dtype)
    sxx = (0.05 * (a @ a.T) + 0.2 * jnp.eye(d, dtype=dtype))[None]
    return model, GaussianMoments(mean=mx, cov=sxx)


def _setup_gpr(seed=7):
    dtype = jnp.float32
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    xg = np.asarray(jax.random.normal(keys[0], (48, 6), dtype=dtype))
    yg = np.asarray(0.3 * jax.random.normal(keys[1], (48, 4), dtype=dtype))
    gpr = build_gpr(xg, yg, noise_variance=0.05, dtype=dtype)
    mx = 0.2 * jax.random.normal(keys[2], (1, 6), dtype)
    a = jax.random.normal(keys[3], (6, 6), dtype)
    sxx = (0.05 * (a @ a.T) + 0.2 * jnp.eye(6, dtype=dtype))[None]
    return gpr, GaussianMoments(mean=mx, cov=sxx)


def _cast(tree, dtype):
    return jax.tree.map(
        lambda a: jnp.asarray(a, dtype) if jnp.issubdtype(
            jnp.asarray(a).dtype, jnp.floating) else a, tree)


def _outs(t, x):
    m = t.moment_match(x)
    return m.y.mean, m.y.cov, m.cross_covariance(preinv=True)


def _scalar(t, x):
    m, c, s = _outs(t, x)
    return (jnp.sum(m) + jnp.sum(c * jnp.cos(jnp.arange(c.size).reshape(c.shape)))
            + jnp.sum(s))


def _svgp_cases(model, x, dtype):
    """dict name -> flat array of outputs/grads through the XLA or fused path."""
    model = _cast(model, dtype)
    mean, cov = jnp.asarray(x.mean, dtype), jnp.asarray(x.cov, dtype)

    def make(builder):
        def outs():
            o = _outs(builder(model), GaussianMoments(mean=mean, cov=cov))
            return {k: np.asarray(v, np.float64) for k, v in
                    zip(("mean", "cov", "cross"), o)}

        def grads_full():
            g = jax.jit(jax.grad(lambda m, mu, s: _scalar(
                builder(m), GaussianMoments(mean=mu, cov=s)),
                argnums=(0, 1, 2)))(model, mean, cov)
            return np.asarray(jax.flatten_util.ravel_pytree(g)[0], np.float64)

        def grads_frozen(frozen_builder):
            g = jax.jit(jax.grad(lambda mu, s: _scalar(
                frozen_builder(model), GaussianMoments(mean=mu, cov=s)),
                argnums=(0, 1)))(mean, cov)
            return np.asarray(jax.flatten_util.ravel_pytree(g)[0], np.float64)

        return outs, grads_full, grads_frozen

    xla_b = lambda m: SVGPTransform(model=m).with_cache()
    fus_b = lambda m: SVGPTransform(model=m, fused_match=True).with_cache()
    fro_b = lambda m: SVGPTransform(model=m, fused_match=True, frozen=True).with_cache()
    o_x, gf_x, gz_x = make(xla_b)
    o_f, gf_f, gz_f = make(fus_b)
    res = {"xla": {**o_x(), "gfull": gf_x(), "gfroz": gz_x(xla_b)}}
    if dtype == jnp.float32:  # fused kernels are f32-only on chip
        res["fused"] = {**o_f(), "gfull": gf_f(), "gfroz": gz_f(fro_b)}
    return res


def _gpr_cases(gpr, x, dtype):
    gpr = _cast(gpr, dtype)
    mean, cov = jnp.asarray(x.mean, dtype), jnp.asarray(x.cov, dtype)

    def run(builder):
        o = _outs(builder(gpr), GaussianMoments(mean=mean, cov=cov))
        out = {k: np.asarray(v, np.float64) for k, v in
               zip(("mean", "cov", "cross"), o)}
        g = jax.jit(jax.grad(lambda mu, s: _scalar(
            builder(gpr), GaussianMoments(mean=mu, cov=s)), argnums=(0, 1)))(mean, cov)
        out["gfroz"] = np.asarray(jax.flatten_util.ravel_pytree(g)[0], np.float64)
        return out

    res = {"xla": run(lambda m: GPRTransform(model=m).with_cache())}
    if dtype == jnp.float32:
        res["fused"] = run(
            lambda m: GPRTransform(model=m, fused_match=True).with_cache())
    return res


def _mm_rollout(dtype, fused_match):
    from bench import build_mm_loss
    p, g = build_mm_loss(dtype, fused_match=fused_match, fused=False)
    v, gr = g(p)
    return (np.float64(v),
            np.asarray(jax.flatten_util.ravel_pytree(gr)[0], np.float64))


def check(name, fused, xla, truth, floor=2e-5, factor=4.0):
    """fused passes if its truth-error is within `factor` of the XLA f32
    path's own truth-error (or below an absolute floor)."""
    scale = np.max(np.abs(truth)) + 1e-12
    e_f = np.max(np.abs(fused - truth)) / scale
    e_x = np.max(np.abs(xla - truth)) / scale
    ok = np.isfinite(fused).all() and (e_f <= max(factor * e_x, floor))
    print(f"{'PASS' if ok else 'FAIL'} {name}: fused-err {e_f:.2e} vs xla-err {e_x:.2e}")
    if not ok:
        FAILURES.append(name)


def main():
    if TRUTH:
        assert jax.devices()[0].platform == "cpu"
        out = {}
        for coreg, tag in ((False, "sep"), (True, "lck")):
            model, x = _setup_svgp(coreg=coreg)
            t = _svgp_cases(model, x, jnp.float64)["xla"]
            out.update({f"svgp-{tag}/{k}": v for k, v in t.items()})
        gpr, xg = _setup_gpr()
        t = _gpr_cases(gpr, xg, jnp.float64)["xla"]
        out.update({f"gpr/{k}": v for k, v in t.items()})
        v, gr = _mm_rollout(jnp.float64, fused_match=False)
        out["mm/loss"], out["mm/grad"] = v, gr
        np.savez(NPZ, **out)
        print(f"truth written: {NPZ} ({len(out)} entries)")
        return 0

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    assert "TPU" in str(dev), "probe must run on the TPU (or pass --truth)"
    truth = dict(np.load(NPZ))

    for coreg, tag in ((False, "sep"), (True, "lck")):
        model, x = _setup_svgp(coreg=coreg)
        t0 = time.perf_counter()
        res = _svgp_cases(model, x, jnp.float32)
        print(f"[{tag}] compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        for k in ("mean", "cov", "cross", "gfull", "gfroz"):
            check(f"svgp-{tag} {k}", res["fused"][k], res["xla"][k],
                  truth[f"svgp-{tag}/{k}"])

    gpr, xg = _setup_gpr()
    res = _gpr_cases(gpr, xg, jnp.float32)
    for k in ("mean", "cov", "cross", "gfroz"):
        check(f"gpr {k}", res["fused"][k], res["xla"][k], truth[f"gpr/{k}"])

    t0 = time.perf_counter()
    v_x, g_x = _mm_rollout(jnp.float32, fused_match=False)
    v_f, g_f = _mm_rollout(jnp.float32, fused_match=True)
    print(f"[mm-rollout] compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    check("mm-rollout loss", np.asarray([v_f]), np.asarray([v_x]),
          np.asarray([truth["mm/loss"]]), floor=1e-3)
    # Truth methodology fixed in round 3: bench.build_mm_loss now builds
    # parameters at f32 and casts to the compute dtype (jax.random draws
    # differ per dtype, so the old f64 "truth" was a DIFFERENT model — the
    # historic 0.78 cosines measured against it were artifacts). Against a
    # correct truth the synthetic (vague-drift) point keeps f32 direction well
    # (CPU-f32 cos ~0.996, scripts/mm_precision_study.py), so the absolute
    # floor tightens to 0.95; the relative criterion (fused at least as
    # truth-aligned as the XLA path it replaces) stays.
    gt = truth["mm/grad"]
    cos_x = float(g_x @ gt / (np.linalg.norm(g_x) * np.linalg.norm(gt)))
    cos_f = float(g_f @ gt / (np.linalg.norm(g_f) * np.linalg.norm(gt)))
    ok = np.isfinite(g_f).all() and cos_f > 0.95 and cos_f >= cos_x - 5e-4
    print(f"{'PASS' if ok else 'FAIL'} mm-rollout grad-cosine: fused {cos_f:.6f} "
          f"vs xla {cos_x:.6f}")
    if not ok:
        FAILURES.append("mm-rollout grad-cosine")

    print("ALL PASS" if not FAILURES else f"FAILURES: {FAILURES}")
    return 0 if not FAILURES else 1


if __name__ == "__main__":
    sys.exit(main())
