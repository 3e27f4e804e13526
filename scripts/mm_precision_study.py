#!/usr/bin/env python
"""Which part of the f32 MM rollout loses the gradient direction?

The round-3 on-chip evidence isolated precision as the reason moment-matching
PILCO does not solve on the TPU (f32) while the identical algorithm solves in
CPU-f64: the 30-step rollout's f32 policy gradient has cosine ~0.78 against
the f64 truth (scripts/tpu_fused_match_probe.py mm-rollout check), and full
f64 on a v5e (no f64 ALU) stall-times-out (docs/perf_notes.md round-3).

This study runs ON CPU (where every dtype is cheap) and measures the
truth-gradient cosine of *selective* precision variants, to find the smallest
f64 island that restores gradient quality — only that island then needs to be
paid for on the chip (or replaced with compensated-f32 arithmetic):

  f32       everything f32 (the chip status quo)
  cost64    f32 rollout, f64 batched cost tail
  glue64    f64 carry + Euler update + encoder match + joint/psd/stitch glue;
            BOTH GP matches (policy and drift) stay f32 islands
  policy64  glue64 + the policy match in f64 (drift match = the M=240 eKuffu
            MXU hot spot stays f32)
  drift64   glue64 + the drift match in f64 (policy match stays f32)
  f64       everything f64 (truth; cosine 1 by construction)

Gradient w.r.t. the f32 policy parameters in every variant (dtype casts live
inside the loss), so cotangent spaces are identical and cosines comparable.

Run: python scripts/mm_precision_study.py
"""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build_models
from gpflowpilco_tpu.dynamics.forward import forward_moments
from gpflowpilco_tpu.loops.pilco import _cast_floats
from gpflowpilco_tpu.moments import Chain, GaussianMatch, GaussianMoments
from gpflowpilco_tpu.moment_matching.gp import SVGPTransform
from gpflowpilco_tpu.moment_matching.rules import SquashedProbit

NUM_STEPS = 30
M_DRIFT = 240
M_POLICY = 30

F32 = jnp.float32
F64 = jnp.float64


class Island:
    """Run ``inner.moment_match`` at ``dtype`` inside a composition running at
    a different (outer) dtype: cast moments in, cast the match back out. The
    returned match keeps the OUTER ``x`` so preinv conversions/joints stay at
    the outer dtype."""

    def __init__(self, inner, dtype, outer):
        self.inner, self.dtype, self.outer = inner, dtype, outer

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        xm = GaussianMoments(
            mean=x.mean.astype(self.dtype), cov=x.cov.astype(self.dtype)
        )
        m = self.inner.moment_match(xm)
        y = GaussianMoments(
            mean=m.y.mean.astype(self.outer), cov=m.y.cov.astype(self.outer)
        )
        return GaussianMatch(
            x=x, y=y, cross=m.cross.astype(self.outer), preinv=m.preinv
        )


def _load_models(ckpt_dir):
    """(drift, policy) from the newest checkpoint of a real run — the fitted
    regime where the cancellation/chaos effects actually bite."""
    import pickle
    import pathlib

    paths = sorted(pathlib.Path(ckpt_dir).glob("ckpt-*.pkl"),
                   key=lambda p: int(p.stem.split("-")[1]))
    payload = pickle.load(paths[-1].open("rb"))
    to_jax = lambda t: jax.tree.map(jnp.asarray, t)
    print(f"loaded {paths[-1]} (step {payload['step_count']})", file=sys.stderr)
    return to_jax(payload["drift"]), to_jax(payload["policy"])


CKPT = None
for i, a in enumerate(list(sys.argv)):
    if a == "--ckpt":
        CKPT = sys.argv[i + 1]


def build_variant(glue_dtype, policy_dtype, drift_dtype, cost_dtype):
    """value_and_grad of the MM rollout loss w.r.t. the f32 policy params,
    with per-component compute dtypes (same workload as bench.build_mm_loss)."""
    encoder, drift_model, policy_model, objective = _build_models(
        F32, m_drift=M_DRIFT, m_policy=M_POLICY
    )
    if CKPT is not None:
        drift_model, policy_model = _load_models(CKPT)
    mean0 = jnp.asarray([0.0, math.pi, 0.0, 0.0], glue_dtype)[None]
    cov0 = (0.1**2) * jnp.eye(4, dtype=glue_dtype)[None]
    encoder_g = _cast_floats(encoder, glue_dtype)
    encoder_c = _cast_floats(encoder, cost_dtype)
    objective_c = _cast_floats(objective, cost_dtype)
    drift_t = SVGPTransform(model=_cast_floats(drift_model, drift_dtype)).with_cache()
    drift = Island(drift_t, drift_dtype, glue_dtype)

    def loss_fn(policy_params):
        pol_model = _cast_floats(policy_params, policy_dtype)
        pol_chain = Chain(
            SquashedProbit(scale=jnp.asarray(20.0 - 1e-5, policy_dtype)),
            SVGPTransform(model=pol_model, deterministic=True).with_cache(),
        )
        pol = Island(pol_chain, policy_dtype, glue_dtype)

        def step(carry, t):
            mean, cov = carry
            x = GaussianMoments(mean=mean, cov=cov)
            match = forward_moments(x, drift, policy=pol, encoder=encoder_g)
            sxf = match.cross_covariance(preinv=False)
            new_mean = mean + match.y.mean
            new_cov = cov + (sxf + jnp.swapaxes(sxf, -1, -2)) + match.y.cov
            new_cov = 0.5 * (new_cov + jnp.swapaxes(new_cov, -1, -2))
            if glue_dtype == F32:
                new_cov = new_cov + 1e-6 * jnp.eye(4, dtype=F32)
            return (new_mean, new_cov), (new_mean, new_cov)

        (_, _), (means, covs) = jax.lax.scan(
            step, (mean0, cov0), jnp.arange(NUM_STEPS)
        )
        states = GaussianMoments(
            mean=means.astype(cost_dtype)[:, 0], cov=covs.astype(cost_dtype)[:, 0]
        )
        cost = objective_c(encoder_c.moment_match(states).y)
        return cost.sum().astype(F64)

    return policy_model, jax.jit(jax.value_and_grad(loss_fn))


def grad_of(glue, pol, drift, cost):
    params, vg = build_variant(glue, pol, drift, cost)
    v, g = vg(params)
    flat = np.asarray(jax.flatten_util.ravel_pytree(g)[0], np.float64)
    return np.float64(v), flat


import contextlib

import gpflowpilco_tpu.moment_matching.gp as gpmod
from gpflowpilco_tpu.ops import kexp as kexp_mod


def _f64_island(fn, out_to=F32):
    """Wrap a kexp function: upcast array args to f64, run, downcast results."""

    def up(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(F64)
        if isinstance(a, tuple):
            return tuple(up(x) for x in a)
        return a

    def down(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(out_to)
        if isinstance(a, tuple):
            return tuple(down(x) for x in a)
        return a

    def wrapped(*args, **kwargs):
        return down(fn(*up(args), **kwargs))

    return wrapped


@contextlib.contextmanager
def island_patch(**which):
    """Temporarily run selected drift-match internals in f64.

    cache64:  svgp_match_cache (alpha/qmat/luu + pair terms) built in f64 —
              the once-per-update systematic factors (suspect: f32 Cholesky
              of a fitted, near-singular Kuu corrupts alpha for EVERY step)
    ekfu64:   per-step ekxz_isolve_log in f64
    ekuffu64: per-step eKuffu delta assembly in f64
    """
    saved = {}
    if which.get("ekfu64"):
        saved["ekxz_isolve"] = kexp_mod.ekxz_isolve
        kexp_mod.ekxz_isolve = _f64_island(kexp_mod.ekxz_isolve)
    if which.get("ekuffu64"):
        saved["ekuffu_mo_from_cache"] = kexp_mod.ekuffu_mo_from_cache
        saved["ekuffu_mo_diag_from_cache"] = kexp_mod.ekuffu_mo_diag_from_cache
        kexp_mod.ekuffu_mo_from_cache = _f64_island(kexp_mod.ekuffu_mo_from_cache)
        kexp_mod.ekuffu_mo_diag_from_cache = _f64_island(
            kexp_mod.ekuffu_mo_diag_from_cache
        )
    if which.get("cache64"):
        saved["svgp_match_cache"] = gpmod.svgp_match_cache
        orig_cache = gpmod.svgp_match_cache

        def cache64(model, **kw):
            m64 = jax.tree.map(
                lambda a: a.astype(F64)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                model,
            )
            c = orig_cache(m64, **kw)
            return jax.tree.map(
                lambda a: a.astype(F32)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                c,
            )

        gpmod.svgp_match_cache = cache64
    try:
        yield
    finally:
        for k, v in saved.items():
            setattr(kexp_mod if hasattr(kexp_mod, k) else gpmod, k, v)
        if "svgp_match_cache" in saved:
            gpmod.svgp_match_cache = saved["svgp_match_cache"]


def main():
    variants = {
        "f64": (F64, F64, F64, F64),
        "f32": (F32, F32, F32, F32),
        "cost64": (F32, F32, F32, F64),
        "glue64": (F64, F32, F32, F64),
        "policy64": (F64, F64, F32, F64),
        "drift64": (F64, F32, F64, F64),
    }
    results = {}
    for name, dts in variants.items():
        v, g = grad_of(*dts)
        results[name] = (v, g)
        print(f"computed {name}: loss={v:.8f}", file=sys.stderr)

    f32 = (F32, F32, F32, F32)
    for name, patch in (
        ("cache64", dict(cache64=True)),
        ("ekfu64", dict(ekfu64=True)),
        ("ekuffu64", dict(ekuffu64=True)),
        ("step64", dict(ekfu64=True, ekuffu64=True)),
        ("cach+step", dict(cache64=True, ekfu64=True, ekuffu64=True)),
    ):
        with island_patch(**patch):
            v, g = grad_of(*f32)
        results[name] = (v, g)
        print(f"computed {name}: loss={v:.8f}", file=sys.stderr)

    _, gt = results["f64"]
    print(f"{'variant':<10} {'loss':>14} {'grad-cosine':>12} {'|g|/|gt|':>10}")
    for name, (v, g) in results.items():
        cos = float(g @ gt / (np.linalg.norm(g) * np.linalg.norm(gt) + 1e-30))
        ratio = float(np.linalg.norm(g) / (np.linalg.norm(gt) + 1e-30))
        print(f"{name:<10} {v:>14.8f} {cos:>12.6f} {ratio:>10.4f}")


if __name__ == "__main__":
    main()
