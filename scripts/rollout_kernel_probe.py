"""On-chip timing probe for the whole-rollout Pallas kernel at the three
production shapes (ROADMAP round-3: "on-chip timing for the LCK/GPR kernel
shapes"):

  cartpole        SVGP drift, scalar action           (flagship; bench.py shape)
  dp_lck          coregionalized drift AND policy     (double-pendulum policy
                                                       opt: 411 s/ep target)
  hmc_gpr         8-member exact-GPR hyperposterior   (HMC policy opt:
                  ensemble, particles split across K   284-572 s/ep target)

For each shape it times jitted loss+grad over the trainable policy partition
(models/builders.py policy_mask — the production policy-opt step's hot body)
through (a) the unfused composition (forward_concrete + euler_rollout) and
(b) the whole-rollout kernel, checks loss agreement, and prints one JSON line
per (shape, path). Run on the default backend for TPU numbers; --interpret
exercises the same code on CPU at toy sizes (plumbing only, timings
meaningless).

Synthetic parameters at production dimensions — kernel timing depends on
shapes, not fitted values (reference workload: settings.py:40-56 policy spec,
double_pendulum experiment.py build_loop, DriftSpec.hmc_ensemble=8).
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def _rbf(key, var, ls_shape, dtype):
    from gpflowpilco_tpu.models.kernels import RBF

    return RBF.create(
        jnp.asarray(var, dtype),
        0.9 + 0.4 * jax.random.uniform(key, ls_shape, dtype=dtype),
    )


def _svgp(key, kern, ld, m, din, num_out, w, dtype):
    from gpflowpilco_tpu.models.gp import SVGP

    k1, k2 = jax.random.split(key)
    return SVGP(
        kernel=kern,
        z=jax.random.normal(k1, (ld, m, din), dtype=dtype),
        q_mu=0.3 * jax.random.normal(k2, (m, ld), dtype=dtype),
        q_sqrt=0.1 * jnp.broadcast_to(jnp.eye(m, dtype=dtype), (ld, m, m)),
        mean_const=jnp.zeros(num_out, dtype),
        raw_noise=jnp.asarray(-3.0, dtype),
        w=w,
        whiten=True,
    )


def _task(key, de, dtype):
    a = jax.random.normal(key, (de, de), dtype=dtype)
    precis = 0.1 * (a @ a.T) + jnp.eye(de, dtype=dtype)
    target = jnp.zeros(de, dtype).at[min(2, de - 1)].set(1.0)
    return target, precis


def build_shape(name, dtype, small=False):
    """Returns (drift_or_members, policy, cfg) — cfg drives both loss paths."""
    key = jax.random.PRNGKey(hash(name) % (1 << 31))
    ks = iter(jax.random.split(key, 16))
    d = 4
    if name == "cartpole":
        active, u, lp, ld = (1,), 1, 1, 4
        m, mp = (256, 30) if not small else (24, 8)
        s, b, steps = (1024, 1024, 30) if not small else (32, 16, 5)
        scale = 10.0
        de = 2 * len(active) + d - len(active)
        drift = _svgp(next(ks), _rbf(next(ks), [0.8, 1.1, 0.9, 1.3], (ld, de + u), dtype),
                      ld, m, de + u, d, None, dtype)
        policy = _svgp(next(ks), _rbf(next(ks), [0.7], (lp, de), dtype),
                       lp, mp, de, u, None, dtype)
    elif name == "dp_lck":
        # double-pendulum production recipe: 20 Hz x 2.5 s = 50 steps,
        # ~100 drift centers, 40 policy centers, 2-D torque, LCK both sides
        active, u, lp, ld = (0, 1), 2, 2, 4
        m, mp = (100, 40) if not small else (24, 8)
        s, b, steps = (1024, 1024, 50) if not small else (32, 16, 5)
        scale = 2.0
        de = 2 * len(active) + d - len(active)
        wd = 0.5 * jax.random.normal(next(ks), (d, ld), dtype=dtype)
        wp = jax.random.normal(next(ks), (u, lp), dtype=dtype)
        drift = _svgp(next(ks), _rbf(next(ks), [0.8, 1.1, 0.9, 1.2], (ld, de + u), dtype),
                      ld, m, de + u, d, wd, dtype)
        policy = _svgp(next(ks), _rbf(next(ks), [0.7, 1.2], (lp, de), dtype),
                       lp, mp, de, u, wp, dtype)
    elif name == "hmc_gpr":
        # 8-member GPR hyperposterior ensemble at the ~ep-10 cartpole dataset
        # size (10 eps x 30 steps); particle budget splits across members
        from gpflowpilco_tpu.models.gp import GPR, GPREnsemble

        active, u, lp = (1,), 1, 1
        members, n = (8, 300) if not small else (2, 24)
        mp = 30 if not small else 8
        s, b, steps = (1024, 1024, 30) if not small else (32, 16, 5)
        scale = 10.0
        de = 2 * len(active) + d - len(active)

        def member(key_m):
            k1, k2, k3 = jax.random.split(key_m, 3)
            return GPR(
                kernel=_rbf(k1, 1.0, (de + u,), dtype),
                x=jax.random.normal(k2, (n, de + u), dtype=dtype),
                y=0.3 * jax.random.normal(k3, (n, d), dtype=dtype),
                mean_const=jnp.zeros(d, dtype),
                raw_noise=jnp.asarray(-3.0, dtype),
            )

        stacked = jax.vmap(member)(jax.random.split(next(ks), members))
        drift = GPREnsemble(members=stacked, num_members=members)
        policy = _svgp(next(ks), _rbf(next(ks), [0.7], (lp, de), dtype),
                       lp, mp, de, u, None, dtype)
    else:
        raise ValueError(name)
    target, precis = _task(next(ks), de, dtype)
    cfg = dict(active_dims=active, action_scale=scale, target=target,
               precis=precis, num_steps=steps, batch=s, bases=b, state_dim=d)
    return drift, policy, cfg


def unfused_loss(policy, drift, paths, x0, cfg):
    from gpflowpilco_tpu.components import Encoder, GaussianObjective
    from gpflowpilco_tpu.dynamics.forward import forward_concrete
    from gpflowpilco_tpu.dynamics.solvers import euler_rollout
    from gpflowpilco_tpu.models.gp import GPR
    from gpflowpilco_tpu.models.pathwise import (
        PathwiseGPRTransform,
        PathwiseSVGPTransform,
    )
    from gpflowpilco_tpu.moment_matching.gp import SVGPTransform
    from gpflowpilco_tpu.moment_matching.rules import SinCos, SquashedProbit
    from gpflowpilco_tpu.moments import Chain

    encoder = Encoder(transform=SinCos(), active_dims=cfg["active_dims"])
    objective = GaussianObjective(target=cfg["target"], precis=cfg["precis"])
    pol = Chain(
        SquashedProbit(scale=jnp.asarray(2.0 * cfg["action_scale"] - 1e-5, x0.dtype)),
        SVGPTransform(model=policy, deterministic=True).with_cache(),
    )
    if isinstance(drift, GPR):
        drift_fn = PathwiseGPRTransform(model=drift, paths=paths)
    else:
        drift_fn = PathwiseSVGPTransform(model=drift, paths=paths)

    def f(t, x):
        return forward_concrete(x, drift_fn, policy=pol, encoder=encoder)

    def acc(t, x, loss):
        return loss + objective(encoder(x))

    _, loss, _ = euler_rollout(
        f, x0, dt=1.0, num_steps=cfg["num_steps"],
        accumulate=acc, acc_init=jnp.zeros((x0.shape[0],), x0.dtype),
    )
    return loss


def make_losses(name, drift, policy, cfg, interpret):
    """(loss_fused(policy, key), loss_unfused(policy, key)) closures, each
    generating fresh paths + x0 from key (the production step resamples)."""
    from gpflowpilco_tpu.models.gp import GPREnsemble
    from gpflowpilco_tpu.models.pathwise import (
        generate_paths_gpr,
        generate_paths_svgp,
    )
    from gpflowpilco_tpu.ops.rollout_pallas import pathwise_rollout_loss_fused

    s, b, d = cfg["batch"], cfg["bases"], cfg["state_dim"]

    def x0_of(key, num):
        x = 0.3 * jax.random.normal(key, (num, d), dtype=cfg["target"].dtype)
        return x.at[:, : len(cfg["active_dims"])].add(jnp.pi)

    def fused_one(pm, m, paths, x0):
        return pathwise_rollout_loss_fused(
            pm, m, paths, x0,
            active_dims=cfg["active_dims"], action_scale=cfg["action_scale"],
            target=cfg["target"], precis=cfg["precis"],
            dt=1.0, num_steps=cfg["num_steps"], interpret=interpret,
        ).mean()

    if isinstance(drift, GPREnsemble):
        k_m, s_per = drift.num_members, s // drift.num_members

        def per_member(fused):
            def body(pm, member, kk):
                k1, k2 = jax.random.split(kk)
                paths = generate_paths_gpr(member, k1, s_per, b)
                x0 = x0_of(k2, s_per)
                if fused:
                    return fused_one(pm, member, paths, x0)
                return unfused_loss(pm, member, paths, x0, cfg).mean()

            def loss(pm, key):
                keys = jax.random.split(key, k_m)
                return jnp.mean(
                    jax.vmap(lambda mem, kk: body(pm, mem, kk))(drift.members, keys)
                )

            return loss

        return per_member(True), per_member(False)

    def loss_fused(pm, key):
        k1, k2 = jax.random.split(key)
        paths = generate_paths_svgp(drift, k1, s, b)
        return fused_one(pm, drift, paths, x0_of(k2, s))

    def loss_unfused(pm, key):
        k1, k2 = jax.random.split(key)
        paths = generate_paths_svgp(drift, k1, s, b)
        return unfused_loss(pm, drift, paths, x0_of(k2, s), cfg).mean()

    return loss_fused, loss_unfused


def time_grad(loss, policy, key, reps):
    from gpflowpilco_tpu.models.builders import policy_mask
    from gpflowpilco_tpu.utils.trees import combine, partition

    train, frozen = partition(policy, policy_mask(policy))
    vg = jax.jit(jax.value_and_grad(lambda tr, k: loss(combine(tr, frozen), k)))
    t0 = time.perf_counter()
    v, g = vg(train, key)
    jax.block_until_ready((v, g))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(reps):
        v, g = vg(train, jax.random.fold_in(key, i))
    jax.block_until_ready((v, g))
    ms = (time.perf_counter() - t0) / reps * 1e3
    gflat = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g)])
    return float(v), gflat, ms, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="*",
                    default=["cartpole", "dp_lck", "hmc_gpr"])
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU plumbing check at toy sizes")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # production parity: run_tpu_full.py sets HIGHEST globally (TPU default is
    # fast bf16-pass matmuls, which diverges a chaotic 30-50 step rollout from
    # the kernel's f32-accumulating dots — first on-chip probe run measured
    # cos 0.55 fused-vs-unfused from exactly this mismatch)
    jax.config.update("jax_default_matmul_precision", "highest")
    print(f"backend: {jax.devices()}", file=sys.stderr)
    dtype = jnp.float32
    failures = []
    for name in args.shapes:
        drift, policy, cfg = build_shape(name, dtype, small=args.interpret)
        lf, lu = make_losses(name, drift, policy, cfg, args.interpret)
        key = jax.random.PRNGKey(0)
        reps = 2 if args.interpret else args.reps
        v_f, g_f, ms_f, c_f = time_grad(lf, policy, key, reps)
        v_u, g_u, ms_u, c_u = time_grad(lu, policy, key, reps)
        cos = float(
            g_f @ g_u / (jnp.linalg.norm(g_f) * jnp.linalg.norm(g_u) + 1e-30)
        )
        # same key -> same paths/x0: losses agree to f32 rollout noise and the
        # gradients must be directionally identical
        ok = (
            abs(v_f - v_u) <= 2e-3 * max(abs(v_u), 1e-3)
            and cos > 0.995
            and jnp.isfinite(g_f).all()
        )
        if not ok:
            failures.append(name)
        print(json.dumps({
            "shape": name,
            "fused_ms": round(ms_f, 3), "unfused_ms": round(ms_u, 3),
            "speedup": round(ms_u / ms_f, 2),
            "loss_fused": round(v_f, 6), "loss_unfused": round(v_u, 6),
            "grad_cos": round(cos, 6),
            "compile_s": {"fused": round(c_f, 1), "unfused": round(c_u, 1)},
            "ok": bool(ok),
        }))
    print("ALL PASS" if not failures else f"FAILURES: {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
