#!/usr/bin/env python
"""Compile-cost probe for the full-dd MM policy-opt graph (VERDICT r4 #2).

The round-4 MM evidence run died on the first-episode policy-opt compile:
the full-dd policy chain (traced dd cache) unrolled O(M^3) scalar dd ops
into the multi-start Adam scan body and stalled the remote TPU compile
tunnel 4x at the 30-min ceiling. This probe measures, on the current
backend, the trace/lower wall-clock, the lowered module size, and the
compile wall-clock of:

  1. loss+grad, f32-island policy         (the round-4 26.2 ms probe graph)
  2. loss+grad, FULL-dd policy chain      (the production --mm-loss-dd graph)
  3. the multi-start Adam chunk (K=4)     (the actual in-loop executable)

Run on CPU for a fast signal, then on the TPU backend for the real number:
  python scripts/dd_compile_probe.py [--cpu] [--m-drift 64] [--chunk 250]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def probe(tag, jitted, *args):
    t0 = time.time()
    lowered = jitted.lower(*args)
    t_lower = time.time() - t0
    nlines = len(lowered.as_text().splitlines())
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(
        f"{tag}: lower {t_lower:.1f}s, stablehlo_lines {nlines}, "
        f"compile {t_compile:.1f}s"
    )
    return compiled


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--m-drift", type=int, default=64)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--restarts", type=int, default=4)
    p.add_argument("--skip-island", action="store_true")
    p.add_argument("--step-limit", type=int, default=2000,
                   help="only sets the lr schedule; compile cost is chunk-bound")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices())

    from bench import build_mm_loss_dd
    from gpflowpilco_tpu.ops import dd as ddops

    kw = {}
    opts = ddops.eft_compiler_options()
    if opts:
        kw["compiler_options"] = opts

    if not args.skip_island:
        policy, pack, vg = build_mm_loss_dd(m_drift=args.m_drift, unroll=1)
        c = probe("island loss+grad", vg, policy, pack)
        v, g = c(policy, pack)
        jax.block_until_ready(v)
        print("  island loss:", float(v))

    policy, pack, vg2 = build_mm_loss_dd(
        m_drift=args.m_drift, unroll=1, full_dd_policy=True
    )
    c2 = probe("full-dd loss+grad", vg2, policy, pack)
    v2, g2 = c2(policy, pack)
    jax.block_until_ready(v2)
    print("  full-dd loss:", float(v2))

    # ---- the actual in-loop executable: multi-start Adam chunk over the
    # full-dd loss, built exactly like utils.optimizers.adam_minimize_multistart
    from functools import partial

    import optax

    from gpflowpilco_tpu.loops.pilco import policy_mask
    from gpflowpilco_tpu.utils.optimizers import (
        _guarded_adam,
        make_policy_schedule,
    )
    from gpflowpilco_tpu.utils.trees import combine, partition

    schedule = make_policy_schedule(args.step_limit)
    opt = _guarded_adam(schedule, 1.0)
    mask = policy_mask(policy)
    K = args.restarts
    stacked = jax.tree.map(
        lambda x: jnp.stack([x] * K), policy
    )
    train, frozen = partition(stacked, mask)
    opt_state = jax.vmap(opt.init)(train)
    keys = jax.random.split(jax.random.PRNGKey(0), K)
    best_loss = jnp.full((K,), jnp.inf, jnp.float32)
    best_train = train

    @partial(jax.jit, static_argnames=("n",), **kw)
    def run_chunk(train, frozen, opt_state, keys, best_loss, best_train, pack_, n):
        def one(train, frozen, opt_state, k, best_loss, best_train):
            def step(carry, _):
                train, opt_state, k, best_loss, best_train = carry
                k, sub = jax.random.split(k)

                def full_loss(tr):
                    full = combine(tr, frozen)
                    return _loss_of(full, pack_)

                loss, grads = jax.value_and_grad(full_loss)(train)
                loss = loss.astype(best_loss.dtype)
                better = loss < best_loss
                best_loss = jnp.where(better, loss, best_loss)
                best_train = jax.tree.map(
                    lambda b, t: jnp.where(better, t, b), best_train, train
                )
                updates, opt_state = opt.update(grads, opt_state, train)
                train = optax.apply_updates(train, updates)
                return (train, opt_state, k, best_loss, best_train), loss

            out, losses = jax.lax.scan(
                step, (train, opt_state, k, best_loss, best_train), None, length=n
            )
            return (*out, losses)

        return jax.vmap(
            lambda tr, fz, os, kk, bl, bt: one(tr, fz, os, kk, bl, bt)
        )(train, frozen, opt_state, keys, best_loss, best_train)

    # the raw loss body (unjitted) for embedding: rebuild from bench pieces
    import math

    from __graft_entry__ import _build_models
    from gpflowpilco_tpu.moments import GaussianMoments
    from gpflowpilco_tpu.moment_matching import dd_rollout
    from gpflowpilco_tpu.moment_matching.dd_match import (
        DDMoments,
        as_meta_dict,
        build_dd_policy_cache,
        make_meta_tuple,
    )
    from gpflowpilco_tpu.ops import dd as ddops2

    encoder, _, _, objective = _build_models(
        jnp.float32, m_drift=args.m_drift, m_policy=30
    )
    meta = as_meta_dict(pack.meta)
    mean0 = jnp.asarray([0.0, math.pi, 0.0, 0.0], jnp.float32)[None]
    cov0 = (0.1**2) * jnp.eye(4, dtype=jnp.float32)[None]

    def _loss_of(policy_params, pack_):
        pcache, pmeta = build_dd_policy_cache(policy_params)
        island = dd_rollout.DDPolicyChain(
            cache=pcache,
            meta_t=make_meta_tuple(pmeta),
            scale=jnp.asarray(20.0 - 1e-5, jnp.float32),
        )

        def fwd(t, xm):
            del t
            return dd_rollout.dd_forward_moments(
                xm, pack_.cache, meta, island, encoder
            )

        x0 = DDMoments(mean=ddops2.lift(mean0), cov=ddops2.lift(cov0))
        _, means_hi, covs_hi = dd_rollout.dd_mm_euler_rollout(
            fwd, x0, dt=1.0, num_steps=30, unroll=1
        )
        states = GaussianMoments(mean=means_hi, cov=covs_hi)
        return objective(encoder.moment_match(states).y).sum()

    probe(
        f"multistart chunk (K={K}, n={args.chunk})",
        run_chunk,
        train, frozen, opt_state, keys, best_loss, best_train, pack, args.chunk,
    )
    # execute through the jitted callable (the AOT object's flat calling
    # convention differs for pytrees with static meta); the compile above
    # seeded the persistent cache, so this dispatch is cheap
    out = run_chunk(
        train, frozen, opt_state, keys, best_loss, best_train, pack, args.chunk
    )
    jax.block_until_ready(out[-1])
    t0 = time.time()
    out = run_chunk(
        train, frozen, opt_state, keys, best_loss, best_train, pack, args.chunk
    )
    jax.block_until_ready(out[-1])
    dt = time.time() - t0
    print(
        f"  chunk exec: {dt:.1f}s = {1e3 * dt / args.chunk:.1f} ms/step "
        f"(K={K} lock-step), losses[,-1]={[float(x) for x in out[-1][:, -1]]}"
    )


if __name__ == "__main__":
    main()
