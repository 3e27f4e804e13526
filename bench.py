#!/usr/bin/env python
"""Benchmark: pathwise PILCO policy-optimization step throughput on TPU.

Workload = the reference's policy-training inner step at full scale
(BASELINE.md: 1024 particles x 1024 Fourier bases x 30-step rollout, loss +
gradient + clip + Adam update). The reference runs this on CPU/TF
(settings.py:51-56); TF is not installed here, so `vs_baseline` is the speedup
of the TPU chip over this framework's own CPU execution of the identical
workload — a conservative stand-in for the CPU/TF reference (both are
multithreaded XLA/Eigen CPU backends).

Prints ONE final JSON line: {"metric", "value", "unit", "vs_baseline"} — the
headline pathwise metric, always LAST so a last-line parser finds it. A second
machine-readable line for the classic-PILCO MM workload
(mm_policy_opt_steps_per_s, VERDICT r2 #5) precedes it. Secondary numbers go to
stderr.

`--scaling` instead runs the multi-chip weak-scaling harness (VERDICT r2 #3):
the sharded pathwise train step at dp in {1,2,4,8} with a fixed per-device
particle batch, emitting rollouts/s/device and scaling efficiency per dp. On
this 1-chip environment, run it with `--scaling-backend cpu` (8 virtual XLA
host devices — numbers meaningless, plumbing proven); on a real slice the same
command measures the BASELINE.md >=80%-at-2-hosts target unchanged.
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time


def build_step(dtype, batch_size, num_bases, num_steps=30, m_drift=256, fused=False, remat=False, unroll=1, fused_rollout=False):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_models
    from gpflowpilco_tpu.dynamics.forward import forward_concrete
    from gpflowpilco_tpu.dynamics.solvers import euler_rollout
    from gpflowpilco_tpu.models.pathwise import (
        PathwiseSVGPTransform,
        generate_paths_svgp,
    )
    from gpflowpilco_tpu.moments import Chain
    from gpflowpilco_tpu.moment_matching.gp import SVGPTransform
    from gpflowpilco_tpu.moment_matching.rules import Probit, Scale, Shift

    encoder, drift_model, policy_model, objective = _build_models(
        dtype, m_drift=m_drift
    )
    mean0 = jnp.asarray([0.0, math.pi, 0.0, 0.0], dtype)
    tril0 = 0.1 * jnp.eye(4, dtype=dtype)

    def policy_chain(policy_params):
        return Chain(
            Scale(scale=jnp.asarray(20.0 - 1e-5, dtype)),
            Shift(shift=jnp.asarray(-0.5, dtype)),
            Probit(),
            SVGPTransform(model=policy_params, deterministic=True).with_cache(),
        )

    def loss_fn(policy_params, key):
        k_paths, k_init = jax.random.split(key)
        paths = generate_paths_svgp(drift_model, k_paths, batch_size, num_bases)
        if fused_rollout:
            from gpflowpilco_tpu.ops.rollout_pallas import pathwise_rollout_loss_fused

            rvs = jax.random.normal(k_init, (batch_size, 4), dtype)
            x0 = mean0 + rvs @ tril0.T
            loss = pathwise_rollout_loss_fused(
                policy_params, drift_model, paths, x0,
                active_dims=(1,), action_scale=10.0,
                target=objective.target, precis=objective.precis,
                dt=1.0, num_steps=num_steps,
                interpret=jax.default_backend() != "tpu",
            )
            return loss.mean()
        drift_fn = PathwiseSVGPTransform(model=drift_model, paths=paths, fused=fused)
        pol = policy_chain(policy_params)
        rvs = jax.random.normal(k_init, (batch_size, 4), dtype)
        x0 = mean0 + rvs @ tril0.T

        def f(t, x):
            return forward_concrete(x, drift_fn, policy=pol, encoder=encoder)

        def acc(t, x, loss):
            return loss + objective(encoder(x))

        _, loss, _ = euler_rollout(
            f, x0, dt=1.0, num_steps=num_steps,
            accumulate=acc, acc_init=jnp.zeros((batch_size,), dtype),
            remat=remat, unroll=unroll,
        )
        return loss.mean()

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-2))

    if fused_rollout:
        # production semantics: grads w.r.t. the trainable policy leaves only
        # (models/builders.py policy_mask partition — the whole-rollout kernel
        # freezes everything else by design)
        from gpflowpilco_tpu.models.builders import policy_mask
        from gpflowpilco_tpu.utils.trees import combine, partition

        mask = policy_mask(policy_model)
        train0, frozen = partition(policy_model, mask)
        opt_state = optimizer.init(train0)

        def masked_loss(train, key):
            return loss_fn(combine(train, frozen), key)

        @jax.jit
        def train_step(train, opt_state, key):
            loss, grads = jax.value_and_grad(masked_loss)(train, key)
            updates, opt_state = optimizer.update(grads, opt_state, train)
            return optax.apply_updates(train, updates), opt_state, loss

        return train0, opt_state, train_step, jax.jit(masked_loss)

    opt_state = optimizer.init(policy_model)

    @jax.jit
    def train_step(policy_params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(policy_params, key)
        updates, opt_state = optimizer.update(grads, opt_state, policy_params)
        return optax.apply_updates(policy_params, updates), opt_state, loss

    return policy_model, opt_state, train_step, jax.jit(loss_fn)


def build_mm_loss(dtype, num_steps=30, m_drift=240, m_policy=30, unroll=30,
                  fused=False, fused_match=False):
    """Classic-PILCO moment-matching policy loss (the second flagship path):
    one deterministic 30-step Gaussian-moment rollout, loss + grad."""
    import math

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_models
    from gpflowpilco_tpu.dynamics.forward import forward_moments
    from gpflowpilco_tpu.dynamics.solvers import moment_matching_euler_rollout
    from gpflowpilco_tpu.loops.pilco import _cast_floats
    from gpflowpilco_tpu.moments import Chain, GaussianMoments
    from gpflowpilco_tpu.moment_matching.gp import SVGPTransform
    from gpflowpilco_tpu.moment_matching.rules import SquashedProbit

    # ALWAYS build parameters at f32 and cast to the compute dtype:
    # jax.random draws different values per dtype, so building directly at f64
    # would create a DIFFERENT model — an f64 "truth" gradient would belong to
    # another function (this silently broke the round-2/3 probe's mm-rollout
    # cosine; see scripts/mm_precision_study.py).
    encoder, drift_model, policy_model, objective = _build_models(
        jnp.float32, m_drift=m_drift, m_policy=m_policy
    )
    encoder = _cast_floats(encoder, dtype)
    drift_model = _cast_floats(drift_model, dtype)
    policy_model = _cast_floats(policy_model, dtype)
    objective = _cast_floats(objective, dtype)
    mean0 = jnp.asarray([0.0, math.pi, 0.0, 0.0], dtype)[None]
    cov0 = (0.1**2) * jnp.eye(4, dtype=dtype)[None]

    def loss_fn(policy_params):
        if fused_match:
            # whole-match Pallas kernel: frozen drift, full-adjoint policy
            drift = SVGPTransform(
                model=drift_model, fused_match=True, frozen=True
            ).with_cache()
            policy_t = SVGPTransform(
                model=policy_params, deterministic=True, fused_match=True
            ).with_cache()
        else:
            drift = SVGPTransform(model=drift_model, fused=fused).with_cache()
            policy_t = SVGPTransform(
                model=policy_params, deterministic=True, fused=fused
            ).with_cache()
        pol = Chain(
            SquashedProbit(scale=jnp.asarray(20.0 - 1e-5, dtype)),
            policy_t,
        )

        def f(t, xm):
            return forward_moments(xm, drift, policy=pol, encoder=encoder)

        _, _, means, covs = moment_matching_euler_rollout(
            f, GaussianMoments(mean=mean0, cov=cov0), dt=1.0,
            num_steps=num_steps, unroll=unroll,
        )
        # batched post-scan cost (mirrors loops/pilco.py:_mm_rollout_loss)
        states = GaussianMoments(mean=means, cov=covs)
        return objective(encoder.moment_match(states).y).sum()

    return policy_model, jax.jit(jax.value_and_grad(loss_fn))


def build_mm_loss_dd(
    num_steps=30, m_drift=240, m_policy=30, unroll=1, full_dd_policy=False
):
    """Compensated (double-float) MM policy loss (PolicySpec.loss_compensated
    equivalent, standalone): dd carry + dd drift match + dd encoder match,
    f32 policy island, f32 cost tail. The production replacement for the
    107 ms/loss+grad f64-island lever (docs/perf_notes.md round 4).

    ``full_dd_policy=True`` swaps the f32 policy island for the FULL-dd
    policy chain (traced dd cache + dd probit squash) — the production
    ``--mm-loss-dd`` configuration (loss_policy_f32=False)."""
    import math

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_models
    from gpflowpilco_tpu.moments import Chain, GaussianMoments
    from gpflowpilco_tpu.moment_matching import dd_rollout
    from gpflowpilco_tpu.moment_matching.dd_match import (
        DDMoments,
        as_meta_dict,
        build_dd_drift,
    )
    from gpflowpilco_tpu.moment_matching.gp import SVGPTransform
    from gpflowpilco_tpu.moment_matching.rules import SquashedProbit
    from gpflowpilco_tpu.ops import dd as ddops

    encoder, drift_model, policy_model, objective = _build_models(
        jnp.float32, m_drift=m_drift, m_policy=m_policy
    )
    pack = build_dd_drift(drift_model)
    meta = as_meta_dict(pack.meta)
    mean0 = jnp.asarray([0.0, math.pi, 0.0, 0.0], jnp.float32)[None]
    cov0 = (0.1**2) * jnp.eye(4, dtype=jnp.float32)[None]

    def loss_fn(policy_params, pack_):
        if full_dd_policy:
            from gpflowpilco_tpu.moment_matching.dd_match import (
                build_dd_policy_cache,
                make_meta_tuple,
            )

            pcache, pmeta = build_dd_policy_cache(policy_params)
            island = dd_rollout.DDPolicyChain(
                cache=pcache,
                meta_t=make_meta_tuple(pmeta),
                scale=jnp.asarray(20.0 - 1e-5, jnp.float32),
            )
        else:
            policy_t = SVGPTransform(
                model=policy_params, deterministic=True
            ).with_cache()
            pol = Chain(
                SquashedProbit(scale=jnp.asarray(20.0 - 1e-5, jnp.float32)),
                policy_t,
            )
            island = dd_rollout.DDPolicyIsland(chain=pol)

        def fwd(t, xm):
            del t
            return dd_rollout.dd_forward_moments(
                xm, pack_.cache, meta, island, encoder
            )

        x0 = DDMoments(mean=ddops.lift(mean0), cov=ddops.lift(cov0))
        _, means_hi, covs_hi = dd_rollout.dd_mm_euler_rollout(
            fwd, x0, dt=1.0, num_steps=num_steps, unroll=unroll
        )
        states = GaussianMoments(mean=means_hi, cov=covs_hi)
        return objective(encoder.moment_match(states).y).sum()

    kw = {}
    opts = ddops.eft_compiler_options()
    if opts:
        kw["compiler_options"] = opts
    vg = jax.jit(jax.value_and_grad(loss_fn), **kw)
    return policy_model, pack, vg


def time_steps(policy, opt_state, train_step, reps):
    import jax

    key = jax.random.PRNGKey(0)
    # warm-up / compile
    policy, opt_state, loss = train_step(policy, opt_state, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(reps):
        key = jax.random.fold_in(key, i)
        policy, opt_state, loss = train_step(policy, opt_state, key)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / reps
    return dt, float(loss)


def run_scaling(args):
    """Weak-scaling harness: the sharded pathwise policy train step
    (parallel/pathwise.py) at dp in {1,2,4,...} with args.per_device particles
    per device. Emits one JSON line per dp and a final summary line whose
    vs_baseline is efficiency / 0.80 (the BASELINE.md scaling target)."""
    import os

    if args.scaling_backend == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.scaling_devices}"
            ).strip()
    import jax

    if args.scaling_backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_models
    from gpflowpilco_tpu.loops.core import EpisodeSpec
    from gpflowpilco_tpu.moments import Chain
    from gpflowpilco_tpu.moment_matching.gp import SVGPTransform
    from gpflowpilco_tpu.moment_matching.rules import Probit, Scale, Shift
    from gpflowpilco_tpu.parallel.mesh import make_mesh
    from gpflowpilco_tpu.parallel.pathwise import make_pathwise_train_step

    dtype = jnp.float32
    n_dev = len(jax.devices())
    print(f"scaling devices: {jax.devices()}", file=sys.stderr)
    encoder, drift_model, policy_model, objective = _build_models(
        dtype, m_drift=args.m_drift
    )
    if args.scaling_ensemble:
        # north-star fully-Bayesian config: 8-member GPR hyperposterior
        # ensemble drift (BASELINE.md; DriftSpec.hmc_ensemble=8) at the
        # ~ep-10 cartpole dataset size
        import pathlib
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "scripts"))
        from rollout_kernel_probe import build_shape

        drift_model, _, _ = build_shape(
            "hmc_gpr", dtype, small=args.scaling_backend == "cpu"
        )
    spec = EpisodeSpec(
        state_mean=[0.0, math.pi, 0.0, 0.0],
        state_scale_tril=0.1 * jnp.eye(4),
        horizon=3.0,
        step_size=0.1,
    )

    def policy_chain_fn(pm):
        return Chain(
            Scale(scale=jnp.asarray(20.0 - 1e-5, dtype)),
            Shift(shift=jnp.asarray(-0.5, dtype)),
            Probit(),
            SVGPTransform(model=pm, deterministic=True).with_cache(),
        )

    dp_list = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    reps = args.reps
    per_dev = {}
    for dp in dp_list:
        mesh = make_mesh(dp=dp, tp=1)
        batch = args.per_device * dp
        optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-2))
        train_step, _ = make_pathwise_train_step(
            mesh, drift_model, policy_chain_fn, encoder, objective, spec,
            batch, args.num_bases, optimizer, dtype,
            fused_rollout=args.scaling_fused_rollout, action_scale=10.0,
        )
        opt_state = optimizer.init(policy_model)
        policy, loss = policy_model, None
        key = jax.random.PRNGKey(0)
        policy, opt_state, loss = train_step(policy, opt_state, key)  # compile
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(reps):
            policy, opt_state, loss = train_step(
                policy, opt_state, jax.random.fold_in(key, i)
            )
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / reps
        rps_dev = batch / dt / dp  # particle-rollout-steps throughput basis
        per_dev[dp] = rps_dev
        print(
            json.dumps(
                {
                    "metric": "pathwise_weak_scaling_point",
                    "dp": dp,
                    "batch": batch,
                    "ms_per_step": round(dt * 1e3, 3),
                    "rollouts_per_s_per_device": round(rps_dev, 1),
                    "efficiency_vs_dp1": round(rps_dev / per_dev[1], 4),
                    "loss": round(float(loss), 5),
                }
            )
        )
    dmax = dp_list[-1]
    eff = per_dev[dmax] / per_dev[1]
    print(
        json.dumps(
            {
                "metric": "pathwise_weak_scaling_efficiency",
                "value": round(eff, 4),
                "unit": (
                    f"rollouts/s/device at dp={dmax} vs dp=1 (weak scaling, "
                    f"{args.per_device} particles/device x {args.num_bases} "
                    f"bases x 30-step rollout, backend={args.scaling_backend}, "
                    f"fused_rollout={args.scaling_fused_rollout}, "
                    f"ensemble={args.scaling_ensemble})"
                ),
                "vs_baseline": round(eff / 0.80, 4),
            }
        )
    )


def bench_mm_dd_full_iteration():
    """Measured FULL dd-MM PILCO iteration (VERDICT r4 #6): dynamics L-BFGS
    refit + 2000-step compensated-dd policy optimization (K=4 multistart,
    full-dd policy chain — the production --mm-loss-dd recipe) + vmapped
    100-rollout validation, on the real cartpole loop. One untimed warmup
    iteration absorbs the first-call compiles (persistent cache makes them
    ~seconds on reruns); the timed iteration is the steady state every
    episode after the first runs at.

    vs_baseline basis: the CPU-f64 reference-recipe iteration measured in
    round 3 on this host (230-360 s/iteration; conservative end 230 s) —
    the configuration whose gradients the dd loss reproduces (cos 1.0)."""
    import pathlib
    import sys
    import time

    import jax
    import jax.numpy as jnp

    sys.path.insert(
        0,
        str(pathlib.Path(__file__).resolve().parent / "examples" / "cartpole_swingup"),
    )
    from experiment import build_loop

    from gpflowpilco_tpu.loops.pilco import (
        DriftSpec,
        MomentMatchingPILCO,
        PolicySpec,
    )

    # the MM loss's Cholesky factorizations NaN on TPU at default (bf16-pass)
    # matmul precision (see run_tpu_full.py); called late in main so the
    # global flip cannot touch the other metrics' already-compiled graphs
    jax.config.update("jax_default_matmul_precision", "highest")

    loop = build_loop(
        MomentMatchingPILCO,
        None,
        seed=3,
        dtype=jnp.float32,
        drift_spec=DriftSpec(
            num_centers=64, max_iters=1000, per_output_noise=True
        ),
        policy_spec=PolicySpec(
            step_limit=2000, loss_compensated=True, loss_policy_f32=False,
            mm_unroll=1,
        ),
        validation_samples=100,
    )
    loop.step()  # init episode (random policy), as in the production loop

    def iteration():
        # mirror loops/driver.py outer_loop's phase order: refit -> policy
        # opt -> real episode + vmapped 100-rollout validation (loop.step
        # computes the episode metrics, validation included)
        t0 = time.perf_counter()
        loop.update_dynamics()
        t_fit = time.perf_counter()
        loop.update_policy()
        t_pol = time.perf_counter()
        loop.step()
        t_val = time.perf_counter()
        return t_fit - t0, t_pol - t_fit, t_val - t_pol, t_val - t0

    iteration()  # warmup: first-episode compiles
    fit_s, pol_s, val_s, total_s = iteration()
    print(
        f"mm dd full iteration (fit+2000-step policy opt+episode with "
        f"100-rollout validation): {total_s:.1f} s = fit {fit_s:.1f} + "
        f"policy {pol_s:.1f} + episode/validation {val_s:.1f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "mm_dd_full_iteration_s",
                "value": round(total_s, 1),
                "unit": (
                    "s/iteration (dynamics L-BFGS refit + 2000-step "
                    "compensated-dd MM policy opt, K=4 multistart full-dd "
                    "chain + 100-rollout validation; steady state after "
                    "first-episode compiles; vs_baseline basis: CPU-f64 "
                    "reference-recipe iteration, conservative 230 s of the "
                    "230-360 s measured round 3)"
                ),
                "vs_baseline": round(230.0 / total_s, 2),
            }
        )
    )


def main():
    import jax

    # persistent compile cache: the pathwise loss+grad graph takes minutes to
    # compile through the remote tunnel; cache hits make reruns instant
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    batch, bases, steps = 1024, 1024, 30

    # --- TPU (default backend) -----------------------------------------------
    dev = jax.devices()[0]
    on_tpu = "TPU" in str(dev)
    print(f"benchmark device: {dev}", file=sys.stderr)
    # NOTE: remat=True would cut HBM traffic further but its scan+checkpoint
    # graph compiles pathologically slowly through the remote-compile tunnel
    # (>40 min observed); the fused Pallas path gets the same effect via a
    # recomputing custom VJP.
    policy, opt_state, train_step, loss_eval = build_step(
        jnp.float32, batch, bases, steps
    )
    tpu_dt, tpu_loss = time_steps(policy, opt_state, train_step, reps=20)
    print(
        f"tpu (xla): {tpu_dt*1e3:.2f} ms/opt-step, loss={tpu_loss:.5f}",
        file=sys.stderr,
    )

    import os

    if on_tpu and os.environ.get("GPILCO_BENCH_PALLAS", "1") == "1":
        # Pallas fused drift-eval variant (validated on-chip: 10.4 ms vs 58.5 ms
        # per step; set GPILCO_BENCH_PALLAS=0 to skip, e.g. with a cold compile
        # cache where the tunnel compile could stall an unattended run)
        try:
            probe_key = jax.random.PRNGKey(123)
            l_ref = float(loss_eval(policy, probe_key))
            # fused kernel's custom VJP already recomputes activations: no
            # remat. unroll>1 additionally fuses the inter-step glue
            # (encode/squash/Euler/cost) across steps — the per-step kernel is
            # MXU-bound but the glue is dispatch-latency.
            for unroll in (1, 6, 30):
                policy_f, opt_f, step_f, loss_eval_f = build_step(
                    jnp.float32, batch, bases, steps, fused=True, remat=False,
                    unroll=unroll,
                )
                fused_dt, fused_loss = time_steps(policy_f, opt_f, step_f, reps=20)
                # deterministic acceptance: same params + same key, single eval
                l_fused = float(loss_eval_f(policy, probe_key))
                print(
                    f"tpu (pallas fused, unroll={unroll}): {fused_dt*1e3:.2f} "
                    f"ms/opt-step; same-input loss ref={l_ref:.5f} "
                    f"fused={l_fused:.5f}",
                    file=sys.stderr,
                )
                if fused_dt < tpu_dt and abs(l_fused - l_ref) < 1e-2 * max(1.0, abs(l_ref)):
                    tpu_dt = fused_dt

            # whole-rollout kernel (ops/rollout_pallas.py): all 30 steps —
            # encode/squash/drift/Euler/cost — in ONE kernel per particle tile
            policy_fr, opt_fr, step_fr, loss_eval_fr = build_step(
                jnp.float32, batch, bases, steps, fused_rollout=True,
            )
            fr_dt, fr_loss = time_steps(policy_fr, opt_fr, step_fr, reps=20)
            # _build_models is deterministic, so policy_fr is the partition of
            # the same params `policy` holds: same-input acceptance is valid
            l_fr = float(loss_eval_fr(policy_fr, probe_key))
            print(
                f"tpu (pallas whole-rollout): {fr_dt*1e3:.2f} ms/opt-step; "
                f"same-input loss ref={l_ref:.5f} fused={l_fr:.5f}",
                file=sys.stderr,
            )
            if fr_dt < tpu_dt and abs(l_fr - l_ref) < 1e-2 * max(1.0, abs(l_ref)):
                tpu_dt = fr_dt
        except Exception as e:
            print(f"pallas variant failed: {e}", file=sys.stderr)

    tpu_steps_per_s = 1.0 / tpu_dt
    rollouts_per_s = batch * tpu_steps_per_s
    print(
        f"tpu best: {tpu_dt*1e3:.2f} ms/opt-step, {rollouts_per_s:,.0f} particle-rollouts/s",
        file=sys.stderr,
    )

    # --- secondary: MM policy loss+grad (classic PILCO path) ------------------
    mm_dt = None
    try:
        mm_policy, mm_grad = build_mm_loss(jnp.float32, fused=on_tpu)
        mm_val, _ = mm_grad(mm_policy)
        jax.block_until_ready(mm_val)
        t0 = time.perf_counter()
        for _ in range(50):
            mm_val, _ = mm_grad(mm_policy)
        jax.block_until_ready(mm_val)
        mm_dt = (time.perf_counter() - t0) / 50
        print(
            f"mm policy loss+grad (30 steps, M_drift=240): {mm_dt*1e3:.2f} ms",
            file=sys.stderr,
        )
        if on_tpu:
            # whole-match fused kernel variant (ops/mm_match_pallas.py)
            mm_policy2, mm_grad2 = build_mm_loss(jnp.float32, fused_match=True)
            mm_val2, _ = mm_grad2(mm_policy2)
            jax.block_until_ready(mm_val2)
            t0 = time.perf_counter()
            for _ in range(50):
                mm_val2, _ = mm_grad2(mm_policy2)
            jax.block_until_ready(mm_val2)
            mm_dt2 = (time.perf_counter() - t0) / 50
            rel = abs(float(mm_val2) - float(mm_val)) / max(1.0, abs(float(mm_val)))
            print(
                f"mm policy loss+grad (whole-match fused): {mm_dt2*1e3:.2f} ms, "
                f"loss rel-diff {rel:.2e}",
                file=sys.stderr,
            )
            if rel < 1e-2:
                mm_dt = min(mm_dt, mm_dt2)
    except Exception as e:
        print(f"mm bench failed: {e}", file=sys.stderr)

    # compensated (double-float) MM loss — the gradient-correct production
    # lever (replaces the 107 ms f64 island; docs/perf_notes.md round 4).
    # unroll=1 to match the production recipe's compile envelope.
    try:
        dd_policy, dd_pack, dd_grad = build_mm_loss_dd(unroll=1)
        dd_val, _ = dd_grad(dd_policy, dd_pack)
        jax.block_until_ready(dd_val)
        t0 = time.perf_counter()
        for _ in range(50):
            dd_val, _ = dd_grad(dd_policy, dd_pack)
        jax.block_until_ready(dd_val)
        dd_dt = (time.perf_counter() - t0) / 50
        print(
            f"mm dd (compensated) loss+grad (30 steps, M_drift=240, unroll=1): "
            f"{dd_dt*1e3:.2f} ms",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "mm_dd_policy_opt_steps_per_s",
                    "value": round(1.0 / dd_dt, 3),
                    "unit": "steps/s (30-step COMPENSATED MM loss+grad, "
                            "M_drift=240, unroll=1; f64-island-grade gradients "
                            "from pure f32 ops; vs_baseline basis: the 107 ms "
                            "on-chip f64-ISLAND loss+grad this lever replaces "
                            "— NOT the CPU basis other metrics use)",
                    "vs_baseline": round(0.107 / dd_dt, 3),
                }
            )
        )
    except Exception as e:
        print(f"mm dd bench failed: {e}", file=sys.stderr)

    # MM CPU baseline (same workload, XLA-CPU) for the MM metric's vs_baseline
    mm_cpu_dt = None
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            mm_policy_c, mm_grad_c = build_mm_loss(jnp.float32)
            mm_val_c, _ = mm_grad_c(mm_policy_c)
            jax.block_until_ready(mm_val_c)
            t0 = time.perf_counter()
            for _ in range(10):
                mm_val_c, _ = mm_grad_c(mm_policy_c)
            jax.block_until_ready(mm_val_c)
            mm_cpu_dt = (time.perf_counter() - t0) / 10
        print(f"mm policy loss+grad (cpu xla): {mm_cpu_dt*1e3:.2f} ms", file=sys.stderr)
    except Exception as e:
        print(f"mm cpu baseline failed: {e}", file=sys.stderr)

    if mm_dt is not None:
        print(
            json.dumps(
                {
                    "metric": "mm_policy_opt_steps_per_s",
                    "value": round(1.0 / mm_dt, 3),
                    "unit": "steps/s (30-step MM rollout loss+grad, M_drift=240, M_policy=30)",
                    "vs_baseline": (
                        round(mm_cpu_dt / mm_dt, 3) if mm_cpu_dt else float("nan")
                    ),
                }
            )
        )

    # --- CPU baselines (two independent stacks, same workload) ----------------
    cpu_times = []
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            policy_c, opt_c, step_c, _ = build_step(jnp.float32, batch, bases, steps)
            cpu_dt, cpu_loss = time_steps(policy_c, opt_c, step_c, reps=3)
        print(f"cpu (xla): {cpu_dt*1e3:.2f} ms/opt-step, loss={cpu_loss:.5f}", file=sys.stderr)
        cpu_times.append(cpu_dt)
    except Exception as e:
        print(f"xla cpu baseline failed: {e}", file=sys.stderr)
    try:
        # independently-engineered second stack: the same workload in torch
        # (ATen CPU kernels + torch autodiff), parity-checked against the JAX
        # math on identical exported paths before the timing is trusted
        from bench_baselines import run_torch_baseline, torch_parity_check

        perr = torch_parity_check()
        torch_dt = run_torch_baseline(batch, bases, steps, reps=2, budget_s=120.0)
        print(
            f"cpu (torch): {torch_dt*1e3:.2f} ms/opt-step "
            f"(parity |torch-jax| = {perr:.2e})",
            file=sys.stderr,
        )
        if perr < 1e-3:
            cpu_times.append(torch_dt)
    except Exception as e:
        print(f"torch cpu baseline failed: {e}", file=sys.stderr)

    if cpu_times:
        # conservative: measure the speedup against the FASTEST CPU stack
        vs_baseline = min(cpu_times) / tpu_dt
        if len(cpu_times) >= 2:
            basis = ("min(XLA-CPU, torch-CPU): two independently-engineered "
                     "multithreaded CPU stacks, fastest wins")
        else:
            basis = ("XLA-CPU ONLY (torch baseline unavailable this run) — "
                     "this is the framework measuring itself; treat as an "
                     "upper bound on the CPU stack's speed")
        print(
            f"baseline methodology: vs_baseline = CPU / TPU on the identical "
            f"f32 workload; CPU basis = {basis}. The reference's own "
            f"TF/gpflow CPU stack is not installable here — a conservative "
            f"stand-in, not a measured TF number.",
            file=sys.stderr,
        )
    else:
        vs_baseline = float("nan")

    # full dd-MM iteration (VERDICT r4 #6): runs LAST among the measured
    # workloads because it flips the global matmul precision; the pathwise
    # headline JSON below stays the final line for the driver's parser
    try:
        bench_mm_dd_full_iteration()
    except Exception as e:
        print(f"mm dd full-iteration bench failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "pathwise_policy_opt_steps_per_s",
                "value": round(tpu_steps_per_s, 3),
                "unit": "steps/s (1024 particles x 1024 bases x 30-step rollout, loss+grad+adam)",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--scaling", action="store_true",
                        help="run the weak-scaling harness instead of the chip bench")
    parser.add_argument("--scaling-backend", choices=["cpu", "default"], default="cpu",
                        help="'cpu' = virtual XLA host devices (plumbing proof); "
                             "'default' = the session backend (a real slice)")
    parser.add_argument("--scaling-devices", type=int, default=8)
    parser.add_argument("--per-device", dest="per_device", type=int, default=256)
    parser.add_argument("--num-bases", dest="num_bases", type=int, default=512)
    parser.add_argument("--m-drift", dest="m_drift", type=int, default=64)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--scaling-ensemble", action="store_true",
                        help="weak-scale the fully-Bayesian north-star config "
                             "(8-member GPR hyperposterior ensemble drift) "
                             "instead of the point-estimate SVGP drift")
    parser.add_argument("--scaling-fused-rollout", action="store_true",
                        help="shard the whole-rollout Pallas kernel over 'dp' "
                             "(parallel/pathwise.py fused_rollout; interpret "
                             "mode off-TPU) — the fastest single-chip path, "
                             "weak-scaled")
    cli = parser.parse_args()
    if cli.scaling:
        run_scaling(cli)
    else:
        main()
