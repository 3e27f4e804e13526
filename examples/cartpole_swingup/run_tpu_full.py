#!/usr/bin/env python
"""Full-config cartpole swing-up on the TPU chip (f32), with compile cache.

The headline BASELINE workload: 10 episodes, SVGP dynamics (<=240 inducing),
5000-step policy optimization per iteration, 100-rollout validation.
"""
import argparse
import logging
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dest", default="/tmp/swingup_tpu_ckpt")
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--episodes", type=int, default=10)
    p.add_argument("--variant", choices=["mm", "pathwise"], default="mm")
    p.add_argument("--step-limit", type=int, default=5000)
    p.add_argument("--num-centers", type=int, default=240)
    p.add_argument("--mm-loss-f64", action="store_true",
                   help="mixed precision: f32 models/fits but the MM rollout "
                        "loss+grad in (software-emulated) f64, with the policy "
                        "chain fenced in an f32 island "
                        "(PolicySpec.loss_policy_f32). At a FITTED drift the "
                        "pure-f32 gradient decorrelates from the f64 truth "
                        "(cos 0.47 at the mm_small ep-10 checkpoint) while "
                        "this mixed loss restores cos 0.999999 "
                        "(docs/perf_notes.md round-3 precision study)")
    p.add_argument("--f64", action="store_true",
                   help="run the whole loop in f64 (TPU software-emulated; "
                        "slow but isolates f32 gradient-quality effects — the "
                        "round-2 on-chip f32 MM run never found the swing-up "
                        "basin while the identical-algorithm CPU-f64 run "
                        "solved at episode 5)")
    p.add_argument("--fused", action="store_true",
                   help="use the Pallas fused kernels (pathwise path-eval + MM pair-grid)")
    p.add_argument("--fused-match", action="store_true",
                   help="run the whole MM drift match as one Pallas kernel "
                        "(ops/mm_match_pallas.py; supersedes the pair-grid "
                        "kernel for the drift)")
    p.add_argument("--mm-loss-dd", action="store_true",
                   help="COMPENSATED MM loss (PolicySpec.loss_compensated + "
                        "full-dd policy chain): carry, drift match, encoder "
                        "match AND the probit policy squash in double-float "
                        "f32 pairs — f64-grade gradients from pure f32 "
                        "graphs, no x64 compiles, no emulated-f64 ops "
                        "(docs/perf_notes.md round 4). Supersedes "
                        "--mm-loss-f64 when set")
    p.add_argument("--mm-unroll", type=int, default=None,
                   help="MM rollout scan unroll (default: PolicySpec's 30). "
                        "Use 1 with --mm-loss-f64: the 30x-unrolled x64 graph "
                        "takes >30 min to compile through the remote tunnel, "
                        "and the f64 loss is emulation-bound, not "
                        "dispatch-bound, so unrolling buys nothing there")
    p.add_argument("--fused-rollout", action="store_true",
                   help="run the ENTIRE pathwise rollout (all 30 steps) as one "
                        "Pallas kernel per particle tile "
                        "(ops/rollout_pallas.py; supersedes --fused's "
                        "path-eval kernel when the task shape qualifies)")
    p.add_argument("--per-output-noise", action="store_true",
                   help="per-output (P,) likelihood noise on the drift SVGP "
                        "instead of the reference's shared scalar "
                        "(DriftSpec.per_output_noise)")
    p.add_argument("--optimism-tol", type=float, default=0.0,
                   help="enable the pessimistic-refit guard: when last "
                        "episode's eReward exceeded its realized reward by "
                        "more than this, floor the refit noise at the "
                        "incumbent's held-out episode MSE "
                        "(DriftSpec.optimism_tolerance; 0 disables)")
    p.add_argument("--optimism-noise-mult", type=float, default=1.0,
                   help="scale on the held-out-MSE noise floor "
                        "(DriftSpec.optimism_noise_mult)")
    p.add_argument(
        "--drift-optimizer",
        choices=["lbfgs", "natgrad_adam", "adam", "hmc"],
        default="lbfgs",
        help="dynamics-fit driver; 'hmc' samples a GPR hyperparameter "
        "posterior (ensemble rollouts) instead of a point fit",
    )
    args = p.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        datefmt="%H:%M:%S",
        format="%(asctime)s %(levelname)s:%(name)s:%(message)s",
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # full f32 matmul accumulation: the MM loss's Cholesky factorizations (XLA
    # lowers them through matmuls) NaN on TPU at default (bf16-pass) precision —
    # CPU f32 runs the identical graph cleanly. The MM workload is small-matrix
    # bound, so the MXU cost of HIGHEST is negligible here.
    jax.config.update("jax_default_matmul_precision", "highest")
    if args.f64 or (args.mm_loss_f64 and not args.mm_loss_dd):
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    run_dtype = jnp.float64 if args.f64 else jnp.float32
    loss_dtype = (
        jnp.float64 if (args.mm_loss_f64 and not args.mm_loss_dd) else None
    )

    from gpflowpilco_tpu.loops.pilco import (
        DriftSpec,
        MomentMatchingPILCO,
        PathwisePILCO,
        PolicySpec,
    )

    logging.info("devices=%s", jax.devices())
    cls = MomentMatchingPILCO if args.variant == "mm" else PathwisePILCO

    from experiment import build_loop, outer_loop

    loop = build_loop(
        cls,
        args.dest,
        args.seed,
        dtype=run_dtype,
        drift_spec=DriftSpec(
            num_centers=args.num_centers,
            max_iters=1000,
            optimizer=args.drift_optimizer,
            # HMC samples the GPR (internal-data) hyperparameter posterior
            model_type="gpr" if args.drift_optimizer == "hmc" else "svgp",
            per_output_noise=args.per_output_noise,
            optimism_tolerance=args.optimism_tol,
            optimism_noise_mult=args.optimism_noise_mult,
        ),
        policy_spec=PolicySpec(
            step_limit=args.step_limit,
            loss_dtype=loss_dtype,
            loss_compensated=args.mm_loss_dd,
            # full-dd policy chain under the compensated loss (the island's
            # f32 policy rounding decorrelates gradients at fitted
            # checkpoints; round-4 horizon study)
            loss_policy_f32=not args.mm_loss_dd,
            **({"mm_unroll": args.mm_unroll} if args.mm_unroll is not None else {}),
        ),
        validation_samples=100,
    )
    if args.fused:
        loop.use_fused_paths = True
        loop.use_fused_mm = True
    if args.fused_match:
        loop.use_fused_match = True
    if args.fused_rollout:
        loop.use_fused_rollout = True
    outer_loop(loop, num_episodes=args.episodes)


if __name__ == "__main__":
    main()
