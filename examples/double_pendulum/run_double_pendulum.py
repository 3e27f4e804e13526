#!/usr/bin/env python
"""Run PILCO on the double-pendulum swing-up task (2-D torque, LCK models)."""
import argparse
import logging
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dest", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--episodes", type=int, default=15)
    p.add_argument("--variant", choices=["mm", "pathwise"], default="pathwise")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="use the Pallas fused kernels (TPU)")
    p.add_argument("--fused-rollout", action="store_true",
                   help="whole-rollout Pallas kernel (ops/rollout_pallas.py; "
                        "supports the coregionalized 2-D-torque policy)")
    p.add_argument("--fused-match", action="store_true",
                   help="whole-match Pallas kernel for the MM matches (TPU)")
    # classic-PILCO double-pendulum settings (Deisenroth & Rasmussen):
    # 20 Hz control over a 2.5 s horizon, ~100 policy basis functions
    p.add_argument("--dt", type=float, default=0.05)
    p.add_argument("--horizon", type=float, default=2.5)
    p.add_argument("--policy-centers", type=int, default=100)
    p.add_argument("--drift-centers", type=int, default=320)
    p.add_argument("--ls-low", type=float, default=0.01,
                   help="dynamics-kernel lengthscale floor; raise (e.g. 0.1) "
                        "when a fast dim (theta2-dot) drags the fit into a "
                        "near-interpolating kernel")
    args = p.parse_args()
    if (args.fused or args.fused_match or args.fused_rollout) and args.cpu:
        p.error("--fused* flags require the TPU backend (incompatible with --cpu)")

    logging.basicConfig(
        level=logging.INFO,
        datefmt="%H:%M:%S",
        format="%(asctime)s %(levelname)s:%(name)s:%(message)s",
    )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from experiment import main as run_main
    from gpflowpilco_tpu.loops.pilco import (
        DriftSpec,
        MomentMatchingPILCO,
        PathwisePILCO,
        PolicySpec,
    )

    seed = args.seed if args.seed is not None else random.randint(0, 2**31)
    logging.info("seed=%d devices=%s", seed, jax.devices())

    cls = MomentMatchingPILCO if args.variant == "mm" else PathwisePILCO
    if args.smoke:
        drift = DriftSpec(num_centers=32, max_iters=60, coregionalize=True,
                          per_output_noise=True)
        policy = PolicySpec(
            num_centers=10, step_limit=200, batch_size=32, num_bases=64,
            action_scale=2.0, coregionalize=True,
        )
        # honor --dt/--horizon so a smoke run compiles the same program
        # shapes (step count) as the full run it is vetting
        kwargs = dict(
            validation_samples=4, step_size=args.dt, horizon=args.horizon
        )
        episodes = min(args.episodes, 3)
    else:
        # per-output noise needs a longer L-BFGS budget: the disparate
        # output scales slow the joint hyperparameter convergence
        drift = DriftSpec(num_centers=args.drift_centers, max_iters=1600,
                          coregionalize=True, per_output_noise=True,
                          ls_low=args.ls_low)
        policy = PolicySpec(
            num_centers=args.policy_centers, step_limit=3000,
            action_scale=2.0, coregionalize=True,
        )
        kwargs = dict(step_size=args.dt, horizon=args.horizon)
        episodes = args.episodes

    run_main(
        dest=args.dest,
        seed=seed,
        loop_cls=cls,
        num_episodes=episodes,
        dtype=jnp.float32 if args.f32 else jnp.float64,
        drift_spec=drift,
        policy_spec=policy,
        fused=args.fused,
        fused_match=args.fused_match,
        fused_rollout=args.fused_rollout,
        **kwargs,
    )


if __name__ == "__main__":
    main()
