#!/usr/bin/env python
"""Run moment-matching PILCO on cartpole swing-up.

Counterpart of /root/reference/examples/cartpole_swingup/run_momentMatching.py.
--smoke shrinks every knob for a fast end-to-end exercise of the whole pipeline.
"""
import argparse
import logging
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dest", default=None, help="checkpoint directory")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--episodes", type=int, default=10)
    p.add_argument("--smoke", action="store_true", help="tiny config, CPU-friendly")
    p.add_argument("--f32", action="store_true", help="run in float32 (TPU-native)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    return p.parse_args()


def main():
    args = parse_args()
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
        # f32 Cholesky-heavy graphs on TPU require full-precision matmul
        # passes (XLA lowers Cholesky through matmuls); see run_tpu_full.py
        jax.config.update("jax_default_matmul_precision", "highest")
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from experiment import main as run_main
    from gpflowpilco_tpu.loops.pilco import DriftSpec, MomentMatchingPILCO, PolicySpec

    seed = args.seed if args.seed is not None else random.randint(0, 2**31)
    logging.info("seed=%d devices=%s", seed, jax.devices())

    if args.smoke:
        drift = DriftSpec(num_centers=32, max_iters=60)
        policy = PolicySpec(num_centers=10, step_limit=200)
        kwargs = dict(validation_samples=8)
    else:
        drift = DriftSpec()
        policy = PolicySpec()
        kwargs = {}

    run_main(
        dest=args.dest,
        seed=seed,
        loop_cls=MomentMatchingPILCO,
        num_episodes=args.episodes if not args.smoke else min(args.episodes, 3),
        dtype=jnp.float32 if args.f32 else jnp.float64,
        drift_spec=drift,
        policy_spec=policy,
        **kwargs,
    )


if __name__ == "__main__":
    main()
