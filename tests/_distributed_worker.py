"""Worker for the multi-process jax.distributed test (run via subprocess).

Each of WORLD processes owns 4 virtual CPU devices; together they form one
8-device global mesh. Exercises the real multi-controller pattern (SURVEY.md §4):
jax.distributed.initialize + pjit over a cross-process Mesh, with host-local
(replicated) inputs and cross-process collectives in the compiled program.
"""
import math
import os
import pathlib
import sys

import jax

jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=int(os.environ["WORLD"]),
    process_id=int(os.environ["RANK"]),
)

import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from gpflowpilco_tpu.loops.core import EpisodeSpec
from gpflowpilco_tpu.models.hmc import HMCConfig
from gpflowpilco_tpu.moments import Chain
from gpflowpilco_tpu.moment_matching.gp import SVGPTransform
from gpflowpilco_tpu.moment_matching.rules import Probit, Scale, Shift
from gpflowpilco_tpu.parallel.hmc import run_hmc_sharded
from gpflowpilco_tpu.parallel.mesh import make_mesh
from gpflowpilco_tpu.parallel.pathwise import make_pathwise_train_step


def main():
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 8 // int(os.environ["WORLD"])
    dtype = jnp.float64

    from __graft_entry__ import _build_models

    encoder, drift, policy, objective = _build_models(
        dtype, m_drift=16, m_policy=8
    )
    spec = EpisodeSpec(
        state_mean=np.asarray([0.0, math.pi, 0.0, 0.0]),
        state_scale_tril=0.1 * np.eye(4),
        horizon=0.5,
        step_size=0.1,
    )

    def chain_fn(p):
        return Chain(
            Scale(scale=jnp.asarray(20.0 - 1e-5, dtype)),
            Shift(shift=jnp.asarray(-0.5, dtype)),
            Probit(),
            SVGPTransform(model=p, deterministic=True),
        )

    mesh = make_mesh(tp=2)  # 4 (dp, spans both processes) x 2 (tp)
    opt = optax.adam(1e-2)
    step, loss_fn = make_pathwise_train_step(
        mesh, drift, chain_fn, encoder, objective, spec,
        batch_size=16, num_bases=64, optimizer=opt, dtype=dtype,
    )
    state = opt.init(policy)
    p2, state, loss = step(policy, state, jax.random.PRNGKey(0))
    # scalar jit outputs are fully replicated -> fetchable on every process
    print(f"LOSS {float(loss):.12e}", flush=True)
    delta = jax.jit(lambda a, b: jnp.max(jnp.abs(a.q_mu - b.q_mu)))(p2, policy)
    assert float(delta) > 0.0

    # sharded HMC: 8 chains over the same cross-process device set
    hmc_mesh = make_mesh(dp=8, tp=1)
    mean = jnp.asarray([0.5, -1.0])

    def log_prob(tree):
        z = tree["x"] - mean
        return -0.5 * jnp.sum(z * z)

    init = {"x": jax.random.normal(jax.random.PRNGKey(0), (8, 2))}
    res = run_hmc_sharded(
        log_prob, init, jax.random.PRNGKey(1), hmc_mesh,
        HMCConfig(num_warmup=100, num_samples=200, num_leapfrog=8),
    )
    sample_mean = jax.jit(
        lambda s: jnp.mean(jnp.reshape(s["x"], (-1, 2)), axis=0)
    )(res.samples)
    accept = jax.jit(lambda a: jnp.mean(a))(res.accept_prob)
    print(
        f"HMC {float(sample_mean[0]):.6f} {float(sample_mean[1]):.6f} "
        f"{float(accept):.4f}",
        flush=True,
    )
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
