"""Sharded pathwise training: mesh execution + parity with unsharded loss."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gpflowpilco_tpu.loops.core import EpisodeSpec
from gpflowpilco_tpu.moments import Chain
from gpflowpilco_tpu.moment_matching.gp import SVGPTransform
from gpflowpilco_tpu.moment_matching.rules import Probit, Scale, Shift
from gpflowpilco_tpu.parallel.mesh import make_mesh
from gpflowpilco_tpu.parallel.pathwise import make_pathwise_train_step


def _setup(dtype=jnp.float64):
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _build_models

    encoder, drift, policy, objective = _build_models(dtype, m_drift=16, m_policy=8)
    spec = EpisodeSpec(
        state_mean=np.asarray([0.0, math.pi, 0.0, 0.0]),
        state_scale_tril=0.1 * np.eye(4),
        horizon=0.5,
        step_size=0.1,
    )

    def policy_chain_fn(p):
        return Chain(
            Scale(scale=jnp.asarray(20.0 - 1e-5, dtype)),
            Shift(shift=jnp.asarray(-0.5, dtype)),
            Probit(),
            SVGPTransform(model=p, deterministic=True),
        )

    return encoder, drift, policy, objective, spec, policy_chain_fn


def test_sharded_step_runs_on_8_device_mesh():
    assert len(jax.devices()) == 8, "conftest should force 8 virtual CPU devices"
    dtype = jnp.float64
    encoder, drift, policy, objective, spec, chain_fn = _setup(dtype)
    mesh = make_mesh(tp=2)  # 4 x 2
    opt = optax.adam(1e-2)
    step, loss_fn = make_pathwise_train_step(
        mesh, drift, chain_fn, encoder, objective, spec,
        batch_size=16, num_bases=64, optimizer=opt, dtype=dtype,
    )
    state = opt.init(policy)
    p2, state, loss = step(policy, state, jax.random.PRNGKey(0))
    assert jnp.isfinite(loss)
    # params actually moved
    delta = jnp.max(jnp.abs(p2.q_mu - policy.q_mu))
    assert float(delta) > 0


def test_sharded_loss_matches_unsharded():
    dtype = jnp.float64
    encoder, drift, policy, objective, spec, chain_fn = _setup(dtype)
    opt = optax.adam(1e-2)

    mesh_multi = make_mesh(tp=2)
    _, loss_multi = make_pathwise_train_step(
        mesh_multi, drift, chain_fn, encoder, objective, spec,
        batch_size=16, num_bases=64, optimizer=opt, dtype=dtype,
    )
    mesh_single = make_mesh(dp=1, tp=1)
    _, loss_single = make_pathwise_train_step(
        mesh_single, drift, chain_fn, encoder, objective, spec,
        batch_size=16, num_bases=64, optimizer=opt, dtype=dtype,
    )
    key = jax.random.PRNGKey(3)
    a = jax.jit(loss_multi)(policy, key)
    b = jax.jit(loss_single)(policy, key)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-9)


def test_sharded_hmc_chains():
    import jax.numpy as jnp

    from gpflowpilco_tpu.models.hmc import HMCConfig
    from gpflowpilco_tpu.parallel.hmc import run_hmc_sharded

    mesh = make_mesh(dp=8, tp=1)
    mean = jnp.asarray([0.5, -1.0])

    def log_prob(tree):
        z = tree["x"] - mean
        return -0.5 * jnp.sum(z * z)

    init = {"x": jax.random.normal(jax.random.PRNGKey(0), (8, 2))}
    res = run_hmc_sharded(
        log_prob, init, jax.random.PRNGKey(1), mesh,
        HMCConfig(num_warmup=200, num_samples=300, num_leapfrog=8),
    )
    xs = np.asarray(res.samples["x"]).reshape(-1, 2)
    np.testing.assert_allclose(xs.mean(0), np.asarray(mean), atol=0.12)
    assert 0.5 < float(np.mean(np.asarray(res.accept_prob))) <= 1.0
