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


def test_sharded_fused_loss_matches_unsharded():
    """Pallas kernel inside shard_map over the particle axis (interpret mode on
    virtual CPU devices) must agree with the unsharded XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.float32
    encoder, drift, policy, objective, spec, chain_fn = _setup(dtype)
    opt = optax.adam(1e-2)
    mesh = make_mesh(dp=4, tp=1)
    _, loss_fused = make_pathwise_train_step(
        mesh, drift, chain_fn, encoder, objective, spec,
        batch_size=16, num_bases=64, optimizer=opt, dtype=dtype, fused=True,
    )
    mesh1 = make_mesh(dp=1, tp=1)
    _, loss_ref = make_pathwise_train_step(
        mesh1, drift, chain_fn, encoder, objective, spec,
        batch_size=16, num_bases=64, optimizer=opt, dtype=dtype, fused=False,
    )
    key = jax.random.PRNGKey(5)
    with pltpu.force_tpu_interpret_mode():
        a = jax.jit(loss_fused)(policy, key)
    b = jax.jit(loss_ref)(policy, key)
    np.testing.assert_allclose(float(a), float(b), rtol=2e-4)


def test_sharded_fused_rollout_matches_dp1_loss_and_grad():
    """Whole-rollout Pallas kernel inside shard_map over 'dp' (interpret mode
    on the virtual CPU mesh): loss AND trainable-policy gradients must match
    the dp=1 run exactly — the only cross-device op is the psum, so any
    mismatch is a sharding/transpose bug (kernel-vs-XLA parity is covered in
    test_rollout_pallas.py)."""
    from gpflowpilco_tpu.models.builders import policy_mask
    from gpflowpilco_tpu.utils.trees import combine, partition

    dtype = jnp.float32
    encoder, drift, policy, objective, spec, chain_fn = _setup(dtype)

    def build(dp):
        mesh = make_mesh(dp=dp, tp=1)
        opt = optax.adam(1e-2)
        return make_pathwise_train_step(
            mesh, drift, chain_fn, encoder, objective, spec,
            batch_size=16, num_bases=64, optimizer=opt, dtype=dtype,
            fused_rollout=True, action_scale=10.0,
        )

    _, loss4 = build(4)
    _, loss1 = build(1)
    key = jax.random.PRNGKey(7)

    mask = policy_mask(policy)
    train, frozen = partition(policy, mask)

    def masked(loss_fn):
        return jax.jit(
            jax.value_and_grad(lambda tr: loss_fn(combine(tr, frozen), key))
        )

    v4, g4 = masked(loss4)(train)
    v1, g1 = masked(loss1)(train)
    np.testing.assert_allclose(float(v4), float(v1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g4), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-5, atol=1e-7)


def test_sharded_fused_rollout_train_step_freezes_masked_leaves():
    """fused_rollout train_step: trainable leaves move, frozen leaves
    (q_sqrt, variance, noise, mean_const) stay bitwise fixed, loss finite."""
    dtype = jnp.float32
    encoder, drift, policy, objective, spec, chain_fn = _setup(dtype)
    mesh = make_mesh(dp=4, tp=1)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-2))
    step, _ = make_pathwise_train_step(
        mesh, drift, chain_fn, encoder, objective, spec,
        batch_size=16, num_bases=64, optimizer=opt, dtype=dtype,
        fused_rollout=True, action_scale=10.0,
    )
    state = opt.init(policy)
    p2, state, loss = step(policy, state, jax.random.PRNGKey(0))
    assert jnp.isfinite(loss)
    assert float(jnp.max(jnp.abs(p2.q_mu - policy.q_mu))) > 0
    np.testing.assert_array_equal(
        np.asarray(p2.q_sqrt), np.asarray(policy.q_sqrt)
    )
    np.testing.assert_array_equal(
        np.asarray(p2.kernel.raw_variance), np.asarray(policy.kernel.raw_variance)
    )


def _ensemble(dtype, members=2, n=20):
    """Tiny GPR hyperposterior ensemble (cartpole-shaped: 6-D input, 4 outputs)."""
    from gpflowpilco_tpu.models.gp import GPR, GPREnsemble
    from gpflowpilco_tpu.models.kernels import RBF

    def member(key):
        k1, k2, k3 = jax.random.split(key, 3)
        kern = RBF.create(
            jnp.asarray(1.0, dtype),
            0.9 + 0.4 * jax.random.uniform(k1, (6,), dtype=dtype),
        )
        return GPR(
            kernel=kern,
            x=jax.random.normal(k2, (n, 6), dtype=dtype),
            y=0.3 * jax.random.normal(k3, (n, 4), dtype=dtype),
            mean_const=jnp.zeros(4, dtype),
            raw_noise=jnp.asarray(-3.0, dtype),
        )

    stacked = jax.vmap(member)(jax.random.split(jax.random.PRNGKey(21), members))
    return GPREnsemble(members=stacked, num_members=members)


@pytest.mark.parametrize("fused_rollout", [False, True])
def test_sharded_ensemble_loss_matches_dp1(fused_rollout):
    """GPREnsemble drift through the sharded step: dp=4 == dp=1 for both the
    GSPMD path and the vmapped whole-rollout kernel."""
    dtype = jnp.float32
    encoder, _, policy, objective, spec, chain_fn = _setup(dtype)
    ensemble = _ensemble(dtype)

    def build(dp):
        mesh = make_mesh(dp=dp, tp=1)
        opt = optax.adam(1e-2)
        _, loss = make_pathwise_train_step(
            mesh, ensemble, chain_fn, encoder, objective, spec,
            batch_size=16, num_bases=64, optimizer=opt, dtype=dtype,
            fused_rollout=fused_rollout, action_scale=10.0,
        )
        return loss

    key = jax.random.PRNGKey(11)
    a = jax.jit(build(4))(policy, key)
    b = jax.jit(build(1))(policy, key)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_sharded_ensemble_fused_matches_unfused():
    """Same key: the vmapped whole-rollout kernel and the GSPMD ensemble path
    compute the same loss (up to the A-S-ndtr-vs-erf squash difference)."""
    dtype = jnp.float32
    encoder, _, policy, objective, spec, chain_fn = _setup(dtype)
    ensemble = _ensemble(dtype)
    mesh = make_mesh(dp=2, tp=1)
    opt = optax.adam(1e-2)

    def build(fused_rollout):
        _, loss = make_pathwise_train_step(
            mesh, ensemble, chain_fn, encoder, objective, spec,
            batch_size=16, num_bases=64, optimizer=opt, dtype=dtype,
            fused_rollout=fused_rollout, action_scale=10.0,
        )
        return loss

    key = jax.random.PRNGKey(13)
    a = jax.jit(build(True))(policy, key)
    b = jax.jit(build(False))(policy, key)
    np.testing.assert_allclose(float(a), float(b), rtol=5e-4, atol=5e-4)


def test_sharded_ensemble_fused_train_step_runs():
    dtype = jnp.float32
    encoder, _, policy, objective, spec, chain_fn = _setup(dtype)
    ensemble = _ensemble(dtype)
    mesh = make_mesh(dp=4, tp=1)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-2))
    step, _ = make_pathwise_train_step(
        mesh, ensemble, chain_fn, encoder, objective, spec,
        batch_size=16, num_bases=64, optimizer=opt, dtype=dtype,
        fused_rollout=True, action_scale=10.0,
    )
    state = opt.init(policy)
    p2, state, loss = step(policy, state, jax.random.PRNGKey(0))
    assert jnp.isfinite(loss)
    assert float(jnp.max(jnp.abs(p2.q_mu - policy.q_mu))) > 0


def test_fused_rollout_rejects_tp_sharding():
    dtype = jnp.float32
    encoder, drift, policy, objective, spec, chain_fn = _setup(dtype)
    mesh = make_mesh(dp=4, tp=2)
    with pytest.raises(ValueError, match="tp=1"):
        make_pathwise_train_step(
            mesh, drift, chain_fn, encoder, objective, spec,
            batch_size=16, num_bases=64, optimizer=optax.adam(1e-2),
            dtype=dtype, fused_rollout=True,
        )


def test_systematic_resampling_local_and_sharded():
    from jax.sharding import PartitionSpec as P

    from gpflowpilco_tpu.parallel.resample import (
        systematic_resample,
        systematic_resample_sharded,
    )

    key = jax.random.PRNGKey(9)
    s = 64
    weights = jnp.zeros(s).at[7].set(1.0)  # degenerate: everything -> particle 7
    particles = {"x": jnp.arange(s, dtype=jnp.float64)[:, None]}
    out = systematic_resample(key, weights, particles)
    np.testing.assert_array_equal(np.asarray(out["x"]), np.full((s, 1), 7.0))

    # statistical: counts proportional to weights
    w2 = jnp.concatenate([jnp.full(s // 2, 3.0), jnp.full(s // 2, 1.0)])
    out2 = systematic_resample(key, w2, particles)
    frac_low = float(jnp.mean(out2["x"][:, 0] < s // 2))
    assert abs(frac_low - 0.75) < 0.05

    # sharded parity with the local version
    from jax import shard_map

    mesh = make_mesh(dp=8, tp=1)

    def body(w_l, p_l):
        return systematic_resample_sharded(key, w_l, {"x": p_l}, "dp")["x"]

    sharded = shard_map(
        body, mesh=mesh, in_specs=(P("dp"), P("dp", None)), out_specs=P("dp", None),
        check_vma=False,
    )(w2, particles["x"])
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(out2["x"]))
