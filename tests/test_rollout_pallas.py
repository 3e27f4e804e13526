"""Whole-rollout fused pathwise loss (ops/rollout_pallas.py) vs the unfused
composition (forward_concrete + euler_rollout over the policy chain).

Three tiers:
  1. pure-JAX reference restatement (reference=True) == unfused loss
  2. pallas interpret mode == reference restatement (kernel math identical)
  3. policy-parameter gradients (z, q_mu, lengthscales) match the unfused ones

All on CPU; the kernel runs in interpret mode. The real Mosaic lowering is
covered by the AOT-lowering test at the bottom (skips off-TPU) and the bench.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpflowpilco_tpu.components import Encoder, GaussianObjective
from gpflowpilco_tpu.dynamics.forward import forward_concrete
from gpflowpilco_tpu.dynamics.solvers import euler_rollout
from gpflowpilco_tpu.models.gp import SVGP
from gpflowpilco_tpu.models.kernels import RBF
from gpflowpilco_tpu.models.pathwise import PathwiseSVGPTransform, generate_paths_svgp
from gpflowpilco_tpu.moment_matching.gp import SVGPTransform
from gpflowpilco_tpu.moment_matching.rules import SinCos, SquashedProbit
from gpflowpilco_tpu.moments import Chain
from gpflowpilco_tpu.ops.rollout_pallas import pathwise_rollout_loss_fused

from .utils import TestConfig

ACTIVE = (1,)
D = 4  # state dim (cartpole-shaped)
DE = 5  # encoded dim
ACTION_SCALE = 10.0
NUM_STEPS = 7
S, B, M, MP = 64, 32, 24, 12


def _models(config):
    dxu = DE + 1
    kern_d = RBF.create(
        jnp.asarray([0.8, 1.1, 0.9, 1.3], config.dtype),
        0.9 + 0.4 * jax.random.uniform(config.next_key(), (D, dxu), dtype=config.dtype),
    )
    drift = SVGP(
        kernel=kern_d,
        z=jax.random.normal(config.next_key(), (D, M, dxu), dtype=config.dtype),
        q_mu=0.3 * jax.random.normal(config.next_key(), (M, D), dtype=config.dtype),
        q_sqrt=0.1 * jnp.broadcast_to(jnp.eye(M, dtype=config.dtype), (D, M, M)),
        mean_const=jnp.asarray([0.05, -0.02, 0.01, 0.03], config.dtype),
        raw_noise=jnp.asarray(-3.0, config.dtype),
        w=None,
        whiten=True,
    )
    kern_p = RBF.create(
        jnp.asarray([0.7], config.dtype),
        1.2 + 0.3 * jax.random.uniform(config.next_key(), (1, DE), dtype=config.dtype),
    )
    policy = SVGP(
        kernel=kern_p,
        z=jax.random.normal(config.next_key(), (1, MP, DE), dtype=config.dtype),
        q_mu=0.5 * jax.random.normal(config.next_key(), (MP, 1), dtype=config.dtype),
        q_sqrt=jnp.zeros((1, MP, MP), config.dtype),
        mean_const=jnp.zeros((1,), config.dtype),
        raw_noise=jnp.asarray(0.5, config.dtype),
        w=None,
        whiten=True,
    )
    return drift, policy


def _task(config):
    target = jnp.asarray([1.0, 0.0, 0.3, 0.0, 0.0], config.dtype)
    a = jax.random.normal(config.next_key(), (DE, DE), dtype=config.dtype)
    precis = 0.1 * (a @ a.T) + jnp.eye(DE, dtype=config.dtype)
    return target, precis


def _unfused_loss(policy, drift, paths, x0, target, precis):
    encoder = Encoder(transform=SinCos(), active_dims=ACTIVE)
    objective = GaussianObjective(target=target, precis=precis)
    pol = Chain(
        SquashedProbit(scale=jnp.asarray(2.0 * ACTION_SCALE - 1e-5, x0.dtype)),
        SVGPTransform(model=policy, deterministic=True).with_cache(),
    )
    drift_fn = PathwiseSVGPTransform(model=drift, paths=paths)

    def f(t, x):
        return forward_concrete(x, drift_fn, policy=pol, encoder=encoder)

    def acc(t, x, loss):
        return loss + objective(encoder(x))

    _, loss, _ = euler_rollout(
        f, x0, dt=1.0, num_steps=NUM_STEPS,
        accumulate=acc, acc_init=jnp.zeros((x0.shape[0],), x0.dtype),
    )
    return loss


def _setup(seed=11):
    config = TestConfig(seed=seed, dtype=jnp.float32)
    drift, policy = _models(config)
    target, precis = _task(config)
    paths = generate_paths_svgp(drift, config.next_key(), S, B)
    x0 = jnp.concatenate(
        [
            0.3 * jax.random.normal(config.next_key(), (S, 1), dtype=config.dtype),
            jnp.pi + 0.3 * jax.random.normal(config.next_key(), (S, 1), dtype=config.dtype),
            0.3 * jax.random.normal(config.next_key(), (S, 2), dtype=config.dtype),
        ],
        axis=1,
    )
    return drift, policy, paths, x0, target, precis


def _fused(policy, drift, paths, x0, target, precis, **kw):
    return pathwise_rollout_loss_fused(
        policy, drift, paths, x0,
        active_dims=ACTIVE, action_scale=ACTION_SCALE,
        target=target, precis=precis, dt=1.0, num_steps=NUM_STEPS, **kw
    )


def test_reference_matches_unfused():
    drift, policy, paths, x0, target, precis = _setup()
    want = _unfused_loss(policy, drift, paths, x0, target, precis)
    got = _fused(policy, drift, paths, x0, target, precis, reference=True)
    # only difference: A-S ndtr (1.5e-7) vs erf-based, amplified by the rollout
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_interpret_kernel_matches_reference():
    drift, policy, paths, x0, target, precis = _setup()
    ref = _fused(policy, drift, paths, x0, target, precis, reference=True)
    got = _fused(policy, drift, paths, x0, target, precis, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_policy_gradients_match():
    """Gradients w.r.t. the production-trainable policy leaves (z, q_mu,
    raw_lengthscales — models/builders.py policy_mask; everything else is
    frozen in the loop) match the unfused composition."""
    drift, policy, paths, x0, target, precis = _setup()

    def rebuild(z, q_mu, raw_ls):
        kern = dataclasses.replace(policy.kernel, raw_lengthscales=raw_ls)
        return dataclasses.replace(policy, z=z, q_mu=q_mu, kernel=kern)

    def loss_fused(z, q_mu, raw_ls):
        pol_model = rebuild(z, q_mu, raw_ls)
        return _fused(pol_model, drift, paths, x0, target, precis, interpret=True).mean()

    def loss_unfused(z, q_mu, raw_ls):
        pol_model = rebuild(z, q_mu, raw_ls)
        return _unfused_loss(pol_model, drift, paths, x0, target, precis).mean()

    args = (policy.z, policy.q_mu, policy.kernel.raw_lengthscales)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
    g_want = jax.grad(loss_unfused, argnums=(0, 1, 2))(*args)

    # atol 2e-3 on the normalized gradient: f32 accumulation noise over the
    # T-step recomputation + the A-S-ndtr-forward/exact-pdf-backward pairing
    # measured at ~8e-4; a structural adjoint error would be O(1) off.
    for name, a, b in zip(("z", "q_mu", "raw_ls"), g_fused, g_want):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-3, err_msg=name)


def test_frozen_drift_guard():
    """Differentiating w.r.t. drift params must raise, not silently zero."""
    drift, policy, paths, x0, target, precis = _setup()

    def loss_wrt_drift(dm):
        return _fused(policy, dm, paths, x0, target, precis, interpret=True).mean()

    with pytest.raises(NotImplementedError):
        jax.grad(loss_wrt_drift)(drift)


def test_padding_consistency():
    """Non-multiple-of-TILE_S batch: padded lanes must not pollute real ones."""
    drift, policy, paths, x0, target, precis = _setup()
    s_small = 37
    paths_small = jax.tree.map(
        lambda a: a[:s_small] if a.shape[0] == S else a, paths
    )
    paths_small = dataclasses.replace(
        paths_small, omega=paths.omega, phase=paths.phase
    )
    ref = _fused(policy, drift, paths_small, x0[:s_small], target, precis, reference=True)
    got = _fused(policy, drift, paths_small, x0[:s_small], target, precis, interpret=True)
    assert got.shape == (s_small,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


def _models_lck(config):
    """Double-pendulum-shaped: 2-D action, coregionalized policy (Lp=2 -> U=2)
    AND drift (Ld=3 -> D=4)."""
    u_dim, lp, ld = 2, 2, 3
    dxu = DE + u_dim
    kern_d = RBF.create(
        jnp.asarray([0.8, 1.1, 0.9], config.dtype),
        0.9 + 0.4 * jax.random.uniform(config.next_key(), (ld, dxu), dtype=config.dtype),
    )
    # 0.5-scaled mixing keeps the test rollout out of the strongly chaotic
    # regime: gradient parity is checked against f32 round-off amplification
    # (the f64 check gives 1e-4 agreement, so larger deviations here are
    # noise, not adjoint bugs — but keep them small enough to assert on)
    wd = 0.5 * jax.random.normal(config.next_key(), (D, ld), dtype=config.dtype)
    drift = SVGP(
        kernel=kern_d,
        z=jax.random.normal(config.next_key(), (ld, M, dxu), dtype=config.dtype),
        q_mu=0.3 * jax.random.normal(config.next_key(), (M, ld), dtype=config.dtype),
        q_sqrt=0.1 * jnp.broadcast_to(jnp.eye(M, dtype=config.dtype), (ld, M, M)),
        mean_const=jnp.asarray([0.05, -0.02, 0.01, 0.03], config.dtype),
        raw_noise=jnp.asarray(-3.0, config.dtype),
        w=wd,
        whiten=True,
    )
    kern_p = RBF.create(
        jnp.asarray([0.7, 1.2], config.dtype),
        1.2 + 0.3 * jax.random.uniform(config.next_key(), (lp, DE), dtype=config.dtype),
    )
    wp = jax.random.normal(config.next_key(), (u_dim, lp), dtype=config.dtype)
    policy = SVGP(
        kernel=kern_p,
        z=jax.random.normal(config.next_key(), (lp, MP, DE), dtype=config.dtype),
        q_mu=0.5 * jax.random.normal(config.next_key(), (MP, lp), dtype=config.dtype),
        q_sqrt=jnp.zeros((lp, MP, MP), config.dtype),
        mean_const=jnp.zeros((u_dim,), config.dtype),
        raw_noise=jnp.asarray(0.5, config.dtype),
        w=wp,
        whiten=True,
    )
    return drift, policy


def _setup_lck(seed=17):
    config = TestConfig(seed=seed, dtype=jnp.float32)
    drift, policy = _models_lck(config)
    target, precis = _task(config)
    paths = generate_paths_svgp(drift, config.next_key(), S, B)
    x0 = jnp.pi + 0.3 * jax.random.normal(config.next_key(), (S, D), dtype=config.dtype)
    return drift, policy, paths, x0, target, precis


def test_lck_reference_matches_unfused():
    """Coregionalized policy AND drift (double-pendulum shape) through the
    unfused composition vs the kernel's reference restatement."""
    drift, policy, paths, x0, target, precis = _setup_lck()
    want = _unfused_loss(policy, drift, paths, x0, target, precis)
    got = _fused(policy, drift, paths, x0, target, precis, reference=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_lck_interpret_kernel_and_gradients():
    drift, policy, paths, x0, target, precis = _setup_lck()
    ref = _fused(policy, drift, paths, x0, target, precis, reference=True)
    got = _fused(policy, drift, paths, x0, target, precis, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)

    def rebuild(z, q_mu, raw_ls):
        kern = dataclasses.replace(policy.kernel, raw_lengthscales=raw_ls)
        return dataclasses.replace(policy, z=z, q_mu=q_mu, kernel=kern)

    def loss_fused(z, q_mu, raw_ls):
        pol = rebuild(z, q_mu, raw_ls)
        return _fused(pol, drift, paths, x0, target, precis, interpret=True).mean()

    def loss_unfused(z, q_mu, raw_ls):
        pol = rebuild(z, q_mu, raw_ls)
        return _unfused_loss(pol, drift, paths, x0, target, precis).mean()

    args = (policy.z, policy.q_mu, policy.kernel.raw_lengthscales)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
    g_want = jax.grad(loss_unfused, argnums=(0, 1, 2))(*args)
    for name, a, b in zip(("z", "q_mu", "raw_ls"), g_fused, g_want):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-3, err_msg=name)


def test_gpr_drift_fused_matches_unfused():
    """Exact-GPR drift (HMC hyperposterior-ensemble member shape): fused
    whole-rollout vs the unfused PathwiseGPRTransform composition."""
    from gpflowpilco_tpu.models.gp import GPR
    from gpflowpilco_tpu.models.pathwise import (
        PathwiseGPRTransform,
        generate_paths_gpr,
    )

    config = TestConfig(seed=23, dtype=jnp.float32)
    n, dxu = 40, DE + 1
    kern = RBF.create(
        jnp.asarray(0.9, config.dtype),
        0.8 + 0.4 * jax.random.uniform(config.next_key(), (dxu,), dtype=config.dtype),
    )
    drift = GPR(
        kernel=kern,
        x=jax.random.normal(config.next_key(), (n, dxu), config.dtype),
        y=0.3 * jax.random.normal(config.next_key(), (n, D), config.dtype),
        mean_const=jnp.asarray([0.02, -0.01, 0.0, 0.01], config.dtype),
        raw_noise=jnp.asarray(-2.0, config.dtype),
    )
    _, policy = _models(config)
    target, precis = _task(config)
    paths = generate_paths_gpr(drift, config.next_key(), S, B)
    x0 = jnp.pi + 0.2 * jax.random.normal(config.next_key(), (S, D), config.dtype)

    encoder = Encoder(transform=SinCos(), active_dims=ACTIVE)
    objective = GaussianObjective(target=target, precis=precis)
    pol = Chain(
        SquashedProbit(scale=jnp.asarray(2.0 * ACTION_SCALE - 1e-5, x0.dtype)),
        SVGPTransform(model=policy, deterministic=True).with_cache(),
    )
    drift_fn = PathwiseGPRTransform(model=drift, paths=paths)

    def f(t, x):
        return forward_concrete(x, drift_fn, policy=pol, encoder=encoder)

    def acc(t, x, loss):
        return loss + objective(encoder(x))

    _, want, _ = euler_rollout(
        f, x0, dt=1.0, num_steps=NUM_STEPS,
        accumulate=acc, acc_init=jnp.zeros((x0.shape[0],), x0.dtype),
    )
    got = _fused(policy, drift, paths, x0, target, precis, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_loop_fused_rollout_parity_and_update():
    """PathwisePILCO with use_fused_rollout: the policy loss matches the
    unfused path at the same key (identical sampling), and update_policy
    (multistart -> vmapped kernel) runs to a finite loss."""
    import pathlib
    import sys

    sys.path.insert(
        0,
        str(pathlib.Path(__file__).resolve().parents[1] / "examples" / "cartpole_swingup"),
    )
    from experiment import build_loop

    from gpflowpilco_tpu.loops.pilco import DriftSpec, PathwisePILCO, PolicySpec

    loop = build_loop(
        PathwisePILCO,
        None,
        seed=7,
        drift_spec=DriftSpec(num_centers=6, max_iters=10, pad_data_multiple=0),
        policy_spec=PolicySpec(
            num_centers=5, step_limit=10, batch_size=8, num_bases=16, num_restarts=2
        ),
        horizon=0.8,  # 8 steps
        validation_samples=2,
        dtype=jnp.float32,
    )
    loop.step()
    loop.update_dynamics()
    loop.policy_model = loop.build_policy()
    key = jax.random.PRNGKey(3)

    loop.use_fused_rollout = False
    want = loop.policy_loss_fn(loop.policy_model, key)
    loop.use_fused_rollout = True
    assert loop._fused_rollout_eligible(loop.drift_model, loop.policy_model)
    got = loop.policy_loss_fn(loop.policy_model, key)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4, atol=2e-4)

    info = loop.update_policy()
    assert np.isfinite(info["loss"])


def test_loop_fused_rollout_hmc_ensemble():
    """HMC GPR-ensemble drift + fused rollout: the vmapped member losses run
    through the kernel (interpret on CPU) and update_policy stays finite."""
    import pathlib
    import sys

    sys.path.insert(
        0,
        str(pathlib.Path(__file__).resolve().parents[1] / "examples" / "cartpole_swingup"),
    )
    from experiment import build_loop

    from gpflowpilco_tpu.loops.pilco import DriftSpec, PathwisePILCO, PolicySpec

    loop = build_loop(
        PathwisePILCO,
        None,
        seed=9,
        drift_spec=DriftSpec(
            num_centers=6, max_iters=10, pad_data_multiple=0,
            optimizer="hmc", model_type="gpr", hmc_chains=2, hmc_warmup=5,
            hmc_samples=5, hmc_leapfrog=4, hmc_ensemble=2,
        ),
        policy_spec=PolicySpec(
            num_centers=5, step_limit=6, batch_size=8, num_bases=16, num_restarts=1
        ),
        horizon=0.5,  # 5 steps
        validation_samples=2,
        dtype=jnp.float32,
    )
    loop.use_fused_rollout = True
    loop.step()
    loop.update_dynamics()
    from gpflowpilco_tpu.models.gp import GPREnsemble

    assert isinstance(loop.drift_model, GPREnsemble)
    loop.policy_model = loop.build_policy()
    member0 = jax.tree.map(lambda a: a[0], loop.drift_model.members)
    assert loop._fused_rollout_eligible(member0, loop.policy_model)
    info = loop.update_policy()
    assert np.isfinite(info["loss"])


def test_rollout_kernel_lowers_for_tpu():
    """AOT Mosaic lowering of the whole-rollout kernel (value+grad w.r.t. the
    trainable policy leaves) — catches Mosaic-unsupported primitives without a
    chip. Mosaic is 32-bit only, so the check runs in an x64-free subprocess
    (same pattern as test_mm_match_pallas.test_whole_match_lowers_for_tpu)."""
    import os
    import pathlib
    import subprocess
    import sys as _sys

    script = r"""
import dataclasses
import jax
jax.config.update("jax_platforms", "cpu")
from tests.test_rollout_pallas import _setup, _setup_lck, _fused

for setup in (_setup, _setup_lck):
    drift, policy, paths, x0, target, precis = setup()

    def loss(z, q_mu, raw_ls, policy=policy, drift=drift, paths=paths, x0=x0):
        kern = dataclasses.replace(policy.kernel, raw_lengthscales=raw_ls)
        pol = dataclasses.replace(policy, z=z, q_mu=q_mu, kernel=kern)
        return _fused(pol, drift, paths, x0, target, precis).mean()

    f = jax.value_and_grad(loss, argnums=(0, 1, 2))
    args = (policy.z, policy.q_mu, policy.kernel.raw_lengthscales)
    jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",))
print("LOWER_OK")
"""
    env = {k: v for k, v in os.environ.items() if k != "JAX_ENABLE_X64"}
    repo_root = str(pathlib.Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [_sys.executable, "-c", script], capture_output=True, text=True,
        timeout=540, env=env,
    )
    assert "LOWER_OK" in res.stdout, res.stderr[-3000:]
