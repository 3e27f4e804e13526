"""Whole-match fused kernel (ops/mm_match_pallas.py): value + gradient parity
vs the XLA match path, in TPU interpret mode on CPU (pattern of
test_kexp_pallas.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gpflowpilco_tpu.models.builders import build_svgp
from gpflowpilco_tpu.moments import GaussianMoments
from gpflowpilco_tpu.moment_matching.gp import SVGPTransform

from .utils import TestConfig


def _setup(num_latent=3, num_m=17, d=4, seed=3, coreg=False):
    config = TestConfig(seed=seed)
    x = np.asarray(jax.random.normal(config.next_key(), (40, d), dtype=config.dtype))
    y = np.asarray(
        jax.random.normal(config.next_key(), (40, num_latent), dtype=config.dtype)
    )
    model = build_svgp(
        x, y, num_inducing=num_m, key=config.next_key(),
        coregionalize=coreg, noise_variance=0.1,
    )
    q_mu = 0.5 * jax.random.normal(config.next_key(), model.q_mu.shape, config.dtype)
    model = dataclasses.replace(model, q_mu=q_mu)
    mx = jnp.asarray([0.3, -0.2, 0.5, 0.1][:d], config.dtype)[None]
    a = jax.random.normal(config.next_key(), (d, d), config.dtype)
    sxx = (0.05 * (a @ a.T) + 0.2 * jnp.eye(d, dtype=config.dtype))[None]
    return model, GaussianMoments(mean=mx, cov=sxx)


@pytest.mark.parametrize("coreg", [False, True])
@pytest.mark.parametrize("deterministic", [False, True])
def test_whole_match_parity(coreg, deterministic):
    model, x = _setup(coreg=coreg)
    ref = SVGPTransform(model=model, deterministic=deterministic).with_cache()
    with pltpu.force_tpu_interpret_mode():
        fused = SVGPTransform(
            model=model, deterministic=deterministic, fused_match=True
        ).with_cache()
        mf = fused.moment_match(x)
    mr = ref.moment_match(x)
    np.testing.assert_allclose(
        np.asarray(mf.y.mean), np.asarray(mr.y.mean), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(mf.y.cov), np.asarray(mr.y.cov), rtol=1e-7, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(mf.cross_covariance(preinv=True)),
        np.asarray(mr.cross_covariance(preinv=True)),
        rtol=1e-8, atol=1e-12,
    )


def _scalar_fn(transform_builder, model, mean, cov):
    t = transform_builder(model)
    m = t.moment_match(GaussianMoments(mean=mean, cov=cov))
    return (
        jnp.sum(m.y.mean)
        + jnp.sum(m.y.cov * jnp.cos(jnp.arange(m.y.cov.size).reshape(m.y.cov.shape)))
        + jnp.sum(m.cross_covariance(preinv=True))
    )


def test_whole_match_full_gradients():
    """frozen=False: cotangents must reach the model parameters AND the state
    moments, matching the XLA path elementwise."""
    model, x = _setup()
    args = (model, x.mean, x.cov)
    g_ref = jax.grad(
        lambda m, mu, s: _scalar_fn(
            lambda mm: SVGPTransform(model=mm).with_cache(), m, mu, s
        ),
        argnums=(0, 1, 2),
    )(*args)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(
            lambda m, mu, s: _scalar_fn(
                lambda mm: SVGPTransform(model=mm, fused_match=True).with_cache(),
                m, mu, s,
            ),
            argnums=(0, 1, 2),
        )(*args)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_r), rtol=1e-6, atol=1e-9
    )


def test_whole_match_frozen_gradients():
    """frozen=True (the drift-inside-policy-optimization case): moment
    gradients match the XLA path; model cotangents are hard zeros."""
    model, x = _setup()
    g_ref = jax.grad(
        lambda mu, s: _scalar_fn(
            lambda mm: SVGPTransform(model=mm).with_cache(), model, mu, s
        ),
        argnums=(0, 1),
    )(x.mean, x.cov)
    with pltpu.force_tpu_interpret_mode():
        g_frozen = jax.grad(
            lambda m, mu, s: _scalar_fn(
                lambda mm: SVGPTransform(
                    model=mm, fused_match=True, frozen=True
                ).with_cache(),
                m, mu, s,
            ),
            argnums=(0, 1, 2),
        )(model, x.mean, x.cov)
    np.testing.assert_allclose(
        np.asarray(g_frozen[1]), np.asarray(g_ref[0]), rtol=1e-7, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(g_frozen[2]), np.asarray(g_ref[1]), rtol=1e-7, atol=1e-10
    )
    # everything that flows through the kernel gets hard-zero cotangents;
    # mean_const is added outside the kernel so its (exact) gradient survives
    zeroed = dataclasses.replace(
        g_frozen[0], mean_const=jnp.zeros_like(g_frozen[0].mean_const)
    )
    model_cots, _ = jax.flatten_util.ravel_pytree(zeroed)
    assert float(jnp.max(jnp.abs(model_cots))) == 0.0
    np.testing.assert_allclose(
        np.asarray(g_frozen[0].mean_const),
        np.ones_like(np.asarray(g_frozen[0].mean_const)),
    )


def test_whole_match_vmapped():
    """Multi-start policy optimization vmaps whole matches over candidates."""
    model, x = _setup()
    ref = SVGPTransform(model=model).with_cache()
    means = jnp.stack([x.mean, x.mean + 0.1, x.mean - 0.2])
    covs = jnp.stack([x.cov, 1.5 * x.cov, 2.0 * x.cov])
    with pltpu.force_tpu_interpret_mode():
        fused = SVGPTransform(model=model, fused_match=True, frozen=True).with_cache()
        out_f = jax.vmap(
            lambda m, s: fused.moment_match(GaussianMoments(mean=m, cov=s)).y.cov
        )(means, covs)
    out_r = jax.vmap(
        lambda m, s: ref.moment_match(GaussianMoments(mean=m, cov=s)).y.cov
    )(means, covs)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), rtol=1e-7)


def test_whole_match_rollout_loss_parity():
    """End-to-end: a 3-step moment-matched rollout loss and its policy-moment
    gradient agree between the fused drift match and the XLA drift match."""
    from gpflowpilco_tpu.dynamics.forward import forward_moments
    from gpflowpilco_tpu.dynamics.solvers import moment_matching_euler_rollout

    model, x = _setup(num_latent=4, d=4)

    def loss(mean, cov, fused_match):
        drift = SVGPTransform(
            model=model, fused_match=fused_match, frozen=fused_match
        ).with_cache()

        def fwd(t, xm):
            return forward_moments(xm, drift)

        def acc(t, xm, l):
            return l + jnp.sum(xm.mean ** 2) + jnp.sum(jnp.diagonal(
                xm.cov, axis1=-2, axis2=-1))

        x0 = GaussianMoments(mean=mean, cov=cov)
        _, out, _, _ = moment_matching_euler_rollout(
            fwd, x0, dt=0.1, num_steps=3, accumulate=acc,
            acc_init=jnp.zeros((), mean.dtype),
        )
        return out

    v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(x.mean, x.cov, False)
    with pltpu.force_tpu_interpret_mode():
        v_f, g_f = jax.value_and_grad(loss, argnums=(0, 1))(x.mean, x.cov, True)
    np.testing.assert_allclose(float(v_f), float(v_ref), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_ref[0]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_f[1]), np.asarray(g_ref[1]), rtol=1e-6, atol=1e-10
    )


def test_whole_match_in_loop_interpret():
    """use_fused_match drives a full MM PILCO iteration (policy match with the
    full adjoint + frozen drift match) — tiny sizes, interpret mode."""
    import pathlib
    import sys

    sys.path.insert(
        0,
        str(pathlib.Path(__file__).resolve().parents[1] / "examples" / "cartpole_swingup"),
    )
    from experiment import build_loop

    from gpflowpilco_tpu.loops.pilco import DriftSpec, MomentMatchingPILCO, PolicySpec

    loop = build_loop(
        MomentMatchingPILCO,
        None,
        seed=5,
        drift_spec=DriftSpec(num_centers=6, max_iters=10, pad_data_multiple=0),
        policy_spec=PolicySpec(
            num_centers=5, step_limit=4, batch_size=8, num_bases=16, num_restarts=2
        ),
        horizon=0.5,  # 5 steps
        validation_samples=1,
    )
    loop.use_fused_match = True
    with pltpu.force_tpu_interpret_mode():
        loop.step()
        info_d = loop.update_dynamics()
        assert np.isfinite(info_d["loss"])
        info_p = loop.update_policy()
        assert np.isfinite(info_p["loss"])


def test_whole_match_lowers_for_tpu():
    """AOT-lower the jitted match (value+grad, both variants, vmapped) for the
    TPU platform: catches Mosaic-unsupported primitives (scatter, gather from
    mixed slice+None indexing, dynamic_update_slice) without a chip. Mosaic is
    32-bit only (and lowering under x64 mode hits a jax-internal recursion), so
    the check runs in an x64-free subprocess."""
    import pathlib
    import subprocess
    import sys as _sys

    script = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from gpflowpilco_tpu.models.builders import build_svgp
from gpflowpilco_tpu.moments import GaussianMoments
from gpflowpilco_tpu.moment_matching.gp import SVGPTransform

ks = jax.random.split(jax.random.PRNGKey(3), 8)
x_data = np.asarray(jax.random.normal(ks[0], (40, 4)))
y_data = np.asarray(jax.random.normal(ks[1], (40, 3)))
model = build_svgp(x_data, y_data, num_inducing=17, key=ks[2], noise_variance=0.1)
mx = jnp.asarray([0.3, -0.2, 0.5, 0.1], jnp.float32)[None]
a = jax.random.normal(ks[4], (4, 4), jnp.float32)
sxx = (0.05 * (a @ a.T) + 0.2 * jnp.eye(4, dtype=jnp.float32))[None]

def scalar(mu, s, frozen):
    t = SVGPTransform(model=model, fused_match=True, frozen=frozen).with_cache()
    m = t.moment_match(GaussianMoments(mean=mu, cov=s))
    return jnp.sum(m.y.mean) + jnp.sum(m.y.cov) + jnp.sum(m.cross_covariance(preinv=True))

for frozen in (True, False):
    f = jax.value_and_grad(lambda mu, s: scalar(mu, s, frozen), argnums=(0, 1))
    jax.jit(f).trace(mx, sxx).lower(lowering_platforms=("tpu",))
fv = jax.vmap(jax.value_and_grad(lambda mu, s: scalar(mu, s, True), argnums=(0, 1)))
jax.jit(fv).trace(jnp.tile(mx[None], (3, 1, 1)), jnp.tile(sxx[None], (3, 1, 1, 1))).lower(
    lowering_platforms=("tpu",))
print("LOWER_OK")
"""
    import os

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


def test_gpr_whole_match_parity_and_grads():
    """GPR variant (HMC-ensemble drift path): parity + moment gradients."""
    from gpflowpilco_tpu.models.builders import build_gpr
    from gpflowpilco_tpu.moment_matching.gp import GPRTransform

    config = TestConfig(seed=11)
    d = 4
    x_data = np.asarray(jax.random.normal(config.next_key(), (23, d), dtype=config.dtype))
    y_data = np.asarray(jax.random.normal(config.next_key(), (23, 3), dtype=config.dtype))
    model = build_gpr(x_data, y_data, noise_variance=0.05)
    mx = jnp.asarray([0.2, -0.4, 0.1, 0.6], config.dtype)[None]
    a = jax.random.normal(config.next_key(), (d, d), config.dtype)
    sxx = (0.04 * (a @ a.T) + 0.15 * jnp.eye(d, dtype=config.dtype))[None]
    x = GaussianMoments(mean=mx, cov=sxx)

    for det in (False, True):
        ref = GPRTransform(model=model, deterministic=det).with_cache().moment_match(x)
        with pltpu.force_tpu_interpret_mode():
            fm = (
                GPRTransform(model=model, deterministic=det, fused_match=True)
                .with_cache()
                .moment_match(x)
            )
        np.testing.assert_allclose(
            np.asarray(fm.y.mean), np.asarray(ref.y.mean), rtol=1e-8, atol=1e-11
        )
        np.testing.assert_allclose(
            np.asarray(fm.y.cov), np.asarray(ref.y.cov), rtol=1e-7, atol=1e-11
        )
        np.testing.assert_allclose(
            np.asarray(fm.cross_covariance(preinv=True)),
            np.asarray(ref.cross_covariance(preinv=True)),
            rtol=1e-8, atol=1e-12,
        )

    def scalar(mu, s, fused):
        t = GPRTransform(model=model, fused_match=fused).with_cache()
        m = t.moment_match(GaussianMoments(mean=mu, cov=s))
        return (
            jnp.sum(m.y.mean)
            + jnp.sum(m.y.cov * jnp.cos(jnp.arange(m.y.cov.size).reshape(m.y.cov.shape)))
            + jnp.sum(m.cross_covariance(preinv=True))
        )

    g_ref = jax.grad(lambda mu, s: scalar(mu, s, False), argnums=(0, 1))(mx, sxx)
    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(lambda mu, s: scalar(mu, s, True), argnums=(0, 1))(mx, sxx)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_ref[0]), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_ref[1]), rtol=1e-7, atol=1e-10)


def test_gpr_whole_match_lowers_for_tpu():
    """AOT TPU lowering of the GPR whole-match kernel (x64-free subprocess)."""
    import os
    import pathlib
    import subprocess
    import sys as _sys

    script = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from gpflowpilco_tpu.models.builders import build_gpr
from gpflowpilco_tpu.moments import GaussianMoments
from gpflowpilco_tpu.moment_matching.gp import GPRTransform

ks = jax.random.split(jax.random.PRNGKey(11), 4)
x_data = np.asarray(jax.random.normal(ks[0], (23, 4)))
y_data = np.asarray(jax.random.normal(ks[1], (23, 3)))
model = build_gpr(x_data, y_data, noise_variance=0.05)
mx = jnp.asarray([0.2, -0.4, 0.1, 0.6], jnp.float32)[None]
a = jax.random.normal(ks[2], (4, 4), jnp.float32)
sxx = (0.04 * (a @ a.T) + 0.15 * jnp.eye(4, dtype=jnp.float32))[None]

def scalar(mu, s):
    t = GPRTransform(model=model, fused_match=True).with_cache()
    m = t.moment_match(GaussianMoments(mean=mu, cov=s))
    return jnp.sum(m.y.mean) + jnp.sum(m.y.cov) + jnp.sum(m.cross_covariance(preinv=True))

f = jax.value_and_grad(scalar, argnums=(0, 1))
jax.jit(f).trace(mx, sxx).lower(lowering_platforms=("tpu",))
fv = jax.vmap(jax.value_and_grad(scalar, argnums=(0, 1)))
jax.jit(fv).trace(jnp.tile(mx[None], (3, 1, 1)), jnp.tile(sxx[None], (3, 1, 1, 1))).lower(
    lowering_platforms=("tpu",))
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


def test_gpr_whole_match_ensemble_vmap():
    """The HMC-ensemble MM path vmaps the loss over stacked member transforms —
    the GPR kernel must accept a BATCHED grid (vmap adds a grid dimension to
    every pallas operand)."""
    from gpflowpilco_tpu.models.builders import build_gpr
    from gpflowpilco_tpu.moment_matching.gp import GPRTransform, match_gpr

    config = TestConfig(seed=13)
    d = 4
    x_data = jax.random.normal(config.next_key(), (23, d), dtype=config.dtype)
    y_base = jax.random.normal(config.next_key(), (23, 4), dtype=config.dtype)
    members = jax.vmap(
        lambda s: build_gpr(x_data, y_base * s, noise_variance=0.05)
    )(jnp.asarray([1.0, 1.3], config.dtype))

    mx = jnp.asarray([0.2, -0.4, 0.1, 0.6], config.dtype)[None]
    a = jax.random.normal(config.next_key(), (d, d), config.dtype)
    sxx = (0.04 * (a @ a.T) + 0.15 * jnp.eye(d, dtype=config.dtype))[None]
    x = GaussianMoments(mean=mx, cov=sxx)

    def member_cov(t):
        return t.moment_match(x).y.cov

    ref = jax.vmap(
        lambda m: member_cov(GPRTransform(model=m).with_cache())
    )(members)
    with pltpu.force_tpu_interpret_mode():
        stacked = jax.vmap(
            lambda m: GPRTransform(model=m, fused_match=True).with_cache()
        )(members)
        out = jax.vmap(member_cov)(stacked)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-7, atol=1e-11)


def test_fused_encoder_match_parity_and_grads():
    """Fused trig-encoder match (ops/enc_match_pallas.py) vs the XLA Encoder
    rule: values, moment gradients, vmap."""
    import dataclasses as _dc

    from gpflowpilco_tpu.components import trigonometric_encoder

    config = TestConfig(seed=17)
    d = 4
    enc = trigonometric_encoder(active_dims=(1, 3))
    mx = jax.random.normal(config.next_key(), (2, d), config.dtype)
    a = jax.random.normal(config.next_key(), (2, d, d), config.dtype)
    sxx = 0.3 * jnp.einsum("bij,bkj->bik", a, a) + 0.1 * jnp.eye(d, dtype=config.dtype)
    x = GaussianMoments(mean=mx, cov=sxx)

    ref = enc.moment_match(x)
    fused_enc = _dc.replace(enc, fused=True)
    with pltpu.force_tpu_interpret_mode():
        fm = fused_enc.moment_match(x)
    np.testing.assert_allclose(np.asarray(fm.y.mean), np.asarray(ref.y.mean),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(fm.y.cov), np.asarray(ref.y.cov),
                               rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(fm.cross_covariance(preinv=False)),
        np.asarray(ref.cross_covariance(preinv=False)),
        rtol=1e-11, atol=1e-13,
    )

    def scalar(e, m, s):
        mt = e.moment_match(GaussianMoments(mean=m, cov=s))
        w = jnp.cos(jnp.arange(mt.y.cov.size).reshape(mt.y.cov.shape))
        return (jnp.sum(mt.y.mean) + jnp.sum(w * mt.y.cov)
                + jnp.sum(mt.cross_covariance(preinv=False)))

    g_ref = jax.grad(lambda m, s: scalar(enc, m, s), argnums=(0, 1))(mx, sxx)
    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(lambda m, s: scalar(fused_enc, m, s), argnums=(0, 1))(mx, sxx)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_ref[0]),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_ref[1]),
                               rtol=1e-10, atol=1e-12)

    # edge case: all dims active (no inactive stitch)
    enc_all = _dc.replace(trigonometric_encoder(active_dims=(0, 1, 2, 3)), fused=True)
    ref_all = trigonometric_encoder(active_dims=(0, 1, 2, 3)).moment_match(x)
    with pltpu.force_tpu_interpret_mode():
        fm_all = enc_all.moment_match(x)
    np.testing.assert_allclose(np.asarray(fm_all.y.cov), np.asarray(ref_all.y.cov),
                               rtol=1e-11, atol=1e-13)


def test_fused_encoder_match_lowers_for_tpu():
    import os
    import pathlib
    import subprocess
    import sys as _sys

    script = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
import jax.numpy as jnp
from gpflowpilco_tpu.components import trigonometric_encoder
from gpflowpilco_tpu.moments import GaussianMoments

enc = dataclasses.replace(trigonometric_encoder(active_dims=(1,)), fused=True)
mx = jnp.asarray([[0.3, -0.2, 0.5, 0.1]], jnp.float32)
a = jax.random.normal(jax.random.PRNGKey(0), (4, 4), jnp.float32)
sxx = (0.05 * (a @ a.T) + 0.2 * jnp.eye(4, dtype=jnp.float32))[None]

def scalar(m, s):
    mt = enc.moment_match(GaussianMoments(mean=m, cov=s))
    return jnp.sum(mt.y.mean) + jnp.sum(mt.y.cov) + jnp.sum(mt.cross_covariance(preinv=False))

f = jax.value_and_grad(scalar, argnums=(0, 1))
jax.jit(f).trace(mx, sxx).lower(lowering_platforms=("tpu",))
fv = jax.vmap(jax.value_and_grad(scalar, argnums=(0, 1)))
jax.jit(fv).trace(jnp.tile(mx[None], (3, 1, 1)), jnp.tile(sxx[None], (3, 1, 1, 1))).lower(
    lowering_platforms=("tpu",))
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


def test_fused_glue_psd_and_euler():
    """fused_psd_boost / fused_euler_update (ops/mm_glue_pallas.py) vs the XLA
    psd_project / solver-body math: values (healthy AND indefinite inputs),
    gradients, and the in-kernel Jacobi lambda_min accuracy."""
    from gpflowpilco_tpu.moments import psd_project
    from gpflowpilco_tpu.ops import mm_glue_pallas as glue

    config = TestConfig(seed=23)
    d = 6
    a = jax.random.normal(config.next_key(), (4, d, d), config.dtype)
    spd = 0.2 * jnp.einsum("bij,bkj->bik", a, a) + 0.1 * jnp.eye(d, dtype=config.dtype)
    indef = spd - 0.5 * jnp.eye(d, dtype=config.dtype)  # some negative eigs

    # Jacobi lambda_min accuracy
    lam_ref = jnp.min(jnp.linalg.eigvalsh(indef), axis=-1)
    with pltpu.force_tpu_interpret_mode():
        for b in range(4):
            scal = [[indef[b, i, j] for j in range(d)] for i in range(d)]
            lam = glue._jacobi_min_eig(scal, d)
            np.testing.assert_allclose(float(lam), float(lam_ref[b]), rtol=1e-9)

    # psd boost parity (note: lambda_min enters the value, so parity needs the
    # Jacobi accuracy above)
    for mats in (spd, indef):
        ref = psd_project(GaussianMoments(mean=jnp.zeros((4, d)), cov=mats)).cov
        with pltpu.force_tpu_interpret_mode():
            out = glue.fused_psd_boost(mats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-8,
                                   atol=1e-12)
    g_ref = jax.grad(lambda s: jnp.sum(jnp.cos(psd_project(
        GaussianMoments(mean=jnp.zeros((4, d)), cov=s)).cov)))(indef)
    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(lambda s: jnp.sum(jnp.cos(glue.fused_psd_boost(s))))(indef)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref), rtol=1e-8, atol=1e-12)

    # euler update parity vs the solver body (projection branch)
    mean = jax.random.normal(config.next_key(), (4, d), config.dtype)
    f1 = jax.random.normal(config.next_key(), (4, d), config.dtype)
    sxf = 0.1 * jax.random.normal(config.next_key(), (4, d, d), config.dtype)
    sff = spd * 0.3
    dt, jit_ = 1.0, 1e-6

    def ref_step(m, s, f, sf, sx):
        nm = m + dt * f
        nc = s + dt * (sx + jnp.swapaxes(sx, -1, -2)) + dt**2 * sf
        nc = 0.5 * (nc + jnp.swapaxes(nc, -1, -2))
        lam_min = jnp.min(jnp.linalg.eigvalsh(nc), axis=-1)
        boost = jax.lax.stop_gradient(jnp.maximum(-lam_min, 0.0) + jit_)
        return nm, nc + boost[..., None, None] * jnp.eye(d, dtype=nc.dtype)

    nm_r, nc_r = ref_step(mean, indef, f1, sff, sxf)
    with pltpu.force_tpu_interpret_mode():
        nm_f, nc_f = glue.fused_euler_update(mean, indef, f1, sff, sxf, dt, jit_)
    np.testing.assert_allclose(np.asarray(nm_f), np.asarray(nm_r), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(nc_f), np.asarray(nc_r), rtol=1e-8, atol=1e-12)

    def loss(step, m, s, f, sf, sx):
        nm, nc = step(m, s, f, sf, sx)
        return jnp.sum(jnp.sin(nm)) + jnp.sum(jnp.cos(nc))

    args = (mean, indef, f1, sff, sxf)
    g_ref = jax.grad(lambda *a: loss(ref_step, *a), argnums=(0, 1, 2, 3, 4))(*args)
    with pltpu.force_tpu_interpret_mode():
        g_fu = jax.grad(
            lambda *a: loss(
                lambda *b: glue.fused_euler_update(*b, dt, jit_), *a
            ),
            argnums=(0, 1, 2, 3, 4),
        )(*args)
    for gf, gr in zip(g_fu, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-8,
                                   atol=1e-12)


def test_fused_glue_lowers_for_tpu():
    import os
    import pathlib
    import subprocess
    import sys as _sys

    script = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from gpflowpilco_tpu.ops import mm_glue_pallas as glue

d = 6
a = jax.random.normal(jax.random.PRNGKey(0), (2, d, d), jnp.float32)
s = 0.2 * jnp.einsum("bij,bkj->bik", a, a)
m = jnp.zeros((2, d), jnp.float32)

def f(mm, ss):
    nm, nc = glue.fused_euler_update(mm, ss, mm, ss, 0.1 * ss, 1.0, 1e-6)
    return jnp.sum(nm) + jnp.sum(glue.fused_psd_boost(nc))

jax.jit(jax.value_and_grad(f, argnums=(0, 1))).trace(m, s).lower(
    lowering_platforms=("tpu",))
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
