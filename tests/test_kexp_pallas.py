"""Fused eKuffu pair-grid kernel: value + gradient parity vs the XLA path.

Runs the Pallas kernel in TPU interpret mode on CPU (same pattern as
test_path_eval_pallas.py)."""
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
    x = np.asarray(
        jax.random.normal(config.next_key(), (40, d), dtype=config.dtype)
    )
    y = np.asarray(
        jax.random.normal(config.next_key(), (40, num_latent), dtype=config.dtype)
    )
    model = build_svgp(
        x, y, num_inducing=num_m, key=config.next_key(),
        coregionalize=coreg, noise_variance=0.1,
    )
    # non-trivial q so the variational quadratics matter
    import dataclasses

    q_mu = 0.5 * jax.random.normal(
        config.next_key(), model.q_mu.shape, config.dtype
    )
    model = dataclasses.replace(model, q_mu=q_mu)
    mx = jnp.asarray([0.3, -0.2, 0.5, 0.1][:d], config.dtype)[None]
    a = jax.random.normal(config.next_key(), (d, d), config.dtype)
    sxx = (0.05 * (a @ a.T) + 0.2 * jnp.eye(d, dtype=config.dtype))[None]
    return model, GaussianMoments(mean=mx, cov=sxx)


@pytest.mark.parametrize("coreg", [False, True])
@pytest.mark.parametrize("deterministic", [False, True])
def test_fused_match_parity(coreg, deterministic):
    model, x = _setup(coreg=coreg)
    ref = SVGPTransform(model=model, deterministic=deterministic).with_cache()
    with pltpu.force_tpu_interpret_mode():
        fused = SVGPTransform(
            model=model, deterministic=deterministic, fused=True
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


def test_fused_match_gradients():
    """Cotangents must flow to the state moments AND the model parameters
    (policy optimization differentiates both)."""
    model, x = _setup()

    def scalar_fn(transform_builder, model, mean, cov):
        t = transform_builder(model)
        m = t.moment_match(GaussianMoments(mean=mean, cov=cov))
        return (
            jnp.sum(m.y.mean)
            + jnp.sum(m.y.cov * jnp.cos(jnp.arange(m.y.cov.size).reshape(m.y.cov.shape)))
            + jnp.sum(m.cross_covariance(preinv=True))
        )

    args = (model, x.mean, x.cov)
    g_ref = jax.grad(
        lambda m, mu, s: scalar_fn(
            lambda mm: SVGPTransform(model=mm).with_cache(), m, mu, s
        ),
        argnums=(0, 1, 2),
    )(*args)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(
            lambda m, mu, s: scalar_fn(
                lambda mm: SVGPTransform(model=mm, fused=True).with_cache(),
                m, mu, s,
            ),
            argnums=(0, 1, 2),
        )(*args)

    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_r), rtol=1e-6, atol=1e-9
    )


def test_fused_match_vmapped():
    """The kernel must batch (multi-start policy opt vmaps whole matches)."""
    model, x = _setup()
    ref = SVGPTransform(model=model).with_cache()
    means = jnp.stack([x.mean, x.mean + 0.1, x.mean - 0.2])  # (3, 1, D)
    covs = jnp.stack([x.cov, 1.5 * x.cov, 2.0 * x.cov])
    with pltpu.force_tpu_interpret_mode():
        fused = SVGPTransform(model=model, fused=True).with_cache()
        out_f = jax.vmap(
            lambda m, s: fused.moment_match(GaussianMoments(mean=m, cov=s)).y.cov
        )(means, covs)
    out_r = jax.vmap(
        lambda m, s: ref.moment_match(GaussianMoments(mean=m, cov=s)).y.cov
    )(means, covs)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), rtol=1e-7)


def test_fused_gpr_match_parity_and_grads():
    """GPR variant of the fused contraction (the HMC-ensemble drift path)."""
    from gpflowpilco_tpu.models.builders import build_gpr
    from gpflowpilco_tpu.moment_matching.gp import GPRTransform

    config = TestConfig(seed=11)
    d = 4
    x_data = np.asarray(
        jax.random.normal(config.next_key(), (23, d), dtype=config.dtype)
    )
    y_data = np.asarray(
        jax.random.normal(config.next_key(), (23, 3), dtype=config.dtype)
    )
    model = build_gpr(x_data, y_data, noise_variance=0.05)
    mx = jnp.asarray([0.2, -0.4, 0.1, 0.6], config.dtype)[None]
    a = jax.random.normal(config.next_key(), (d, d), config.dtype)
    sxx = (0.04 * (a @ a.T) + 0.15 * jnp.eye(d, dtype=config.dtype))[None]
    x = GaussianMoments(mean=mx, cov=sxx)

    ref = GPRTransform(model=model).with_cache().moment_match(x)
    with pltpu.force_tpu_interpret_mode():
        fm = GPRTransform(model=model, fused=True).with_cache().moment_match(x)
    np.testing.assert_allclose(np.asarray(fm.y.mean), np.asarray(ref.y.mean), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(fm.y.cov), np.asarray(ref.y.cov), rtol=1e-7, atol=1e-12
    )

    def scalar(m, mu, s, fused):
        t = GPRTransform(model=m, fused=fused).with_cache()
        mm = t.moment_match(GaussianMoments(mean=mu, cov=s))
        return jnp.sum(mm.y.cov) + jnp.sum(mm.y.mean)

    g_ref = jax.grad(lambda m, mu, s: scalar(m, mu, s, False), argnums=(0, 1, 2))(
        model, mx, sxx
    )
    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(lambda m, mu, s: scalar(m, mu, s, True), argnums=(0, 1, 2))(
            model, mx, sxx
        )
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    ff, _ = jax.flatten_util.ravel_pytree(g_f)
    np.testing.assert_allclose(np.asarray(ff), np.asarray(fr), rtol=1e-6, atol=1e-9)
