"""Tests for forward composition and scan solvers."""
import jax
import jax.numpy as jnp
import numpy as np

from gpflowpilco_tpu.components import trigonometric_encoder
from gpflowpilco_tpu.dynamics.forward import forward_concrete, forward_moments
from gpflowpilco_tpu.dynamics.solvers import (
    euler_rollout,
    moment_matching_euler_rollout,
)
from gpflowpilco_tpu.models.gp import SVGP
from gpflowpilco_tpu.models.kernels import RBF
from gpflowpilco_tpu.moments import GaussianMoments
from gpflowpilco_tpu.moment_matching.gp import SVGPTransform
from gpflowpilco_tpu.moment_matching.rules import MatVec

from .utils import TestConfig, allclose, draw_samples_mvn, generate_covariance

NUM_SAMPLES = 200_000


def test_forward_moments_affine_composition_exact():
    """encoder=trig, policy & drift affine: the conditional-expectation composition
    is exact, so one MM-Euler step must match MC to MC error."""
    config = TestConfig(seed=42, num_samples=NUM_SAMPLES)
    d = 4
    enc = trigonometric_encoder(active_dims=(1,))
    de = d + 1  # encoded dim
    u_dim = 1
    a_pol = jax.random.normal(config.next_key(), (u_dim, de), dtype=config.dtype)
    policy = MatVec(matrix=0.3 * a_pol)
    a_drift = jax.random.normal(config.next_key(), (d, de + u_dim), dtype=config.dtype)
    drift = MatVec(matrix=0.2 * a_drift)

    mx = jax.random.normal(config.next_key(), (1, d), dtype=config.dtype)
    sxx = generate_covariance(config.next_key(), d, batch_shape=(1,), scale=0.3)
    x = GaussianMoments(mean=mx, cov=sxx)

    dt = 0.1
    final, _, _, _ = moment_matching_euler_rollout(
        lambda t, xm: forward_moments(xm, drift, policy=policy, encoder=enc),
        x,
        dt=dt,
        num_steps=1,
    )

    xs = draw_samples_mvn(config.next_key(), mx, sxx, NUM_SAMPLES)[:, 0, :]
    f = forward_concrete(xs, drift, policy=policy, encoder=enc)
    xs_new = xs + dt * f
    mc_mean = jnp.mean(xs_new, 0)
    dxs = xs_new - mc_mean
    mc_cov = dxs.T @ dxs / NUM_SAMPLES

    assert allclose(final.mean[0], mc_mean, rtol=config.rtol, atol=config.atol)
    assert allclose(final.cov[0], mc_cov, rtol=config.rtol, atol=config.atol)


def test_forward_moments_gp_drift_tracks_mc():
    """Full encoder+policy+GP-drift composition: approximate; must track MC of the
    deterministic posterior-mean dynamics within a loose bound."""
    config = TestConfig(seed=43, num_samples=100_000)
    d = 4
    enc = trigonometric_encoder(active_dims=(1,))
    de = d + 1
    u_dim = 1
    policy = MatVec(matrix=0.3 * jax.random.normal(config.next_key(), (u_dim, de), dtype=config.dtype))

    from gpflowpilco_tpu.utils import bijectors as bij

    num_latent, m = d, 10
    kernel = RBF.create(
        jnp.full((num_latent,), 0.5), jnp.full((num_latent, de + u_dim), 1.5)
    )
    z = jax.random.normal(config.next_key(), (num_latent, m, de + u_dim), dtype=config.dtype)
    q_mu = 0.3 * jax.random.normal(config.next_key(), (m, num_latent), dtype=config.dtype)
    drift_model = SVGP(
        kernel=kernel, z=z, q_mu=q_mu,
        q_sqrt=0.01 * jnp.eye(m)[None].repeat(num_latent, 0),
        mean_const=jnp.zeros((num_latent,)),
        raw_noise=bij.positive_inv(jnp.asarray(1e-4)),
        w=None, whiten=True,
    )
    drift = SVGPTransform(model=drift_model, deterministic=True)

    mx = jax.random.normal(config.next_key(), (1, d), dtype=config.dtype)
    sxx = generate_covariance(config.next_key(), d, batch_shape=(1,), scale=0.05)
    x = GaussianMoments(mean=mx, cov=sxx)

    match = forward_moments(x, drift, policy=policy, encoder=enc)

    xs = draw_samples_mvn(config.next_key(), mx, sxx, config.num_samples)[:, 0, :]
    fs = forward_concrete(xs, drift, policy=policy, encoder=enc)
    mc_mean = jnp.mean(fs, 0)
    mc_cross = (xs - mx[0]).T @ (fs - mc_mean) / config.num_samples

    scale = float(jnp.max(jnp.abs(mc_mean))) + 1e-6
    np.testing.assert_allclose(
        np.asarray(match.y.mean[0]), np.asarray(mc_mean), atol=0.05 * scale, rtol=0
    )
    cscale = float(jnp.max(jnp.abs(mc_cross))) + 1e-9
    np.testing.assert_allclose(
        np.asarray(match.cross_covariance()[0]),
        np.asarray(mc_cross),
        atol=0.1 * cscale,
        rtol=0,
    )


def test_euler_rollout_accumulates():
    def f(t, x):
        return -x

    def acc(t, x, a):
        return a + jnp.sum(x)

    x0 = jnp.ones((3,))
    xf, total, xs = euler_rollout(f, x0, dt=0.1, num_steps=10, accumulate=acc, acc_init=0.0)
    assert xs.shape == (10, 3)
    np.testing.assert_allclose(np.asarray(xf), 0.9**10 * np.ones(3), rtol=1e-12)
    np.testing.assert_allclose(float(total), float(3 * sum(0.9**k for k in range(1, 11))), rtol=1e-12)


def test_forward_moments_policy_without_encoder():
    """The encoder-free policy+drift case — the configuration where the
    reference's preinv path has a latent dimension bug (forward_sde.py:56-62);
    exact for affine maps, so MC parity must hold."""
    config = TestConfig(seed=44, num_samples=NUM_SAMPLES)
    d, u = 3, 2
    policy = MatVec(matrix=0.4 * jax.random.normal(config.next_key(), (u, d), dtype=config.dtype))
    drift = MatVec(matrix=0.25 * jax.random.normal(config.next_key(), (d, d + u), dtype=config.dtype))

    mx = jax.random.normal(config.next_key(), (1, d), dtype=config.dtype)
    sxx = generate_covariance(config.next_key(), d, batch_shape=(1,), scale=0.4)
    x = GaussianMoments(mean=mx, cov=sxx)

    match = forward_moments(x, drift, policy=policy, encoder=None)

    xs = draw_samples_mvn(config.next_key(), mx, sxx, NUM_SAMPLES)[:, 0, :]
    fs = forward_concrete(xs, drift, policy=policy, encoder=None)
    mc_mean = jnp.mean(fs, 0)
    mc_cross = (xs - mx[0]).T @ (fs - mc_mean) / NUM_SAMPLES

    assert allclose(match.y.mean[0], mc_mean, rtol=config.rtol, atol=config.atol)
    assert allclose(match.cross_covariance()[0], mc_cross, rtol=config.rtol, atol=config.atol)


def test_mm_euler_noise_branch():
    """Diffusion contributes sqrt(dt)(Sxz+Szx) + dt Szz — the corrected form of
    the reference's dead noise branch (solvers.py:125-133)."""
    from gpflowpilco_tpu.moments import GaussianMatch

    d = 2
    x0 = GaussianMoments(mean=jnp.zeros((1, d)), cov=jnp.eye(d)[None])

    def fwd(t, xm):  # zero drift
        zero = jnp.zeros((1, d))
        return GaussianMatch(
            x=xm, y=GaussianMoments(mean=zero, cov=jnp.zeros((1, d, d))),
            cross=jnp.zeros((1, d, d)), preinv=False,
        )

    szz = jnp.asarray([[0.5, 0.1], [0.1, 0.3]])

    def noise(t, xm):
        return GaussianMatch(
            x=xm, y=GaussianMoments(mean=jnp.zeros((1, d)), cov=szz[None]),
            cross=jnp.zeros((1, d, d)), preinv=False,
        )

    dt = 0.25
    out, _, _, _ = moment_matching_euler_rollout(
        fwd, x0, dt=dt, num_steps=3, noise=noise
    )
    expect = jnp.eye(d) + 3 * dt * szz
    np.testing.assert_allclose(np.asarray(out.cov[0]), np.asarray(expect), rtol=1e-12)


def test_psd_project():
    from gpflowpilco_tpu.moments import psd_project

    cov = jnp.asarray([[[1.0, 0.0], [0.0, -0.3]]])  # indefinite
    x = GaussianMoments(mean=jnp.zeros((1, 2)), cov=cov)
    out = psd_project(x, min_eig=1e-6)
    eigs = jnp.linalg.eigvalsh(out.cov[0])
    assert float(eigs.min()) >= 0.0
    # valid input is (numerically) untouched
    good = GaussianMoments(mean=jnp.zeros((1, 2)), cov=jnp.eye(2)[None])
    out2 = psd_project(good)
    np.testing.assert_allclose(np.asarray(out2.cov), np.asarray(good.cov), atol=1e-12)
    # gradients flow through the covariance, not the boost
    def f(c):
        return jnp.sum(psd_project(GaussianMoments(jnp.zeros((1, 2)), c)).cov)
    g = jax.grad(f)(cov)
    assert bool(jnp.all(jnp.isfinite(g)))
