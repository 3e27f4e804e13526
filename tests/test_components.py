"""MC parity for task components and transform chains.

Mirrors /root/reference/tests/test_components.py (objective expectation, trig encoder
joint moments incl. inactive-dim stitching) and adds an end-to-end squashed-policy
chain test (Scale o Shift o Probit o SVGP-regressor), the composition the reference
exercises only inside the PILCO loop.
"""
import jax
import jax.numpy as jnp
import pytest

from gpflowpilco_tpu.components import Encoder, GaussianObjective, trigonometric_encoder
from gpflowpilco_tpu.models.gp import SVGP
from gpflowpilco_tpu.models.kernels import RBF
from gpflowpilco_tpu.moments import Chain, GaussianMoments
from gpflowpilco_tpu.moment_matching.gp import SVGPTransform
from gpflowpilco_tpu.moment_matching.rules import Probit, Scale, Shift, SinCos

from .utils import TestConfig, allclose, draw_samples_mvn, generate_covariance

NUM_SAMPLES = 250_000


def test_gaussian_objective_expectation():
    config = TestConfig(seed=11, num_samples=NUM_SAMPLES)
    d = 4
    target = jax.random.normal(config.next_key(), (d,), dtype=config.dtype)
    a = jax.random.normal(config.next_key(), (d, d), dtype=config.dtype)
    precis = a @ a.T / d
    objective = GaussianObjective(target=target, precis=precis)

    mx = jax.random.normal(config.next_key(), (2, d), dtype=config.dtype)
    sxx = generate_covariance(config.next_key(), d, batch_shape=(2,), scale=0.3)

    exact = objective(GaussianMoments(mean=mx, cov=sxx))
    xs = draw_samples_mvn(config.next_key(), mx, sxx, NUM_SAMPLES)
    mc = jnp.mean(objective(xs), axis=0)
    assert allclose(exact, mc, rtol=config.rtol, atol=config.atol)


def test_trig_encoder_moments():
    config = TestConfig(seed=13, num_samples=NUM_SAMPLES)
    d = 4
    enc = trigonometric_encoder(active_dims=(1,))
    mx = jax.random.normal(config.next_key(), (2, d), dtype=config.dtype)
    sxx = generate_covariance(config.next_key(), d, batch_shape=(2,), scale=0.5)

    x = GaussianMoments(mean=mx, cov=sxx)
    match = enc.moment_match(x)

    xs = draw_samples_mvn(config.next_key(), mx, sxx, NUM_SAMPLES)  # (S, 2, D)
    ys = enc(xs)  # (S, 2, 5)
    my = jnp.mean(ys, 0)
    dy = ys - my
    syy = jnp.einsum("sni,snj->nij", dy, dy) / NUM_SAMPLES
    dx = xs - jnp.mean(xs, 0)
    sxy = jnp.einsum("sni,snj->nij", dx, dy) / NUM_SAMPLES

    assert match.y.mean.shape == (2, d + 1)
    assert allclose(match.y.mean, my, rtol=config.rtol, atol=config.atol)
    assert allclose(match.y.cov, syy, rtol=config.rtol, atol=config.atol)
    assert allclose(match.cross_covariance(), sxy, rtol=config.rtol, atol=config.atol)


def test_encoder_concrete_layout():
    enc = trigonometric_encoder(active_dims=(1,))
    x = jnp.asarray([1.0, 0.5, -2.0, 3.0])
    got = enc(x)
    want = jnp.asarray([jnp.sin(0.5), jnp.cos(0.5), 1.0, -2.0, 3.0])
    assert allclose(got, want, rtol=1e-12, atol=0)


def test_squash_chain_exact_on_gaussian_input():
    """Scale o Shift o Probit on a Gaussian input is exact (affine rules exact,
    probit moments closed-form): parity with MC at MC tolerance."""
    config = TestConfig(seed=19, num_samples=NUM_SAMPLES)
    d = 2
    squash = Chain(
        Scale(scale=jnp.asarray(20.0 - 1e-5)),
        Shift(shift=jnp.asarray(-0.5)),
        Probit(),
    )
    mx = jax.random.normal(config.next_key(), (2, d), dtype=config.dtype)
    sxx = generate_covariance(config.next_key(), d, batch_shape=(2,), scale=0.8)
    x = GaussianMoments(mean=mx, cov=sxx)
    match = squash.moment_match(x)

    xs = draw_samples_mvn(config.next_key(), mx, sxx, NUM_SAMPLES)
    us = squash(xs)
    mu = jnp.mean(us, 0)
    du = us - mu
    suu = jnp.einsum("sni,snj->nij", du, du) / NUM_SAMPLES
    dx = xs - jnp.mean(xs, 0)
    sxu = jnp.einsum("sni,snj->nij", dx, du) / NUM_SAMPLES

    # values carry the 20x squash scale, so compare relative to the matrix norm
    # (the reference's rtol acts as an absolute tolerance for O(1) values)
    import numpy as np

    def rel_close(a, b):
        scale = float(jnp.max(jnp.abs(b)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=config.rtol * scale
        )

    rel_close(match.y.mean, mu)
    rel_close(match.y.cov, suu)
    rel_close(match.cross_covariance(), sxu)


def test_squashed_policy_chain_moments():
    """Policy = 19.99 * (Phi(g(x)) - 0.5) with g an SVGP kernel regressor — the full
    moment-matched squash of reference swingup_loops.py:84-91.

    The chain treats g(x) as Gaussian (conditional-expectation linearization,
    reference gaussian.py:66-83), so this is an *approximation*; we check it tracks
    MC within a loose tolerance rather than MC error."""
    config = TestConfig(seed=17, num_samples=NUM_SAMPLES)
    d, num_latent, m = 3, 1, 8
    kernel = RBF.create(jnp.ones((num_latent,)), 0.8 * jnp.ones((num_latent, d)))
    z = jax.random.normal(config.next_key(), (num_latent, m, d), dtype=config.dtype)
    q_mu = jax.random.normal(config.next_key(), (m, num_latent), dtype=config.dtype)
    from gpflowpilco_tpu.utils import bijectors as bij

    model = SVGP(
        kernel=kernel,
        z=z,
        q_mu=q_mu,
        q_sqrt=jnp.zeros((num_latent, m, m), config.dtype),
        mean_const=jnp.zeros((num_latent,), config.dtype),
        raw_noise=bij.positive_inv(jnp.asarray(1e-5, config.dtype)),
        w=None,
        whiten=True,
    )
    policy = Chain(
        Scale(scale=jnp.asarray(20.0 - 1e-5)),
        Shift(shift=jnp.asarray(-0.5)),
        Probit(),
        SVGPTransform(model=model, deterministic=True),
    )

    mx = 0.2 * jax.random.normal(config.next_key(), (2, d), dtype=config.dtype)
    sxx = generate_covariance(config.next_key(), d, batch_shape=(2,), scale=0.15)
    x = GaussianMoments(mean=mx, cov=sxx)
    match = policy.moment_match(x)

    xs = draw_samples_mvn(config.next_key(), mx, sxx, NUM_SAMPLES)
    us = policy(xs.reshape(-1, d)).reshape(NUM_SAMPLES, 2, 1)
    mu = jnp.mean(us, 0)
    du = us - mu
    suu = jnp.einsum("sni,snj->nij", du, du) / NUM_SAMPLES
    dx = xs - jnp.mean(xs, 0)
    sxu = jnp.einsum("sni,snj->nij", dx, du) / NUM_SAMPLES

    assert jnp.all(jnp.abs(us) < 10.0)  # squash keeps actions in (-10, 10)
    assert allclose(match.y.mean, mu, rtol=0.1, atol=1e-3)
    assert allclose(match.y.cov, suu, rtol=0.1 * float(jnp.max(suu)), atol=1e-3)
    assert allclose(match.cross_covariance(), sxu, rtol=0.1 * float(jnp.max(jnp.abs(sxu))), atol=1e-3)


def test_rules_tolerate_indefinite_covariance():
    """f32 moment propagation can leave tiny negative variances; trig and probit
    rules must stay finite (the clamp added after the TPU NaN cascade)."""
    from gpflowpilco_tpu.moment_matching.rules import Probit, SinCos

    mean = jnp.asarray([[0.3, -0.2]])
    bad_cov = jnp.asarray([[[-1e-5, 0.0], [0.0, 0.5]]])  # slightly indefinite
    x = GaussianMoments(mean=mean, cov=bad_cov)
    for op in (SinCos(), Probit()):
        match = op.moment_match(x)
        assert bool(jnp.all(jnp.isfinite(match.y.mean))), op
        assert bool(jnp.all(jnp.isfinite(match.y.cov))), op
        assert bool(jnp.all(jnp.isfinite(match.cross_covariance()))), op


def test_objective_sqrt_path_matches_lu_path():
    """GaussianObjective.create's SPD-Cholesky formulation must agree with the
    LU/slogdet path on both moments and point inputs (incl. a singular PSD
    precision, the tip-distance quadratic case)."""
    import jax
    import numpy as np

    from gpflowpilco_tpu.components import GaussianObjective
    from gpflowpilco_tpu.moments import GaussianMoments

    config = TestConfig(seed=29)
    d = 5
    target = jax.random.normal(config.next_key(), (d,), config.dtype)
    # rank-2 PSD precision (like the swing-up tip quadratic)
    q = jax.random.normal(config.next_key(), (d, 2), config.dtype)
    precis = 16.0 * (q @ q.T)
    lu = GaussianObjective(target=target, precis=precis)
    sq = GaussianObjective.create(target=target, precis=precis)

    mean = jax.random.normal(config.next_key(), (3, d), config.dtype)
    a = jax.random.normal(config.next_key(), (3, d, d), config.dtype)
    cov = 0.1 * jnp.einsum("bij,bkj->bik", a, a) + 0.05 * jnp.eye(d, dtype=config.dtype)
    x = GaussianMoments(mean=mean, cov=cov)

    np.testing.assert_allclose(np.asarray(sq(x)), np.asarray(lu(x)), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sq(mean)), np.asarray(lu(mean)), rtol=1e-12)

    g_lu = jax.grad(lambda m, s: jnp.sum(lu(GaussianMoments(mean=m, cov=s))),
                    argnums=(0, 1))(mean, cov)
    g_sq = jax.grad(lambda m, s: jnp.sum(sq(GaussianMoments(mean=m, cov=s))),
                    argnums=(0, 1))(mean, cov)
    np.testing.assert_allclose(np.asarray(g_sq[0]), np.asarray(g_lu[0]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_sq[1]), np.asarray(g_lu[1]), rtol=1e-9, atol=1e-12)


def test_squashed_probit_collapses_chain():
    """SquashedProbit must equal Chain(Scale, Shift, Probit) exactly — values,
    moments, cross, and gradients (it replaces the chain in policy_chain)."""
    import jax
    import numpy as np

    from gpflowpilco_tpu.moments import Chain, GaussianMoments
    from gpflowpilco_tpu.moment_matching.rules import (
        Probit, Scale, Shift, SquashedProbit,
    )

    config = TestConfig(seed=31)
    c = 19.999
    chain = Chain(Scale(scale=jnp.asarray(c)), Shift(shift=jnp.asarray(-0.5)), Probit())
    sq = SquashedProbit(scale=jnp.asarray(c))

    x_pts = jax.random.normal(config.next_key(), (7, 2), config.dtype)
    np.testing.assert_allclose(np.asarray(sq(x_pts)), np.asarray(chain(x_pts)), rtol=1e-12)

    mean = jax.random.normal(config.next_key(), (3, 2), config.dtype)
    a = jax.random.normal(config.next_key(), (3, 2, 2), config.dtype)
    cov = 0.5 * jnp.einsum("bij,bkj->bik", a, a) + 0.2 * jnp.eye(2, dtype=config.dtype)

    def outs(t, m, s):
        mt = t.moment_match(GaussianMoments(mean=m, cov=s))
        return mt.y.mean, mt.y.cov, mt.cross_covariance(preinv=True)

    for o_sq, o_ch in zip(outs(sq, mean, cov), outs(chain, mean, cov)):
        np.testing.assert_allclose(np.asarray(o_sq), np.asarray(o_ch), rtol=1e-11,
                                   atol=1e-13)

    def loss(t, m, s):
        ym, yc, cr = outs(t, m, s)
        return jnp.sum(jnp.sin(ym)) + jnp.sum(jnp.cos(yc)) + jnp.sum(cr)

    g_sq = jax.grad(lambda m, s: loss(sq, m, s), argnums=(0, 1))(mean, cov)
    g_ch = jax.grad(lambda m, s: loss(chain, m, s), argnums=(0, 1))(mean, cov)
    np.testing.assert_allclose(np.asarray(g_sq[0]), np.asarray(g_ch[0]), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_sq[1]), np.asarray(g_ch[1]), rtol=1e-10,
                               atol=1e-13)
