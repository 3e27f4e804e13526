"""Pathwise sampling parity: sample-function moments vs exact posterior."""
import jax
import jax.numpy as jnp
import numpy as np

from gpflowpilco_tpu.models.gp import GPR, SVGP, gpr_predict_f, svgp_predict_f
from gpflowpilco_tpu.models.kernels import RBF
from gpflowpilco_tpu.models.pathwise import (
    eval_paths_gpr,
    eval_paths_svgp,
    generate_paths_gpr,
    generate_paths_svgp,
)
from gpflowpilco_tpu.utils import bijectors as bij

from .utils import TestConfig, generate_covariance


def test_pathwise_svgp_matches_posterior():
    config = TestConfig(seed=5)
    d, num_latent, m, p = 2, 2, 12, 2
    num_samples, num_bases = 12_000, 1_024
    kernel = RBF.create(jnp.asarray([0.8, 1.2]), 0.9 * jnp.ones((num_latent, d)))
    z = jax.random.normal(config.next_key(), (num_latent, m, d), dtype=config.dtype)
    q_mu = 0.7 * jax.random.normal(config.next_key(), (m, num_latent), dtype=config.dtype)
    q_cov = generate_covariance(config.next_key(), m, batch_shape=(num_latent,), scale=0.4)
    model = SVGP(
        kernel=kernel,
        z=z,
        q_mu=q_mu,
        q_sqrt=jnp.linalg.cholesky(q_cov),
        mean_const=jnp.asarray([0.5, -0.3]),
        raw_noise=bij.positive_inv(jnp.asarray(1e-4)),
        w=None,
        whiten=False,
    )

    paths = generate_paths_svgp(model, config.next_key(), num_samples, num_bases)

    xt = jax.random.normal(config.next_key(), (5, d), dtype=config.dtype)
    exact_mean, exact_var = svgp_predict_f(model, xt)  # (5, P)

    # evaluate all paths at each shared test point
    means, variances = [], []
    for i in range(xt.shape[0]):
        xi = jnp.broadcast_to(xt[i], (num_samples, d))
        fi = eval_paths_svgp(model, paths, xi)  # (S, P)
        means.append(jnp.mean(fi, 0))
        variances.append(jnp.var(fi, 0))
    got_mean = jnp.stack(means)
    got_var = jnp.stack(variances)

    # tolerance: MC error (S) + RFF kernel-approximation bias (B)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(exact_mean), atol=0.05)
    np.testing.assert_allclose(np.asarray(got_var), np.asarray(exact_var), atol=0.08)


def test_pathwise_svgp_whitened_matches_posterior():
    config = TestConfig(seed=6)
    d, num_latent, m = 2, 1, 10
    num_samples, num_bases = 12_000, 1_024
    kernel = RBF.create(jnp.ones((num_latent,)), jnp.ones((num_latent, d)))
    z = jax.random.normal(config.next_key(), (num_latent, m, d), dtype=config.dtype)
    q_mu = jax.random.normal(config.next_key(), (m, num_latent), dtype=config.dtype)
    model = SVGP(
        kernel=kernel,
        z=z,
        q_mu=q_mu,
        q_sqrt=0.3 * jnp.eye(m)[None],
        mean_const=jnp.zeros((num_latent,)),
        raw_noise=bij.positive_inv(jnp.asarray(1e-4)),
        w=None,
        whiten=True,
    )
    paths = generate_paths_svgp(model, config.next_key(), num_samples, num_bases)
    xt = 0.5 * jax.random.normal(config.next_key(), (4, d), dtype=config.dtype)
    exact_mean, exact_var = svgp_predict_f(model, xt)
    for i in range(xt.shape[0]):
        xi = jnp.broadcast_to(xt[i], (num_samples, d))
        fi = eval_paths_svgp(model, paths, xi)
        assert abs(float(jnp.mean(fi, 0)[0] - exact_mean[i, 0])) < 0.05
        assert abs(float(jnp.var(fi, 0)[0] - exact_var[i, 0])) < 0.08


def test_pathwise_gpr_matches_posterior():
    config = TestConfig(seed=7)
    d, n, p = 2, 10, 2
    num_samples, num_bases = 12_000, 1_024
    kernel = RBF.create(1.0, 0.8 * jnp.ones((d,)))
    x_data = jax.random.normal(config.next_key(), (n, d), dtype=config.dtype)
    y_data = jax.random.normal(config.next_key(), (n, p), dtype=config.dtype)
    model = GPR(
        kernel=kernel,
        x=x_data,
        y=y_data,
        mean_const=jnp.zeros((p,)),
        raw_noise=bij.positive_inv(jnp.asarray(0.01)),
    )
    paths = generate_paths_gpr(model, config.next_key(), num_samples, num_bases)
    xt = 0.5 * jax.random.normal(config.next_key(), (4, d), dtype=config.dtype)
    exact_mean, exact_var = gpr_predict_f(model, xt)
    for i in range(xt.shape[0]):
        xi = jnp.broadcast_to(xt[i], (num_samples, d))
        fi = eval_paths_gpr(model, paths, xi)
        np.testing.assert_allclose(
            np.asarray(jnp.mean(fi, 0)), np.asarray(exact_mean[i]), atol=0.05
        )
        np.testing.assert_allclose(
            np.asarray(jnp.var(fi, 0)), np.asarray(exact_var[i]), atol=0.08
        )


def test_paths_are_deterministic_functions():
    """A fixed path evaluated twice at the same input gives identical values —
    the pathwise-consistency property the PILCO rollout relies on."""
    config = TestConfig(seed=8)
    d, num_latent, m = 3, 2, 8
    kernel = RBF.create(jnp.ones((num_latent,)), jnp.ones((num_latent, d)))
    z = jax.random.normal(config.next_key(), (num_latent, m, d), dtype=config.dtype)
    model = SVGP(
        kernel=kernel,
        z=z,
        q_mu=jax.random.normal(config.next_key(), (m, num_latent), dtype=config.dtype),
        q_sqrt=0.1 * jnp.eye(m)[None].repeat(num_latent, 0),
        mean_const=jnp.zeros((num_latent,)),
        raw_noise=bij.positive_inv(jnp.asarray(1e-4)),
        w=None,
        whiten=True,
    )
    paths = generate_paths_svgp(model, config.next_key(), 16, 256)
    x = jax.random.normal(config.next_key(), (16, d), dtype=config.dtype)
    f1 = eval_paths_svgp(model, paths, x)
    f2 = eval_paths_svgp(model, paths, x)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    # different paths differ
    paths2 = generate_paths_svgp(model, config.next_key(), 16, 256)
    f3 = eval_paths_svgp(model, paths2, x)
    assert float(jnp.max(jnp.abs(f1 - f3))) > 1e-4
