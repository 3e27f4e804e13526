"""End-to-end moment parity for GP rules vs Monte-Carlo ground truth.

Mirrors /root/reference/tests/test_moment_matching.py: mean/cov/cross-cov of GP
predictions under Gaussian inputs vs an MC estimator that pushes samples through
predict_f and adds E[predictive cov] (reference test:57-84).
"""
import math

import jax
import jax.numpy as jnp
import pytest

from gpflowpilco_tpu.models.gp import GPR, SVGP, svgp_predict_f, gpr_predict_f
from gpflowpilco_tpu.models.kernels import RBF
from gpflowpilco_tpu.moments import GaussianMoments
from gpflowpilco_tpu.moment_matching.gp import match_gpr, match_svgp

from .utils import TestConfig, allclose, draw_samples_mvn, generate_covariance

NUM_SAMPLES = 250_000
NUM_CHUNKS = 8
SCALE_X = 0.01
SCALE_F = 0.89
NUM_COND = 16
NUM_EVAL = 2


def _rand_lengthscales(config, d):
    log_ls = jax.random.uniform(
        config.next_key(), (d,), minval=math.log(0.05), maxval=math.log(10.0),
        dtype=config.dtype,
    )
    return jnp.exp(log_ls)


def _eval_inputs(config, d):
    mx = jax.random.uniform(config.next_key(), (NUM_EVAL, d), dtype=config.dtype)
    sxx = generate_covariance(
        config.next_key(), d, batch_shape=(NUM_EVAL,), scale=SCALE_X
    )
    return mx, sxx


def _mc_estimate(config, predict_full, mx, sxx):
    """MC moments of f(x): mean, cov (incl. E[pred cov]), cross-cov with x."""
    chunk = NUM_SAMPLES // NUM_CHUNKS
    keys = jax.random.split(config.next_key(), NUM_CHUNKS)

    def chunk_stats(key):
        x = draw_samples_mvn(key, mx, sxx, chunk)  # (S, E, D)
        flat = x.reshape(-1, x.shape[-1])
        mu, cov = predict_full(flat)  # (SE, P), (SE, P, P)
        p = mu.shape[-1]
        mu = mu.reshape(chunk, NUM_EVAL, p)
        cov = cov.reshape(chunk, NUM_EVAL, p, p)
        return (
            mu.sum(0),
            jnp.einsum("sni,snj->nij", mu, mu),
            cov.sum(0),
            jnp.einsum("sni,snj->nij", x, mu),
        )

    sums = [chunk_stats(k) for k in keys]
    s_mu, s_mumu, s_cov, s_xmu = [sum(t) for t in zip(*sums)]
    n = NUM_SAMPLES
    mf = s_mu / n
    sff = s_mumu / n - jnp.einsum("ni,nj->nij", mf, mf) + s_cov / n
    sxf = s_xmu / n - jnp.einsum("ni,nj->nij", mx, mf)
    return mf, sff, sxf


def test_moment_matching_gpr():
    config = TestConfig(seed=101, num_samples=NUM_SAMPLES)
    d, p = 3, 2
    kernel = RBF.create(SCALE_F**2, _rand_lengthscales(config, d))
    x_data = jax.random.uniform(config.next_key(), (NUM_COND, d), dtype=config.dtype)
    y_data = SCALE_F * jax.random.normal(
        config.next_key(), (NUM_COND, p), dtype=config.dtype
    )
    mean_const = 1.0 + jax.random.normal(config.next_key(), (p,), dtype=config.dtype)
    from gpflowpilco_tpu.utils import bijectors as bij

    model = GPR(
        kernel=kernel,
        x=x_data,
        y=y_data,
        mean_const=mean_const,
        raw_noise=bij.positive_inv(jnp.asarray(1e-5, config.dtype)),
    )

    mx, sxx = _eval_inputs(config, d)

    def predict_full(flat):
        mu, var = gpr_predict_f(model, flat)  # var (S, P) shared scalar per point
        cov = jnp.eye(p, dtype=var.dtype) * var[..., None, :]
        return mu, cov

    mf, sff, sxf = _mc_estimate(config, predict_full, mx, sxx)

    match = match_gpr(model, GaussianMoments(mean=mx, cov=sxx))
    assert allclose(match.y.mean, mf, rtol=config.rtol, atol=config.atol)
    assert allclose(match.y.cov, sff, rtol=config.rtol, atol=config.atol)
    assert allclose(
        match.cross_covariance(), sxf, rtol=config.rtol, atol=config.atol
    )


@pytest.mark.parametrize("whiten", [False, True])
def test_moment_matching_svgp_single_output(whiten):
    config = TestConfig(seed=202 + int(whiten), num_samples=NUM_SAMPLES)
    d, num_latent, m = 3, 1, NUM_COND
    kernel = RBF.create(
        jnp.full((num_latent,), SCALE_F**2), _rand_lengthscales(config, d)[None]
    )
    z = jax.random.uniform(config.next_key(), (num_latent, m, d), dtype=config.dtype)
    q_mu = SCALE_F * jax.random.normal(config.next_key(), (m, num_latent), dtype=config.dtype)
    q_cov = generate_covariance(
        config.next_key(), m, batch_shape=(num_latent,), scale=SCALE_F
    )
    q_sqrt = jnp.linalg.cholesky(q_cov)
    mean_const = 1.0 + jax.random.normal(config.next_key(), (num_latent,), dtype=config.dtype)
    from gpflowpilco_tpu.utils import bijectors as bij

    model = SVGP(
        kernel=kernel,
        z=z,
        q_mu=q_mu,
        q_sqrt=q_sqrt,
        mean_const=mean_const,
        raw_noise=bij.positive_inv(jnp.asarray(1e-5, config.dtype)),
        w=None,
        whiten=whiten,
    )

    mx, sxx = _eval_inputs(config, d)

    def predict_full(flat):
        mu, var = svgp_predict_f(model, flat, full_output_cov=True)
        return mu, var

    mf, sff, sxf = _mc_estimate(config, predict_full, mx, sxx)

    match = match_svgp(model, GaussianMoments(mean=mx, cov=sxx))
    assert allclose(match.y.mean, mf, rtol=config.rtol, atol=config.atol)
    assert allclose(match.y.cov, sff, rtol=config.rtol, atol=config.atol)
    assert allclose(match.cross_covariance(), sxf, rtol=config.rtol, atol=config.atol)


@pytest.mark.parametrize("whiten", [False, True])
def test_moment_matching_svgp_multioutput_lck(whiten):
    config = TestConfig(seed=303 + int(whiten), num_samples=NUM_SAMPLES)
    d, num_latent, num_out, m = 4, 2, 3, NUM_COND
    ls = jnp.stack([_rand_lengthscales(config, d) for _ in range(num_latent)])
    kernel = RBF.create(jnp.full((num_latent,), SCALE_F**2), ls)
    z = jax.random.uniform(config.next_key(), (num_latent, m, d), dtype=config.dtype)
    q_mu = SCALE_F * jax.random.normal(config.next_key(), (m, num_latent), dtype=config.dtype)
    q_cov = generate_covariance(
        config.next_key(), m, batch_shape=(num_latent,), scale=SCALE_F
    )
    q_sqrt = jnp.linalg.cholesky(q_cov)
    w_raw = jax.random.uniform(config.next_key(), (num_out, num_latent), dtype=config.dtype)
    w = w_raw / jnp.linalg.norm(w_raw, axis=-1, keepdims=True)
    mean_const = 1.0 + jax.random.normal(config.next_key(), (num_out,), dtype=config.dtype)
    from gpflowpilco_tpu.utils import bijectors as bij

    model = SVGP(
        kernel=kernel,
        z=z,
        q_mu=q_mu,
        q_sqrt=q_sqrt,
        mean_const=mean_const,
        raw_noise=bij.positive_inv(jnp.asarray(1e-5, config.dtype)),
        w=w,
        whiten=whiten,
    )

    mx, sxx = _eval_inputs(config, d)

    def predict_full(flat):
        return svgp_predict_f(model, flat, full_output_cov=True)

    mf, sff, sxf = _mc_estimate(config, predict_full, mx, sxx)

    match = match_svgp(model, GaussianMoments(mean=mx, cov=sxx))
    assert allclose(match.y.mean, mf, rtol=config.rtol, atol=config.atol)
    assert allclose(match.y.cov, sff, rtol=config.rtol, atol=config.atol)
    assert allclose(match.cross_covariance(), sxf, rtol=config.rtol, atol=config.atol)


def test_match_svgp_diag_path_consistency():
    """full_output_cov=False (true diag path: only L diagonal eKuffu blocks are
    formed) must agree with the diagonal of the full path to f64 precision
    (reference models.py:79-84 + its internal consistency tests)."""
    config = TestConfig(seed=505)
    d, num_latent, m = 3, 4, 12
    ls = jnp.stack([_rand_lengthscales(config, d) for _ in range(num_latent)])
    kernel = RBF.create(jnp.full((num_latent,), 1.3), ls)
    z = jax.random.normal(config.next_key(), (num_latent, m, d), dtype=config.dtype)
    q_mu = jax.random.normal(config.next_key(), (m, num_latent), dtype=config.dtype)
    q_cov = generate_covariance(config.next_key(), m, batch_shape=(num_latent,))
    q_sqrt = jnp.linalg.cholesky(q_cov)
    from gpflowpilco_tpu.utils import bijectors as bij

    model = SVGP(
        kernel=kernel, z=z, q_mu=q_mu, q_sqrt=q_sqrt,
        mean_const=jnp.zeros((num_latent,)),
        raw_noise=bij.positive_inv(jnp.asarray(1e-4)), w=None, whiten=True,
    )
    mx = 0.3 * jnp.ones((1, d))
    sxx = generate_covariance(config.next_key(), d, batch_shape=(1,), scale=0.4)
    x = GaussianMoments(mean=mx, cov=sxx)
    for model_uncertainty in (True, False):
        full = match_svgp(model, x, model_uncertainty=model_uncertainty)
        diag = match_svgp(
            model, x, model_uncertainty=model_uncertainty, full_output_cov=False
        )
        assert allclose(diag.y.mean, full.y.mean, rtol=1e-12, atol=0)
        assert allclose(diag.cross_covariance(), full.cross_covariance(), rtol=1e-12, atol=0)
        want = jnp.eye(num_latent) * jnp.diagonal(full.y.cov, axis1=-2, axis2=-1)[..., None, :]
        assert allclose(diag.y.cov, want, rtol=1e-11, atol=1e-14)


def test_deterministic_match_drops_uncertainty():
    """KernelRegressor semantics: cov of a deterministic regressor is Cov of the
    posterior mean only (reference models.py:34-41)."""
    config = TestConfig(seed=404)
    d, num_latent, m = 2, 1, 8
    kernel = RBF.create(jnp.ones((num_latent,)), jnp.ones((num_latent, d)))
    z = jax.random.normal(config.next_key(), (num_latent, m, d), dtype=config.dtype)
    q_mu = jax.random.normal(config.next_key(), (m, num_latent), dtype=config.dtype)
    q_sqrt = 0.1 * jnp.eye(m)[None].repeat(num_latent, 0)
    from gpflowpilco_tpu.utils import bijectors as bij

    model = SVGP(
        kernel=kernel, z=z, q_mu=q_mu, q_sqrt=q_sqrt,
        mean_const=jnp.zeros((num_latent,)),
        raw_noise=bij.positive_inv(jnp.asarray(1e-4)), w=None, whiten=True,
    )
    mx = jnp.zeros((1, d))
    sxx = 0.04 * jnp.eye(d)[None]
    x = GaussianMoments(mean=mx, cov=sxx)
    full = match_svgp(model, x, model_uncertainty=True)
    det = match_svgp(model, x, model_uncertainty=False)
    # deterministic covariance is strictly smaller on the diagonal
    assert float(det.y.cov[0, 0, 0]) < float(full.y.cov[0, 0, 0])
    assert allclose(det.y.mean, full.y.mean, rtol=1e-12, atol=0)
    assert allclose(det.cross_covariance(), full.cross_covariance(), rtol=1e-12, atol=0)


def test_gpr_match_finite_at_tiny_noise_f32():
    """HMC-sampled noise on deterministic-sim data reaches ~1e-5; without a
    jitter floor, chol(Knn + sigma^2 I) is numerically singular in f32 for
    near-duplicate inputs and every ensemble rollout NaNs (observed on TPU)."""
    import numpy as onp
    from gpflowpilco_tpu.models.gp import GPR, gpr_lml, gpr_predict_f
    from gpflowpilco_tpu.models.kernels import RBF
    from gpflowpilco_tpu.moment_matching.gp import gpr_match_cache
    from gpflowpilco_tpu.utils import bijectors as bij

    rng = onp.random.default_rng(0)
    base = rng.normal(size=(200, 3))
    # exact duplicates: chol(Knn + 1e-6 I) is f32-singular at this size
    x = onp.concatenate([base, base], 0).astype(onp.float32)
    y = onp.sin(x[:, :1]).astype(onp.float32)
    model = GPR(
        kernel=RBF.create(jnp.asarray(1.0, jnp.float32),
                          jnp.full((3,), 2.0, jnp.float32)),
        x=jnp.asarray(x),
        y=jnp.asarray(y),
        mean_const=jnp.zeros((1,), jnp.float32),
        raw_noise=bij.positive_inv(jnp.asarray(1e-6, jnp.float32)),
    )
    cache = gpr_match_cache(model)
    assert bool(jnp.all(jnp.isfinite(cache.lyy))), "cholesky NaN at tiny noise"
    assert bool(jnp.all(jnp.isfinite(cache.alpha)))
    assert bool(jnp.isfinite(gpr_lml(model)))
    mean, var = gpr_predict_f(model, jnp.asarray(x[:5]))
    assert bool(jnp.all(jnp.isfinite(mean))) and bool(jnp.all(jnp.isfinite(var)))

    from gpflowpilco_tpu.models.pathwise import generate_paths_gpr, eval_paths_gpr
    paths = generate_paths_gpr(model, jax.random.PRNGKey(1), num_samples=4,
                               num_bases=32)
    f = eval_paths_gpr(model, paths, jnp.asarray(x[:4]))
    assert bool(jnp.all(jnp.isfinite(f)))
