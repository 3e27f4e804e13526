"""dd moment-match parity: the double-float SVGP match must agree with the
f64 XLA match to ~1e-12 (both evaluated at identical f32-representable
parameters — the round-3 methodology: params built at f32, cast up)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpflowpilco_tpu.models.builders import build_svgp
from gpflowpilco_tpu.moments import GaussianMoments
from gpflowpilco_tpu.moment_matching.gp import SVGPTransform, match_svgp
from gpflowpilco_tpu.moment_matching import dd_match
from gpflowpilco_tpu.ops import dd


def _cast_model(model, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        model,
    )


def _build(seed=0, L=2, M=8, D=3, coreg=False):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((24, D))
    y = 0.3 * rng.standard_normal((24, L if not coreg else L + 1))
    model = build_svgp(
        x, y, num_inducing=M, key=jax.random.PRNGKey(seed),
        num_latent=L if coreg else None, coregionalize=coreg,
        dtype=jnp.float32,
    )
    # a non-vague posterior: random q_mu at data scale (the fitted regime is
    # where f32 matches decorrelate)
    model = dataclasses.replace(
        model,
        q_mu=jnp.asarray(rng.standard_normal(model.q_mu.shape), jnp.float32),
    )
    mx = jnp.asarray(0.4 * rng.standard_normal((1, D)), jnp.float32)
    a = 0.2 * rng.standard_normal((D, D))
    sxx = jnp.asarray(a @ a.T + 0.05 * np.eye(D), jnp.float32)[None]
    return model, mx, sxx


@pytest.mark.parametrize("uncertainty", [True, False])
@pytest.mark.parametrize("coreg", [False, True])
def test_dd_svgp_match_parity_f64(uncertainty, coreg):
    model, mx, sxx = _build(coreg=coreg)
    model64 = _cast_model(model, jnp.float64)
    ref = match_svgp(
        model64,
        GaussianMoments(mean=mx.astype(jnp.float64), cov=sxx.astype(jnp.float64)),
        model_uncertainty=uncertainty,
    )

    cache, meta = dd_match.build_dd_svgp_cache(model64)
    x_dd = dd_match.DDMoments(mean=dd.lift(mx), cov=dd.lift(sxx))
    got = dd.jit(
        lambda c, x: dd_match.dd_match_svgp(c, meta, x, model_uncertainty=uncertainty),
    )(cache, x_dd)

    def close(g: dd.DD, want, tol=5e-12):
        gv = np.asarray(g.hi, np.float64) + np.asarray(g.lo, np.float64)
        w = np.asarray(want, np.float64)
        assert np.max(np.abs(gv - w)) < tol * max(1.0, np.max(np.abs(w))), (
            np.max(np.abs(gv - w)),
            np.max(np.abs(w)),
        )

    close(got.y.mean, ref.y.mean)
    close(got.y.cov, ref.y.cov)
    assert ref.preinv and got.preinv
    close(got.cross, ref.cross)


def test_dd_match_grad_through_moments():
    """Policy gradients flow through the dd match via the input moments: the
    jacobian of E[f] wrt the input mean matches the f64 match jacobian."""
    model, mx, sxx = _build(L=2, M=8, D=3)
    model64 = _cast_model(model, jnp.float64)
    cache, meta = dd_match.build_dd_svgp_cache(model64)

    def f_dd(m):
        x = dd_match.DDMoments(mean=dd.lift(m), cov=dd.lift(sxx))
        out = dd_match.dd_match_svgp(cache, meta, x)
        return (out.y.mean.hi + out.y.mean.lo).sum()

    def f_64(m):
        x = GaussianMoments(mean=m, cov=sxx.astype(jnp.float64))
        return match_svgp(model64, x).y.mean.sum()

    g_dd = dd.jit(jax.grad(f_dd))(mx)
    g_64 = jax.grad(f_64)(mx.astype(jnp.float64))
    np.testing.assert_allclose(
        np.asarray(g_dd, np.float64), np.asarray(g_64), rtol=2e-5, atol=1e-7
    )
