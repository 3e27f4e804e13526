"""dd ndtr / Owen-T accuracy vs scipy f64 references."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import ndtr as scipy_ndtr, owens_t

from gpflowpilco_tpu.ops import dd, dd_special


def test_dd_ndtr_accuracy():
    x64 = np.concatenate([
        np.linspace(-12.5, 12.5, 501),
        np.array([-2.0, 2.0, -1.9999, 2.0001, 0.0, 1e-6, -1e-6]),
    ])
    x = dd.from_f64(x64)
    got = dd.jit(dd_special.ndtr)(x)
    g = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
    want = scipy_ndtr(x64)
    assert np.max(np.abs(g - want)) < 2e-14, np.max(np.abs(g - want))
    # relative accuracy on the small tail (the cancellation-critical piece);
    # below Q ~ 1e-30 the dd lo word hits f32-subnormal territory and the
    # relative grade decays — numerically irrelevant (round-4 profile)
    neg = (x64 < -2.5) & (want > 1e-28)
    rel = np.abs(g[neg] - want[neg]) / want[neg]
    assert np.max(rel) < 1e-11, np.max(rel)


def test_dd_owen_t_accuracy():
    rng = np.random.default_rng(0)
    h64 = np.concatenate([
        rng.uniform(-8, 8, 200), np.array([0.0, 0.5, -0.5, 6.0, -6.0, 12.0])
    ])
    a64 = np.concatenate([
        rng.uniform(0.0, 1.0, 200), np.array([1.0, 1e-3, 0.999, 0.2, 0.9, 1e-6])
    ])
    h, a = dd.from_f64(h64), dd.from_f64(a64)
    got = dd.jit(dd_special.owen_t)(h, a)
    g = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
    want = owens_t(h64, a64)
    assert np.max(np.abs(g - want)) < 2e-14, np.max(np.abs(g - want))


def test_dd_probit_second_moment_identity():
    """E[Phi(x)^2] = Phi(h) - 2 T(h, 1/sqrt(1+2v)) vs brute-force quadrature."""
    rng = np.random.default_rng(1)
    for m, v in [(0.0, 1.0), (2.5, 0.3), (-4.0, 9.0), (8.0, 30.0), (0.1, 1e-4)]:
        # brute force in f64
        sd = np.sqrt(v)
        t = np.linspace(m - 14 * sd - 1, m + 14 * sd + 1, 400001)
        gauss = np.exp(-0.5 * (t - m) ** 2 / v) / np.sqrt(2 * np.pi * v)
        want = np.trapezoid(scipy_ndtr(t) ** 2 * gauss, t)
        h = m / np.sqrt(1 + v)
        a = 1.0 / np.sqrt(1 + 2 * v)
        hd, ad = dd.from_f64(np.array([h])), dd.from_f64(np.array([a]))
        phi_h = dd_special.ndtr(hd)
        t_ha = dd_special.owen_t(hd, ad)
        got = dd.sub(phi_h, dd.mul_pow2(t_ha, 1.0))
        got = dd.sub(phi_h, dd.mul_f(t_ha, jnp.float32(2.0)))
        g = float(np.asarray(got.hi, np.float64)[0] + np.asarray(got.lo, np.float64)[0])
        assert abs(g - want) < 1e-10, (m, v, g, want)
