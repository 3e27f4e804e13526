"""Double-float (ops/dd.py) correctness: every op lands ~2^-48 relative error
against a float64 reference, under jit (i.e. XLA must not optimize away the
error-free transformations — the compensation terms survive compilation).

Runs on the CPU conftest backend; scripts/dd_tpu_probe.py repeats the same
checks on the real chip (Mosaic/VPU codegen differs from CPU LLVM)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpflowpilco_tpu.ops import dd

# dd precision: |lo| <= ulp(hi)/2 => ~2^-48 relative, plus slack for the
# f32-tail transcendental heads (documented ~1e-14-2e-14 bounds)
TOL = 5e-13
# ring-op errors scale with the OPERANDS (cancellation shrinks the result,
# not the absolute error); still ~5 orders tighter than one f32 ulp
RING_TOL = 1e-11
RNG = np.random.default_rng(0)


def _sample(n=4096, scale=1.0, offset=0.0):
    x64 = (RNG.standard_normal(n) * scale + offset).astype(np.float64)
    return x64, dd.from_f64(x64)


def _relerr(got_dd, want64):
    got = np.asarray(got_dd.hi, np.float64) + np.asarray(got_dd.lo, np.float64)
    denom = np.maximum(np.abs(want64), 1e-30)
    return np.max(np.abs(got - want64) / denom)


def test_from_f64_roundtrip():
    x64, x = _sample()
    assert _relerr(x, x64) < 2e-15


def test_two_sum_exact_under_jit():
    """The compensation term must be exactly a+b-s — nonzero in general. If
    XLA ever reassociates (a-(s-bb))+(b-bb) away, this catches it."""
    a = jnp.asarray(RNG.standard_normal(1024), jnp.float32)
    b = jnp.asarray(1e-4 * RNG.standard_normal(1024), jnp.float32)
    s, e = dd.jit(lambda a, b: dd.two_sum(a, b))(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)
    assert np.any(np.asarray(e) != 0.0)


def test_two_prod_exact_under_jit():
    a = jnp.asarray(RNG.standard_normal(1024), jnp.float32)
    b = jnp.asarray(RNG.standard_normal(1024), jnp.float32)
    p, e = dd.jit(lambda a, b: dd.two_prod(a, b))(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)
    assert np.any(np.asarray(e) != 0.0)


@pytest.mark.parametrize(
    "op,ref",
    [
        (dd.add, np.add),
        (dd.sub, np.subtract),
        (dd.mul, np.multiply),
        (dd.div, np.divide),
    ],
)
def test_ring_ops(op, ref):
    x64, x = _sample()
    y64, y = _sample()
    if ref is np.divide:
        y64 = np.abs(y64) + 0.5
        y = dd.from_f64(y64)
    got = dd.jit(lambda x, y: op(x, y))(x, y)
    assert _relerr(got, ref(x64, y64)) < RING_TOL


def test_cancellation_add():
    """x + (-x + tiny) keeps the tiny part exactly — the f32 killer case."""
    x64, x = _sample(scale=1e3)
    t64, t = _sample(scale=1e-8)
    got = dd.add(x, dd.add(dd.neg(x), t))
    # absolute comparison at the large-operand scale: the compensated chain
    # must preserve the 1e-8-scale signal exactly where f32 would destroy it
    g = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
    assert np.max(np.abs(g - t64)) < 1e-10


def test_mul_f_and_pow2():
    x64, x = _sample()
    f = jnp.float32(1.7)
    # compare against the dd-representable operand (x as stored), so the
    # check isolates the op's own error from the f64->dd embedding error
    x_repr = np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)
    assert _relerr(dd.mul_f(x, f), x_repr * np.float64(np.float32(1.7))) < TOL
    assert _relerr(dd.mul_pow2(x, 0.25), x_repr * 0.25) == 0.0


def test_sqrt_recip():
    x64, x = _sample(offset=5.0)
    x64 = np.abs(x64) + 0.1
    x = dd.from_f64(x64)
    assert _relerr(dd.jit(dd.sqrt)(x), np.sqrt(x64)) < TOL
    assert _relerr(dd.jit(dd.recip)(x), 1.0 / x64) < TOL


def test_exp():
    x64, x = _sample(scale=10.0)  # spans e^-30 .. e^30
    got = dd.jit(dd.exp)(x)
    assert _relerr(got, np.exp(x64)) < 1e-13
    # deep-underflow flush
    z = dd.exp(dd.lift(jnp.asarray([-100.0], jnp.float32)))
    assert float(z.hi[0]) == 0.0 and float(z.lo[0]) == 0.0


def test_sincos():
    x64, x = _sample(scale=8.0)  # multiple reduction quadrants
    s, c = dd.jit(dd.sincos)(x)
    # compare at the dd-REPRESENTABLE argument (the f64->dd embedding error of
    # a large argument otherwise dominates); absolute tolerance: sin/cos pass
    # through zero
    x_repr = np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)
    s_got = np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64)
    c_got = np.asarray(c.hi, np.float64) + np.asarray(c.lo, np.float64)
    assert np.max(np.abs(s_got - np.sin(x_repr))) < 1e-13
    assert np.max(np.abs(c_got - np.cos(x_repr))) < 1e-13


def test_dsum_dot():
    x64 = RNG.standard_normal((32, 4096))
    y64 = RNG.standard_normal((32, 4096))
    x, y = dd.from_f64(x64), dd.from_f64(y64)
    got = dd.jit(lambda x: dd.dsum(x, -1))(x)
    assert _relerr(got, x64.sum(-1)) < TOL
    got2 = dd.jit(lambda x, y: dd.dot(x, y))(x, y)
    # dot of +-1-scale terms cancels; compare absolutely at dd grade
    want = (x64 * y64).sum(-1)
    g = np.asarray(got2.hi, np.float64) + np.asarray(got2.lo, np.float64)
    assert np.max(np.abs(g - want)) < 1e-10


def test_grad_flows_through_dd():
    """jax.grad through a dd pipeline returns the true derivative (f32-grade,
    which is all the adjoint needs — see module docstring)."""

    def f(a):
        x = dd.lift(a)
        y = dd.exp(dd.mul(x, x))
        s, _c = dd.sincos(y)
        return (s.hi + s.lo).sum()

    a = jnp.asarray([0.3, 0.7], jnp.float32)
    g = jax.grad(f)(a)
    a64 = np.asarray(a, np.float64)
    want = np.cos(np.exp(a64**2)) * np.exp(a64**2) * 2 * a64
    np.testing.assert_allclose(np.asarray(g, np.float64), want, rtol=2e-5)


def test_where_max():
    x64, x = _sample()
    y64, y = _sample()
    got = dd.dmax(x, y)
    assert _relerr(got, np.maximum(x64, y64)) < TOL
