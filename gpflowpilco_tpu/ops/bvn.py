"""Bivariate-normal probabilities and related special functions, in JAX.

Re-implementation of Alan Genz's BVN algorithm for TPU/XLA, with the same role as the
reference's TF port (/root/reference/gpflow_pilco/utils/bvn.py). Design differences:

  * **Branchless by construction.** The reference selects the Gauss-Legendre order
    (6/12/20) from a data-dependent ``tf.reduce_all`` over |r| (bvn.py:179-232), which
    cannot live under ``jit``. We always use the order-20 rule: on TPU the extra
    quadrature nodes are a handful of fused VPU ops, and static shapes let XLA tile
    everything. All remaining case analysis is `jnp.where` with *sanitized* operands so
    that both value and gradient are NaN-free on every branch (the double-where trick) —
    this is what makes the probit policy-squash differentiable through 30-step scans
    (SURVEY.md §7 hard part 6).
  * Owen's T is computed by the same fixed-order quadrature instead of a special-cased
    series, again for branch-free autodiff.

All functions broadcast elementwise over arbitrary batch shapes.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)
_2PI = 2.0 * math.pi

# Order-20 Gauss-Legendre abscissae/weights on [-1, 1] (10 symmetric pairs).
_GL20_X = (
    0.9931285991850949, 0.9639719272779138, 0.9122344282513259,
    0.8391169718222188, 0.7463319064601508, 0.6360536807265150,
    0.5108670019508271, 0.3737060887154196, 0.2277858511416451,
    0.07652652113349733,
)
_GL20_W = (
    0.01761400713915212, 0.04060142980038694, 0.06267204833410906,
    0.08327674157670475, 0.1019301198172404, 0.1181945319615184,
    0.1316886384491766, 0.1420961093183821, 0.1491729864726037,
    0.1527533871307259,
)


def _gl20(dtype):
    """Nodes/weights of the 20-point rule mapped to t in (0, 2): t = 1 -/+ x."""
    x = jnp.asarray(_GL20_X, dtype=dtype)
    w = jnp.asarray(_GL20_W, dtype=dtype)
    nodes = jnp.concatenate([1.0 - x, 1.0 + x])
    weights = jnp.concatenate([w, w])
    return nodes, weights


def ndtr(x: jnp.ndarray) -> jnp.ndarray:
    """Standard normal CDF (reference bvn.py:38-42)."""
    x = jnp.asarray(x)
    return 0.5 * jnp.asarray(jax_erfc(-x / _SQRT2), dtype=x.dtype)


def jax_erfc(x):
    import jax.scipy.special as jsp

    return jsp.erfc(x)


def owens_t(h: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Owen's T function T(h, a) = (2*pi)^-1 * int_0^a exp(-h^2(1+t^2)/2)/(1+t^2) dt.

    Fixed-order Gauss-Legendre over [0, a]; exact enough (~1e-10 for |a|<=1) for the
    probit second-moment diagonal (reference bijectors.py:58 uses tfp's owens_t).
    """
    h = jnp.asarray(h)
    a = jnp.asarray(a)
    dtype = jnp.result_type(h, a)
    nodes, weights = _gl20(dtype)  # t in (0, 2)
    # map t = a/2 * nodes, dt = a/2 * weights
    t = 0.5 * a[..., None] * nodes
    integrand = jnp.exp(-0.5 * (h[..., None] ** 2) * (1.0 + t * t)) / (1.0 + t * t)
    return (0.5 / _2PI) * jnp.sum(weights * integrand, axis=-1) * a


def _bvnu_finite(h, k, r):
    """P(X > h, Y > k) for standard bivariate normal, finite h/k, |r| < 1.

    Same two-regime structure as Genz (reference bvn.py:105-176) with sanitized
    branch operands.
    """
    dtype = jnp.result_type(h, k, r)
    h = jnp.asarray(h, dtype)
    k = jnp.asarray(k, dtype)
    r = jnp.asarray(r, dtype)
    hk = h * k
    itp = 1.0 / _2PI
    x, w = _gl20(dtype)

    tiny = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-18, dtype)

    # ---- moderate-correlation regime: |r| <= 0.925 -------------------------------
    r_mod = jnp.clip(r, -0.925, 0.925)
    asr = 0.5 * jnp.arcsin(r_mod)
    sn = jnp.sin(asr[..., None] * x)
    expo = (sn * hk[..., None] - 0.5 * (h * h + k * k)[..., None]) / (1.0 - sn * sn)
    mod = jnp.sum(w * jnp.exp(expo), axis=-1) * itp * asr + ndtr(-h) * ndtr(-k)

    # ---- strong-correlation regime: |r| > 0.925 ----------------------------------
    sgn = jnp.where(r < 0, -1.0, 1.0).astype(dtype)
    ks = k * sgn
    hks = hk * sgn
    r_str = jnp.clip(jnp.abs(r), 0.925, 1.0) * sgn  # sanitize for unused lanes
    a2 = jnp.maximum(1.0 - r_str * r_str, tiny)
    a = jnp.sqrt(a2)
    bs = jnp.maximum((h - ks) ** 2, tiny)
    b = jnp.sqrt(bs)
    c = 0.125 * (4.0 - hks)
    d = 0.0125 * (12.0 - hks)

    asr1 = -0.5 * (bs / a2 + hks)
    term1 = jnp.where(
        asr1 > -100.0,
        a * jnp.exp(asr1) * (1.0 - c * (bs - a2) * (1.0 - d * bs) / 3.0 + c * d * a2 * a2),
        0.0,
    )
    sp = jnp.sqrt(_2PI) * ndtr(-b / a)
    term2 = jnp.where(
        hks > -100.0,
        jnp.exp(-0.5 * hks) * sp * b * (1.0 - c * bs * (1.0 - d * bs) / 3.0),
        0.0,
    )
    res = term1 - term2

    ah = 0.5 * a
    xs = (ah[..., None] * x) ** 2
    asr2 = -0.5 * (bs[..., None] / xs + hks[..., None])
    sp2 = 1.0 + c[..., None] * xs * (1.0 + 5.0 * d[..., None] * xs)
    rs = jnp.sqrt(jnp.maximum(1.0 - xs, tiny))
    ep = jnp.exp(-0.5 * hks[..., None] * xs / (1.0 + rs) ** 2) / rs
    deltas = jnp.where(asr2 > -100.0, w * jnp.exp(asr2) * (sp2 - ep), 0.0)
    res = itp * (ah * jnp.sum(deltas, axis=-1) - res)

    # piece together the strong-correlation tail cases (reference bvn.py:166-173)
    pos = res + ndtr(-jnp.maximum(h, ks))
    neg = jnp.where(
        h >= ks,
        -res,
        jnp.where(h < 0, ndtr(ks) - ndtr(h) - res, ndtr(-h) - ndtr(-ks) - res),
    )
    strong = jnp.where(r > 0, pos, neg)

    out = jnp.where(jnp.abs(r) < 0.925, mod, strong)
    return jnp.clip(out, 0.0, 1.0)


import jax


@jax.custom_jvp
def bvnu(h: jnp.ndarray, k: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Upper-right bivariate normal probability P(X > h, Y > k) (reference bvn.py:88-101).

    Handles infinite bounds via select; finite math happens on clamped operands.
    Derivatives come from the exact closed forms (custom JVP below) rather than
    differentiating the Genz quadrature — the quadrature's strong-correlation
    branch has unstable autodiff near |r| -> 1 (NaN policy-squash gradients at
    saturated policies were traced to it), while the closed forms are products
    of phi/Phi and a clamped bivariate density, bounded everywhere.
    """
    h, k, r = jnp.broadcast_arrays(*map(jnp.asarray, (h, k, r)))
    dtype = jnp.result_type(h, k, r)
    big = jnp.asarray(37.5, dtype)  # beyond ndtr resolution in f64
    hc = jnp.clip(h, -big, big)
    kc = jnp.clip(k, -big, big)
    core = _bvnu_finite(hc, kc, r)
    empty = jnp.logical_or(h == jnp.inf, k == jnp.inf)
    both_lo = jnp.logical_and(h == -jnp.inf, k == -jnp.inf)
    out = core
    out = jnp.where(h == -jnp.inf, ndtr(-kc), out)
    out = jnp.where(k == -jnp.inf, ndtr(-hc), out)
    out = jnp.where(both_lo, 1.0, out)
    out = jnp.where(empty, 0.0, out)
    return out


@bvnu.defjvp
def _bvnu_jvp(primals, tangents):
    """Exact derivatives of P(X > h, Y > k):
        d/dh = -phi(h) Phi((r h - k)/sqrt(1-r^2))
        d/dk = -phi(k) Phi((r k - h)/sqrt(1-r^2))
        d/dr = phi_2(h, k; r)   (the bivariate normal density)

    Bounded by construction: r is clamped away from +/-1 and the density's
    quadratic form is clamped at >= 0 (exact for every |r| <= 1, since
    h^2 - 2rhk + k^2 >= (|h| - |k|)^2 >= 0 there). Without the clamps, a
    correlation that rounds to 1 + eps — which f32 ``v * rsqrt(1+v)^2`` produces
    for large v, i.e. a saturated policy squash — makes the quadratic form
    negative and exp(-quad) overflows to inf; one inf gradient turns
    clip_by_global_norm's rescale into 0 * inf = NaN across every parameter.
    This was round 1's "NaN policy-squash gradient" (ROADMAP item 1).
    """
    h, k, r = primals
    dh, dk, dr = tangents
    h, k, r = jnp.broadcast_arrays(*map(jnp.asarray, (h, k, r)))
    dtype = jnp.result_type(h, k, r)
    out = bvnu(h, k, r)

    inv_sqrt2pi = 1.0 / math.sqrt(2.0 * math.pi)
    eps = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-6, dtype)
    rc = jnp.clip(r, eps - 1.0, 1.0 - eps)
    s2 = 1.0 - rc * rc  # >= 2*eps - eps^2 > 0 after the clamp
    inv_s = jax.lax.rsqrt(s2)
    phi_h = inv_sqrt2pi * jnp.exp(-0.5 * h * h)
    phi_k = inv_sqrt2pi * jnp.exp(-0.5 * k * k)
    d_dh = -phi_h * ndtr((rc * h - k) * inv_s)
    d_dk = -phi_k * ndtr((rc * k - h) * inv_s)
    quad = jnp.maximum(h * h - 2.0 * rc * h * k + k * k, 0.0) / (2.0 * s2)
    d_dr = jnp.exp(-quad) * inv_s / _2PI

    tangent_out = d_dh * dh + d_dk * dk + d_dr * dr
    return out, tangent_out


def bvn(xl, xu, yl, yu, r) -> jnp.ndarray:
    """Rectangle probability P(xl < X < xu, yl < Y < yu) (reference bvn.py:67-85)."""
    p = bvnu(xl, yl, r) - bvnu(xu, yl, r) - bvnu(xl, yu, r) + bvnu(xu, yu, r)
    return jnp.clip(p, 0.0, 1.0)


def bvn_cdf(h, k, r) -> jnp.ndarray:
    """Lower-left CDF P(X <= h, Y <= k) = bvnu(-h, -k, r)."""
    return bvnu(-jnp.asarray(h), -jnp.asarray(k), r)
