"""Double-float ("dd") f32-pair arithmetic for the compensated MM recursion.

Why this exists (VERDICT r3 #2; docs/perf_notes.md round-3 precision study):
the 30-step moment-matched rollout at a FITTED drift is chaos-dominated —
1e-7 relative rounding anywhere in the drift-match signal path lands the
recursion on a different trajectory, decorrelating the f32 policy gradient
from the f64 truth (cos -0.23 at the round-3 mm_small checkpoint). The
production fix so far runs the carry + drift match in software-emulated f64
(the DtypeIsland lever, cos 0.999999) at 107 ms/loss+grad on a v5e — slower
than the CPU-f64 run it chases, because the v5e has no f64 ALU and XLA's
emulation pays for full f64 semantics on every op, transcendentals included.

This module implements the classic error-free-transformation double-word
arithmetic (Dekker 1971; Knuth TAOCP 4.2.2; Hida/Li/Bailey's QD library
algorithms, re-derived for f32 pairs) directly in JAX f32 ops: every value is
an unevaluated sum hi + lo with |lo| <= ulp(hi)/2, giving ~2^-48 relative
precision (~3.6e-15) from pure f32 VPU instructions. Over the 30-step horizon
with Lyapunov amplification ~1e7-1e8, per-op errors of ~1e-14 end at ~1e-6
trajectory divergence — comfortably inside the gradient-cosine budget, at
f32 hardware speed (no emulated-f64 matmuls/exp, Pallas-compatible dtypes).

Differentiation contract: reverse-mode AD runs through these ops with plain
f32 cotangent arithmetic. That is sound because the adjoint recursion is
LINEAR in the cotangents — rounding noise injected into an adjoint is
amplified by exactly the same Jacobian products as the adjoint itself, so
relative gradient error stays ~sqrt(T)*eps_f32 instead of compounding (the
forward recursion is the nonlinear one, where trajectory error changes the
Jacobians; that is what the dd forward fixes). Transcendentals carry
custom_jvp rules so the backward graph reuses the primal value instead of
differentiating through the Taylor kernels.

No counterpart in the reference (it inherits f64 from TF on CPU/GPU);
the precision problem is TPU-specific.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32


class DD(NamedTuple):
    """A double-float value: the unevaluated exact sum ``hi + lo``."""

    hi: jax.Array
    lo: jax.Array

    @property
    def shape(self):
        return jnp.shape(self.hi)

    def astype_f64(self):
        return jnp.asarray(self.hi, jnp.float64) + jnp.asarray(self.lo, jnp.float64)


def _f32(x):
    return jnp.asarray(x, _F32)


def eft_compiler_options():
    """Per-jit XLA options that keep EFT semantics intact. Pass to
    jax.jit(..., compiler_options=...) on every jit whose graph contains dd
    arithmetic.

    XLA's ALGEBRAIC SIMPLIFIER is value-changing for compensated arithmetic
    on EVERY backend: its float rewrites (e.g. collapsing (a+b)-a chains)
    erase the two_sum/two_prod compensation terms. Round 4 found the
    CPU-side combination (constant folding + algsimp) and the CPU fusion
    pass's LLVM reassociation; round 5 found algsimp firing destructively
    on TPU too — but only in SOME compiled artifacts of the same
    computation (the fitted-checkpoint value_and_grad graph NaN'd /
    returned finite-but-f32-grade values while the value-only and
    training-scan artifacts of the identical math were exact;
    docs/perf_notes.md round 5). Correctness must not depend on which
    fusion/simplification choices a particular graph shape tickles, so dd
    jits disable algsimp everywhere, plus fusion on CPU (the LLVM
    reassociation + pathological producer-duplication recompute,
    round 4)."""
    if jax.default_backend() == "cpu":
        return {"xla_disable_hlo_passes": "fusion,algsimp"}
    return {"xla_disable_hlo_passes": "algsimp"}


def jit(fun, **kwargs):
    """jax.jit with eft_compiler_options applied (see that docstring)."""
    opts = eft_compiler_options()
    if opts is not None:
        kwargs.setdefault("compiler_options", opts)
    return jax.jit(fun, **kwargs)


def lift(x) -> DD:
    """Exact embedding of an f32 array (lo = 0)."""
    h = _f32(x)
    return DD(h, jnp.zeros_like(h))


def one_like(x) -> DD:
    """dd 1.0 with the constant made OPAQUE to the compiler.

    HLO constant folding + the algebraic simplifier jointly rewrite two_sum
    chains that involve a literal constant (measured: the dd cos head
    collapsed to f32 accuracy on XLA:CPU even at LLVM -O0; either pass
    disabled alone restores exactness). An optimization_barrier around the
    constant blocks the folding half of that pair at ~zero runtime cost.
    Use this (or ``opaque_f``) whenever a literal feeds a two_sum/add path."""
    h = jax.lax.optimization_barrier(jnp.ones_like(_f32(x)))
    return DD(h, jnp.zeros_like(h))


def opaque_f(f):
    """Barrier-wrap an f32 scalar/array before it enters an EFT chain (see
    one_like): no-op for runtime values, folding-blocker for literals."""
    return jax.lax.optimization_barrier(_f32(f))


def from_f64(x) -> DD:
    """Split a float64 array into an f32 pair (exact to ~2^-48).

    Host numpy split unless handed a float64 jax array under enabled x64 (the
    cache-conversion path) — without x64, jnp would silently truncate."""
    if isinstance(x, jax.Array) and x.dtype == jnp.float64:
        hi = jnp.asarray(x, _F32)
        lo = jnp.asarray(x - jnp.asarray(hi, jnp.float64), _F32)
        return DD(hi, lo)
    x = np.asarray(x, np.float64)
    hi = np.asarray(x, np.float32)
    lo = np.asarray(x - np.asarray(hi, np.float64), np.float32)
    return DD(jnp.asarray(hi), jnp.asarray(lo))


def const(x) -> DD:
    """dd constant from a python float (host-side split, no x64 needed)."""
    hi = np.float32(x)
    lo = np.float32(float(x) - float(hi))
    return DD(jnp.asarray(hi), jnp.asarray(lo))


# ---------------------------------------------------------------- error-free cores
def two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly (no magnitude assumption)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Fast two-sum; requires |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


with jax.ensure_compile_time_eval():  # trace-proof module constant (see below)
    _SPLITTER = _F32(4097.0)  # 2^12 + 1 (Veltkamp split, 24-bit significands)


def _split(a):
    """Veltkamp split: a == a_hi + a_lo with both halves 12-bit."""
    c = _SPLITTER * a
    a_hi = c - (c - a)
    a_lo = a - a_hi
    return a_hi, a_lo


def two_prod(a, b):
    """Dekker product: p + e == a * b exactly."""
    p = a * b
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


# ---------------------------------------------------------------- ring operations
def add(x: DD, y: DD) -> DD:
    """Accurate dd + dd (Knuth/QD ieee_add)."""
    s_hi, s_lo = two_sum(x.hi, y.hi)
    t_hi, t_lo = two_sum(x.lo, y.lo)
    c = s_lo + t_hi
    v_hi, v_lo = quick_two_sum(s_hi, c)
    w = t_lo + v_lo
    return DD(*quick_two_sum(v_hi, w))


def add_f(x: DD, f) -> DD:
    """dd + f32 (the scalar is barrier-wrapped: a literal here would
    otherwise be folding bait for the constant+algsimp EFT rewrite —
    see one_like)."""
    s_hi, s_lo = two_sum(x.hi, opaque_f(f))
    s_lo = s_lo + x.lo
    return DD(*quick_two_sum(s_hi, s_lo))


def neg(x: DD) -> DD:
    return DD(-x.hi, -x.lo)


def sub(x: DD, y: DD) -> DD:
    return add(x, neg(y))


def sub_f(x: DD, f) -> DD:
    return add_f(x, -_f32(f))


def mul(x: DD, y: DD) -> DD:
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return DD(*quick_two_sum(p, e))


def mul_f(x: DD, f) -> DD:
    """dd * f32 (f exact, e.g. an integer-valued scale or an f32 island value)."""
    f = _f32(f)
    p, e = two_prod(x.hi, f)
    e = e + x.lo * f
    return DD(*quick_two_sum(p, e))


def mul_pow2(x: DD, s) -> DD:
    """Exact scaling by a power of two."""
    s = _f32(s)
    return DD(x.hi * s, x.lo * s)


def div(x: DD, y: DD) -> DD:
    """Accurate dd / dd by iterated quotient refinement (QD accurate_div)."""
    q1 = x.hi / y.hi
    r = sub(x, mul_f(y, q1))
    q2 = r.hi / y.hi
    r = sub(r, mul_f(y, q2))
    q3 = r.hi / y.hi
    s_hi, s_lo = quick_two_sum(q1, q2)
    return add_f(DD(s_hi, s_lo), q3)


def recip(y: DD) -> DD:
    return div(one_like(y.hi), y)


def where(c, x: DD, y: DD) -> DD:
    return DD(jnp.where(c, x.hi, y.hi), jnp.where(c, x.lo, y.lo))


def dmax(x: DD, y: DD) -> DD:
    ge = (x.hi > y.hi) | ((x.hi == y.hi) & (x.lo >= y.lo))
    return where(ge, x, y)


# ---------------------------------------------------------------- reductions
def _pow2_from_exp(e):
    """Exact 2^e for int32 e in the normal range (exponent-bit construction —
    see the dd exp scaling note)."""
    e = jnp.clip(e, -126, 127)
    return jax.lax.bitcast_convert_type((e + 127) << 23, _F32)


def _next_pow2_exp(m):
    """int32 e with 2^e >= m (m > 0), from the f32 exponent bits."""
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    expo = ((bits >> 23) & 0xFF) - 127
    # 2^expo <= m < 2^(expo+1); bump unless m is an exact power of two
    frac_zero = (bits & 0x7FFFFF) == 0
    return jnp.where(frac_zero, expo, expo + 1)


def dsum(x: DD, axis: int) -> DD:
    """Accurate sum along ``axis`` via Rump-Ogita-Oishi error-free extraction
    (AccSum, SIAM J. Sci. Comput. 2008, re-derived for f32 pairs).

    Two extraction levels + a tail sum give ~2^-48-grade accuracy using only
    large vectorized ops (3 plain sums + a few elementwise passes). This
    deliberately avoids pairwise dd-add trees: their log2(n) sliced levels
    triggered a pathological recompute in XLA:CPU codegen (minutes for an
    M=64 grid), while big reductions lower to ordinary fast loops on every
    backend — and to efficient VPU reductions on TPU.

    Level exactness: with sigma = 2^e >= n * max|a| a power of two, the
    extracted heads q_i = fl((sigma + a_i) - sigma) are multiples of
    ulp(sigma) with |sum q_i| <= sigma, so jnp.sum adds them EXACTLY; the
    residuals a_i - q_i are exact by Sterbenz. sigma is runtime-derived (no
    constant-folding hazard; see one_like)."""
    hi = jnp.moveaxis(x.hi, axis, -1)
    lo = jnp.moveaxis(x.lo, axis, -1)
    # the hi and lo words are treated as one 2n-addend f32 sum, but WITHOUT
    # concatenating them: a max-of-abs-of-concat over this producer graph
    # tripped yet another pathological XLA:CPU codegen corner (stage-11 probe,
    # round-4 investigation); per-word extraction on a shared sigma grid is
    # mathematically identical (two exact sums of same-grid multiples)
    n2 = 2 * hi.shape[-1]
    log2n = max(1, (n2 - 1).bit_length())

    def extract(h, l):
        m = jnp.maximum(
            jnp.max(jnp.abs(h), axis=-1, keepdims=True),
            jnp.max(jnp.abs(l), axis=-1, keepdims=True),
        )
        e = _next_pow2_exp(jnp.maximum(m, jnp.finfo(_F32).tiny)) + log2n
        sigma = _pow2_from_exp(e)
        qh = (sigma + h) - sigma
        ql = (sigma + l) - sigma
        t = jnp.sum(qh, axis=-1) + jnp.sum(ql, axis=-1)  # exact (docstring)
        return t, h - qh, l - ql

    # each level clears ~(24 - log2n) mantissa bits of residual, so three
    # levels + an f32 tail reach ~2^-48 even at n = 4096 (two levels measured
    # 6e-13 on the 4096-dot test — not enough)
    t1, rh, rl = extract(hi, lo)
    t2, rh, rl = extract(rh, rl)
    t3, rh, rl = extract(rh, rl)
    t4 = jnp.sum(rh, axis=-1) + jnp.sum(rl, axis=-1)  # fourth-order tail
    s = DD(*two_sum(t1, t2))
    s = add(s, DD(*two_sum(t3, t4)))
    return s


def dot(x: DD, y: DD, axis: int = -1) -> DD:
    """Accurate contraction sum(x*y) along ``axis``."""
    return dsum(mul(x, y), axis)


# ---------------------------------------------------------------- transcendentals
# constants (split host-side from full-precision decimal literals).
# ensure_compile_time_eval: guards against this module's first import
# happening inside a jit trace, which would cache tracer-era constants in
# module globals and crash the next trace (see ops/dd_special.py note).
with jax.ensure_compile_time_eval():
    _LN2 = const(0.6931471805599453094)
    _PIO2 = const(1.5707963267948966192)
    _INV_LN2 = _F32(1.4426950408889634)
    _INV_PIO2 = _F32(0.6366197723675814)
# dd reciprocal factorials for the high-order Taylor heads
with jax.ensure_compile_time_eval():
    _INV_FACT = {k: const(1.0 / math.factorial(k)) for k in range(2, 9)}


def _exp_primal(x: DD) -> DD:
    """exp on dd: 2^k * P(r), r = x - k ln2 in [-ln2/2, ln2/2].

    Taylor head through r^6 in dd + f32 tail (degrees 7-13): tail terms are
    <= r^7/5040 ~ 1.6e-7, so f32 tail evaluation contributes ~1e-14 relative
    error — inside the dd budget."""
    k = jnp.round(x.hi * _INV_LN2)
    r = sub(x, mul_f(_LN2, k))
    rh = r.hi
    # f32 tail: sum_{j=7..13} r^j / j!  (Horner on hi part)
    tail = _F32(1.0 / math.factorial(13))
    for j in range(12, 6, -1):
        tail = tail * rh + _F32(1.0 / math.factorial(j))
    r2 = mul(r, r)
    r3 = mul(r2, r)
    r4 = mul(r2, r2)
    r6 = mul(r4, r2)
    p = add(r, one_like(rh))
    p = add(p, mul(r2, _INV_FACT[2]))
    p = add(p, mul(r3, _INV_FACT[3]))
    p = add(p, mul(r4, _INV_FACT[4]))
    p = add(p, mul(mul(r4, r), _INV_FACT[5]))
    p = add(p, mul(r6, _INV_FACT[6]))
    p = add(p, mul_f(mul(r6, r), tail))
    # exact 2^k scaling built from exponent bits — jnp.exp2 lowers to
    # exp(k ln2) on some backends and is only f32-accurate (~1.5e-6), which
    # would defeat the whole dd exp. Clamp k into the normal-exponent range
    # and flush the deep-underflow region to zero (kernel-expectation tails:
    # values below f32-normal are numerically irrelevant against O(1) entries)
    kc = jnp.clip(k, -126.0, 127.0)
    scale = jax.lax.bitcast_convert_type(
        (jnp.asarray(kc, jnp.int32) + 127) << 23, _F32
    )
    out = DD(p.hi * scale, p.lo * scale)
    return where(x.hi < -87.0, lift(jnp.zeros_like(x.hi)), out)


@jax.custom_jvp
def exp(x: DD) -> DD:
    return _exp_primal(x)


@exp.defjvp
def _exp_jvp(primals, tangents):
    (x,) = primals
    (tx,) = tangents
    e = _exp_primal(x)
    te = mul(e, DD(tx.hi, tx.lo))
    return e, DD(te.hi, te.lo)


def _sincos_primal(x: DD):
    """(sin x, cos x) on dd via pi/2 reduction + Taylor heads.

    sin head through r^7 (f32 tail from r^9: <= 3.1e-7 -> ~2e-14 error);
    cos head through r^8 (f32 tail from r^10: <= 2.5e-8 -> ~2e-15)."""
    k = jnp.round(x.hi * _INV_PIO2)
    r = sub(x, mul_f(_PIO2, k))
    rh = r.hi
    r2 = mul(r, r)
    r2h = r2.hi
    r4 = mul(r2, r2)
    r6 = mul(r4, r2)
    r8 = mul(r4, r4)
    # sin(r) = r - r^3/6 + r^5/120 - r^7/5040 + r^9 * tail_s(r^2)
    tail_s = _F32(1.0 / math.factorial(13))
    for j in (11, 9):
        tail_s = tail_s * r2h + _F32(
            (1.0 if (j - 1) % 4 == 0 else -1.0) / math.factorial(j)
        )
    sin_r = add(
        sub(r, mul(mul(r2, r), _INV_FACT[3])),
        sub(
            mul(mul(r4, r), _INV_FACT[5]),
            mul(mul(r6, r), _INV_FACT[7]),
        ),
    )
    sin_r = add(sin_r, mul_f(mul(r8, r), tail_s))
    # cos(r) = 1 - r^2/2 + r^4/24 - r^6/720 + r^8/40320 + r^10 * tail_c(r^2)
    tail_c = _F32(-1.0 / math.factorial(14))
    for j in (12, 10):
        tail_c = tail_c * r2h + _F32(
            (1.0 if j % 4 == 0 else -1.0) / math.factorial(j)
        )
    cos_r = add(
        sub(one_like(rh), mul(r2, _INV_FACT[2])),
        sub(mul(r4, _INV_FACT[4]), mul(r6, _INV_FACT[6])),
    )
    cos_r = add(cos_r, mul(r8, _INV_FACT[8]))
    cos_r = add(cos_r, mul_f(mul(r8, r2), tail_c))
    # quadrant dispatch: m = k mod 4
    m = k - 4.0 * jnp.floor(k * 0.25)
    sin_out = where(
        m == 0.0, sin_r,
        where(m == 1.0, cos_r, where(m == 2.0, neg(sin_r), neg(cos_r))),
    )
    cos_out = where(
        m == 0.0, cos_r,
        where(m == 1.0, neg(sin_r), where(m == 2.0, neg(cos_r), sin_r)),
    )
    return sin_out, cos_out


@jax.custom_jvp
def sincos(x: DD):
    return _sincos_primal(x)


@sincos.defjvp
def _sincos_jvp(primals, tangents):
    (x,) = primals
    (tx,) = tangents
    s, c = _sincos_primal(x)
    tx = DD(tx.hi, tx.lo)
    return (s, c), (mul(c, tx), neg(mul(s, tx)))


def _sqrt_primal(x: DD) -> DD:
    """sqrt on dd (Karp's high-precision trick): f32 rsqrt + one f32 Newton
    gives s ~= sqrt to f32; the dd correction (x - s^2) * r/2 lands ~2^-48."""
    r = jax.lax.rsqrt(x.hi)
    r = r * (_F32(1.5) - _F32(0.5) * x.hi * r * r)
    s = x.hi * r
    p, e = two_prod(s, s)
    d = sub(x, DD(p, e))
    corr = d.hi * (_F32(0.5) * r)
    out = DD(*quick_two_sum(s, corr))
    return where(x.hi <= 0.0, lift(jnp.zeros_like(x.hi)), out)


@jax.custom_jvp
def sqrt(x: DD) -> DD:
    return _sqrt_primal(x)


@sqrt.defjvp
def _sqrt_jvp(primals, tangents):
    (x,) = primals
    (tx,) = tangents
    s = _sqrt_primal(x)
    # ds = tx / (2 sqrt); f32-grade quotient is enough for cotangents
    denom = jnp.maximum(s.hi, jnp.finfo(_F32).tiny)
    th = (tx.hi + tx.lo) / (2.0 * denom)
    return s, DD(th, jnp.zeros_like(th))
