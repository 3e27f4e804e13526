"""dd moment-matched rollout: encoder match, f32 policy island, composition,
Euler carry — the full per-step recursion of the MM policy loss in
double-float, mirroring the production f64-island composition
(loops/pilco.py _mm_rollout_loss + dynamics/forward.py forward_moments +
dynamics/solvers.py moment_matching_euler_rollout) piece for piece:

  * carry (mean, cov):            dd            (was: emulated f64)
  * SinCos encoder match:         dd            (was: f64)
  * policy chain match:           f32 island    (same as DtypeIsland)
  * joint PSD guard:              f32 eigvalsh, boost applied in dd
                                  (stop-gradient jitter; usually exactly 0)
  * SVGP drift match:             dd            (dd_match.dd_match_svgp)
  * Euler update + symmetrize:    dd            (cov_jitter 0, as in f64)
  * cost tail:                    f32 on the stacked hi moments (the island
                                  study's cost64 variant showed the tail is
                                  precision-irrelevant)

Reference semantics: forward_sde.py:34-137 composition; solvers.py:108-135
Euler covariance update. The precision engineering is TPU-specific.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..moments import GaussianMoments
from ..ops import dd
# EAGER import: dd_special builds module-level jnp constants (GL node/weight
# grids). A lazy import inside a traced function would execute that module
# init DURING the trace, caching tracer-era constants in module globals and
# crashing the NEXT trace in the process with UnexpectedTracerError
# (observed: the K=4 multistart chunk trace after the loss+grad trace,
# scripts/dd_compile_probe.py round 5).
from ..ops import dd_special  # noqa: F401
from ..ops.dd import DD
from .dd_match import (
    DDMatch,
    DDMoments,
    DDSVGPCache,
    dconcat,
    dd_match_svgp,
    dindex,
    dmatmul,
    dstack,
    dswap,
)


# ---------------------------------------------------------------- SinCos match
def dd_sincos_match(x: DDMoments) -> DDMatch:
    """dd mirror of rules.SinCos.moment_match: exact trig moments with the
    sin-cos cross block (reference maths.py:143-176)."""
    m, s = x.mean, x.cov
    d = m.hi.shape[-1]
    # diagonal variance, clamped at 0 (exact for valid inputs)
    v = DD(
        jnp.diagonal(s.hi, axis1=-2, axis2=-1),
        jnp.diagonal(s.lo, axis1=-2, axis2=-1),
    )
    zero = dd.lift(jnp.zeros_like(v.hi))
    v = dd.dmax(v, zero)

    vpv = dd.add(
        DD(v.hi[..., :, None], v.lo[..., :, None]),
        DD(v.hi[..., None, :], v.lo[..., None, :]),
    )
    spst = dd.add(s, dswap(s))
    a_t = dd.exp(dd.mul_pow2(dd.neg(dd.add(vpv, spst)), 0.5))
    b_t = dd.exp(dd.mul_pow2(dd.neg(dd.sub(vpv, spst)), 0.5))
    madd = dd.add(
        DD(m.hi[..., :, None], m.lo[..., :, None]),
        DD(m.hi[..., None, :], m.lo[..., None, :]),
    )
    msub = dd.sub(
        DD(m.hi[..., :, None], m.lo[..., :, None]),
        DD(m.hi[..., None, :], m.lo[..., None, :]),
    )
    ev = dd.exp(dd.mul_pow2(dd.neg(v), 0.5))

    sin_m, cos_m = dd.sincos(m)
    sin_madd, cos_madd = dd.sincos(madd)
    sin_msub, cos_msub = dd.sincos(msub)

    s1 = dd.mul(ev, sin_m)
    c1 = dd.mul(ev, cos_m)

    ss = dd.mul_pow2(dd.sub(dd.mul(b_t, cos_msub), dd.mul(a_t, cos_madd)), 0.5)
    cc = dd.mul_pow2(dd.add(dd.mul(b_t, cos_msub), dd.mul(a_t, cos_madd)), 0.5)
    sc = dd.mul_pow2(dd.add(dd.mul(b_t, sin_msub), dd.mul(a_t, sin_madd)), 0.5)

    y1 = dconcat([s1, c1], axis=-1)
    top = dconcat([ss, sc], axis=-1)
    bot = dconcat([dswap(sc), cc], axis=-1)
    raw2 = dconcat([top, bot], axis=-2)
    cov = dd.sub(
        raw2,
        dd.mul(
            DD(y1.hi[..., :, None], y1.lo[..., :, None]),
            DD(y1.hi[..., None, :], y1.lo[..., None, :]),
        ),
    )

    eye = jnp.eye(d, dtype=c1.hi.dtype)
    def _diag_embed(t: DD) -> DD:
        return DD(eye * t.hi[..., None, :], eye * t.lo[..., None, :])

    cross = dconcat([_diag_embed(c1), _diag_embed(dd.neg(s1))], axis=-1)
    y = DDMoments(mean=y1, cov=cov)
    return DDMatch(x=x, y=y, cross=cross, preinv=True)


# ---------------------------------------------------------------- encoder
def dd_encoder_match(encoder, x: DDMoments) -> DDMatch:
    """dd mirror of components.Encoder.moment_match (SinCos transform):
    partition/stitch index surgery on dd moments, with the transform match in
    dd. cross is returned RAW (preinv=False), as in the f32/f64 path."""
    d = x.mean.hi.shape[-1]
    active, inactive = encoder.partition(d)
    a_idx = list(active)
    mean_a = dindex(x.mean, (..., a_idx))
    sxa = dindex(x.cov, (..., slice(None), a_idx))  # (..., D, Da)
    saa = dindex(sxa, (..., a_idx, slice(None)))  # (..., Da, Da)
    match_t = dd_sincos_match(DDMoments(mean=mean_a, cov=saa))
    # Cov(x, T(a)) = Cov(x, a) @ preinv-cross (Stein)
    sxy_t = dmatmul(sxa, match_t.cross)  # (..., D, Dy)

    if not inactive:
        return DDMatch(x=x, y=match_t.y, cross=sxy_t, preinv=False)

    b_idx = list(inactive)
    mean_b = dindex(x.mean, (..., b_idx))
    sxb = dindex(x.cov, (..., slice(None), b_idx))  # (..., D, Db)
    sbb = dindex(sxb, (..., b_idx, slice(None)))
    sby = dindex(sxy_t, (..., b_idx, slice(None)))  # (..., Db, Dy)

    y_mean = dconcat([match_t.y.mean, mean_b], axis=-1)
    top = dconcat([match_t.y.cov, dswap(sby)], axis=-1)
    bot = dconcat([sby, sbb], axis=-1)
    y_cov = dconcat([top, bot], axis=-2)
    cross = dconcat([sxy_t, sxb], axis=-1)
    return DDMatch(x=x, y=DDMoments(mean=y_mean, cov=y_cov), cross=cross, preinv=False)


# ---------------------------------------------------------------- glue
def dd_psd_boost(mom: DDMoments) -> DDMoments:
    """PSD guard on a dd covariance: symmetrize in dd, lambda_min from the hi
    part in f32 (the boost is a stop-gradient jitter whose own precision is
    irrelevant — it only needs to upper-bound -lambda_min), applied in dd."""
    cov = dd.mul_pow2(dd.add(mom.cov, dswap(mom.cov)), 0.5)
    lam_min = jnp.min(jnp.linalg.eigvalsh(cov.hi), axis=-1)
    # 1+2^-10 headroom: lam_min comes from the f32 hi part only
    boost = jax.lax.stop_gradient(
        jnp.maximum(-lam_min, 0.0) * jnp.float32(1.0009765625)
    )
    eye = jnp.eye(cov.hi.shape[-1], dtype=cov.hi.dtype)
    boosted = dd.add(cov, dd.lift(eye * boost[..., None, None]))
    return DDMoments(mean=mom.mean, cov=boosted)


class DDPolicyIsland(NamedTuple):
    """f32 policy-chain island inside the dd composition (the DtypeIsland
    counterpart): the match runs at f32 on the hi parts; outputs lift exactly."""

    chain: object  # a moment-matchable f32 transform (Chain)

    def moment_match(self, x: DDMoments):
        xm = GaussianMoments(mean=x.mean.hi, cov=x.cov.hi)
        m = self.chain.moment_match(xm)
        return m  # f32 GaussianMatch; caller lifts the pieces it needs


def dd_forward_moments(
    x: DDMoments, drift_cache: DDSVGPCache, drift_meta: dict, policy, encoder
) -> DDMatch:
    """dd mirror of forward_moments' full case (encoder + policy + drift):
    e = enc(x), u = policy(e), d = (e, u), f = drift(d). The policy is either
    a DDPolicyIsland (f32 chain, DtypeIsland semantics) or a DDPolicyChain
    (full dd)."""
    dx = x.mean.hi.shape[-1]
    match_encoder = dd_encoder_match(encoder, x)
    sxe = match_encoder.cross  # raw (..., Dx, De), dd

    match_policy = policy.moment_match(match_encoder.y)
    if isinstance(match_policy, DDMatch):  # full-dd policy chain
        assert match_policy.preinv
        u_mean = match_policy.y.mean
        u_cov = match_policy.y.cov
        pol_cross_pre = match_policy.cross
    else:  # f32 island: lift the pieces exactly
        u_mean = dd.lift(match_policy.y.mean)
        u_cov = dd.lift(match_policy.y.cov)
        pol_cross_pre = dd.lift(match_policy.cross_covariance(preinv=True))

    # joint d = (e, u): e-blocks stay dd (the DtypeIsland keeps the OUTER x)
    e = match_encoder.y
    seu = dmatmul(e.cov, pol_cross_pre)  # (..., De, U)
    d_mean = dconcat([e.mean, u_mean], axis=-1)
    top = dconcat([e.cov, seu], axis=-1)
    bot = dconcat([dswap(seu), u_cov], axis=-1)
    d_cov = dconcat([top, bot], axis=-2)
    d_mom = dd_psd_boost(DDMoments(mean=d_mean, cov=d_cov))

    match_drift = dd_match_svgp(drift_cache, drift_meta, d_mom)

    sxu = dmatmul(sxe, pol_cross_pre)  # (..., Dx, U)
    sxd = dconcat([sxe, sxu], axis=-1)
    sxf = dmatmul(sxd, match_drift.cross)  # (..., Dx, F)
    return DDMatch(x=x, y=match_drift.y, cross=sxf, preinv=False)


# ---------------------------------------------------------------- rollout
def dd_mm_euler_rollout(
    forward, x0: DDMoments, dt: float, num_steps: int, unroll: int = 1
):
    """dd mirror of moment_matching_euler_rollout (cov_jitter = 0, as in the
    f64 island path): scan the dd Euler update, stack per-step hi moments for
    the (f32) cost tail."""
    ts = dt * (1.0 + jnp.arange(num_steps, dtype=jnp.float32))

    def body(carry, t):
        mean, cov = carry
        match = forward(t, DDMoments(mean=mean, cov=cov))
        mf = match.y.mean
        sff = match.y.cov
        sxf = match.cross  # raw
        new_mean = dd.add(mean, dd.mul_f(mf, jnp.float32(dt)))
        new_cov = dd.add(
            cov,
            dd.add(
                dd.mul_f(dd.add(sxf, dswap(sxf)), jnp.float32(dt)),
                dd.mul_f(sff, jnp.float32(dt * dt)),
            ),
        )
        new_cov = dd.mul_pow2(dd.add(new_cov, dswap(new_cov)), 0.5)
        return (new_mean, new_cov), (new_mean.hi, new_cov.hi)

    (mean_f, cov_f), (means_hi, covs_hi) = jax.lax.scan(
        body, (x0.mean, x0.cov), ts, unroll=unroll
    )
    return DDMoments(mean=mean_f, cov=cov_f), means_hi, covs_hi


# ---------------------------------------------------------------- dd policy
class DDPolicyChain(NamedTuple):
    """FULL-dd squashed deterministic policy chain (U=1): replaces the f32
    island when PolicySpec.loss_compensated + loss_policy_f32=False.

    Round-4 horizon study: at fitted checkpoints with narrow drift
    lengthscales, the island's f32 policy-match rounding (absolute error
    ~eps*scale^2 on the action moments) is itself the trajectory-diverging
    perturbation — BOTH the f64 island and the dd-carry loss lose gradient
    cosine through it. This chain computes the deterministic SVGP policy
    match AND the probit squash in dd (ops/dd_special.py Phi + Owen-T), so
    the only non-dd piece left in the whole recursion is the (precision-
    irrelevant) cost tail.

    ``cache`` is the TRACED dd policy cache (dd_match.build_dd_policy_cache),
    built once per loss evaluation (it depends on the trainable policy
    parameters, not the state) and closed over by the scan body.
    """

    cache: object  # DDSVGPCache (traced)
    meta_t: tuple  # (L, M, D, pairs)
    scale: jax.Array  # f32 squash scale c: u = c (Phi(g) - 1/2)

    def moment_match(self, x: DDMoments) -> DDMatch:
        from .dd_match import as_meta_dict, dd_match_svgp

        m1 = dd_match_svgp(
            self.cache, as_meta_dict(self.meta_t), x, model_uncertainty=False
        )
        m2 = dd_squashed_probit_match(m1.y, self.scale)
        cross = dmatmul(m1.cross, m2.cross)
        return DDMatch(x=x, y=m2.y, cross=cross, preinv=True)


def dd_squashed_probit_match(x: DDMoments, scale) -> DDMatch:
    """dd mirror of rules.SquashedProbit.moment_match for U=1:
    y = c (Phi(g) - 1/2) with E[Phi^2] via the Owen-T identity
    (ops/dd_special.py)."""
    u = x.mean.hi.shape[-1]
    if u != 1:
        raise NotImplementedError(
            "dd squashed-probit supports single-action policies (U=1); "
            "multi-action MM tasks keep the f32 island"
        )
    m = DD(x.mean.hi[..., 0], x.mean.lo[..., 0])
    v = DD(x.cov.hi[..., 0, 0], x.cov.lo[..., 0, 0])
    v = dd.dmax(v, dd.lift(jnp.zeros_like(v.hi)))  # clamp (rules._trig_terms)

    one_pv = dd.add_f(v, jnp.float32(1.0))
    inv_sqrt_1pv = dd.recip(dd.sqrt(one_pv))
    h = dd.mul(m, inv_sqrt_1pv)
    y1p = dd_special.ndtr(h)
    a = dd.recip(dd.sqrt(dd.add_f(dd.mul_pow2(v, 2.0), jnp.float32(1.0))))
    t_ha = dd_special.owen_t(h, a)
    e2 = dd.sub(y1p, dd.mul_f(t_ha, jnp.float32(2.0)))
    cov_p = dd.sub(e2, dd.mul(y1p, y1p))
    # premultiplied cross: phi(h) / sqrt(1+v)
    phi_h = dd.mul(
        dd.exp(dd.mul_pow2(dd.neg(dd.mul(h, h)), 0.5)),
        dd.const(0.3989422804014326779),
    )
    cross_p = dd.mul(phi_h, inv_sqrt_1pv)

    c = jnp.asarray(scale, jnp.float32)
    y_mean = dd.sub(dd.mul_f(y1p, c), dd.lift(c * jnp.float32(0.5)))
    y_cov = dd.mul_f(cov_p, c * c)
    cross = dd.mul_f(cross_p, c)
    y = DDMoments(
        mean=DD(y_mean.hi[..., None], y_mean.lo[..., None]),
        cov=DD(y_cov.hi[..., None, None], y_cov.lo[..., None, None]),
    )
    return DDMatch(
        x=x,
        y=y,
        cross=DD(cross.hi[..., None, None], cross.lo[..., None, None]),
        preinv=True,
    )
