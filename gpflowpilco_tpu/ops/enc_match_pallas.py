"""Pallas TPU kernel: the trigonometric-encoder moment match as one fused op.

Third fusion phase of the MM rollout step (after the whole-match SVGP/GPR
kernels in mm_match_pallas.py): the encoder match — exact sincos moments of the
active dims plus the joint-covariance stitch (reference
moment_matching/components.py:19-57, maths.py:143-176) — is ~15 tiny HLOs in
each direction of a dispatch-latency-bound sequential chain. The partition is
static (meta), every quantity is a scalar on a <=8-dim state, so the whole
match collapses into one pallas_call per direction with a hand-derived adjoint
(recomputing, like the match kernels).

Outputs match components.Encoder.moment_match exactly:
    y_mean (De,)       De = 2*|active| + |inactive|
    y_cov  (De, De)
    cross  (D, De)     Cov(x, y), NOT premultiplied (preinv=False)
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class EncMeta(NamedTuple):
    num_dim: int  # D
    active: tuple  # active dim indices
    inactive: tuple  # the rest, in order
    dp: int  # D padded


def make_enc_meta(active_dims, num_dim: int) -> EncMeta:
    active = tuple(active_dims)
    inactive = tuple(i for i in range(num_dim) if i not in set(active))
    return EncMeta(
        num_dim=num_dim, active=active, inactive=inactive,
        dp=_round_up(max(num_dim, 8), 8),
    )


def _enc_fwd_core(meta: EncMeta, mxp, sxxp, keep=False):
    """Scalar-graph forward. mxp (1, Dp); sxxp (Dp, Dp). Returns row lists."""
    act, inact = meta.active, meta.inactive
    na = len(act)

    m = [mxp[0, i] for i in act]
    v = [jnp.maximum(sxxp[i, i], 0.0) for i in act]
    ev = [jnp.exp(-0.5 * vi) for vi in v]
    sin_m = [jnp.sin(mi) for mi in m]
    cos_m = [jnp.cos(mi) for mi in m]
    s1 = [ev[i] * sin_m[i] for i in range(na)]
    c1 = [ev[i] * cos_m[i] for i in range(na)]

    # pairwise exact trig second moments (raw)
    ss = [[None] * na for _ in range(na)]
    cc = [[None] * na for _ in range(na)]
    sc = [[None] * na for _ in range(na)]
    ab = [[None] * na for _ in range(na)] if keep else None
    for i in range(na):
        for j in range(na):
            sij = sxxp[act[i], act[j]]
            sji = sxxp[act[j], act[i]]
            a = jnp.exp(-0.5 * (v[i] + v[j] + sij + sji))
            b = jnp.exp(-0.5 * (v[i] + v[j] - sij - sji))
            madd = m[i] + m[j]
            msub = m[i] - m[j]
            ss[i][j] = 0.5 * (b * jnp.cos(msub) - a * jnp.cos(madd))
            cc[i][j] = 0.5 * (b * jnp.cos(msub) + a * jnp.cos(madd))
            sc[i][j] = 0.5 * (b * jnp.sin(msub) + a * jnp.sin(madd))
            if keep:
                ab[i][j] = (a, b, madd, msub)

    # y layout: [sin(a); cos(a); inactive]
    y_mean = s1 + c1 + [mxp[0, i] for i in inact]
    de = len(y_mean)

    def y1(k):
        return y_mean[k]

    # transform-block covariance: raw2 - y1 y1^T over the 2*na trig dims
    def raw2(ki, kj):
        i, j = ki % na, kj % na
        if ki < na and kj < na:
            return ss[i][j]
        if ki < na <= kj:
            return sc[i][j]
        if kj < na <= ki:
            return sc[j][i]
        return cc[i][j]

    # cross of the transform, premultiplied form is diagonal:
    # Saa^{-1}Cov(a, T) = [diag(c1), diag(-s1)]; full cross = Sxa @ that
    def sxy_t(d, k):  # d in 0..D-1, k in 0..2na-1
        i = k % na
        coef = c1[i] if k < na else -s1[i]
        return sxxp[d, act[i]] * coef

    y_cov = [[None] * de for _ in range(de)]
    nt = 2 * na
    for ki in range(nt):
        for kj in range(nt):
            y_cov[ki][kj] = raw2(ki, kj) - y1(ki) * y1(kj)
    for bi, d in enumerate(inact):  # Cov(T, b) = sxy_t[b]^T ; Cov(b, b') = S
        for kj in range(nt):
            y_cov[nt + bi][kj] = sxy_t(d, kj)
            y_cov[kj][nt + bi] = sxy_t(d, kj)
        for bj, d2 in enumerate(inact):
            y_cov[nt + bi][nt + bj] = sxxp[d, d2]

    cross = [[None] * de for _ in range(meta.num_dim)]
    for d in range(meta.num_dim):
        for k in range(nt):
            cross[d][k] = sxy_t(d, k)
        for bi, d2 in enumerate(inact):
            cross[d][nt + bi] = sxxp[d, d2]

    outs = (y_mean, y_cov, cross)
    if not keep:
        return outs
    ivars = dict(m=m, v=v, ev=ev, sin_m=sin_m, cos_m=cos_m, s1=s1, c1=c1, ab=ab)
    return outs, ivars


def _enc_bwd_core(meta: EncMeta, mxp, sxxp, dym, dyc, dcr):
    """Adjoint: cotangent scalar grids (lists) -> (dm scalars, dS scalar grid).

    dym: list de; dyc: de x de; dcr: D x de."""
    act, inact = meta.active, meta.inactive
    na = len(act)
    nt = 2 * na
    d_dim = meta.num_dim
    (y_mean, y_cov, cross), iv = _enc_fwd_core(meta, mxp, sxxp, keep=True)
    m, v, ev = iv["m"], iv["v"], iv["ev"]
    s1, c1 = iv["s1"], iv["c1"]
    ab = iv["ab"]

    dm = [0.0] * d_dim  # indexed by true dim
    dS = [[0.0] * d_dim for _ in range(d_dim)]

    # --- direct inactive-dim contributions
    for bi, d in enumerate(inact):
        dm[d] = dm[d] + dym[nt + bi]
        for bj, d2 in enumerate(inact):
            dS[d][d2] = dS[d][d2] + dyc[nt + bi][nt + bj]
        for d0 in range(d_dim):
            dS[d0][d] = dS[d0][d] + dcr[d0][nt + bi]

    # --- accumulate cotangents for s1/c1 (y1) and raw2 and sxy_t
    dy1 = [0.0] * nt
    for k in range(nt):
        dy1[k] = dy1[k] + dym[k]
    draw2 = [[0.0] * nt for _ in range(nt)]
    for ki in range(nt):
        for kj in range(nt):
            g = dyc[ki][kj]
            draw2[ki][kj] = draw2[ki][kj] + g
            dy1[ki] = dy1[ki] - g * y_mean[kj]
            dy1[kj] = dy1[kj] - g * y_mean[ki]
    # sxy_t consumers: cross rows (all D) + the TB/BT blocks of y_cov
    dsxy = [[0.0] * nt for _ in range(d_dim)]  # cotangent of sxy_t(d, k)
    for d in range(d_dim):
        for k in range(nt):
            dsxy[d][k] = dsxy[d][k] + dcr[d][k]
    for bi, d in enumerate(inact):
        for kj in range(nt):
            dsxy[d][kj] = dsxy[d][kj] + dyc[nt + bi][kj] + dyc[kj][nt + bi]

    # sxy_t(d, k) = S[d, act[i]] * coef(k): coef = c1[i] (k < na) else -s1[i]
    ds1 = [0.0] * na
    dc1 = [0.0] * na
    for d in range(d_dim):
        for k in range(nt):
            g = dsxy[d][k]
            if isinstance(g, float):
                continue
            i = k % na
            coef = c1[i] if k < na else -s1[i]
            dS[d][act[i]] = dS[d][act[i]] + g * coef
            if k < na:
                dc1[i] = dc1[i] + g * sxxp[d, act[i]]
            else:
                ds1[i] = ds1[i] - g * sxxp[d, act[i]]
    for i in range(na):
        ds1[i] = ds1[i] + dy1[i]
        dc1[i] = dc1[i] + dy1[na + i]

    # --- raw2 blocks -> (a, b, madd, msub) -> m, v, S
    dmA = [0.0] * na  # cotangent of m_i (active-dim mean)
    dv = [0.0] * na
    for i in range(na):
        for j in range(na):
            dss = draw2[i][j]
            dcc = draw2[na + i][na + j]
            dsc = draw2[i][na + j] + draw2[na + j][i]  # sc[i][j] appears twice
            a, b, madd, msub = ab[i][j]
            ca, sa = jnp.cos(madd), jnp.sin(madd)
            cs, s_s = jnp.cos(msub), jnp.sin(msub)
            # ss = .5(b cs - a ca); cc = .5(b cs + a ca); sc = .5(b s_s + a sa)
            da = 0.5 * (-dss * ca + dcc * ca + dsc * sa)
            db = 0.5 * (dss * cs + dcc * cs + dsc * s_s)
            dmadd = 0.5 * (dss * a * sa - dcc * a * sa + dsc * a * ca)
            dmsub = 0.5 * (-dss * b * s_s - dcc * b * s_s + dsc * b * cs)
            # a = exp(-.5(v_i+v_j+S_ij+S_ji)); b = exp(-.5(v_i+v_j-S_ij-S_ji))
            ga = -0.5 * da * a
            gb = -0.5 * db * b
            dv[i] = dv[i] + ga + gb
            dv[j] = dv[j] + ga + gb
            dS[act[i]][act[j]] = dS[act[i]][act[j]] + ga - gb
            dS[act[j]][act[i]] = dS[act[j]][act[i]] + ga - gb
            dmA[i] = dmA[i] + dmadd + dmsub
            dmA[j] = dmA[j] + dmadd - dmsub

    # --- s1/c1 -> ev, m, v
    for i in range(na):
        dev = ds1[i] * jnp.sin(m[i]) + dc1[i] * jnp.cos(m[i])
        dmA[i] = dmA[i] + ds1[i] * ev[i] * jnp.cos(m[i]) - dc1[i] * ev[i] * jnp.sin(m[i])
        dv[i] = dv[i] - 0.5 * dev * ev[i]

    # --- v = max(S_ii, 0): subgradient passes when S_ii > 0 (mirrors XLA max)
    for i in range(na):
        g = dv[i]
        if not isinstance(g, float):
            passed = jnp.where(sxxp[act[i], act[i]] > 0, g, jnp.zeros_like(g))
            dS[act[i]][act[i]] = dS[act[i]][act[i]] + passed
    for i in range(na):
        dm[act[i]] = dm[act[i]] + dmA[i]
    return dm, dS


# ------------------------------------------------------------------ kernels
def _rows_to_padded(rows, shape, dtype):
    """List-of-lists (or list) of scalars -> padded 2-D array via stacks."""
    if rows and not isinstance(rows[0], (list, tuple)):
        rows = [rows]
    zero = jnp.zeros((), dtype)
    mat = jnp.stack(
        [
            jnp.stack([jnp.asarray(e, dtype) if isinstance(e, float) else e
                       for e in r])
            for r in rows
        ]
    )
    return jnp.pad(mat, ((0, shape[0] - mat.shape[0]), (0, shape[1] - mat.shape[1])))


def _enc_fwd_kernel(meta, mx_ref, sxx_ref, ym_ref, yc_ref, cr_ref):
    mxp = mx_ref[...]
    sxxp = sxx_ref[...]
    y_mean, y_cov, cross = _enc_fwd_core(meta, mxp, sxxp)
    dtype = mxp.dtype
    ym_ref[...] = _rows_to_padded(y_mean, ym_ref.shape, dtype)
    yc_ref[...] = _rows_to_padded(y_cov, yc_ref.shape, dtype)
    cr_ref[...] = _rows_to_padded(cross, cr_ref.shape, dtype)


def _enc_bwd_kernel(meta, mx_ref, sxx_ref, dym_ref, dyc_ref, dcr_ref,
                    dmx_ref, dsxx_ref):
    mxp = mx_ref[...]
    sxxp = sxx_ref[...]
    act, inact = meta.active, meta.inactive
    de = 2 * len(act) + len(inact)
    d = meta.num_dim
    dym = [dym_ref[0, k] for k in range(de)]
    dyc = [[dyc_ref[i, j] for j in range(de)] for i in range(de)]
    dcr = [[dcr_ref[i, j] for j in range(de)] for i in range(d)]
    dm, dS = _enc_bwd_core(meta, mxp, sxxp, dym, dyc, dcr)
    dtype = mxp.dtype
    dmx_ref[...] = _rows_to_padded(dm, dmx_ref.shape, dtype)
    dsxx_ref[...] = _rows_to_padded(dS, dsxx_ref.shape, dtype)


def _enc_out_shapes(meta, dtype):
    de = 2 * len(meta.active) + len(meta.inactive)
    rows = _round_up(max(de, meta.num_dim, 8), 8)
    return de, [
        jax.ShapeDtypeStruct((8, 128), dtype),
        jax.ShapeDtypeStruct((rows, 128), dtype),
        jax.ShapeDtypeStruct((rows, 128), dtype),
    ]


def _enc_fwd_call(meta, mxp, sxxp):
    _, shapes = _enc_out_shapes(meta, mxp.dtype)
    return pl.pallas_call(
        partial(_enc_fwd_kernel, meta), out_shape=shapes
    )(mxp, sxxp)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _enc_match(meta: EncMeta, mxp, sxxp):
    return _enc_fwd_call(meta, mxp, sxxp)


def _enc_vjp_fwd(meta, mxp, sxxp):
    return _enc_fwd_call(meta, mxp, sxxp), (mxp, sxxp)


def _enc_vjp_bwd(meta, res, cots):
    mxp, sxxp = res
    dymp, dycp, dcrp = cots
    dmx, dsxx = pl.pallas_call(
        partial(_enc_bwd_kernel, meta),
        out_shape=[
            jax.ShapeDtypeStruct(mxp.shape, mxp.dtype),
            jax.ShapeDtypeStruct(sxxp.shape, sxxp.dtype),
        ],
    )(mxp, sxxp, dymp, dycp, dcrp)
    return dmx, dsxx


_enc_match.defvjp(_enc_vjp_fwd, _enc_vjp_bwd)


def fused_encoder_match(meta: EncMeta, mx, sxx):
    """mx (..., D), sxx (..., D, D) -> (y_mean (..., De), y_cov (..., De, De),
    cross (..., D, De)), matching Encoder(SinCos).moment_match exactly."""
    d, dp = meta.num_dim, meta.dp
    de = 2 * len(meta.active) + len(meta.inactive)
    batch = mx.shape[:-1]
    mx_f = mx.reshape((-1, d))
    sxx_f = sxx.reshape((-1, d, d))

    def one(m, s):
        mxp = jnp.pad(m[None, :], ((0, 0), (0, dp - d)))
        sxxp = jnp.pad(s, ((0, dp - d), (0, dp - d)))
        ymp, ycp, crp = _enc_match(meta, mxp, sxxp)
        return ymp[0, :de], ycp[:de, :de], crp[:d, :de]

    ym, yc, cr = jax.vmap(one)(mx_f, sxx_f)
    return (
        ym.reshape(batch + (de,)),
        yc.reshape(batch + (de, de)),
        cr.reshape(batch + (d, de)),
    )
