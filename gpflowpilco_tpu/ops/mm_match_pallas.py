"""Pallas TPU kernel: the ENTIRE SVGP moment match as one fused kernel.

The MM policy loss is dispatch-latency bound (docs/perf_notes.md round-2
profile): a 30-step rollout issues ~50 small HLOs per step for the drift match
alone (latent/pair (D, D) Choleskys, triangular solves, exp assembly, the
pair-grid contraction, cross-covariance einsums), and each fused HLO costs
~1-3 us of fixed overhead regardless of FLOPs. The pair-grid kernel
(ops/kexp_pallas.py) fused the largest single op; this module fuses the whole
match — everything between the input moments (mx, sxx) and the match outputs

    f1    (L,)    = E[f]            (latent means)
    sff   (L, L)  = Cov[f]          (latent covariance, incl. model uncertainty)
    cross (D, L)  = Sxx^{-1} Cov(x, f)   (premultiplied cross-covariance)

runs inside ONE pallas_call (forward) and ONE pallas_call (backward): in-kernel
batched Cholesky of the K = L + P matrices (S + diag(lam_l)) / (S + diag(V_p)),
unrolled triangular solves, eKfu / eKuffu exp assembly, and all contractions.
The backward kernel recomputes the forward (nothing (M, M)-sized is saved) and
emits hand-derived cotangents — the adjoint of each unrolled recurrence is the
recurrence reversed, so forward and backward stay consistent by construction.

Two backward variants share the adjoint core:
  * frozen=True  — cotangents for (mx, sxx) only. This is the drift inside the
    MM policy optimization (reference pilco.py:192-220 freezes the dynamics
    model during the policy update), the hot path.
  * frozen=False — cotangents for every grid tensor as well; the grid builder
    is plain differentiable JAX, so parameter gradients (policy training) chain
    through it.

Math matches moment_matching/gp.py:match_svgp / ops/kexp.py exactly (reference
models.py:129-299, kernel_expectation.py:72-187); parity + gradient tests in
tests/test_mm_match_pallas.py.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..moments import pytree_dataclass

_HI = jax.lax.Precision.HIGHEST

# Mosaic's shape-invariant-numerics mode refuses ADD reductions over vector
# slices whose layout offsets are nonzero (the adjoint cores sum row-slices of
# stacked per-latent/per-pair tiles). The mode only pins reduction order across
# shape changes — our shapes are static per trace, so relax it for these
# kernels rather than materialize offset-0 copies of every reduced slice.
# vmem_limit_bytes: the full-adjoint backward keeps the recomputed forward plus
# per-pair cotangent stacks live at once (~32 MB at L=4, Mp=128) — above the
# 16 MB default scoped-vmem limit but well inside the chip's 128 MB VMEM.
_MOSAIC_PARAMS = pltpu.CompilerParams(
    shape_invariant_numerics=False, vmem_limit_bytes=100 * 1024 * 1024
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class MatchMeta(NamedTuple):
    """Static shape/config info for the fused match (hashable: custom_vjp
    nondiff arg)."""

    num_latent: int  # L
    num_pairs: int  # P = L(L+1)/2
    num_dim: int  # D (true input dim)
    num_m: int  # M (true inducing count)
    mp: int  # M padded to lane multiples
    dp: int  # D padded to sublane multiples
    uncertainty: bool  # include the expected-covariance (model uncertainty) term
    pairs: tuple  # ((i, j), ...) upper-triangular latent pairs


@pytree_dataclass(meta_fields=("meta",))
class FusedMatchGrid:
    """All tensors of the SVGP match, padded for the kernel. Built once per
    model by ``build_fused_match_grid`` (hoisted into the match cache exactly
    like SVGPMatchCache — state-independent, frozen across a rollout)."""

    kdiag: jax.Array  # (K, Dp) diag additions: lam_l rows then vdiag_p rows
    zt: jax.Array  # (L, Dp, Mp) inducing points, transposed, zero-padded
    alpha: jax.Array  # (L, Mp) representer weights
    varr: jax.Array  # (1, L) kernel variances
    hll: jax.Array  # (1, L) 0.5 sum log lam_l
    qmat: jax.Array  # (L, Mp, Mp) Kuu^{-1} - Luu^{-T} CC^T Luu^{-1}
    ut: jax.Array  # (P, Dp, Mp) pair centre factors u^T
    wt: jax.Array  # (P, Dp, Mp)
    g1t: jax.Array  # (P, Dp, Mp) x-free Gaussian factors
    g2t: jax.Array  # (P, Dp, Mp)
    g11: jax.Array  # (P, Mp)
    g22: jax.Array  # (P, Mp)
    cp: jax.Array  # (1, P) log(v_i v_j) + 0.5 sum log vdiag
    alpha_u: jax.Array  # (P, Mp) alpha[i(p)]
    alpha_w: jax.Array  # (P, Mp) alpha[j(p)]
    meta: MatchMeta = None


def build_fused_match_grid(model, uncertainty: bool = True) -> FusedMatchGrid:
    """model: models.gp.SVGP (latent-stacked). Differentiable in the model's
    parameters — the frozen/hoisted semantics come from where the caller builds
    it, not from stop_gradients here."""
    from . import kexp

    z = model.z  # (L, M, D)
    num_latent, num_m, d = z.shape
    mp = _round_up(max(num_m, 128), 128)
    dp = _round_up(max(d, 8), 8)
    var = model.kernel.variance
    ls = model.kernel.lengthscales
    lam = kexp.latent_lam(model.kernel, d)  # (L, D)

    # representer weights / variational quadratic (cf. svgp_match_cache)
    from ..models.gp import chol_kuu
    from .linalg import bcho_solve, bsolve_triangular

    luu = chol_kuu(model)
    q_mu = jnp.swapaxes(model.q_mu, -1, -2)[..., None]
    if model.whiten:
        alpha = bsolve_triangular(luu, q_mu, lower=True, trans=1)[..., 0]
    else:
        alpha = bcho_solve(luu, q_mu)[..., 0]
    q_sqrt = jnp.tril(model.q_sqrt)
    c = q_sqrt if model.whiten else bsolve_triangular(luu, q_sqrt, lower=True)
    eye = jnp.eye(num_m, dtype=luu.dtype)
    kuu_inv = bcho_solve(luu, jnp.broadcast_to(eye, luu.shape))
    h = bsolve_triangular(luu, c, lower=True, trans=1)
    qmat = kuu_inv - jnp.einsum("lmk,lnk->lmn", h, h, precision=_HI)

    pairs = tuple((i, j) for i in range(num_latent) for j in range(i, num_latent))
    i_idx = jnp.asarray([p[0] for p in pairs])
    j_idx = jnp.asarray([p[1] for p in pairs])
    vdiag, u, w, _ = jax.vmap(
        lambda v1, l1, z1, v2, l2, z2: kexp.ekzxxz_pair_terms(v1, l1, z1, v2, l2, z2)
    )(var[i_idx], ls[i_idx], z[i_idx], var[j_idx], ls[j_idx], z[j_idx])
    lam_i = jax.vmap(kexp._bc_lengthscales, in_axes=(0, None))(ls[i_idx], d) ** 2
    lam_j = jax.vmap(kexp._bc_lengthscales, in_axes=(0, None))(ls[j_idx], d) ** 2
    inv_sqrt = jnp.sqrt(1.0 / (lam_i + lam_j))
    g1 = z[i_idx] * inv_sqrt[:, None, :]  # (P, M, D)
    g2 = z[j_idx] * inv_sqrt[:, None, :]
    cp = jnp.log(var[i_idx] * var[j_idx]) + 0.5 * jnp.sum(jnp.log(vdiag), -1)

    mpad, dpad = mp - num_m, dp - d

    def padt(a):  # (G, M, D) -> (G, Dp, Mp)
        return jnp.pad(jnp.swapaxes(a, -1, -2), ((0, 0), (0, dpad), (0, mpad)))

    def padv(a):  # (G, M) -> (G, Mp)
        return jnp.pad(a, ((0, 0), (0, mpad)))

    # padded kdiag rows get 1.0 so the (never-read) padded Cholesky lanes stay
    # finite under any compiler speculation
    kdiag = jnp.pad(
        jnp.concatenate([lam, vdiag], axis=0), ((0, 0), (0, dpad)),
        constant_values=1.0,
    )  # (K, Dp)
    meta = MatchMeta(
        num_latent=num_latent, num_pairs=len(pairs), num_dim=d, num_m=num_m,
        mp=mp, dp=dp, uncertainty=uncertainty, pairs=pairs,
    )
    return FusedMatchGrid(
        kdiag=kdiag,
        zt=padt(z),
        alpha=padv(alpha),
        varr=var[None, :],
        hll=0.5 * jnp.sum(jnp.log(lam), -1)[None, :],
        qmat=jnp.pad(qmat, ((0, 0), (0, mpad), (0, mpad))),
        ut=padt(u),
        wt=padt(w),
        g1t=padt(g1),
        g2t=padt(g2),
        g11=padv(jnp.sum(g1 * g1, -1)),
        g22=padv(jnp.sum(g2 * g2, -1)),
        cp=cp[None, :],
        alpha_u=padv(alpha[i_idx]),
        alpha_w=padv(alpha[j_idx]),
        meta=meta,
    )


# =============================================================================
# shared numeric cores (plain jnp on padded values; used inside the pallas
# kernel bodies AND directly testable)
# =============================================================================
def _chol_unrolled(amat, d):
    """Batched unrolled Cholesky: amat (K, Dp, Dp) -> ch[i][j] (K,) for j<=i."""
    ch = [[None] * d for _ in range(d)]
    for j in range(d):
        s = amat[:, j, j]
        for k in range(j):
            s = s - ch[j][k] * ch[j][k]
        ch[j][j] = jnp.sqrt(s)
        inv = 1.0 / ch[j][j]
        for i in range(j + 1, d):
            s = amat[:, i, j]
            for k in range(j):
                s = s - ch[i][k] * ch[j][k]
            ch[i][j] = s * inv
    return ch


def _chol_rev(ch, dch, d):
    """Adjoint of _chol_unrolled (the forward recurrence reversed). dch is a
    list-of-lists of (K,) cotangents (entries may be None = zero); returns
    da[i][j] (K,) for the LOWER triangle (the only part the forward reads)."""
    dL = [[None if dch[i][j] is None else dch[i][j] for j in range(d)] for i in range(d)]

    def _get(m, i, j):
        return m[i][j] if m[i][j] is not None else 0.0

    def _add(m, i, j, v):
        m[i][j] = v if m[i][j] is None else m[i][j] + v

    da = [[None] * d for _ in range(d)]
    for j in reversed(range(d)):
        inv = 1.0 / ch[j][j]
        for i in reversed(range(j + 1, d)):
            g = _get(dL, i, j)
            if isinstance(g, float):
                continue
            gi = g * inv
            _add(da, i, j, gi)
            _add(dL, j, j, -gi * ch[i][j])
            for k in range(j):
                _add(dL, i, k, -gi * ch[j][k])
                _add(dL, j, k, -gi * ch[i][k])
        g = _get(dL, j, j)
        if not isinstance(g, float):
            s = 0.5 * g * inv
            _add(da, j, j, s)
            for k in range(j):
                _add(dL, j, k, -2.0 * s * ch[j][k])
    return da


def _solve_lower(ch, rows, d):
    """Solve L y = b for row-lists: ch[i][j] (G,), rows[i] (G, ...) -> y rows."""
    out = [None] * d
    for i in range(d):
        acc = rows[i]
        for j in range(i):
            acc = acc - ch[i][j][:, None] * out[j]
        out[i] = acc / ch[i][i][:, None]
    return out


def _solve_upper_t(ch, rows, d):
    """Solve L^T x = y (backward substitution)."""
    out = [None] * d
    for i in reversed(range(d)):
        acc = rows[i]
        for j in range(i + 1, d):
            acc = acc - ch[j][i][:, None] * out[j]
        out[i] = acc / ch[i][i][:, None]
    return out


def _solve_lower_s(ch, rows, d):
    """Scalar-rhs variant: rows[i] (G,)."""
    out = [None] * d
    for i in range(d):
        acc = rows[i]
        for j in range(i):
            acc = acc - ch[i][j] * out[j]
        out[i] = acc / ch[i][i]
    return out


def _solve_upper_t_s(ch, rows, d):
    out = [None] * d
    for i in reversed(range(d)):
        acc = rows[i]
        for j in range(i + 1, d):
            acc = acc - ch[j][i] * out[j]
        out[i] = acc / ch[i][i]
    return out


def _pair_e(g, up, wp, a_u, a_w, cexp, p, d, dtype):
    """E' = exp(cexp_p - M_p) for one latent pair (VMEM-transient)."""
    m_p = -jax.lax.dot_general(
        g.g1t[p, :d, :], g.g2t[p, :d, :], (((0,), (0,)), ((), ())),
        preferred_element_type=dtype, precision=_HI,
    )
    for i in range(d):
        m_p = m_p + up[i][p][:, None] * wp[i][p][None, :]
    m_p = m_p + 0.5 * a_u[p][:, None] + 0.5 * a_w[p][None, :]
    return jnp.exp(cexp[p] - m_p)


def _fwd_core(meta: MatchMeta, g: FusedMatchGrid, mxp, sxxp, keep=False):
    """Forward match on padded values. mxp (1, Dp); sxxp (Dp, Dp).

    Returns (f1 (L,), sff (L, L), cross rows list of (L,) length D) and, with
    keep=True, every intermediate the adjoint needs."""
    L, P, d = meta.num_latent, meta.num_pairs, meta.num_dim
    dtype = mxp.dtype

    # --- batched Cholesky of the K = L + P matrices S + diag(kdiag_k), split
    # by group (Mosaic prefers whole-group ops over rank-1 slicing)
    eye_dp = jnp.eye(sxxp.shape[-1], dtype=dtype)
    # NOTE: a partial slice mixed with None in one bracket (kdiag[:L, :, None])
    # lowers to a gather, which Mosaic cannot lower — slice first, expand after
    amat_lat = sxxp[None, :, :] + eye_dp * g.kdiag[:L][:, :, None]
    amat_pair = sxxp[None, :, :] + eye_dp * g.kdiag[L:][:, :, None]
    ch_lat = _chol_unrolled(amat_lat, d)  # entries (L,)
    ch_pair = _chol_unrolled(amat_pair, d)  # entries (P,)
    hls_lat = 0.0
    hls_pair = 0.0
    for i in range(d):
        hls_lat = hls_lat + jnp.log(ch_lat[i][i])
        hls_pair = hls_pair + jnp.log(ch_pair[i][i])

    # --- latent part: eKfu + premultiplied cross solve
    zc = [g.zt[:, i, :] - mxp[0, i] for i in range(d)]  # rows (L, Mp)
    y = _solve_lower(ch_lat, zc, d)
    quad = y[0] * y[0]
    for i in range(1, d):
        quad = quad + y[i] * y[i]
    e = g.varr[0][:, None] * jnp.exp(
        (g.hll[0] - hls_lat)[:, None] - 0.5 * quad
    )  # (L, Mp)
    iv = _solve_upper_t(ch_lat, y, d)
    ae = g.alpha * e  # (L, Mp)
    f1 = jnp.sum(ae, axis=-1)  # (L,)
    cross = [jnp.sum(iv[i] * ae, axis=-1) for i in range(d)]  # D x (L,)

    # --- pair part: eKuffu contractions
    ilu = _solve_lower(ch_pair, [g.ut[:, i, :] for i in range(d)], d)
    ilw = _solve_lower(ch_pair, [g.wt[:, i, :] for i in range(d)], d)
    ilm = _solve_lower_s(ch_pair, [jnp.broadcast_to(mxp[0, i], (P,)) for i in range(d)], d)
    up = [ilu[i] - 0.5 * ilm[i][:, None] for i in range(d)]
    wp = [ilw[i] - 0.5 * ilm[i][:, None] for i in range(d)]
    a_u = g.g11
    a_w = g.g22
    for i in range(d):
        a_u = a_u + up[i] * up[i]
        a_w = a_w + wp[i] * wp[i]
    cexp = g.cp[0] - hls_pair  # (P,)

    lut = {p: k for k, p in enumerate(meta.pairs)}
    diag_pos = [lut[(l, l)] for l in range(L)]
    inv_diag_pos = {p: l for l, p in enumerate(diag_pos)}
    f2_scalars = [None] * P
    ecov_scalars = [None] * L
    for p in range(P):
        e_p = _pair_e(g, up, wp, a_u, a_w, cexp, p, d, dtype)
        t_p = jax.lax.dot_general(
            g.alpha_u[p][None, :], e_p, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype, precision=_HI,
        )  # (1, Mp)
        f2_scalars[p] = jnp.sum(t_p[0] * g.alpha_w[p])
        if meta.uncertainty and p in inv_diag_pos:
            ecov_scalars[inv_diag_pos[p]] = jnp.sum(g.qmat[inv_diag_pos[p]] * e_p)

    # --- assemble f2 (L, L) and sff (nested stacks: Mosaic has no scatter)
    f2 = jnp.stack(
        [
            jnp.stack([f2_scalars[lut[(min(i, j), max(i, j))]] for j in range(L)])
            for i in range(L)
        ]
    )
    sff = f2 - f1[:, None] * f1[None, :]
    if meta.uncertainty:
        ecov = jnp.stack([g.varr[0, l] - ecov_scalars[l] for l in range(L)])
        sff = sff + jnp.eye(L, dtype=dtype) * ecov[None, :]

    outs = (f1, sff, cross)
    if not keep:
        return outs
    ivars = dict(
        ch_lat=ch_lat, ch_pair=ch_pair, hls_lat=hls_lat,
        hls_pair=hls_pair, zc=zc, y=y, quad=quad, e=e, iv=iv, ae=ae,
        ilu=ilu, ilw=ilw, ilm=ilm, up=up, wp=wp, a_u=a_u, a_w=a_w,
        cexp=cexp, f2_scalars=f2_scalars, f1=f1,
        diag_pos=diag_pos,
    )
    return outs, ivars


def _bwd_core(meta: MatchMeta, g: FusedMatchGrid, mxp, sxxp, df1_in, dsff, dcross_rows,
              frozen: bool):
    """Adjoint of _fwd_core. df1_in (L,), dsff (L, L), dcross_rows D x (L,).

    Returns (dmx rows list D x scalar..., actually (1, Dp)-assembled outside) —
    concretely a dict with 'dmx' (list of D scalars), 'dsxx' da-lists, and, for
    frozen=False, cotangents for every grid tensor."""
    L, P, d = meta.num_latent, meta.num_pairs, meta.num_dim
    dtype = mxp.dtype
    (f1, sff, cross), iv_ = _fwd_core(meta, g, mxp, sxxp, keep=True)

    ch_lat, ch_pair = iv_["ch_lat"], iv_["ch_pair"]
    y, e, iv, ae = iv_["y"], iv_["e"], iv_["iv"], iv_["ae"]
    up, wp, ilu, ilw, ilm = iv_["up"], iv_["wp"], iv_["ilu"], iv_["ilw"], iv_["ilm"]
    a_u, a_w, cexp = iv_["a_u"], iv_["a_w"], iv_["cexp"]
    diag_pos = iv_["diag_pos"]

    # --- sff = f2 - f1 f1^T (+ diag(var - ecov))
    df2 = dsff  # (L, L)
    # d/df1[l] of -f1 f1^T contracted with dsff = -sum_j (dsff[l,j]+dsff[j,l]) f1[j]
    df1 = df1_in - jnp.sum((dsff + dsff.T) * f1[None, :], axis=-1)  # (L,)
    decov = [None] * L
    dvarr = [None] * L
    if meta.uncertainty:
        for l in range(L):
            decov[l] = -dsff[l, l]  # ecov enters as +(var - ecov_corr) on diag
            dvarr[l] = dsff[l, l]

    # --- latent part adjoint
    # d(ae) = df1 broadcast + sum_i dcross_rows[i] * iv[i]
    dae = jnp.broadcast_to(df1[:, None], ae.shape)
    div = [None] * d
    for i in range(d):
        dae = dae + dcross_rows[i][:, None] * iv[i]
        div[i] = dcross_rows[i][:, None] * ae  # (L, Mp)
    de = g.alpha * dae  # (L, Mp)
    dalpha = dae * e if not frozen else None
    ede = e * de
    dquad = -0.5 * ede
    s_ede = jnp.sum(ede, axis=-1)  # (L,)
    dhls_lat = -s_ede
    dhll = s_ede if not frozen else None
    dvarr_lat = jnp.sum(de * (e / g.varr[0][:, None]), axis=-1) if not frozen else None

    # iv = solve(L^T, y): dy += solve(L, div); dL[a,b] += -sum_m t[a] iv[b]  (a>=b)
    t_iv = _solve_lower(ch_lat, div, d)
    dy = [2.0 * y[i] * dquad + t_iv[i] for i in range(d)]
    dch_lat = [[None] * d for _ in range(d)]

    def _acc(m, i, j, v):
        m[i][j] = v if m[i][j] is None else m[i][j] + v

    for a in range(d):
        for b in range(a + 1):
            _acc(dch_lat, a, b, -jnp.sum(t_iv[b] * iv[a], axis=-1))
    # y = solve(L, zc): dzc = solve(L^T, dy); dL[a,b] += -sum_m dzc[a] y[b]
    dzc = _solve_upper_t(ch_lat, dy, d)
    for a in range(d):
        for b in range(a + 1):
            _acc(dch_lat, a, b, -jnp.sum(dzc[a] * y[b], axis=-1))
    for i in range(d):
        _acc(dch_lat, i, i, dhls_lat / ch_lat[i][i])
    dmx = [-jnp.sum(dzc[i]) for i in range(d)]  # latent zc = zt - mx
    dzt = dzc if not frozen else None

    # --- pair part adjoint (per-pair lists assembled by jnp.stack: Mosaic has
    # no scatter, but stacks of rows/scalars lower cleanly)
    dch_pair = [[None] * d for _ in range(d)]
    dilu_rows = [[None] * P for _ in range(d)]
    dilw_rows = [[None] * P for _ in range(d)]
    dilm_s = [[None] * P for _ in range(d)]
    dcp_s = [None] * P if not frozen else None
    dg1t_rows = [[None] * P for _ in range(d)] if not frozen else None
    dg2t_rows = [[None] * P for _ in range(d)] if not frozen else None
    dg11_rows = [None] * P if not frozen else None
    dg22_rows = [None] * P if not frozen else None
    dalpha_u_rows = [None] * P if not frozen else None
    dalpha_w_rows = [None] * P if not frozen else None
    dqmat = [None] * L if not frozen else None
    dhls_pair_s = [None] * P

    inv_diag_pos = {p: l for l, p in enumerate(diag_pos)}
    for p, (i_l, j_l) in enumerate(meta.pairs):
        # recomputed per pair: storing all P (Mp, Mp) grids would dominate
        # VMEM at M=320/L=4 (the double-pendulum config)
        e_p = _pair_e(g, up, wp, a_u, a_w, cexp, p, d, dtype)
        df2_p = df2[i_l, j_l] + (df2[j_l, i_l] if i_l != j_l else 0.0)
        de_p = df2_p * (g.alpha_u[p][:, None] * g.alpha_w[p][None, :])
        if meta.uncertainty and p in inv_diag_pos:
            l = inv_diag_pos[p]
            de_p = de_p + decov[l] * g.qmat[l]
            if not frozen:
                dqmat[l] = decov[l] * e_p
        if not frozen:
            # f2_p = alpha_u^T E alpha_w
            dalpha_u_rows[p] = df2_p * jax.lax.dot_general(
                e_p, g.alpha_w[p][:, None], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=_HI,
            )[:, 0]
            dalpha_w_rows[p] = df2_p * jax.lax.dot_general(
                g.alpha_u[p][None, :], e_p, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=_HI,
            )[0]
        ede_p = e_p * de_p
        dm_p = -ede_p  # (Mp, Mp)
        s = jnp.sum(ede_p)
        dhls_pair_s[p] = -s
        if not frozen:
            dcp_s[p] = s
        da_u_p = 0.5 * jnp.sum(dm_p, axis=1)  # (Mp,)
        da_w_p = 0.5 * jnp.sum(dm_p, axis=0)
        if not frozen:
            dg11_rows[p] = da_u_p
            dg22_rows[p] = da_w_p
        for i in range(d):
            dup_pi = jax.lax.dot_general(
                dm_p, wp[i][p][:, None], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=_HI,
            )[:, 0] + 2.0 * up[i][p] * da_u_p
            dwp_pi = jax.lax.dot_general(
                up[i][p][None, :], dm_p, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=_HI,
            )[0] + 2.0 * wp[i][p] * da_w_p
            if not frozen:
                dg1t_rows[i][p] = -jax.lax.dot_general(
                    dm_p, g.g2t[p, i, :][:, None], (((1,), (0,)), ((), ())),
                    preferred_element_type=dtype, precision=_HI,
                )[:, 0]
                dg2t_rows[i][p] = -jax.lax.dot_general(
                    g.g1t[p, i, :][None, :], dm_p, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtype, precision=_HI,
                )[0]
            dilu_rows[i][p] = dup_pi
            dilw_rows[i][p] = dwp_pi
            dilm_s[i][p] = -0.5 * (jnp.sum(dup_pi) + jnp.sum(dwp_pi))

    dilu = [jnp.stack(dilu_rows[i]) for i in range(d)]  # (P, Mp) each
    dilw = [jnp.stack(dilw_rows[i]) for i in range(d)]
    dilm = [jnp.stack(dilm_s[i]) for i in range(d)]  # (P,) each
    dhls_pair_acc = jnp.stack(dhls_pair_s)  # (P,)
    if not frozen:
        dcp = jnp.stack(dcp_s)
        dg1t = [jnp.stack(dg1t_rows[i]) for i in range(d)]
        dg2t = [jnp.stack(dg2t_rows[i]) for i in range(d)]
        dg11 = jnp.stack(dg11_rows)
        dg22 = jnp.stack(dg22_rows)
        dalpha_u = jnp.stack(dalpha_u_rows)
        dalpha_w = jnp.stack(dalpha_w_rows)
    else:
        dcp = dg1t = dg2t = dg11 = dg22 = dalpha_u = dalpha_w = None

    # il_u = solve(L_p, ut): dut = solve(L^T, dilu); dL[a,b] -= sum_m dut[a] ilu[b]
    tmp_u = _solve_upper_t(ch_pair, dilu, d)
    tmp_w = _solve_upper_t(ch_pair, dilw, d)
    tmp_m = _solve_upper_t_s(ch_pair, dilm, d)
    for a in range(d):
        for b in range(a + 1):
            _acc(
                dch_pair, a, b,
                -jnp.sum(tmp_u[a] * ilu[b], axis=-1)
                - jnp.sum(tmp_w[a] * ilw[b], axis=-1)
                - tmp_m[a] * ilm[b],
            )
    for i in range(d):
        _acc(dch_pair, i, i, dhls_pair_acc / ch_pair[i][i])
        dmx[i] = dmx[i] + jnp.sum(tmp_m[i])
    dut = tmp_u if not frozen else None
    dwt = tmp_w if not frozen else None

    # --- Cholesky adjoints -> dsxx (lower) + dkdiag, per group
    da_lat = _chol_rev(ch_lat, dch_lat, d)  # lower-tri (L,) entries
    da_pair = _chol_rev(ch_pair, dch_pair, d)  # lower-tri (P,) entries

    out = dict(dmx=dmx, da_lat=da_lat, da_pair=da_pair)
    if not frozen:
        out.update(
            dzt=dzt, dalpha=dalpha, dvarr_lat=dvarr_lat, dvarr_diag=dvarr,
            dhll=dhll, dqmat=dqmat, dut=dut, dwt=dwt, dg1t=dg1t, dg2t=dg2t,
            dg11=dg11, dg22=dg22, dcp=dcp, dalpha_u=dalpha_u, dalpha_w=dalpha_w,
        )
    return out


# =============================================================================
# pallas kernels
# =============================================================================
_GRID_FIELDS = (
    "kdiag", "zt", "alpha", "varr", "hll", "qmat", "ut", "wt",
    "g1t", "g2t", "g11", "g22", "cp", "alpha_u", "alpha_w",
)


def _grid_from_refs(meta, refs):
    vals = {f: r[...] for f, r in zip(_GRID_FIELDS, refs)}
    return FusedMatchGrid(meta=meta, **vals)


def _write_padded_rows(ref, rows, cols):
    """rows: list of (cols,) vectors -> ref (8-ish, 128) zero-padded. Built by
    stack + pad (Mosaic has no scatter/dynamic_update_slice)."""
    mat = jnp.stack(rows)  # (len(rows), cols)
    ref[...] = jnp.pad(
        mat, ((0, ref.shape[0] - mat.shape[0]), (0, ref.shape[1] - mat.shape[1]))
    )


def _sum_groups(da_lat, da_pair, d):
    """Combine the two per-group Cholesky adjoints into summed-scalar entries
    (dV_k all add into the shared sxx)."""
    out = [[None] * d for _ in range(d)]
    for a in range(d):
        for b in range(a + 1):
            parts = [
                jnp.sum(m[a][b]) for m in (da_lat, da_pair) if m[a][b] is not None
            ]
            if parts:
                out[a][b] = parts[0] if len(parts) == 1 else parts[0] + parts[1]
    return out


def _scalars_to_lower(entries, d, rows, dtype):
    """Lower-tri list-of-lists of summed scalars -> (rows, cols>=d) matrix."""
    zero = jnp.zeros((), dtype)
    return jnp.stack(
        [
            jnp.stack(
                [
                    jnp.sum(entries[a][b])
                    if b <= a and entries[a][b] is not None
                    else zero
                    for b in range(d)
                ]
            )
            for a in range(d)
        ]
    )


def _fwd_kernel(meta, *refs):
    in_refs = refs[: 2 + len(_GRID_FIELDS)]
    f1_ref, sff_ref, cross_ref = refs[2 + len(_GRID_FIELDS):]
    mxp = in_refs[0][...]
    sxxp = in_refs[1][...]
    g = _grid_from_refs(meta, in_refs[2:])
    f1, sff, cross = _fwd_core(meta, g, mxp, sxxp)
    L, d = meta.num_latent, meta.num_dim
    _write_padded_rows(f1_ref, [f1], L)
    _write_padded_rows(sff_ref, [sff[i] for i in range(L)], L)
    _write_padded_rows(cross_ref, cross, L)


def _bwd_kernel_frozen(meta, *refs):
    in_refs = refs[: 2 + len(_GRID_FIELDS)]
    df1_ref, dsff_ref, dcross_ref = refs[2 + len(_GRID_FIELDS): 5 + len(_GRID_FIELDS)]
    dmx_ref, dsxx_ref = refs[5 + len(_GRID_FIELDS):]
    mxp = in_refs[0][...]
    sxxp = in_refs[1][...]
    g = _grid_from_refs(meta, in_refs[2:])
    L, d = meta.num_latent, meta.num_dim
    df1 = df1_ref[0, :L]
    dsff = dsff_ref[:L, :L]
    dcross_rows = [dcross_ref[i, :L] for i in range(d)]
    out = _bwd_core(meta, g, mxp, sxxp, df1, dsff, dcross_rows, frozen=True)
    dp = dmx_ref.shape[-1]
    dmx_ref[...] = jnp.pad(jnp.stack(out["dmx"])[None, :], ((0, 0), (0, dp - d)))
    dsxx = _scalars_to_lower(
        _sum_groups(out["da_lat"], out["da_pair"], d), d, d, dsxx_ref.dtype
    )
    dsxx_ref[...] = jnp.pad(dsxx, ((0, dp - d), (0, dp - d)))


def _bwd_kernel_full(meta, *refs):
    nin = 2 + len(_GRID_FIELDS)
    in_refs = refs[:nin]
    df1_ref, dsff_ref, dcross_ref = refs[nin: nin + 3]
    (dmx_ref, dsxx_ref, dkdiag_ref, dzt_ref, dalpha_ref, dvarr_ref, dhll_ref,
     dqmat_ref, dut_ref, dwt_ref, dg1t_ref, dg2t_ref, dg11_ref, dg22_ref,
     dcp_ref, dalpha_u_ref, dalpha_w_ref) = refs[nin + 3:]
    mxp = in_refs[0][...]
    sxxp = in_refs[1][...]
    g = _grid_from_refs(meta, in_refs[2:])
    L, P, d = meta.num_latent, meta.num_pairs, meta.num_dim
    df1 = df1_ref[0, :L]
    dsff = dsff_ref[:L, :L]
    dcross_rows = [dcross_ref[i, :L] for i in range(d)]
    out = _bwd_core(meta, g, mxp, sxxp, df1, dsff, dcross_rows, frozen=False)
    dtype = mxp.dtype
    dp = dmx_ref.shape[-1]
    dmx_ref[...] = jnp.pad(jnp.stack(out["dmx"])[None, :], ((0, 0), (0, dp - d)))

    da_lat, da_pair = out["da_lat"], out["da_pair"]
    dsxx = _scalars_to_lower(_sum_groups(da_lat, da_pair, d), d, d, dtype)
    dsxx_ref[...] = jnp.pad(dsxx, ((0, dp - d), (0, dp - d)))
    # dkdiag rows: latent group then pair group, one column per diagonal entry
    zl = jnp.zeros((L,), dtype)
    zp = jnp.zeros((P,), dtype)
    dkdiag_lat = jnp.stack(
        [da_lat[a][a] if da_lat[a][a] is not None else zl for a in range(d)], axis=1
    )  # (L, d)
    dkdiag_pair = jnp.stack(
        [da_pair[a][a] if da_pair[a][a] is not None else zp for a in range(d)], axis=1
    )  # (P, d)
    dkdiag_ref[...] = jnp.pad(
        jnp.concatenate([dkdiag_lat, dkdiag_pair], axis=0), ((0, 0), (0, dp - d))
    )

    zrow_l = jnp.zeros((L, meta.mp), dtype)
    zrow_p = jnp.zeros((P, meta.mp), dtype)

    def _rows3(rows, zero):
        # list of d (G, Mp) rows -> (G, Dp, Mp) with zero-padded middle dim
        return jnp.stack(rows + [zero] * (dp - d), axis=1)

    dzt_ref[...] = _rows3(out["dzt"], zrow_l)
    dut_ref[...] = _rows3(out["dut"], zrow_p)
    dwt_ref[...] = _rows3(out["dwt"], zrow_p)
    dg1t_ref[...] = _rows3(out["dg1t"], zrow_p)
    dg2t_ref[...] = _rows3(out["dg2t"], zrow_p)

    dalpha_ref[...] = out["dalpha"]
    dg11_ref[...] = out["dg11"]
    dg22_ref[...] = out["dg22"]
    dalpha_u_ref[...] = out["dalpha_u"]
    dalpha_w_ref[...] = out["dalpha_w"]

    dvarr = out["dvarr_lat"]  # (L,)
    if meta.uncertainty:
        dvarr = dvarr + jnp.stack(out["dvarr_diag"])
    dvarr_ref[...] = dvarr[None, :]
    dhll_ref[...] = out["dhll"][None, :]
    dcp_ref[...] = out["dcp"][None, :]

    if meta.uncertainty:
        dqmat_ref[...] = jnp.stack(out["dqmat"])
    else:
        dqmat_ref[...] = jnp.zeros(dqmat_ref.shape, dtype)


# =============================================================================
# custom-vjp wrappers
# =============================================================================
def _out_pad(n):
    return _round_up(max(n, 8), 8)


def _fwd_call(meta: MatchMeta, grid: FusedMatchGrid, mxp, sxxp):
    dtype = mxp.dtype
    lpad = 128
    rpad = _out_pad(max(meta.dp, meta.num_latent))
    arrays = [getattr(grid, f) for f in _GRID_FIELDS]
    outs = pl.pallas_call(
        partial(_fwd_kernel, meta),
        out_shape=[
            jax.ShapeDtypeStruct((8, lpad), dtype),
            jax.ShapeDtypeStruct((rpad, lpad), dtype),
            jax.ShapeDtypeStruct((rpad, lpad), dtype),
        ],
        compiler_params=_MOSAIC_PARAMS,
    )(mxp, sxxp, *arrays)
    return outs


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_match_frozen(meta: MatchMeta, grid: FusedMatchGrid, mxp, sxxp):
    return _fwd_call(meta, grid, mxp, sxxp)


def _frozen_fwd(meta, grid, mxp, sxxp):
    return _fwd_call(meta, grid, mxp, sxxp), (grid, mxp, sxxp)


def _frozen_bwd(meta, res, cots):
    grid, mxp, sxxp = res
    df1p, dsffp, dcrossp = cots
    dtype = mxp.dtype
    arrays = [getattr(grid, f) for f in _GRID_FIELDS]
    dmx, dsxx = pl.pallas_call(
        partial(_bwd_kernel_frozen, meta),
        out_shape=[
            jax.ShapeDtypeStruct(mxp.shape, dtype),
            jax.ShapeDtypeStruct(sxxp.shape, dtype),
        ],
        compiler_params=_MOSAIC_PARAMS,
    )(mxp, sxxp, *arrays, df1p, dsffp, dcrossp)
    # the kernel reads only sxx's lower triangle (as XLA's Cholesky does);
    # symmetrize the cotangent to match XLA's symmetric-input convention
    dsxx = 0.5 * (dsxx + dsxx.T)
    dgrid = jax.tree.map(jnp.zeros_like, grid)
    return dgrid, dmx, dsxx


_fused_match_frozen.defvjp(_frozen_fwd, _frozen_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_match_full(meta: MatchMeta, grid: FusedMatchGrid, mxp, sxxp):
    return _fwd_call(meta, grid, mxp, sxxp)


def _full_fwd(meta, grid, mxp, sxxp):
    return _fwd_call(meta, grid, mxp, sxxp), (grid, mxp, sxxp)


def _full_bwd(meta, res, cots):
    grid, mxp, sxxp = res
    df1p, dsffp, dcrossp = cots
    dtype = mxp.dtype
    arrays = [getattr(grid, f) for f in _GRID_FIELDS]
    outs = pl.pallas_call(
        partial(_bwd_kernel_full, meta),
        out_shape=[jax.ShapeDtypeStruct(mxp.shape, dtype),
                   jax.ShapeDtypeStruct(sxxp.shape, dtype)]
        + [jax.ShapeDtypeStruct(a.shape, dtype) for a in arrays],
        compiler_params=_MOSAIC_PARAMS,
    )(mxp, sxxp, *arrays, df1p, dsffp, dcrossp)
    dmx, dsxx = outs[0], 0.5 * (outs[1] + outs[1].T)
    dgrid = FusedMatchGrid(
        meta=meta, **{f: v for f, v in zip(_GRID_FIELDS, outs[2:])}
    )
    return dgrid, dmx, dsxx


_fused_match_full.defvjp(_full_fwd, _full_bwd)


def fused_svgp_match(grid: FusedMatchGrid, mx, sxx, frozen: bool = False):
    """Whole-match fused kernel. mx (..., D), sxx (..., D, D) ->
    (f1 (..., L), sff (..., L, L), cross (..., D, L)).

    frozen=True emits cotangents only for (mx, sxx) — the drift-inside-policy-
    optimization case; grid cotangents are hard zeros (callers must not train
    the model through this path)."""
    meta = grid.meta
    d, dp, L = meta.num_dim, meta.dp, meta.num_latent
    batch = mx.shape[:-1]
    mx_f = mx.reshape((-1, d))
    sxx_f = sxx.reshape((-1, d, d))
    fn = _fused_match_frozen if frozen else _fused_match_full

    def one(m, s):
        mxp = jnp.pad(m[None, :], ((0, 0), (0, dp - d)))
        sxxp = jnp.pad(s, ((0, dp - d), (0, dp - d)))
        f1p, sffp, crossp = fn(meta, grid, mxp, sxxp)
        return f1p[0, :L], sffp[:L, :L], crossp[:d, :L]

    f1, sff, cross = jax.vmap(one)(mx_f, sxx_f)
    return (
        f1.reshape(batch + (L,)),
        sff.reshape(batch + (L, L)),
        cross.reshape(batch + (d, L)),
    )


# =============================================================================
# GPR whole-match kernel (frozen-only)
# =============================================================================
# A GPR drift (exact GP on the training inputs, e.g. every HMC-ensemble member)
# is only ever moment-matched FROZEN: its hyperparameters are trained by
# LML/HMC, never through the match. So the GPR variant needs just the
# (dmx, dsxx) adjoint. One shared kernel across R output columns means a single
# symmetric (X, X) pair grid — R(R+1)/2 times less exp work than mapping GPR
# onto the replicated-latent SVGP grid.


class GPRMatchMeta(NamedTuple):
    num_out: int  # R output columns
    num_dim: int  # D
    num_n: int  # N data points
    np_: int  # N padded
    dp: int  # D padded
    uncertainty: bool


@pytree_dataclass(meta_fields=("meta",))
class FusedGPRMatchGrid:
    """Constants of the GPR match, padded for the kernel (cf. GPRMatchCache)."""

    kdiag: jax.Array  # (2, Dp): [lam; vdiag]
    xt: jax.Array  # (Dp, Np) training inputs, transposed
    alpha: jax.Array  # (Np, R) representer weights (Kyy^{-1}(y - mean))
    varr: jax.Array  # (1, 1) kernel variance
    hll: jax.Array  # (1, 1) 0.5 sum log lam
    kyy_inv: jax.Array  # (Np, Np)
    ut: jax.Array  # (Dp, Np) pair centre factor (u = w for the symmetric pair)
    g1t: jax.Array  # (Dp, Np)
    g11: jax.Array  # (1, Np)
    cp: jax.Array  # (1, 1) log v^2 + 0.5 sum log vdiag
    meta: GPRMatchMeta = None


def build_fused_gpr_match_grid(model, uncertainty: bool = True) -> FusedGPRMatchGrid:
    """model: models.gp.GPR. All jnp; cites reference models.py:44-111."""
    from . import kexp
    from .linalg import bcho_solve, safe_cholesky
    from .. import config as _config

    xdata = model.x
    n, d = xdata.shape
    np_ = _round_up(max(n, 128), 128)
    dp = _round_up(max(d, 8), 8)
    variance = model.kernel.variance
    ls = kexp._bc_lengthscales(model.kernel.lengthscales, d)
    lam = ls * ls

    knn = model.kernel.gram(xdata)
    kyy = knn + model.noise_variance * jnp.eye(n, dtype=knn.dtype)
    lyy = safe_cholesky(kyy, _config.default_jitter(knn.dtype))
    alpha = bcho_solve(lyy, model.y - model.mean_const)  # (N, R)
    kyy_inv = bcho_solve(lyy, jnp.eye(n, dtype=knn.dtype))

    vdiag, u, _, _ = kexp.ekzxxz_pair_terms(
        variance, model.kernel.lengthscales, xdata,
        variance, model.kernel.lengthscales, xdata,
    )
    inv_sqrt = jnp.sqrt(1.0 / (2.0 * lam))
    g1 = xdata * inv_sqrt  # (N, D)
    cp = jnp.log(variance * variance) + 0.5 * jnp.sum(jnp.log(vdiag))

    npad, dpad = np_ - n, dp - d

    def padt(a):  # (N, D) -> (Dp, Np)
        return jnp.pad(a.T, ((0, dpad), (0, npad)))

    meta = GPRMatchMeta(
        num_out=model.y.shape[-1], num_dim=d, num_n=n, np_=np_, dp=dp,
        uncertainty=uncertainty,
    )
    return FusedGPRMatchGrid(
        kdiag=jnp.pad(
            jnp.stack([lam, vdiag]), ((0, 0), (0, dpad)), constant_values=1.0
        ),
        xt=padt(xdata),
        alpha=jnp.pad(alpha, ((0, npad), (0, 0))),
        varr=jnp.reshape(variance, (1, 1)),
        hll=jnp.reshape(0.5 * jnp.sum(jnp.log(lam)), (1, 1)),
        kyy_inv=jnp.pad(kyy_inv, ((0, npad), (0, npad))),
        ut=padt(u),
        g1t=padt(g1),
        g11=jnp.pad(jnp.sum(g1 * g1, -1), (0, npad))[None, :],
        cp=jnp.reshape(cp, (1, 1)),
        meta=meta,
    )


def _gpr_fwd_core(meta: GPRMatchMeta, g: FusedGPRMatchGrid, mxp, sxxp, keep=False):
    """f1 (R,), sff (R, R), cross rows D x (R,)."""
    d = meta.num_dim
    dtype = mxp.dtype

    eye_dp = jnp.eye(sxxp.shape[-1], dtype=dtype)
    amat = sxxp[None, :, :] + eye_dp * g.kdiag[:, :, None]  # (2, Dp, Dp)
    ch0 = _chol_unrolled(amat[0:1], d)  # entries (1,)
    ch1 = _chol_unrolled(amat[1:2], d)
    hls0 = 0.0
    hls1 = 0.0
    for i in range(d):
        hls0 = hls0 + jnp.log(ch0[i][i])  # (1,)
        hls1 = hls1 + jnp.log(ch1[i][i])

    # --- eKfu + premultiplied cross solve (single shared kernel)
    zc = [g.xt[i, :][None, :] - mxp[0, i] for i in range(d)]  # rows (1, Np)
    y = _solve_lower(ch0, zc, d)
    quad = y[0] * y[0]
    for i in range(1, d):
        quad = quad + y[i] * y[i]
    e = g.varr[0, 0] * jnp.exp((g.hll[0, 0] - hls0)[:, None] - 0.5 * quad)  # (1, Np)
    iv = _solve_upper_t(ch0, y, d)
    f1 = jax.lax.dot_general(
        e, g.alpha, (((1,), (0,)), ((), ())),
        preferred_element_type=dtype, precision=_HI,
    )[0]  # (R,)
    cross = [
        jax.lax.dot_general(
            iv[i] * e, g.alpha, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype, precision=_HI,
        )[0]
        for i in range(d)
    ]  # D x (R,)

    # --- symmetric (X, X) pair
    ilu = _solve_lower(ch1, [g.ut[i, :][None, :] for i in range(d)], d)
    ilm = _solve_lower_s(ch1, [mxp[0, i][None] for i in range(d)], d)  # (1,) each
    up = [ilu[i] - 0.5 * ilm[i][:, None] for i in range(d)]  # (1, Np)
    a_u = g.g11
    for i in range(d):
        a_u = a_u + up[i] * up[i]
    cexp = g.cp[0, 0] - jnp.sum(hls1)  # scalar

    m_p = -jax.lax.dot_general(
        g.g1t[:d, :], g.g1t[:d, :], (((0,), (0,)), ((), ())),
        preferred_element_type=dtype, precision=_HI,
    )
    for i in range(d):
        m_p = m_p + up[i][0][:, None] * up[i][0][None, :]
    m_p = m_p + 0.5 * a_u[0][:, None] + 0.5 * a_u[0][None, :]
    e_p = jnp.exp(cexp - m_p)  # (Np, Np)
    t_p = jax.lax.dot_general(
        e_p, g.alpha, (((1,), (0,)), ((), ())),
        preferred_element_type=dtype, precision=_HI,
    )  # (Np, R)
    f2 = jax.lax.dot_general(
        g.alpha, t_p, (((0,), (0,)), ((), ())),
        preferred_element_type=dtype, precision=_HI,
    )  # (R, R)
    ecov = jnp.sum(g.kyy_inv * e_p) if meta.uncertainty else None

    sff = f2 - f1[:, None] * f1[None, :]
    if meta.uncertainty:
        sff = sff + jnp.eye(meta.num_out, dtype=dtype) * (g.varr[0, 0] - ecov)

    outs = (f1, sff, cross)
    if not keep:
        return outs
    ivars = dict(
        ch0=ch0, ch1=ch1, hls0=hls0, hls1=hls1, y=y, quad=quad, e=e, iv=iv,
        ilu=ilu, ilm=ilm, up=up, a_u=a_u, cexp=cexp, e_p=e_p, f1=f1,
    )
    return outs, ivars


def _gpr_bwd_core(meta: GPRMatchMeta, g: FusedGPRMatchGrid, mxp, sxxp,
                  df1_in, dsff, dcross_rows):
    """(dmx scalars list, da0, da1) — frozen-only adjoint."""
    d = meta.num_dim
    dtype = mxp.dtype
    (f1, sff, cross), iv_ = _gpr_fwd_core(meta, g, mxp, sxxp, keep=True)
    ch0, ch1 = iv_["ch0"], iv_["ch1"]
    y, e, iv = iv_["y"], iv_["e"], iv_["iv"]
    ilu, ilm, up, e_p = iv_["ilu"], iv_["ilm"], iv_["up"], iv_["e_p"]

    df2 = dsff
    df1 = df1_in - jnp.sum((dsff + dsff.T) * f1[None, :], axis=-1)  # (R,)
    # -sum of dsff's diagonal (jnp.trace would gather inside Mosaic)
    decov = (
        -jnp.sum(dsff * jnp.eye(meta.num_out, dtype=dtype))
        if meta.uncertainty
        else None
    )

    # --- eKfu part: f1_r = sum_m e_m alpha[m, r]; cross[i, r] = sum_m iv_i e alpha
    ad1 = jax.lax.dot_general(
        g.alpha, df1[:, None], (((1,), (0,)), ((), ())),
        preferred_element_type=dtype, precision=_HI,
    )[:, 0][None, :]  # (1, Np): alpha @ df1
    de = ad1
    div = [None] * d
    for i in range(d):
        adc = jax.lax.dot_general(
            g.alpha, dcross_rows[i][:, None], (((1,), (0,)), ((), ())),
            preferred_element_type=dtype, precision=_HI,
        )[:, 0][None, :]  # (1, Np)
        de = de + iv[i] * adc
        div[i] = e * adc
    ede = e * de
    dquad = -0.5 * ede
    dhls0 = -jnp.sum(ede, axis=-1)  # (1,)

    t_iv = _solve_lower(ch0, div, d)
    dy = [2.0 * y[i] * dquad + t_iv[i] for i in range(d)]
    dch0 = [[None] * d for _ in range(d)]

    def _acc(m, i, j, v):
        m[i][j] = v if m[i][j] is None else m[i][j] + v

    for a in range(d):
        for b in range(a + 1):
            _acc(dch0, a, b, -jnp.sum(t_iv[b] * iv[a], axis=-1))
    dzc = _solve_upper_t(ch0, dy, d)
    for a in range(d):
        for b in range(a + 1):
            _acc(dch0, a, b, -jnp.sum(dzc[a] * y[b], axis=-1))
    for i in range(d):
        _acc(dch0, i, i, dhls0 / ch0[i][i])
    dmx = [-jnp.sum(dzc[i]) for i in range(d)]

    # --- pair part: f2 = alpha^T E alpha, ecov = sum(Kyy^{-1} E)
    adf2 = jax.lax.dot_general(
        g.alpha, df2, (((1,), (0,)), ((), ())),
        preferred_element_type=dtype, precision=_HI,
    )  # (Np, R)
    de_p = jax.lax.dot_general(
        adf2, g.alpha, (((1,), (1,)), ((), ())),
        preferred_element_type=dtype, precision=_HI,
    )  # (Np, Np): alpha df2 alpha^T
    if meta.uncertainty:
        de_p = de_p + decov * g.kyy_inv
    ede_p = e_p * de_p
    dm_p = -ede_p
    dhls1 = -jnp.sum(ede_p)  # scalar
    da_u = 0.5 * (jnp.sum(dm_p, axis=1) + jnp.sum(dm_p, axis=0))  # (Np,)
    dch1 = [[None] * d for _ in range(d)]
    dilu = [None] * d
    dilm = [None] * d
    for i in range(d):
        dup_i = (
            jax.lax.dot_general(
                dm_p, up[i][0][:, None], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=_HI,
            )[:, 0]
            + jax.lax.dot_general(
                up[i][0][None, :], dm_p, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype, precision=_HI,
            )[0]
            + 2.0 * up[i][0] * da_u
        )[None, :]  # (1, Np)
        dilu[i] = dup_i
        dilm[i] = -0.5 * jnp.sum(dup_i, axis=-1)  # (1,)
    tmp_u = _solve_upper_t(ch1, dilu, d)
    tmp_m = _solve_upper_t_s(ch1, dilm, d)
    for a in range(d):
        for b in range(a + 1):
            _acc(
                dch1, a, b,
                -jnp.sum(tmp_u[a] * ilu[b], axis=-1) - tmp_m[a] * ilm[b],
            )
    for i in range(d):
        _acc(dch1, i, i, jnp.reshape(dhls1, (1,)) / ch1[i][i])
        dmx[i] = dmx[i] + jnp.sum(tmp_m[i])

    da0 = _chol_rev(ch0, dch0, d)
    da1 = _chol_rev(ch1, dch1, d)
    return dmx, da0, da1


_GPR_GRID_FIELDS = (
    "kdiag", "xt", "alpha", "varr", "hll", "kyy_inv", "ut", "g1t", "g11", "cp",
)


def _gpr_grid_from_refs(meta, refs):
    vals = {f: r[...] for f, r in zip(_GPR_GRID_FIELDS, refs)}
    return FusedGPRMatchGrid(meta=meta, **vals)


def _gpr_fwd_kernel(meta, *refs):
    in_refs = refs[: 2 + len(_GPR_GRID_FIELDS)]
    f1_ref, sff_ref, cross_ref = refs[2 + len(_GPR_GRID_FIELDS):]
    mxp = in_refs[0][...]
    sxxp = in_refs[1][...]
    g = _gpr_grid_from_refs(meta, in_refs[2:])
    f1, sff, cross = _gpr_fwd_core(meta, g, mxp, sxxp)
    r = meta.num_out
    _write_padded_rows(f1_ref, [f1], r)
    _write_padded_rows(sff_ref, [sff[i] for i in range(r)], r)
    _write_padded_rows(cross_ref, cross, r)


def _gpr_bwd_kernel(meta, *refs):
    nin = 2 + len(_GPR_GRID_FIELDS)
    in_refs = refs[:nin]
    df1_ref, dsff_ref, dcross_ref = refs[nin: nin + 3]
    dmx_ref, dsxx_ref = refs[nin + 3:]
    mxp = in_refs[0][...]
    sxxp = in_refs[1][...]
    g = _gpr_grid_from_refs(meta, in_refs[2:])
    r, d = meta.num_out, meta.num_dim
    df1 = df1_ref[0, :r]
    dsff = dsff_ref[:r, :r]
    dcross_rows = [dcross_ref[i, :r] for i in range(d)]
    dmx, da0, da1 = _gpr_bwd_core(meta, g, mxp, sxxp, df1, dsff, dcross_rows)
    dp = dmx_ref.shape[-1]
    dmx_ref[...] = jnp.pad(jnp.stack(dmx)[None, :], ((0, 0), (0, dp - d)))
    dsxx = _scalars_to_lower(_sum_groups(da0, da1, d), d, d, dsxx_ref.dtype)
    dsxx_ref[...] = jnp.pad(dsxx, ((0, dp - d), (0, dp - d)))


def _gpr_fwd_call(meta: GPRMatchMeta, grid: FusedGPRMatchGrid, mxp, sxxp):
    dtype = mxp.dtype
    rpad = _out_pad(max(meta.dp, meta.num_out))
    arrays = [getattr(grid, f) for f in _GPR_GRID_FIELDS]
    return pl.pallas_call(
        partial(_gpr_fwd_kernel, meta),
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), dtype),
            jax.ShapeDtypeStruct((rpad, 128), dtype),
            jax.ShapeDtypeStruct((rpad, 128), dtype),
        ],
        compiler_params=_MOSAIC_PARAMS,
    )(mxp, sxxp, *arrays)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_gpr_match(meta: GPRMatchMeta, grid: FusedGPRMatchGrid, mxp, sxxp):
    return _gpr_fwd_call(meta, grid, mxp, sxxp)


def _gpr_vjp_fwd(meta, grid, mxp, sxxp):
    return _gpr_fwd_call(meta, grid, mxp, sxxp), (grid, mxp, sxxp)


def _gpr_vjp_bwd(meta, res, cots):
    grid, mxp, sxxp = res
    df1p, dsffp, dcrossp = cots
    dtype = mxp.dtype
    arrays = [getattr(grid, f) for f in _GPR_GRID_FIELDS]
    dmx, dsxx = pl.pallas_call(
        partial(_gpr_bwd_kernel, meta),
        out_shape=[
            jax.ShapeDtypeStruct(mxp.shape, dtype),
            jax.ShapeDtypeStruct(sxxp.shape, dtype),
        ],
        compiler_params=_MOSAIC_PARAMS,
    )(mxp, sxxp, *arrays, df1p, dsffp, dcrossp)
    dsxx = 0.5 * (dsxx + dsxx.T)  # match XLA's symmetric-input convention
    dgrid = jax.tree.map(jnp.zeros_like, grid)
    return dgrid, dmx, dsxx


_fused_gpr_match.defvjp(_gpr_vjp_fwd, _gpr_vjp_bwd)


def fused_gpr_match(grid: FusedGPRMatchGrid, mx, sxx):
    """GPR whole-match kernel (frozen-only): mx (..., D), sxx (..., D, D) ->
    (f1 (..., R), sff (..., R, R), cross (..., D, R))."""
    meta = grid.meta
    d, dp, r = meta.num_dim, meta.dp, meta.num_out
    batch = mx.shape[:-1]
    mx_f = mx.reshape((-1, d))
    sxx_f = sxx.reshape((-1, d, d))

    def one(m, s):
        mxp = jnp.pad(m[None, :], ((0, 0), (0, dp - d)))
        sxxp = jnp.pad(s, ((0, dp - d), (0, dp - d)))
        f1p, sffp, crossp = _fused_gpr_match(meta, grid, mxp, sxxp)
        return f1p[0, :r], sffp[:r, :r], crossp[:d, :r]

    f1, sff, cross = jax.vmap(one)(mx_f, sxx_f)
    return (
        f1.reshape(batch + (r,)),
        sff.reshape(batch + (r, r)),
        cross.reshape(batch + (d, r)),
    )
