"""Pallas TPU kernel: fused eKuffu pair-grid contraction for MM rollouts.

The MM policy loss (SURVEY.md §3.2, reference utils/kernel_expectation.py:72-187)
spends most of each rollout step assembling, for every latent pair (i, j), the
(M, M) block

    E_ij[a, b] = exp(-1/2 [(c_ab - m)^T (S+V)^{-1} (c_ab - m) + zquad_ab]) ...

whose ONLY consumers are two tiny reductions: f2[i,j] = alpha_i^T E alpha_j and
ecov_i = sum(Q_i * E_ii). XLA materializes ~6 (P, M, M) intermediates per step
(quad assembly, exp, mirror) in HBM — ~20 MB of traffic per step-direction at
M=240 — and the MM loss is latency/bandwidth-bound (docs/perf_notes.md round-2
profile: 60 us/step for the drift match alone).

This kernel computes E tile-resident and emits only the reduced vectors. The
trick that makes it one MXU op: the exponent is a *bilinear* form

    M_ij = su^T sw  with  su = [u'; g1; a_u; 1],  sw = [w'; -g2; 0.5; 0.5 a_w]

(u' = L^{-1}u - L^{-1}m/2 etc., the |a+b-m|^2 = |a-m/2|^2 + |b-m/2|^2 +
2(a-m/2).(b-m/2) split, which also keeps every exp argument <= 0 — no f32
overflow), so E = exp(-su^T sw) and the per-index affine terms ride two extra
matrix rows instead of awkward lane/sublane broadcasts.

custom_vjp boundary = exactly the kernel: (su, sw, alu, qm) -> (evc, qcol);
everything upstream (Cholesky, solves, row stacking, exp(s) scaling, the final
dot with alpha_w) stays in XLA, so ordinary autodiff delivers gradients to both
policy parameters and state moments.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..moments import pytree_dataclass
from .linalg import bsolve_triangular

_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------------- kernels
def _fwd_kernel(su_ref, sw_ref, alu_ref, qm_ref, evc_ref, qcol_ref):
    su = su_ref[0]  # (D2, Mp)
    sw = sw_ref[0]  # (D2, Mp)
    m = jax.lax.dot_general(
        su, sw, (((0,), (0,)), ((), ())),
        preferred_element_type=su.dtype, precision=_HI,
    )  # (Mp, Mp)
    e = jnp.exp(-m)
    evc_ref[0] = jax.lax.dot_general(
        alu_ref[0], e, (((1,), (0,)), ((), ())),
        preferred_element_type=su.dtype, precision=_HI,
    )  # (1, Mp): sum_i alpha_u[i] E[i, j]
    qcol_ref[0] = jnp.sum(qm_ref[0] * e, axis=0, keepdims=True)  # (1, Mp)


def _bwd_kernel(su_ref, sw_ref, alu_ref, qm_ref, devc_ref, dqcol_ref,
                dsu_ref, dsw_ref, dalu_ref, dqm_ref):
    su = su_ref[0]
    sw = sw_ref[0]
    m = jax.lax.dot_general(
        su, sw, (((0,), (0,)), ((), ())),
        preferred_element_type=su.dtype, precision=_HI,
    )
    e = jnp.exp(-m)  # recomputed — nothing (Mp, Mp)-sized is ever saved

    devc = devc_ref[0]  # (1, Mp)
    dqcol = dqcol_ref[0]  # (1, Mp)
    # dE = outer(alpha_u, devc) + qm * dqcol_row;  dM = -E . dE
    de = jax.lax.dot_general(
        alu_ref[0], devc, (((0,), (0,)), ((), ())),
        preferred_element_type=su.dtype, precision=_HI,
    )  # (Mp, Mp) outer product on the MXU
    de = de + qm_ref[0] * dqcol
    g = -(e * de)  # (Mp, Mp) = dL/dM

    dsu_ref[0] = jax.lax.dot_general(
        sw, g, (((1,), (1,)), ((), ())),
        preferred_element_type=su.dtype, precision=_HI,
    )  # (D2, Mp): sum_j sw[d, j] g[i, j]
    dsw_ref[0] = jax.lax.dot_general(
        su, g, (((1,), (0,)), ((), ())),
        preferred_element_type=su.dtype, precision=_HI,
    )  # (D2, Mp): sum_i su[d, i] g[i, j]
    dalu_ref[0] = jax.lax.dot_general(
        devc, e, (((1,), (1,)), ((), ())),
        preferred_element_type=su.dtype, precision=_HI,
    )  # (1, Mp): sum_j devc[j] E[i, j]
    dqm_ref[0] = e * dqcol


# ------------------------------------------------------------------ custom vjp
@jax.custom_vjp
def fused_pair_contract(su, sw, alu, qm):
    """su, sw (P, D2, Mp); alu (P, R, Mp) row-stacked left vectors;
    qm (P, Mp, Mp) -> evc (P, R, Mp) = alu @ exp(-su^T sw),
    qcol (P, 1, Mp) = colsum(qm*E). R=1 for the SVGP pair grid; R=num_outputs
    for the GPR match (alpha has one column per output)."""
    return _fwd_impl(su, sw, alu, qm)


def _specs(d2, mp, r):
    return [
        pl.BlockSpec((1, d2, mp), lambda p: (p, 0, 0)),
        pl.BlockSpec((1, d2, mp), lambda p: (p, 0, 0)),
        pl.BlockSpec((1, r, mp), lambda p: (p, 0, 0)),
        pl.BlockSpec((1, mp, mp), lambda p: (p, 0, 0)),
    ]


def _fwd_impl(su, sw, alu, qm):
    num_pairs, d2, mp = su.shape
    r = alu.shape[1]
    evc, qcol = pl.pallas_call(
        _fwd_kernel,
        grid=(num_pairs,),
        in_specs=_specs(d2, mp, r),
        out_specs=[
            pl.BlockSpec((1, r, mp), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, 1, mp), lambda p: (p, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_pairs, r, mp), su.dtype),
            jax.ShapeDtypeStruct((num_pairs, 1, mp), su.dtype),
        ],
    )(su, sw, alu, qm)
    return evc, qcol


def _vjp_fwd(su, sw, alu, qm):
    return _fwd_impl(su, sw, alu, qm), (su, sw, alu, qm)


def _vjp_bwd(res, cot):
    su, sw, alu, qm = res
    devc, dqcol = cot
    num_pairs, d2, mp = su.shape
    r = alu.shape[1]
    dsu, dsw, dalu, dqm = pl.pallas_call(
        _bwd_kernel,
        grid=(num_pairs,),
        in_specs=_specs(d2, mp, r)
        + [
            pl.BlockSpec((1, r, mp), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, 1, mp), lambda p: (p, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d2, mp), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, d2, mp), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, r, mp), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, mp, mp), lambda p: (p, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_pairs, d2, mp), su.dtype),
            jax.ShapeDtypeStruct((num_pairs, d2, mp), su.dtype),
            jax.ShapeDtypeStruct((num_pairs, r, mp), su.dtype),
            jax.ShapeDtypeStruct((num_pairs, mp, mp), su.dtype),
        ],
    )(su, sw, alu, qm, devc, dqcol)
    return dsu, dsw, dalu, dqm


fused_pair_contract.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------------------- state-free grid
@pytree_dataclass(meta_fields=("num_latent", "num_dim"))
class FusedPairGrid:
    """State-independent tensors of the latent-pair grid, M-padded for the
    kernel. Built once per model by the match cache (cf. SVGPMatchCache)."""

    vdiag: jax.Array  # (P, D)
    ut: jax.Array  # (P, D, Mp) u^T, zero-padded columns
    wt: jax.Array  # (P, D, Mp)
    g1t: jax.Array  # (P, D, Mp)
    g2t: jax.Array  # (P, D, Mp)
    g11: jax.Array  # (P, Mp)
    g22: jax.Array  # (P, Mp)
    cp: jax.Array  # (P,) log(v1 v2) + 0.5 log|V|
    alpha_u: jax.Array  # (P, Mp) alpha[i(p)], zero-padded
    alpha_w: jax.Array  # (P, Mp) alpha[j(p)]
    qm: jax.Array  # (P, Mp, Mp) Q_{i(p)} for diagonal pairs, zeros otherwise
    scatter: jax.Array  # (P, L*L) 0/1 f2 scatter (mirrors the lower triangle)
    diag_pos: jax.Array  # (L,) pair index of (l, l)
    num_latent: int = 1
    num_dim: int = 1


def build_fused_pair_grid(kernel, z, alpha, qmat) -> FusedPairGrid:
    """kernel: latent-stacked RBF; z (L, M, D); alpha (L, M); qmat (L, M, M)."""
    import numpy as np

    from . import kexp

    num_latent, num_m, d = z.shape
    mp = _round_up(max(num_m, 128), 128)
    pad = mp - num_m
    var = kernel.variance
    ls = kernel.lengthscales
    pairs = [(i, j) for i in range(num_latent) for j in range(i, num_latent)]
    i_idx = jnp.asarray([p[0] for p in pairs])
    j_idx = jnp.asarray([p[1] for p in pairs])

    vdiag, u, w, _ = jax.vmap(
        lambda v1, l1, z1, v2, l2, z2: kexp.ekzxxz_pair_terms(v1, l1, z1, v2, l2, z2)
    )(var[i_idx], ls[i_idx], z[i_idx], var[j_idx], ls[j_idx], z[j_idx])
    # NOTE: log_pref from pair_terms bakes zquad into an (M, M) tensor; here the
    # z-side factors stay in vector form and zquad is recomputed on the MXU.
    lam_i = jax.vmap(kexp._bc_lengthscales, in_axes=(0, None))(ls[i_idx], d) ** 2
    lam_j = jax.vmap(kexp._bc_lengthscales, in_axes=(0, None))(ls[j_idx], d) ** 2
    inv_sqrt = jnp.sqrt(1.0 / (lam_i + lam_j))  # (P, D)
    g1 = z[i_idx] * inv_sqrt[:, None, :]  # (P, M, D)
    g2 = z[j_idx] * inv_sqrt[:, None, :]
    cp = jnp.log(var[i_idx] * var[j_idx]) + 0.5 * jnp.sum(jnp.log(vdiag), -1)

    def padt(a):  # (P, M, D) -> (P, D, Mp)
        return jnp.pad(jnp.swapaxes(a, -1, -2), ((0, 0), (0, 0), (0, pad)))

    def padv(a):  # (P, M) -> (P, Mp)
        return jnp.pad(a, ((0, 0), (0, pad)))

    lut = {p: k for k, p in enumerate(pairs)}
    # f2 is symmetric (alpha_i^T E_ij alpha_j = alpha_j^T E_ij^T alpha_i), so
    # each upper-tri pair scatters to both (i, j) and (j, i); diagonal pairs
    # write the same slot once
    scatter = np.zeros((len(pairs), num_latent * num_latent), np.float64)
    for k, (i, j) in enumerate(pairs):
        scatter[k, i * num_latent + j] = 1.0
        scatter[k, j * num_latent + i] = 1.0

    qm = jnp.zeros((len(pairs), mp, mp), z.dtype)
    for l in range(num_latent):
        qm = qm.at[lut[(l, l)], :num_m, :num_m].set(qmat[l])

    return FusedPairGrid(
        vdiag=vdiag,
        ut=padt(u),
        wt=padt(w),
        g1t=padt(g1),
        g2t=padt(g2),
        g11=padv(jnp.sum(g1 * g1, -1)),
        g22=padv(jnp.sum(g2 * g2, -1)),
        cp=cp,
        alpha_u=padv(alpha[i_idx]),
        alpha_w=padv(alpha[j_idx]),
        qm=qm,
        scatter=jnp.asarray(scatter, z.dtype),
        diag_pos=jnp.asarray([lut[(l, l)] for l in range(num_latent)]),
        num_latent=num_latent,
        num_dim=d,
    )


def _contract_single(grid: FusedPairGrid, mx, sxx):
    """Unbatched core: mx (D,), sxx (D, D) -> f2_lat (L, L), ecov_corr (L,)."""
    d = grid.num_dim
    num_pairs, _, mp = grid.ut.shape
    d2 = _round_up(2 * d + 2, 8)
    dtype = mx.dtype

    eye = jnp.eye(d, dtype=dtype)
    vmat = sxx[None] + eye * grid.vdiag[:, :, None]  # (P, D, D)
    chol = jnp.linalg.cholesky(vmat)
    # one batched solve for both inducing-set factors, one for the mean
    rhs = jnp.concatenate([grid.ut, grid.wt], axis=-1)  # (P, D, 2Mp)
    il_uw = bsolve_triangular(chol, rhs, lower=True)
    il_u, il_w = il_uw[..., :mp], il_uw[..., mp:]
    il_m = bsolve_triangular(
        chol, jnp.broadcast_to(mx[None, :, None], (num_pairs, d, 1)), lower=True
    )  # (P, D, 1)
    up = il_u - 0.5 * il_m  # padded columns become -il_m/2: harmless, see a_u
    wp = il_w - 0.5 * il_m
    a_u = jnp.sum(up * up, axis=-2) + grid.g11  # (P, Mp)
    a_w = jnp.sum(wp * wp, axis=-2) + grid.g22

    ones = jnp.ones((num_pairs, 1, mp), dtype)
    su = jnp.concatenate(
        [up, grid.g1t, a_u[:, None, :], ones], axis=-2
    )  # (P, 2D+2, Mp)
    sw = jnp.concatenate(
        [wp, -grid.g2t, 0.5 * ones, 0.5 * a_w[:, None, :]], axis=-2
    )
    rpad = d2 - (2 * d + 2)
    if rpad:
        su = jnp.pad(su, ((0, 0), (0, rpad), (0, 0)))
        sw = jnp.pad(sw, ((0, 0), (0, rpad), (0, 0)))

    evc, qcol = fused_pair_contract(su, sw, grid.alpha_u[:, None, :], grid.qm)

    hls = jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), -1)  # (P,)
    esc = jnp.exp(grid.cp - hls)  # (P,)
    f2_pairs = esc * jnp.sum(evc[:, 0, :] * grid.alpha_w, axis=-1)  # (P,)
    num_latent = grid.num_latent
    f2_lat = (f2_pairs @ grid.scatter).reshape(num_latent, num_latent)
    ecov_pairs = esc * jnp.sum(qcol[:, 0, :], axis=-1)  # (P,)
    ecov_corr = jnp.take(ecov_pairs, grid.diag_pos, axis=0)  # (L,)
    return f2_lat, ecov_corr


def ekuffu_contract_fused(grid: FusedPairGrid, mx, sxx):
    """Batched wrapper: mx (..., D), sxx (..., D, D) ->
    f2_lat (..., L, L) = alpha_i^T eKuffu_ij alpha_j  and
    ecov_corr (..., L) = sum(Q_l * eKuffu_ll) (the expected-cov trace term)."""
    batch = mx.shape[:-1]
    d = mx.shape[-1]
    mx_f = mx.reshape((-1, d))
    sxx_f = sxx.reshape((-1, d, d))
    f2, ecov = jax.vmap(lambda m, s: _contract_single(grid, m, s))(mx_f, sxx_f)
    num_latent = grid.num_latent
    return (
        f2.reshape(batch + (num_latent, num_latent)),
        ecov.reshape(batch + (num_latent,)),
    )


# ------------------------------------------------------------- GPR (X, X) pair
@pytree_dataclass(meta_fields=("num_dim",))
class FusedGPRGrid:
    """Single symmetric (X, X) pair for the GPR match: u = w = X/2 under the
    shared kernel, so only the affine rows differ between the two factors."""

    vdiag: jax.Array  # (D,)
    ut: jax.Array  # (D, Np)
    g1t: jax.Array  # (D, Np)
    g11: jax.Array  # (Np,)
    cp: jax.Array  # ()
    alphat: jax.Array  # (R, Np) alpha^T, zero-padded
    qm: jax.Array  # (Np, Np) Kyy^{-1}, zero-padded
    num_dim: int = 1


def build_fused_gpr_grid(variance, lengthscales, xdata, alpha, kyy_inv):
    """xdata (N, D); alpha (N, R); kyy_inv (N, N)."""
    from . import kexp

    n, d = xdata.shape
    np_ = _round_up(max(n, 128), 128)
    pad = np_ - n
    vdiag, u, _, _ = kexp.ekzxxz_pair_terms(
        variance, lengthscales, xdata, variance, lengthscales, xdata
    )
    lam = kexp._bc_lengthscales(lengthscales, d) ** 2
    inv_sqrt = jnp.sqrt(1.0 / (2.0 * lam))
    g1 = xdata * inv_sqrt  # (N, D)
    cp = jnp.log(variance * variance) + 0.5 * jnp.sum(jnp.log(vdiag))

    def padt(a):  # (N, D) -> (D, Np)
        return jnp.pad(a.T, ((0, 0), (0, pad)))

    return FusedGPRGrid(
        vdiag=vdiag,
        ut=padt(u),
        g1t=padt(g1),
        g11=jnp.pad(jnp.sum(g1 * g1, -1), (0, pad)),
        cp=cp,
        alphat=jnp.pad(alpha.T, ((0, 0), (0, pad))),
        qm=jnp.pad(kyy_inv, ((0, pad), (0, pad))),
        num_dim=d,
    )


def _gpr_contract_single(grid: FusedGPRGrid, mx, sxx):
    d = grid.num_dim
    _, np_ = grid.ut.shape
    d2 = _round_up(2 * d + 2, 8)
    dtype = mx.dtype

    vmat = sxx + jnp.eye(d, dtype=dtype) * grid.vdiag  # (D, D)
    chol = jnp.linalg.cholesky(vmat)
    il_u = bsolve_triangular(chol, grid.ut, lower=True)  # (D, Np)
    il_m = bsolve_triangular(chol, mx[:, None], lower=True)  # (D, 1)
    up = il_u - 0.5 * il_m
    a_u = jnp.sum(up * up, axis=0) + grid.g11  # (Np,)

    ones = jnp.ones((1, np_), dtype)
    su = jnp.concatenate([up, grid.g1t, a_u[None, :], ones], axis=0)
    sw = jnp.concatenate(
        [up, -grid.g1t, 0.5 * ones, 0.5 * a_u[None, :]], axis=0
    )
    rpad = d2 - (2 * d + 2)
    if rpad:
        su = jnp.pad(su, ((0, rpad), (0, 0)))
        sw = jnp.pad(sw, ((0, rpad), (0, 0)))

    evc, qcol = fused_pair_contract(
        su[None], sw[None], grid.alphat[None], grid.qm[None]
    )
    hls = jnp.sum(jnp.log(jnp.diagonal(chol)))
    esc = jnp.exp(grid.cp - hls)
    f2 = esc * jnp.einsum("rn,qn->rq", evc[0], grid.alphat)  # (R, R)
    ecov_corr = esc * jnp.sum(qcol)  # ()
    return f2, ecov_corr


def ekuffu_contract_gpr(grid: FusedGPRGrid, mx, sxx):
    """Batched: mx (..., D), sxx (..., D, D) -> f2 (..., R, R) =
    alpha^T eKuffu alpha and ecov_corr (...,) = sum(Kyy^{-1} * eKuffu)."""
    batch = mx.shape[:-1]
    d = mx.shape[-1]
    f2, ecov = jax.vmap(lambda m, s: _gpr_contract_single(grid, m, s))(
        mx.reshape((-1, d)), sxx.reshape((-1, d, d))
    )
    r = grid.alphat.shape[0]
    return f2.reshape(batch + (r, r)), ecov.reshape(batch)
