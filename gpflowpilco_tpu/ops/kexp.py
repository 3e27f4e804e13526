"""Gaussian integrals of RBF kernels — the PILCO kernel-expectation quadratics.

Re-derivation of the closed forms computed by the reference's gpflow-expectation
extensions (/root/reference/gpflow_pilco/utils/kernel_expectation.py:72-288), written
as pure batched JAX:

With k(x, z) = s^2 exp(-1/2 (x-z)^T Lam^{-1} (x-z)), Lam = diag(l^2) and
x ~ N(m, S):

  eKff          E[k(x,x)] = s^2
  eKxz[m]       E[k(x, z_m)]            = s^2 sqrt(|Lam|/|S+Lam|)
                                          * exp(-1/2 (z_m-m)^T (S+Lam)^{-1} (z_m-m))
  eKzxxz[i,j]   E[k1(z1_i, x) k2(x, z2_j)]:
      the product of two Gaussian kernels is an unnormalized Gaussian in x with
      covariance V = (Lam1^{-1}+Lam2^{-1})^{-1} and centre c_ij = u_i + w_j where
      u_i = V Lam1^{-1} z1_i, w_j = V Lam2^{-1} z2_j, times the x-free factor
      s1^2 s2^2 exp(-1/2 (z1_i-z2_j)^T (Lam1+Lam2)^{-1} (z1_i-z2_j)).  Integrating,
      eKzxxz[i,j] = zfac_ij * sqrt(|V|/|S+V|)
                    * exp(-1/2 (c_ij-m)^T (S+V)^{-1} (c_ij-m)).

The (c_ij - m) quadratic is *expanded* so no (M1, M2, D) tensor is ever materialized —
everything is one Cholesky + three triangular solves + an (M1, M2) matmul on the MXU
(the same trick as reference kernel_expectation.py:125-163, re-derived).

Multioutput variants vmap over the stacked latent axis of `models.kernels.RBF`;
the eKuffu pair grid exploits the adjoint symmetry E[k_i k_j] = E[k_j k_i]^T so only
L(L+1)/2 pairs are computed (reference caches by hash order, kernel_expectation.py:238-244).

All functions broadcast over leading batch dims of (mx, Sxx).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from .linalg import bsolve_triangular

from ..models.kernels import RBF


def _bc_lengthscales(ls, d):
    ls = jnp.asarray(ls)
    if ls.ndim == 0:
        ls = jnp.broadcast_to(ls, (d,))
    return ls


def ekff(variance, mx):
    """E[k(x, x)] for an RBF kernel: (...,) of the kernel variance."""
    return jnp.broadcast_to(jnp.asarray(variance), jnp.shape(mx)[:-1])


def ekxz(variance, lengthscales, z, mx, sxx):
    """E[k(x, Z)]: mx (..., D), sxx (..., D, D), z (M, D) -> (..., M)."""
    d = z.shape[-1]
    ls = _bc_lengthscales(lengthscales, d)
    lam = ls * ls
    s = sxx + _bdiag(lam, sxx)
    chol = jnp.linalg.cholesky(s)
    diff = z - mx[..., None, :]  # (..., M, D)
    il_diff = bsolve_triangular(chol, jnp.swapaxes(diff, -1, -2), lower=True)
    quad = jnp.sum(il_diff * il_diff, axis=-2)  # (..., M)
    half_logdet_lam = 0.5 * jnp.sum(jnp.log(lam), axis=-1)
    half_logdet_s = jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    )
    log_det_term = half_logdet_lam - half_logdet_s
    return variance * jnp.exp(log_det_term[..., None] - 0.5 * quad)


def _bdiag(diag_vec, like):
    """Diagonal matrix broadcastable against `like`'s batch dims."""
    return jnp.eye(like.shape[-1], dtype=like.dtype) * diag_vec[..., None, :]


def ekzxxz_pair_terms(v1, l1, z1, v2, l2, z2):
    """State-independent factors of eKzxxz for one kernel pair.

    Everything here depends only on (variances, lengthscales, inducing sets) —
    inside a rollout scan (and across every policy-optimizer step for a frozen
    drift) these are constants, so hoisting them removes the x-free Gaussian
    factor's matmuls from every step. Returns (vdiag (D,), u (M1, D), w (M2, D),
    log_pref (M1, M2)) with log_pref = log(v1 v2) + 0.5 log|V| - zquad/2.
    """
    d = z1.shape[-1]
    ls1 = _bc_lengthscales(l1, d)
    ls2 = _bc_lengthscales(l2, d)
    lam1 = ls1 * ls1
    lam2 = ls2 * ls2
    lam_sum = lam1 + lam2
    v = lam1 * lam2 / lam_sum  # diag of V

    u = z1 * (lam2 / lam_sum)  # (M1, D)
    w = z2 * (lam1 / lam_sum)  # (M2, D)

    # x-free Gaussian factor between the two inducing sets
    inv_sqrt = jnp.sqrt(1.0 / lam_sum)
    g1 = z1 * inv_sqrt  # (M1, D)
    g2 = z2 * inv_sqrt  # (M2, D)
    g11 = jnp.sum(g1 * g1, axis=-1)
    g22 = jnp.sum(g2 * g2, axis=-1)
    g12 = jnp.einsum("id,jd->ij", g1, g2, precision=jax.lax.Precision.HIGHEST)
    zquad = g11[:, None] + g22[None, :] - 2.0 * g12  # (M1, M2)

    half_logdet_v = 0.5 * jnp.sum(jnp.log(v), axis=-1)
    log_pref = jnp.log(v1 * v2) + half_logdet_v - 0.5 * zquad  # (M1, M2)
    return v, u, w, log_pref


def ekzxxz_from_terms(vdiag, u, w, log_pref, mx, sxx):
    """Per-step part of eKzxxz given precomputed pair terms: one (D, D)
    Cholesky, three triangular solves, and the exp assembly."""
    s = sxx + _bdiag(vdiag, sxx)
    chol = jnp.linalg.cholesky(s)

    il_m = bsolve_triangular(chol, mx[..., :, None], lower=True)  # (..., D, 1)
    il_u = bsolve_triangular(chol, u.T, lower=True)  # (..., D, M1)
    il_w = bsolve_triangular(chol, w.T, lower=True)  # (..., D, M2)

    uu = jnp.sum(il_u * il_u, axis=-2)  # (..., M1)
    ww = jnp.sum(il_w * il_w, axis=-2)  # (..., M2)
    mm = jnp.sum(il_m * il_m, axis=(-2, -1))  # (...,)
    # full f32 accumulation: the quadratic assembles by cancellation and feeds exp
    uw = jnp.einsum(
        "...di,...dj->...ij", il_u, il_w, precision=jax.lax.Precision.HIGHEST
    )  # (..., M1, M2)
    um = jnp.sum(il_u * il_m, axis=-2)  # (..., M1)
    wm = jnp.sum(il_w * il_m, axis=-2)  # (..., M2)

    quad = (
        mm[..., None, None]
        + (uu - 2.0 * um)[..., :, None]
        + (ww - 2.0 * wm)[..., None, :]
        + 2.0 * uw
    )

    half_logdet_s = jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    return jnp.exp(log_pref - (half_logdet_s[..., None, None] + 0.5 * quad))


def ekzxxz(v1, l1, z1, v2, l2, z2, mx, sxx):
    """E[k1(Z1, x) k2(x, Z2)]: -> (..., M1, M2). See module docstring for algebra."""
    vdiag, u, w, log_pref = ekzxxz_pair_terms(v1, l1, z1, v2, l2, z2)
    return ekzxxz_from_terms(vdiag, u, w, log_pref, mx, sxx)


def ekxz_isolve(variance, lam, z, mx, sxx):
    """Fused E[k(x, Z)] and (S + Lam)^{-1} (Z - m) over a latent-stacked RBF.

    Both quantities factor the *same* (S + Lam_l) matrix — the MM rules need
    them together every rollout step (eKfu for the first moment, the
    premultiplied solve for the cross-covariance, reference models.py:90-98),
    so sharing one Cholesky halves the per-step small-matrix decompositions.

    variance (L,), lam (L, D) = lengthscales^2, z (L, M, D), mx (..., D),
    sxx (..., D, D) -> ekfu (..., M, L), iv_dx (..., L, D, M).
    """
    eye = jnp.eye(z.shape[-1], dtype=z.dtype)
    v = sxx[..., None, :, :] + eye * lam[..., :, None, :]  # (..., L, D, D)
    chol = jnp.linalg.cholesky(v)
    dx = z - mx[..., None, None, :]  # (..., L, M, D)
    il_dx = bsolve_triangular(
        chol, jnp.swapaxes(dx, -1, -2), lower=True
    )  # (..., L, D, M)
    quad = jnp.sum(il_dx * il_dx, axis=-2)  # (..., L, M)
    half_logdet_lam = 0.5 * jnp.sum(jnp.log(lam), axis=-1)  # (L,)
    half_logdet_s = jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    )  # (..., L)
    log_det_term = half_logdet_lam - half_logdet_s
    ekfu = variance[..., :, None] * jnp.exp(
        log_det_term[..., :, None] - 0.5 * quad
    )  # (..., L, M)
    iv_dx = bsolve_triangular(chol, il_dx, lower=True, trans=1)  # (..., L, D, M)
    return jnp.swapaxes(ekfu, -1, -2), iv_dx


def latent_lam(kernel: RBF, d: int) -> jax.Array:
    """Per-latent squared lengthscales broadcast to (L, D)."""
    ls = jnp.asarray(kernel.lengthscales)
    lam = ls * ls
    if lam.ndim == 1:  # (L,) isotropic per latent
        lam = lam[:, None]
    return jnp.broadcast_to(lam, (lam.shape[0], d))


# ----------------------------------------------------------------------------------
# Multioutput (latent-stacked) variants
# ----------------------------------------------------------------------------------
def ekff_mo(kernel: RBF, mx) -> jax.Array:
    """(..., L): per-latent E[k(x,x)]."""
    var = kernel.variance  # (L,)
    return jnp.broadcast_to(var, jnp.shape(mx)[:-1] + var.shape)


def ekfu_mo(kernel: RBF, z: jax.Array, mx, sxx) -> jax.Array:
    """Stacked E[k_l(x, Z_l)]: z (L, M, D) -> (..., M, L).

    Output layout matches the reference's NxMxL convention
    (kernel_expectation.py:200-214).
    """
    var = kernel.variance
    ls = kernel.lengthscales

    def one(v, l, zz):
        return ekxz(v, l, zz, mx, sxx)  # (..., M)

    out = jax.vmap(one)(var, ls, z)  # (L, ..., M)
    return jnp.moveaxis(out, 0, -1)  # (..., M, L)


def ekuffu_diag_cache(kernel: RBF, z: jax.Array):
    """State-independent terms for the diagonal latent blocks only."""
    var = kernel.variance
    ls = kernel.lengthscales
    return jax.vmap(lambda v, l, zz: ekzxxz_pair_terms(v, l, zz, v, l, zz))(
        var, ls, z
    )


def ekuffu_mo_diag_from_cache(diag_cache, mx, sxx) -> jax.Array:
    vdiag, u, w, log_pref = diag_cache
    out = jax.vmap(lambda vd, uu, ww, lp: ekzxxz_from_terms(vd, uu, ww, lp, mx, sxx))(
        vdiag, u, w, log_pref
    )  # (L, ..., M, M)
    return jnp.moveaxis(out, 0, -3)


def ekuffu_mo_diag(kernel: RBF, z: jax.Array, mx, sxx) -> jax.Array:
    """Diagonal latent blocks E[k_l(Z_l, x) k_l(x, Z_l)]: z (L, M, D) -> (..., L, M, M).

    The full_output_cov=False fast path (reference models.py:79-84): skips the
    L(L-1)/2 cross-latent blocks entirely instead of diagonalizing the full
    (L, M, L, M) tensor.
    """
    return ekuffu_mo_diag_from_cache(ekuffu_diag_cache(kernel, z), mx, sxx)


def ekuffu_pair_cache(kernel: RBF, z: jax.Array):
    """State-independent pair terms for the upper-triangular latent-pair grid:
    (vdiag (P, D), u (P, M, D), w (P, M, D), log_pref (P, M, M)). Computed once
    per model (hoisted out of rollout scans by the match caches)."""
    var = kernel.variance
    ls = kernel.lengthscales
    num_latent = z.shape[0]
    pairs = [(i, j) for i in range(num_latent) for j in range(i, num_latent)]
    i_idx = jnp.asarray([p[0] for p in pairs])
    j_idx = jnp.asarray([p[1] for p in pairs])
    return jax.vmap(ekzxxz_pair_terms)(
        var[i_idx], ls[i_idx], z[i_idx], var[j_idx], ls[j_idx], z[j_idx]
    )


def ekuffu_mo_from_cache(pair_cache, num_latent: int, mx, sxx) -> jax.Array:
    """Per-step eKuffu from hoisted pair terms -> (..., L, M, L, M). The lower
    triangle mirrors the upper via one gather + masked transpose (adjoint
    symmetry) instead of a python stack loop."""
    vdiag, u, w, log_pref = pair_cache
    out = jax.vmap(lambda vd, uu, ww, lp: ekzxxz_from_terms(vd, uu, ww, lp, mx, sxx))(
        vdiag, u, w, log_pref
    )  # (P, ..., M, M)

    pairs = [(i, j) for i in range(num_latent) for j in range(i, num_latent)]
    lut_map = {p: k for k, p in enumerate(pairs)}
    lut = jnp.asarray(
        [
            [lut_map[(i, j)] if i <= j else lut_map[(j, i)] for j in range(num_latent)]
            for i in range(num_latent)
        ]
    )  # (L, L)
    tmask = jnp.asarray(
        [[i > j for j in range(num_latent)] for i in range(num_latent)]
    )  # (L, L) True where the mirrored (transposed) block is needed

    full = out[lut]  # (L1, L2, ..., M, M)
    tmask_b = tmask.reshape((num_latent, num_latent) + (1,) * (full.ndim - 2))
    full = jnp.where(tmask_b, jnp.swapaxes(full, -1, -2), full)
    full = jnp.moveaxis(full, 1, -3)  # (L1, ..., L2, M1, M2)
    full = jnp.moveaxis(full, 0, -4)  # (..., L1, L2, M1, M2)
    return jnp.swapaxes(full, -2, -3)  # (..., L1, M1, L2, M2)


def ekuffu_mo(kernel: RBF, z: jax.Array, mx, sxx) -> jax.Array:
    """Stacked E[k_i(Z_i, x) k_j(x, Z_j)]: z (L, M, D) -> (..., L, M, L, M).

    Computes only the upper-triangular latent pairs and mirrors the rest via the
    adjoint symmetry (always valid: same integrand, transposed).
    """
    return ekuffu_mo_from_cache(
        ekuffu_pair_cache(kernel, z), z.shape[0], mx, sxx
    )
