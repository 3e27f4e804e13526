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


def ekzxxz(v1, l1, z1, v2, l2, z2, mx, sxx):
    """E[k1(Z1, x) k2(x, Z2)]: -> (..., M1, M2). See module docstring for algebra."""
    d = z1.shape[-1]
    ls1 = _bc_lengthscales(l1, d)
    ls2 = _bc_lengthscales(l2, d)
    lam1 = ls1 * ls1
    lam2 = ls2 * ls2
    lam_sum = lam1 + lam2
    v = lam1 * lam2 / lam_sum  # diag of V

    u = z1 * (lam2 / lam_sum)  # (M1, D)
    w = z2 * (lam1 / lam_sum)  # (M2, D)

    s = sxx + _bdiag(v, sxx)
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

    # x-free Gaussian factor between the two inducing sets
    inv_sqrt = jnp.sqrt(1.0 / lam_sum)
    g1 = z1 * inv_sqrt  # (M1, D)
    g2 = z2 * inv_sqrt  # (M2, D)
    g11 = jnp.sum(g1 * g1, axis=-1)
    g22 = jnp.sum(g2 * g2, axis=-1)
    g12 = jnp.einsum("id,jd->ij", g1, g2, precision=jax.lax.Precision.HIGHEST)
    zquad = g11[:, None] + g22[None, :] - 2.0 * g12  # (M1, M2)

    half_logdet_v = 0.5 * jnp.sum(jnp.log(v), axis=-1)
    half_logdet_s = jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    log_det_term = half_logdet_v - half_logdet_s  # (...,)

    return (v1 * v2) * jnp.exp(
        log_det_term[..., None, None] - 0.5 * (quad + zquad)
    )


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


def ekuffu_mo_diag(kernel: RBF, z: jax.Array, mx, sxx) -> jax.Array:
    """Diagonal latent blocks E[k_l(Z_l, x) k_l(x, Z_l)]: z (L, M, D) -> (..., L, M, M).

    The full_output_cov=False fast path (reference models.py:79-84): skips the
    L(L-1)/2 cross-latent blocks entirely instead of diagonalizing the full
    (L, M, L, M) tensor.
    """
    var = kernel.variance
    ls = kernel.lengthscales

    def one(v, l, zz):
        return ekzxxz(v, l, zz, v, l, zz, mx, sxx)  # (..., M, M)

    out = jax.vmap(one)(var, ls, z)  # (L, ..., M, M)
    return jnp.moveaxis(out, 0, -3)


def ekuffu_mo(kernel: RBF, z: jax.Array, mx, sxx) -> jax.Array:
    """Stacked E[k_i(Z_i, x) k_j(x, Z_j)]: z (L, M, D) -> (..., L, M, L, M).

    Computes only the upper-triangular latent pairs and mirrors the rest via the
    adjoint symmetry (always valid: same integrand, transposed).
    """
    var = kernel.variance
    ls = kernel.lengthscales
    num_latent = z.shape[0]
    pairs = [(i, j) for i in range(num_latent) for j in range(i, num_latent)]
    i_idx = jnp.asarray([p[0] for p in pairs])
    j_idx = jnp.asarray([p[1] for p in pairs])

    def one(v1, l1, z1, v2, l2, z2):
        return ekzxxz(v1, l1, z1, v2, l2, z2, mx, sxx)  # (..., M, M)

    out = jax.vmap(one)(
        var[i_idx], ls[i_idx], z[i_idx], var[j_idx], ls[j_idx], z[j_idx]
    )  # (P, ..., M, M)

    lut = {p: k for k, p in enumerate(pairs)}
    rows = []
    for i in range(num_latent):
        cols = []
        for j in range(num_latent):
            if i <= j:
                cols.append(out[lut[(i, j)]])
            else:
                cols.append(jnp.swapaxes(out[lut[(j, i)]], -1, -2))
        rows.append(jnp.stack(cols, axis=-2))  # (..., M1, L2, M2)
    return jnp.stack(rows, axis=-4)  # (..., L1, M1, L2, M2)
