"""Natural-gradient updates for SVGP variational parameters.

BASELINE.md config 2 ("SVGP dynamics model fit by ELBO + natural gradients") —
no reference counterpart (it uses plain L-BFGS over everything). Method of
Salimbeni, Eleftheriadis & Hensman (2018): for q(u) = N(m, S), step in the
natural parameters theta = (S^{-1} m, -1/2 S^{-1}) along the gradient in the
expectation parameters eta = (m, S + m m^T):

    dL/deta1 = dL/dm - 2 (dL/dS) m
    dL/deta2 = dL/dS
    theta <- theta - gamma * dL/deta, then recover (m, S).

With a Gaussian likelihood the ELBO is conjugate in q, so gamma = 1 jumps to the
*exact* optimal q(u) in one step — that is the unit test, and the practical win:
the dynamics fit only needs hyperparameter steps around an exact inner update.

The ELBO is evaluated as a function of (m, S) with S dense; logdet uses slogdet
so autodiff yields symmetric dL/dS directly.
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp

from ..ops.linalg import bcho_solve, bsolve_triangular
from .gp import SVGP, chol_kuu, kuu

_LOG2PI = math.log(2.0 * math.pi)


def _elbo_meanvar(model: SVGP, m: jax.Array, s: jax.Array, x, y, num_data=None, weights=None):
    """ELBO as a function of variational mean m (L, M) and covariance s (L, M, M)
    (dense SPD), in the model's (whitened or not) coordinates."""
    luu = chol_kuu(model)  # (L, M, M)
    kxu = model.kernel.gram(x[..., None, :, :], model.z)  # (L, N, M)
    a = bsolve_triangular(luu, jnp.swapaxes(kxu, -1, -2), lower=True)  # (L, M, N)

    if model.whiten:
        proj_m = m[..., None]  # (L, M, 1)
        mean_lat = jnp.einsum("lmn,lmo->nl", a, proj_m)
        quad = jnp.einsum("lmn,lmk,lkn->nl", a, s, a)  # a^T S a
    else:
        # unwhitened: f = Kxu Kuu^{-1} u; with b = Luu^{-T} a = Kuu^{-1} Kux
        b = bsolve_triangular(luu, a, lower=True, trans=1)  # (L, M, N)
        mean_lat = jnp.einsum("lmn,lm->nl", b, m)
        quad = jnp.einsum("lmn,lmk,lkn->nl", b, s, b)

    kdiag = model.kernel.variance  # (L,)
    proj = jnp.einsum("lmn,lmn->nl", a, a)
    var_lat = kdiag[None, :] - proj + quad

    if model.w is not None:
        mean = mean_lat @ model.w.T
        var = var_lat @ (model.w**2).T
    else:
        mean, var = mean_lat, var_lat
    mean = mean + model.mean_const

    noise = model.noise_variance
    err = y - mean
    var_exp = -0.5 * (_LOG2PI + jnp.log(noise) + (err**2 + var) / noise)
    if weights is not None:
        var_exp = var_exp * weights[..., None]
    scale = 1.0 if num_data is None else num_data / x.shape[-2]

    # KL(q || p) in the same coordinates
    num_inducing = m.shape[-1]
    sign, logdet_s = jnp.linalg.slogdet(s)
    if model.whiten:
        trace = jnp.einsum("lmm->l", s)
        mahal = jnp.sum(m * m, axis=-1)
        logdet_p = jnp.zeros_like(logdet_s)
    else:
        il_s = bcho_solve(luu, s)
        trace = jnp.einsum("lmm->l", il_s)
        il_m = bsolve_triangular(luu, m[..., None], lower=True)
        mahal = jnp.sum(il_m[..., 0] ** 2, axis=-1)
        logdet_p = 2.0 * jnp.sum(jnp.log(jnp.diagonal(luu, axis1=-2, axis2=-1)), -1)

    kl = 0.5 * jnp.sum(trace + mahal - num_inducing + logdet_p - logdet_s)
    return scale * jnp.sum(var_exp) - kl


def natgrad_step(
    model: SVGP, x, y, gamma: float = 1.0, num_data=None, weights=None
) -> SVGP:
    """One natural-gradient step on (q_mu, q_sqrt); returns the updated model."""
    q_sqrt = jnp.tril(model.q_sqrt)  # (L, M, M)
    m = jnp.swapaxes(model.q_mu, -1, -2)  # (L, M)
    s = jnp.einsum("lmk,lnk->lmn", q_sqrt, q_sqrt)

    def loss(m, s):
        return -_elbo_meanvar(model, m, s, x, y, num_data, weights)

    dm, ds = jax.grad(loss, argnums=(0, 1))(m, s)
    ds = 0.5 * (ds + jnp.swapaxes(ds, -1, -2))

    # natural parameters
    chol_s = jnp.linalg.cholesky(s)
    is_m = bcho_solve(chol_s, m[..., None])[..., 0]  # S^{-1} m
    is_full = bcho_solve(chol_s, jnp.broadcast_to(jnp.eye(s.shape[-1], dtype=s.dtype), s.shape))

    theta1 = is_m - gamma * (dm - 2.0 * jnp.einsum("lmn,ln->lm", ds, m))
    theta2 = -0.5 * is_full - gamma * ds  # = -1/2 S_new^{-1}

    prec_new = -2.0 * theta2  # S_new^{-1}
    prec_new = 0.5 * (prec_new + jnp.swapaxes(prec_new, -1, -2))
    chol_prec = jnp.linalg.cholesky(prec_new)
    s_new = bcho_solve(chol_prec, jnp.broadcast_to(jnp.eye(s.shape[-1], dtype=s.dtype), s.shape))
    s_new = 0.5 * (s_new + jnp.swapaxes(s_new, -1, -2))
    m_new = bcho_solve(chol_prec, theta1[..., None])[..., 0]

    q_sqrt_new = jnp.linalg.cholesky(s_new)
    return dataclass_replace(
        model,
        q_mu=jnp.swapaxes(m_new, -1, -2),
        q_sqrt=q_sqrt_new,
    )


def dataclass_replace(obj, **changes):
    import dataclasses

    return dataclasses.replace(obj, **changes)
