"""Pallas TPU kernels for the MM rollout's PSD guards and Euler update.

Each moment-matched rollout step runs TWO eigvalsh-based PSD projections (the
policy-joint guard, forward.py:78, and the solver's covariance guard,
solvers.py) plus the Euler moment update — on TPU each eigh is an iterative
HLO subgraph and the surrounding glue is ~10 more tiny ops, all pure dispatch
latency in a sequential chain. Both collapse here:

  * fused_psd_boost(S, jitter): sym(S) + (max(0, -lambda_min) + jitter) I
  * fused_euler_update(m, S, f1, sff, sxf, dt, jitter): the solver step
    new_m = m + dt f1;  C = sym(S + dt(sxf + sxf^T) + dt^2 sff) + boost I

lambda_min comes from an UNROLLED cyclic Jacobi eigenvalue sweep inside the
kernel (D <= 8; 5 sweeps is ~f32-exact for 6x6). The boost is stop-gradient in
the reference semantics (moments.psd_project), so neither kernel needs a
backward kernel: the custom-vjp backwards are 3-5 cheap XLA ops
(symmetrization passthrough / the linear Euler adjoints), identical to XLA
autodiff of the unfused code.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _jacobi_min_eig(a_scal, d):
    """Unrolled cyclic Jacobi on a scalar grid a_scal[i][j] (symmetric, d x d);
    returns the smallest eigenvalue. 5 sweeps: off-diagonal mass decays
    quadratically, ~f32-exact for d <= 8."""
    a = [[a_scal[i][j] for j in range(d)] for i in range(d)]
    for _ in range(5):
        for p in range(d - 1):
            for q in range(p + 1, d):
                apq = a[p][q]
                app = a[p][p]
                aqq = a[q][q]
                # Golub-Van-Loan stable small-angle tangent (Mosaic has no
                # atan2): t = 2 apq sgn(h) / (|h| + sqrt(h^2 + 4 apq^2))
                h = aqq - app
                sgn_h = jnp.where(h < 0, -1.0, 1.0).astype(apq.dtype)
                denom = jnp.abs(h) + jnp.sqrt(h * h + 4.0 * apq * apq) + 1e-37
                t = 2.0 * apq * sgn_h / denom
                c = jax.lax.rsqrt(1.0 + t * t)
                s = t * c
                a[p][p] = c * c * app - 2.0 * s * c * apq + s * s * aqq
                a[q][q] = s * s * app + 2.0 * s * c * apq + c * c * aqq
                a[p][q] = jnp.zeros_like(apq)
                a[q][p] = a[p][q]
                for r in range(d):
                    if r == p or r == q:
                        continue
                    arp = a[r][p]
                    arq = a[r][q]
                    a[r][p] = c * arp - s * arq
                    a[p][r] = a[r][p]
                    a[r][q] = s * arp + c * arq
                    a[q][r] = a[r][q]
    lam = a[0][0]
    for i in range(1, d):
        lam = jnp.minimum(lam, a[i][i])
    return lam


def _sym_boost_core(sxxp, d, jitter, extra=None):
    """sym + Jacobi-min-eig boost on the top-left d x d block of a padded
    value; ``extra`` (optional) adds pre-symmetrization terms."""
    s = sxxp if extra is None else sxxp + extra
    sym = [[0.5 * (s[i, j] + s[j, i]) for j in range(d)] for i in range(d)]
    lam_min = _jacobi_min_eig(sym, d)
    boost = jnp.maximum(-lam_min, 0.0) + jitter
    out = jnp.stack(
        [
            jnp.stack([sym[i][j] + boost if i == j else sym[i][j] for j in range(d)])
            for i in range(d)
        ]
    )
    return out


def _psd_kernel(d, jitter, sxx_ref, out_ref):
    sxxp = sxx_ref[...]
    out = _sym_boost_core(sxxp, d, jitter)
    dp = out_ref.shape[-1]
    out_ref[...] = jnp.pad(out, ((0, dp - d), (0, dp - d)))


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _psd_boost(meta, jitter, sxxp):
    d, dp = meta
    return pl.pallas_call(
        partial(_psd_kernel, d, jitter),
        out_shape=jax.ShapeDtypeStruct(sxxp.shape, sxxp.dtype),
    )(sxxp)


def _psd_fwd(meta, jitter, sxxp):
    return _psd_boost(meta, jitter, sxxp), None


def _psd_bwd(meta, jitter, res, cot):
    # boost is stop-gradient; only the symmetrization propagates
    return (0.5 * (cot + jnp.swapaxes(cot, -1, -2)),)


_psd_boost.defvjp(_psd_fwd, _psd_bwd)


def fused_psd_boost(sxx, jitter: float = 0.0):
    """moments.psd_project as one kernel: sxx (..., D, D) -> (..., D, D)."""
    d = sxx.shape[-1]
    dp = _round_up(max(d, 8), 8)
    batch = sxx.shape[:-2]
    sxx_f = sxx.reshape((-1, d, d))

    def one(s):
        sp = jnp.pad(s, ((0, dp - d), (0, dp - d)))
        return _psd_boost((d, dp), float(jitter), sp)[:d, :d]

    out = jax.vmap(one)(sxx_f)
    return out.reshape(batch + (d, d))


def _euler_kernel(d, dt, jitter, project, m_ref, sxx_ref, f1_ref, sff_ref,
                  sxf_ref, nm_ref, nc_ref):
    mxp = m_ref[...]
    sxxp = sxx_ref[...]
    f1p = f1_ref[...]
    sffp = sff_ref[...]
    sxfp = sxf_ref[...]
    nm_ref[...] = mxp + dt * f1p
    extra = dt * (sxfp + sxfp.T) + (dt * dt) * sffp
    if project:
        out = _sym_boost_core(sxxp, d, jitter, extra=extra)
    else:
        # f64 semantics: symmetrize only (solvers.py skips the projection
        # entirely when cov_jitter is zero)
        s = sxxp + extra
        out = jnp.stack(
            [
                jnp.stack([0.5 * (s[i, j] + s[j, i]) for j in range(d)])
                for i in range(d)
            ]
        )
    dp = nc_ref.shape[-1]
    nc_ref[...] = jnp.pad(out, ((0, dp - d), (0, dp - d)))


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _euler_update(meta, dt, jitter, project, mxp, sxxp, f1p, sffp, sxfp):
    d, dp = meta
    return pl.pallas_call(
        partial(_euler_kernel, d, dt, jitter, project),
        out_shape=[
            jax.ShapeDtypeStruct(mxp.shape, mxp.dtype),
            jax.ShapeDtypeStruct(sxxp.shape, sxxp.dtype),
        ],
    )(mxp, sxxp, f1p, sffp, sxfp)


def _euler_fwd(meta, dt, jitter, project, mxp, sxxp, f1p, sffp, sxfp):
    return _euler_update(meta, dt, jitter, project, mxp, sxxp, f1p, sffp, sxfp), None


def _euler_bwd(meta, dt, jitter, project, res, cots):
    dnm, dnc = cots
    g = 0.5 * (dnc + jnp.swapaxes(dnc, -1, -2))
    return (dnm, g, dt * dnm, (dt * dt) * g, 2.0 * dt * g)


_euler_update.defvjp(_euler_fwd, _euler_bwd)


def fused_euler_update(mean, cov, f1, sff, sxf, dt: float, jitter: float):
    """One solver step (solvers.moment_matching_euler_rollout body) fused:
    mean/f1 (..., D); cov/sff/sxf (..., D, D) -> (new_mean, new_cov).
    jitter == 0 reproduces the symmetrize-only (no projection) semantics."""
    d = mean.shape[-1]
    dp = _round_up(max(d, 8), 8)
    batch = mean.shape[:-1]
    pads2 = ((0, dp - d), (0, dp - d))

    def one(m, s, f, sf, sx):
        mp = jnp.pad(m[None, :], ((0, 0), (0, dp - d)))
        fp = jnp.pad(f[None, :], ((0, 0), (0, dp - d)))
        nm, nc = _euler_update(
            (d, dp), float(dt), float(jitter), bool(jitter),
            mp, jnp.pad(s, pads2), fp, jnp.pad(sf, pads2), jnp.pad(sx, pads2),
        )
        return nm[0, :d], nc[:d, :d]

    nm, nc = jax.vmap(one)(
        mean.reshape((-1, d)),
        cov.reshape((-1, d, d)),
        f1.reshape((-1, d)),
        sff.reshape((-1, d, d)),
        sxf.reshape((-1, d, d)),
    )
    return nm.reshape(batch + (d,)), nc.reshape(batch + (d, d))
