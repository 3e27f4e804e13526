"""Pallas TPU kernel: fused pathwise GP drift evaluation.

The hot op of pathwise PILCO (docs/perf_notes.md): per rollout step, every
particle s evaluates its own sampled posterior function

    f[s, l] = scale_l * sum_b cos(x_s . omega_lb + phi_lb) * w_slb     (RFF prior)
            + var_l  * sum_m exp(-1/2 |x~_s - z~_lm|^2) * v_slm        (canonical)

XLA materializes the (S, L, B) projection/cosine intermediates in HBM between
fusions (and the backward saves them per scan step). This kernel computes both
terms in one VMEM pass per (particle-tile, latent) grid cell: two MXU matmuls
(TS x D x B and TS x D x M) feeding VPU transcendentals and row reductions, with
a custom VJP that *recomputes* the projections instead of saving them.

TPU tiling requires the last two block dims be (8k, 128k)-aligned or cover the
whole axis, so per-sample tensors are laid out latent-major inside this module:
w, v, gradients and outputs all travel as (L, S, ...) and the wrapper
transposes at the boundary.

The VJP produces tangents only for (x, w, v); the RFF frequencies/phases and
kernel hyperparameters get symbolic zeros. The custom VJP registers with
``symbolic_zeros=True`` so it sees which inputs are actually perturbed: during
policy optimization the paths are frozen constants (reference
train_utils.py:91-105 optimizes policy variables only), and the backward then
runs a dx-only kernel that skips the (S, L, B)+(S, L, M) dw/dv writes — the
dominant HBM traffic of the step. `eval_paths_svgp` (models/pathwise.py)
remains the fully general differentiable path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_S = 128

def _proj_and_k(x, om, phase, il, z, z2):
    """Shared fwd recomputation: RFF projection and (unit-variance) canonical
    gram — kernel variance and the RFF scale are folded into v/w outside the
    custom-VJP boundary, so no per-latent scalars enter the kernel."""
    proj = jax.lax.dot_general(
        x, om, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + phase  # (TS, B)
    xs = x * il  # (TS, D)
    x2 = jnp.sum(xs * xs, axis=1)  # (TS,)
    xz = jax.lax.dot_general(
        xs, z, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # full f32: feeds a cancellation
    )  # (TS, M)
    d2 = jnp.maximum(x2[:, None] + z2 - 2.0 * xz, 0.0)
    k = jnp.exp(-0.5 * d2)  # (TS, M)
    return proj, xs, k


def _fwd_kernel(x_ref, w_ref, v_ref, om_ref, ph_ref, z_ref, z2_ref, il_ref,
                out_ref):
    x = x_ref[:]  # (TS, D)
    proj, _, k = _proj_and_k(
        x, om_ref[0], ph_ref[0], il_ref[0], z_ref[0], z2_ref[0]
    )
    prior = jnp.sum(jnp.cos(proj) * w_ref[0], axis=1)  # (TS,)
    canon = jnp.sum(k * v_ref[0], axis=1)  # (TS,)
    out_ref[0, 0, :] = prior + canon


def _bwd_math(x, w, v, om, ph, z, z2, il, g, want_wv):
    """Shared backward math. want_wv=False (frozen paths) skips the cos(proj)
    evaluation for dw entirely — the kernel is VPU-transcendental-bound, so an
    unused cos over (TS, B) is real money even if later DCE might catch it."""
    proj, xs, k = _proj_and_k(x, om, ph, il, z, z2)
    sw = jnp.sin(proj) * w  # (TS, B)
    dx_prior = -jax.lax.dot_general(
        sw, om, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TS, D)
    kv = k * v  # (TS, M)
    kv_z = jax.lax.dot_general(
        kv, z, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TS, D)
    kv_sum = jnp.sum(kv, axis=1)[:, None]  # (TS, 1)
    dx_canon = (kv_z - kv_sum * xs) * il
    dx = g * (dx_prior + dx_canon)
    if not want_wv:
        return dx, None, None
    return dx, jnp.cos(proj) * g, k * g


def _bwd_kernel(x_ref, w_ref, v_ref, om_ref, ph_ref, z_ref, z2_ref, il_ref,
                g_ref, dx_ref, dw_ref, dv_ref):
    g = g_ref[0, 0][:, None]  # (TS, 1)
    dx, dw, dv = _bwd_math(
        x_ref[:], w_ref[0], v_ref[0], om_ref[0], ph_ref[0], z_ref[0],
        z2_ref[0], il_ref[0], g, want_wv=True,
    )
    dx_ref[0] = dx
    dw_ref[0] = dw
    dv_ref[0] = dv


def _bwd_dx_kernel(x_ref, w_ref, v_ref, om_ref, ph_ref, z_ref, z2_ref, il_ref,
                   g_ref, dx_ref):
    """dx-only backward: during policy optimization the paths (w, v) are frozen
    constants, so their cotangents are discarded upstream — skipping the
    (L, S, B) dw and (L, S, M) dv writes removes ~2/3 of the backward's HBM
    traffic (the dominant cost at S=B=1024; see docs/perf_notes.md)."""
    g = g_ref[0, 0][:, None]  # (TS, 1)
    dx, _, _ = _bwd_math(
        x_ref[:], w_ref[0], v_ref[0], om_ref[0], ph_ref[0], z_ref[0],
        z2_ref[0], il_ref[0], g, want_wv=False,
    )
    dx_ref[0] = dx


def _pad_axis(a, pad, axis):
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _common_specs(b, m, d):
    """BlockSpecs for (x, w_lsb, v_lsm, omega, phase3, z, z2_3, il3)."""
    return [
        pl.BlockSpec((TILE_S, d), lambda i, l: (i, 0)),
        pl.BlockSpec((1, TILE_S, b), lambda i, l: (l, i, 0)),
        pl.BlockSpec((1, TILE_S, m), lambda i, l: (l, i, 0)),
        pl.BlockSpec((1, b, d), lambda i, l: (l, 0, 0)),
        pl.BlockSpec((1, 1, b), lambda i, l: (l, 0, 0)),
        pl.BlockSpec((1, m, d), lambda i, l: (l, 0, 0)),
        pl.BlockSpec((1, 1, m), lambda i, l: (l, 0, 0)),
        pl.BlockSpec((1, 1, d), lambda i, l: (l, 0, 0)),
    ]


def _prep(x, w, v, omega, phase, z_scaled, z2, inv_ls):
    s = x.shape[0]
    pad = (-s) % TILE_S
    xp = _pad_axis(x, pad, 0)
    w_lsb = _pad_axis(jnp.swapaxes(w, 0, 1), pad, 1)  # (L, Sp, B)
    v_lsm = _pad_axis(jnp.swapaxes(v, 0, 1), pad, 1)  # (L, Sp, M)
    return s, pad, xp, w_lsb, v_lsm, phase[:, None, :], z2[:, None, :], inv_ls[:, None, :]


@jax.custom_vjp
def fused_path_eval(x, w, v, omega, phase, z_scaled, z2, inv_ls):
    """f (S, L) from x (S, D), w (S, L, B) [pre-scaled by sqrt(2 var/B)],
    v (S, L, M) [pre-scaled by var], omega (L, B, D), phase (L, B),
    z_scaled (L, M, D), z2 (L, M), inv_ls (L, D)."""
    return _fused_fwd_impl(x, w, v, omega, phase, z_scaled, z2, inv_ls)


def _fused_fwd_impl(x, w, v, omega, phase, z_scaled, z2, inv_ls):
    num_latent, b, d = omega.shape
    m = z_scaled.shape[1]
    s, pad, xp, w_lsb, v_lsm, ph3, z2_3, il3 = _prep(
        x, w, v, omega, phase, z_scaled, z2, inv_ls
    )
    sp = s + pad
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(sp // TILE_S, num_latent),
        in_specs=_common_specs(b, m, d),
        out_specs=pl.BlockSpec((1, 1, TILE_S), lambda i, l: (l, 0, i)),
        out_shape=jax.ShapeDtypeStruct((num_latent, 1, sp), x.dtype),
    )(xp, w_lsb, v_lsm, omega, ph3, z_scaled, z2_3, il3)
    return out[:, 0, :s].T  # (S, L)


def _fused_vjp_fwd(x, w, v, omega, phase, z_scaled, z2, inv_ls):
    # symbolic_zeros=True: every arg arrives as CustomVJPPrimal(value, perturbed)
    if any(a.perturbed for a in (omega, phase, z_scaled, z2, inv_ls)):
        raise NotImplementedError(
            "fused_path_eval has no VJP for the RFF frequencies/phases or "
            "kernel hyperparameters — differentiating through them here would "
            "silently return zero gradients. Use eval_paths_svgp "
            "(models/pathwise.py) for that computation."
        )
    need_wv = w.perturbed or v.perturbed
    args = tuple(a.value for a in (x, w, v, omega, phase, z_scaled, z2, inv_ls))
    return _fused_fwd_impl(*args), (args, need_wv)


def _fused_vjp_bwd(residuals, g):
    (x, w, v, omega, phase, z_scaled, z2, inv_ls), need_wv = residuals
    if isinstance(g, jax.custom_derivatives.SymbolicZero):
        z_ = jnp.zeros_like
        return (z_(x), z_(w), z_(v), z_(omega), z_(phase), z_(z_scaled),
                z_(z2), z_(inv_ls))
    num_latent, b, d = omega.shape
    m = z_scaled.shape[1]
    s, pad, xp, w_lsb, v_lsm, ph3, z2_3, il3 = _prep(
        x, w, v, omega, phase, z_scaled, z2, inv_ls
    )
    sp = s + pad
    gp = _pad_axis(g.T, pad, 1)[:, None, :]  # (L, 1, Sp)

    in_specs = _common_specs(b, m, d) + [
        pl.BlockSpec((1, 1, TILE_S), lambda i, l: (l, 0, i))
    ]
    operands = (xp, w_lsb, v_lsm, omega, ph3, z_scaled, z2_3, il3, gp)
    zeros = jnp.zeros_like
    if need_wv:
        dx_l, dw_l, dv_l = pl.pallas_call(
            _bwd_kernel,
            grid=(sp // TILE_S, num_latent),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, TILE_S, d), lambda i, l: (l, i, 0)),
                pl.BlockSpec((1, TILE_S, b), lambda i, l: (l, i, 0)),
                pl.BlockSpec((1, TILE_S, m), lambda i, l: (l, i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_latent, sp, d), x.dtype),
                jax.ShapeDtypeStruct((num_latent, sp, b), x.dtype),
                jax.ShapeDtypeStruct((num_latent, sp, m), x.dtype),
            ],
            )(*operands)
        dw = jnp.swapaxes(dw_l[:, :s, :], 0, 1)  # (S, L, B)
        dv = jnp.swapaxes(dv_l[:, :s, :], 0, 1)  # (S, L, M)
    else:
        # paths frozen (policy optimization): dw/dv cotangents are discarded by
        # the caller, so don't compute or write them at all
        dx_l = pl.pallas_call(
            _bwd_dx_kernel,
            grid=(sp // TILE_S, num_latent),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, TILE_S, d), lambda i, l: (l, i, 0)),
            out_shape=jax.ShapeDtypeStruct((num_latent, sp, d), x.dtype),
            )(*operands)
        dw = zeros(w)
        dv = zeros(v)

    dx = jnp.sum(dx_l, axis=0)[:s]  # accumulate latents, unpad
    return (
        dx, dw, dv,
        zeros(omega), zeros(phase), zeros(z_scaled), zeros(z2), zeros(inv_ls),
    )


fused_path_eval.defvjp(_fused_vjp_fwd, _fused_vjp_bwd, symbolic_zeros=True)


def eval_paths_svgp_fused(model, paths, x):
    """Drop-in fused replacement for models.pathwise.eval_paths_svgp.

    Only valid where drift/path parameters are constants of the differentiated
    computation (policy optimization); their cotangents are zero by construction.
    """
    kern = model.kernel
    ls = kern.lengthscales  # (L, D)
    inv_ls = 1.0 / ls
    z_scaled = model.z * inv_ls[:, None, :]
    z2 = jnp.sum(z_scaled * z_scaled, axis=-1)
    num_bases = paths.omega.shape[-2]
    scale = jnp.sqrt(2.0 * kern.variance / num_bases)
    # fold per-latent scalars into the sample weights OUTSIDE the custom-VJP
    # boundary so their chain rule is ordinary autodiff
    w_scaled = paths.w * scale[None, :, None]
    v_scaled = paths.v * kern.variance[None, :, None]
    f_lat = fused_path_eval(
        x, w_scaled, v_scaled, paths.omega, paths.phase, z_scaled, z2, inv_ls,
    )
    if model.w is not None:
        out = f_lat @ model.w.T
    else:
        out = f_lat
    return out + model.mean_const
