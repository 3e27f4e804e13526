"""Pallas TPU kernel: the ENTIRE pathwise policy-rollout loss as one kernel.

Round-2 left the pathwise opt step at ~10 ms: a per-step fused drift kernel
(ops/path_eval_pallas.py) inside a 30-step `lax.scan`, with the inter-step
glue (trig encode -> squashed GP policy -> action append -> Euler -> Gaussian
cost) as ~20 XLA ops per step, plus the scan's activation round-trips for the
backward. At ~50 us of roofline MXU compute per opt step, that path is
dispatch/HBM-bound, not compute-bound.

This kernel runs the whole T-step rollout for a tile of particles in VMEM:

    for t in 0..T-1:
        e    = encode(x)                        # sincos of active dims
        g_lp = k_p^lp(e) @ alpha_lp             # per policy latent
        u    = s * (ndtr(g @ Wp' + mc_p) - .5)  # squashed LCK-mixed policy
        xu   = [e, u]
        f_ld = sum_b cos(xu.omega_ld + phi)*w_ld
               + sum_m exp(-.5|xu-z_ld,m|^2/ls^2)*v_ld
        x    = x + dt * (f @ Wd' + mc_d)
        loss+= -exp(-.5 (encode(x)-target)' P (encode(x)-target))

Wp (U, Lp) / Wd (D, Ld) are LinearCoregionalization mixing matrices (identity
when the model has w=None), so both the cartpole shape (1-D action, w=None)
and the double-pendulum shape (2-D torque, coregionalized policy AND drift)
run fused. Reference semantics: svgp.py:102-114 LCK construction,
swingup_loops.py:84-91 squash, pilco.py:272-298 particle rollout.

The custom VJP stores ONLY the (T+1, S, D) state trajectory and recomputes
everything else in a reverse-time in-kernel loop, emitting gradients for the
POLICY parameters (per-latent alpha, scaled centers, inverse lengthscales) and
nothing else — during policy optimization the drift, paths, mixing matrices,
and initial states are frozen constants (reference train_utils.py:91-105
optimizes policy variables only; models/builders.py policy_mask freezes w).

Mosaic has no erf/erfc: ndtr is computed with the Abramowitz–Stegun 7.1.26
rational approximation (max abs err 1.5e-7 ~= f32 eps) in the forward, and the
EXACT Gaussian pdf in the backward (the true derivative of the true ndtr — the
approximation error stays below f32 rounding noise in both directions).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# particle-tile rows per kernel instance. 128 VMEM-OOMs at the production
# shape (S=1024, B=1024, M=256, L=4: 16.33M > the 16M scoped-vmem limit);
# 64 leaves ~2 MB headroom while keeping the (TS, B) matmuls MXU-shaped.
TILE_S = 64
_INV_SQRT_2PI = 0.3989422804014327


class RolloutMeta(NamedTuple):
    """Static configuration baked into the kernel."""

    num_steps: int
    dt: float
    squash_scale: float  # 2*action_scale - 1e-5
    active_dims: Tuple[int, ...]  # encoder active dims (sorted)
    state_dim: int  # D
    enc_dim: int  # De = 2a + (D - a)
    act_dim: int  # U
    num_latent: int  # Ld drift latents (== D iff Wd is identity)
    pol_latent: int  # Lp policy latents (== U iff Wp is identity)
    interpret: bool = False  # pallas interpret mode (CPU tests)
    tile_s: int = TILE_S  # particles per kernel instance (VMEM-bounded)


def _ndtr(x):
    """Abramowitz–Stegun 7.1.26 normal CDF (exp + polynomial only; Mosaic has
    no erf). Max abs error 1.5e-7 — at/below f32 resolution."""
    z = x * (2.0**-0.5)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.where(z < 0.0, -erf_abs, erf_abs)
    return 0.5 * (1.0 + erf)


def _encode(meta: RolloutMeta, x):
    """e = [sin(x_a), cos(x_a), x_inactive] (components.py Encoder with SinCos:
    transform output first, untouched dims appended)."""
    a = list(meta.active_dims)
    inactive = [i for i in range(meta.state_dim) if i not in set(a)]
    xa = jnp.concatenate([x[:, i : i + 1] for i in a], axis=1)
    parts = [jnp.sin(xa), jnp.cos(xa)]
    if inactive:
        parts.append(jnp.concatenate([x[:, i : i + 1] for i in inactive], axis=1))
    return jnp.concatenate(parts, axis=1)


def _encode_bwd(meta: RolloutMeta, x, ge):
    """gx from ge: active col j gets cos(x_j)*ge_sin_j - sin(x_j)*ge_cos_j;
    inactive dims pass through."""
    a = list(meta.active_dims)
    na = len(a)
    inactive = [i for i in range(meta.state_dim) if i not in set(a)]
    cols = [None] * meta.state_dim
    for j, dim in enumerate(a):
        xj = x[:, dim : dim + 1]
        cols[dim] = ge[:, j : j + 1] * jnp.cos(xj) - ge[:, na + j : na + j + 1] * jnp.sin(xj)
    for j, dim in enumerate(inactive):
        cols[dim] = ge[:, 2 * na + j : 2 * na + j + 1]
    return jnp.concatenate(cols, axis=1)


def _dot(a, b, transpose_b=False, highest=False):
    dims = (((1,), (1,)), ((), ())) if transpose_b else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(
        a, b, dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if highest else None,
    )


def _policy_grams(meta, e, zp, zp2, ilp):
    """Per-policy-latent gram rows: es_l = e*ilp_l, kp_l = exp(-d2/2)."""
    es, kp = [], []
    for l in range(meta.pol_latent):
        es_l = e * ilp[l]
        e2 = jnp.sum(es_l * es_l, axis=1)
        ez = _dot(es_l, zp[l], transpose_b=True, highest=True)  # (TS, Mp)
        d2 = jnp.maximum(e2[:, None] + zp2[l] - 2.0 * ez, 0.0)
        es.append(es_l)
        kp.append(jnp.exp(-0.5 * d2))
    return es, kp


def _drift_terms(xu, om_l, ph_l, il_l, zd_l, zd2_l):
    """proj (TS, B), scaled input (TS, Dxu), canonical gram (TS, M)."""
    proj = _dot(xu, om_l, transpose_b=True) + ph_l
    xs = xu * il_l
    x2 = jnp.sum(xs * xs, axis=1)
    xz = _dot(xs, zd_l, transpose_b=True, highest=True)
    d2 = jnp.maximum(x2[:, None] + zd2_l - 2.0 * xz, 0.0)
    return proj, xs, jnp.exp(-0.5 * d2)


def _step_forward(meta, x, refs):
    """One rollout step from state x: returns
    (x_new, e, es[Lp], kp[Lp], graw, xu)."""
    (zp, zp2, alpha, ilp, wp, mc_p, om, ph, ild, zd, zd2, w, v, wd, mc_d) = refs
    e = _encode(meta, x)
    es, kp = _policy_grams(meta, e, zp, zp2, ilp)
    glat_cols = [
        _dot(kp[l], alpha[l][:, None]) for l in range(meta.pol_latent)
    ]  # each (TS, 1)
    glat = jnp.concatenate(glat_cols, axis=1)  # (TS, Lp)
    graw = _dot(glat, wp, transpose_b=True) + mc_p  # (TS, U)
    u = meta.squash_scale * (_ndtr(graw) - 0.5)
    xu = jnp.concatenate([e, u], axis=1)
    f_cols = []
    for l in range(meta.num_latent):
        proj, _, k = _drift_terms(xu, om[l], ph[l], ild[l], zd[l], zd2[l])
        prior = jnp.sum(jnp.cos(proj) * w[l], axis=1)
        canon = jnp.sum(k * v[l], axis=1)
        f_cols.append((prior + canon)[:, None])
    f_lat = jnp.concatenate(f_cols, axis=1)  # (TS, Ld)
    f = _dot(f_lat, wd, transpose_b=True) + mc_d  # (TS, D)
    return x + meta.dt * f, e, es, kp, graw, xu


def _cost(meta, x, target, precis):
    e = _encode(meta, x)
    err = e - target  # (TS, De)
    perr = _dot(err, precis)  # precis symmetric
    q = jnp.sum(err * perr, axis=1)
    return -jnp.exp(-0.5 * q), err, perr


def _load_refs(meta, zp_ref, zp2_ref, al_ref, ilp_ref, wp_ref, mcp_ref, om_ref,
               ph_ref, ild_ref, zd_ref, zd2_ref, w_ref, v_ref, wd_ref, mcd_ref):
    zp = [zp_ref[l] for l in range(meta.pol_latent)]
    zp2 = [zp2_ref[l, 0] for l in range(meta.pol_latent)]
    alpha = [al_ref[l, 0] for l in range(meta.pol_latent)]
    ilp = [ilp_ref[l, 0] for l in range(meta.pol_latent)]
    om = [om_ref[l] for l in range(meta.num_latent)]
    ph = [ph_ref[l, 0] for l in range(meta.num_latent)]
    ild = [ild_ref[l, 0] for l in range(meta.num_latent)]
    zd = [zd_ref[l] for l in range(meta.num_latent)]
    zd2 = [zd2_ref[l, 0] for l in range(meta.num_latent)]
    w = [w_ref[l] for l in range(meta.num_latent)]
    v = [v_ref[l] for l in range(meta.num_latent)]
    return (zp, zp2, alpha, ilp, wp_ref[:], mcp_ref[0], om, ph, ild, zd, zd2,
            w, v, wd_ref[:], mcd_ref[0])


def _fwd_kernel(meta: RolloutMeta, x0_ref, zp_ref, zp2_ref, al_ref, ilp_ref,
                wp_ref, mcp_ref, om_ref, ph_ref, ild_ref, zd_ref, zd2_ref,
                w_ref, v_ref, wd_ref, mcd_ref, tgt_ref, prc_ref,
                loss_ref, xs_ref):
    step_refs = _load_refs(meta, zp_ref, zp2_ref, al_ref, ilp_ref, wp_ref,
                           mcp_ref, om_ref, ph_ref, ild_ref, zd_ref, zd2_ref,
                           w_ref, v_ref, wd_ref, mcd_ref)
    target = tgt_ref[0]
    precis = prc_ref[:]

    x0 = x0_ref[:]
    xs_ref[0] = x0

    def body(t, carry):
        x, acc = carry
        x_new, *_ = _step_forward(meta, x, step_refs)
        xs_ref[pl.ds(t + 1, 1)] = x_new[None]
        c, _, _ = _cost(meta, x_new, target, precis)
        return x_new, acc + c

    _, loss = jax.lax.fori_loop(
        0, meta.num_steps, body, (x0, jnp.zeros((x0.shape[0],), x0.dtype))
    )
    loss_ref[0, 0] = loss


def _bwd_kernel(meta: RolloutMeta, xs_ref, gl_ref, zp_ref, zp2_ref, al_ref,
                ilp_ref, wp_ref, mcp_ref, om_ref, ph_ref, ild_ref, zd_ref,
                zd2_ref, w_ref, v_ref, wd_ref, mcd_ref, tgt_ref, prc_ref,
                dzp_ref, dal_ref, dilp_ref):
    step_refs = _load_refs(meta, zp_ref, zp2_ref, al_ref, ilp_ref, wp_ref,
                           mcp_ref, om_ref, ph_ref, ild_ref, zd_ref, zd2_ref,
                           w_ref, v_ref, wd_ref, mcd_ref)
    (zp, zp2, alpha, ilp, wp, mc_p, om, ph, ild, zd, zd2, w, v, wd, mc_d) = step_refs
    target = tgt_ref[0]
    precis = prc_ref[:]
    gl = gl_ref[0, 0]  # (TS,) dL/dloss per particle

    ts = gl.shape[0]
    de = meta.enc_dim
    lp = meta.pol_latent

    def body(r, carry):
        g, dzp, dal, dilp = carry
        t = meta.num_steps - 1 - r
        x = xs_ref[pl.ds(t, 1)][0]
        x1 = xs_ref[pl.ds(t + 1, 1)][0]

        # cost gradient at x_{t+1}: dc/derr = -c * (P err)
        c, err, perr = _cost(meta, x1, target, precis)
        ge1 = (gl * (-c))[:, None] * perr
        g1 = g + _encode_bwd(meta, x1, ge1)

        # recompute the step's forward internals at x_t
        _, e, es, kp, graw, xu = _step_forward(meta, x, step_refs)

        gf_lat = meta.dt * _dot(g1, wd)  # (TS, Ld): through the Wd mixing
        # drift backward -> gxu
        gxu = jnp.zeros((ts, xu.shape[1]), xu.dtype)
        for l in range(meta.num_latent):
            proj, xs_l, k = _drift_terms(xu, om[l], ph[l], ild[l], zd[l], zd2[l])
            gfl = gf_lat[:, l : l + 1]
            sw = jnp.sin(proj) * w[l]
            dxu_prior = -_dot(sw, om[l])
            kv = k * v[l]
            kv_z = _dot(kv, zd[l])
            kv_sum = jnp.sum(kv, axis=1)[:, None]
            dxu_canon = (kv_z - kv_sum * xs_l) * ild[l]
            gxu = gxu + gfl * (dxu_prior + dxu_canon)

        ge = gxu[:, :de]
        gu = gxu[:, de:]

        # squash backward: du/draw = s * pdf(graw) (exact Gaussian pdf)
        pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * graw * graw)
        graw_g = gu * (meta.squash_scale * pdf)  # (TS, U)
        glat_g = _dot(graw_g, wp)  # (TS, Lp): through the Wp mixing

        # per-policy-latent backward
        new_dzp, new_dal, new_dilp = [], [], []
        for l in range(lp):
            gcol = glat_g[:, l : l + 1]  # (TS, 1)
            new_dal.append(
                dal[l]
                + jax.lax.dot_general(
                    kp[l], gcol, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[:, 0][None]
            )
            amat = kp[l] * (gcol * alpha[l][None, :])  # (TS, Mp)
            row_a = jnp.sum(amat, axis=1)[:, None]  # (TS, 1)
            ges = _dot(amat, zp[l]) - es[l] * row_a  # (TS, De) = dL/des_l
            ge = ge + ges * ilp[l]
            new_dzp.append(
                dzp[l]
                + jax.lax.dot_general(
                    amat, es[l], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                - jnp.sum(amat, axis=0)[:, None] * zp[l]
            )
            new_dilp.append(dilp[l] + jnp.sum(ges * e, axis=0)[None])

        g_next = g1 + _encode_bwd(meta, x, ge)
        return g_next, tuple(new_dzp), tuple(new_dal), tuple(new_dilp)

    acc_dt = gl.dtype
    g0 = jnp.zeros((ts, meta.state_dim), acc_dt)
    mp = zp[0].shape[0]
    dzp0 = tuple(jnp.zeros((mp, de), acc_dt) for _ in range(lp))
    dal0 = tuple(jnp.zeros((1, mp), acc_dt) for _ in range(lp))
    dilp0 = tuple(jnp.zeros((1, de), acc_dt) for _ in range(lp))
    _, dzp, dal, dilp = jax.lax.fori_loop(
        0, meta.num_steps, body, (g0, dzp0, dal0, dilp0)
    )

    # per-tile partial gradients, summed outside the kernel: no cross-tile
    # accumulator state, so the kernel stays correct under vmap's prepended
    # grid axis (multistart policy optimization vmaps the whole update)
    for l in range(lp):
        dzp_ref[0, l] = dzp[l]
        dal_ref[0, l] = dal[l][0]
        dilp_ref[0, l] = dilp[l][0]


def _pad_axis(a, pad, axis):
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _const_specs(meta, b, m, mp):
    """BlockSpecs for the replicated constants (same order as kernel args
    after the per-tile operands)."""
    de, u = meta.enc_dim, meta.act_dim
    ld, lp, dxu = meta.num_latent, meta.pol_latent, meta.enc_dim + meta.act_dim
    d = meta.state_dim
    c = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return [
        c(lp, mp, de),  # zp (scaled centers, per latent)
        c(lp, 1, mp),   # zp2
        c(lp, 1, mp),   # alpha (variance-scaled, per latent)
        c(lp, 1, de),   # ilp
        c(u, lp),       # wp
        c(1, u),        # mc_p
        c(ld, b, dxu),  # omega
        c(ld, 1, b),    # phase
        c(ld, 1, dxu),  # ild
        c(ld, m, dxu),  # zd
        c(ld, 1, m),    # zd2
    ]


def _tile_specs(meta, b, m):
    ld = meta.num_latent
    return [
        pl.BlockSpec((ld, meta.tile_s, b), lambda i: (0, i, 0)),  # w
        pl.BlockSpec((ld, meta.tile_s, m), lambda i: (0, i, 0)),  # v
    ]


def _trail_specs(meta):
    de, d, ld = meta.enc_dim, meta.state_dim, meta.num_latent
    c = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return [
        c(d, ld),   # wd
        c(1, d),    # mc_d
        c(1, de),   # target
        c(de, de),  # precis
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_rollout_loss(meta: RolloutMeta, x0, zp, zp2, alpha, ilp, wp, mc_p,
                       omega, phase, ild, zd, zd2, w, v, wd, mc_d,
                       target, precis):
    """Per-particle rollout loss (S,). Differentiable ONLY w.r.t. the policy
    arrays (zp, alpha, ilp); everything else is frozen (policy optimization).
    Shapes:
      x0 (S, D); zp (Lp, Mp, De) pre-scaled by ilp; zp2 (Lp, Mp);
      alpha (Lp, Mp) pre-scaled by kernel variance; ilp (Lp, De);
      wp (U, Lp) policy mixing (identity when w=None); mc_p (U,);
      omega (Ld, B, Dxu); phase (Ld, B); ild (Ld, Dxu); zd (Ld, M, Dxu)
      pre-scaled; zd2 (Ld, M); w (S, Ld, B) pre-scaled by sqrt(2 var/B);
      v (S, Ld, M) pre-scaled by var; wd (D, Ld) drift mixing; mc_d (D,);
      target (De,); precis (De, De).
    """
    loss, _ = _fwd_impl(meta, x0, zp, zp2, alpha, ilp, wp, mc_p, omega, phase,
                        ild, zd, zd2, w, v, wd, mc_d, target, precis)
    return loss


def _operands(meta, x0p, zp, zp2, alpha, ilp, wp, mc_p, omega, phase, ild, zd,
              zd2, w_lsb, v_lsm, wd, mc_d, target, precis):
    return (
        x0p, zp, zp2[:, None, :], alpha[:, None, :], ilp[:, None, :], wp,
        mc_p[None], omega, phase[:, None, :], ild[:, None, :], zd,
        zd2[:, None, :], w_lsb, v_lsm, wd, mc_d[None], target[None], precis,
    )


def _fwd_impl(meta, x0, zp, zp2, alpha, ilp, wp, mc_p, omega, phase, ild, zd,
              zd2, w, v, wd, mc_d, target, precis):
    s = x0.shape[0]
    ld, b, dxu = omega.shape
    m = zd.shape[1]
    mp = zp.shape[1]
    pad = (-s) % meta.tile_s
    sp = s + pad
    x0p = _pad_axis(x0, pad, 0)
    w_lsb = _pad_axis(jnp.swapaxes(w, 0, 1), pad, 1)  # (Ld, Sp, B)
    v_lsm = _pad_axis(jnp.swapaxes(v, 0, 1), pad, 1)  # (Ld, Sp, M)

    in_specs = (
        [pl.BlockSpec((meta.tile_s, meta.state_dim), lambda i: (i, 0))]
        + _const_specs(meta, b, m, mp)
        + _tile_specs(meta, b, m)
        + _trail_specs(meta)
    )
    num_tiles = sp // meta.tile_s
    # loss laid out (num_tiles, 1, tile_s): Mosaic requires a block's last dim
    # be 128-divisible or equal the array dim — per-tile rows satisfy the
    # "equal" arm for any tile_s (leading grid dims are unconstrained)
    loss, xs = pl.pallas_call(
        functools.partial(_fwd_kernel, meta),
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, meta.tile_s), lambda i: (i, 0, 0)),
            pl.BlockSpec(
                (meta.num_steps + 1, meta.tile_s, meta.state_dim), lambda i: (0, i, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 1, meta.tile_s), x0.dtype),
            jax.ShapeDtypeStruct((meta.num_steps + 1, sp, meta.state_dim), x0.dtype),
        ],
        interpret=meta.interpret,
    )(*_operands(meta, x0p, zp, zp2, alpha, ilp, wp, mc_p, omega, phase, ild,
                 zd, zd2, w_lsb, v_lsm, wd, mc_d, target, precis))
    return loss.reshape(sp)[:s], xs


def _vjp_fwd(meta, x0, zp, zp2, alpha, ilp, wp, mc_p, omega, phase, ild, zd,
             zd2, w, v, wd, mc_d, target, precis):
    # zp2 = sum(zp^2) is computed FROM zp in the wrapper, so it is perturbed
    # whenever the policy centers train — but the kernel's dzp formula
    # (amat^T es - colsum(amat) zp) is the TOTAL derivative of the distance
    # d2 = e2 + zp2 - 2 es.zp w.r.t. zp, zp2-path included, so returning a
    # zero cotangent for the zp2 slot is exact, not an omission.
    frozen = (x0, wp, mc_p, omega, phase, ild, zd, zd2, w, v, wd, mc_d,
              target, precis)
    if any(a.perturbed for a in frozen):
        raise NotImplementedError(
            "fused_rollout_loss differentiates only the policy arrays "
            "(zp, alpha, ilp); a perturbed drift/path/mixing/initial-state "
            "input would silently get zero gradients. Use the unfused rollout "
            "(loops/pilco.py PathwisePILCO) for that computation."
        )
    vals = tuple(
        a.value for a in (x0, zp, zp2, alpha, ilp, wp, mc_p, omega, phase,
                          ild, zd, zd2, w, v, wd, mc_d, target, precis)
    )
    loss, xs = _fwd_impl(meta, *vals)
    return loss, (vals, xs)


def _vjp_bwd(meta, residuals, gl):
    vals, xs = residuals
    (x0, zp, zp2, alpha, ilp, wp, mc_p, omega, phase, ild, zd, zd2, w, v, wd,
     mc_d, target, precis) = vals
    zeros = jnp.zeros_like
    if isinstance(gl, jax.custom_derivatives.SymbolicZero):
        return tuple(zeros(a) for a in vals)
    s = x0.shape[0]
    ld, b, dxu = omega.shape
    m = zd.shape[1]
    lp, mp = alpha.shape
    de = meta.enc_dim
    pad = (-s) % meta.tile_s
    sp = s + pad
    w_lsb = _pad_axis(jnp.swapaxes(w, 0, 1), pad, 1)
    v_lsm = _pad_axis(jnp.swapaxes(v, 0, 1), pad, 1)
    num_tiles = sp // meta.tile_s
    # (num_tiles, 1, tile_s) like the forward's loss output (Mosaic last-dim
    # rule); pad rows contribute zero
    glp = _pad_axis(gl, pad, 0).reshape(num_tiles, 1, meta.tile_s)

    in_specs = (
        [
            pl.BlockSpec(
                (meta.num_steps + 1, meta.tile_s, meta.state_dim), lambda i: (0, i, 0)
            ),
            pl.BlockSpec((1, 1, meta.tile_s), lambda i: (i, 0, 0)),
        ]
        + _const_specs(meta, b, m, mp)
        + _tile_specs(meta, b, m)
        + _trail_specs(meta)
    )
    tile_out = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + tuple(0 for _ in shape)
    )
    dzp, dal, dilp = pl.pallas_call(
        functools.partial(_bwd_kernel, meta),
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=[tile_out(lp, mp, de), tile_out(lp, mp), tile_out(lp, de)],
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, lp, mp, de), x0.dtype),
            jax.ShapeDtypeStruct((num_tiles, lp, mp), x0.dtype),
            jax.ShapeDtypeStruct((num_tiles, lp, de), x0.dtype),
        ],
        interpret=meta.interpret,
    )(xs, glp, *_operands(meta, jnp.zeros_like(x0), zp, zp2, alpha, ilp, wp,
                          mc_p, omega, phase, ild, zd, zd2, w_lsb, v_lsm, wd,
                          mc_d, target, precis)[1:])
    return (
        zeros(x0), dzp.sum(0), zeros(zp2), dal.sum(0), dilp.sum(0),
        zeros(wp), zeros(mc_p), zeros(omega), zeros(phase), zeros(ild),
        zeros(zd), zeros(zd2), zeros(w), zeros(v), zeros(wd), zeros(mc_d),
        zeros(target), zeros(precis),
    )


fused_rollout_loss.defvjp(_vjp_fwd, _vjp_bwd, symbolic_zeros=True)


# ------------------------------------------------------------------ wrapper
def pathwise_rollout_loss_fused(
    policy_model,
    drift_model,
    paths,
    x0,
    *,
    active_dims: Tuple[int, ...],
    action_scale: float,
    target,
    precis,
    dt: float = 1.0,
    num_steps: int = 30,
    interpret: bool = False,
    reference: bool = False,
):
    """Whole-rollout fused pathwise loss: SVGP drift (optionally
    coregionalized), deterministic squashed SVGP policy (optionally
    coregionalized), trig encoder, Gaussian objective. Returns the
    per-particle loss (S,).

    Policy gradients flow through the XLA-side cache construction (alpha,
    scaled centers, inverse lengthscales), so training sees exact adjoints for
    every trainable policy parameter (models/builders.py policy_mask: z, q_mu,
    lengthscales; mixing matrices are frozen). Drift/path/initial-state inputs
    are frozen by construction (policy optimization)."""
    meta, head, tail, w_s, v_s = fused_rollout_operands(
        policy_model, drift_model, paths,
        state_dim=x0.shape[-1], dtype=x0.dtype,
        active_dims=active_dims, action_scale=action_scale,
        target=target, precis=precis, dt=dt, num_steps=num_steps,
        interpret=interpret,
    )
    if reference:
        return _interpret_reference(meta, x0, *head, w_s, v_s, *tail)
    return fused_rollout_loss(meta, x0, *head, w_s, v_s, *tail)


def fused_rollout_operands(
    policy_model,
    drift_model,
    paths,
    *,
    state_dim: int,
    dtype,
    active_dims: Tuple[int, ...],
    action_scale: float,
    target,
    precis,
    dt: float = 1.0,
    num_steps: int = 30,
    interpret: bool = False,
):
    """Particle-independent kernel operands: (meta, head, tail, w_s, v_s) with
    call order fused_rollout_loss(meta, x0, *head, w_s[local], v_s[local],
    *tail). Split out of the loss wrapper so a sharded caller
    (parallel/pathwise.py) can build the caches ONCE outside `shard_map` —
    the cache's cholesky solves are per-model, not per-particle, and concrete
    closure arrays may not enter the Manual mesh context anyway."""
    from ..models.gp import GPR
    from ..moment_matching.gp import svgp_match_cache

    d = state_dim
    x0 = jnp.zeros((1, d), dtype)  # dtype/shape witness for the checks below
    kern = drift_model.kernel
    num_bases = paths.omega.shape[-2]
    if isinstance(drift_model, GPR):
        # exact-GPR drift (HMC hyperposterior-ensemble members): one SHARED
        # kernel across P outputs, canonical update at the data points
        # (models/pathwise.py:180-239) — latent-stack the scalars and reuse
        # the SVGP kernel layout with zd := X
        ld = int(drift_model.y.shape[-1])
        dxu = drift_model.x.shape[-1]
        inv_ls = jnp.broadcast_to(1.0 / kern.lengthscales, (ld, dxu))
        zd = drift_model.x[None] * inv_ls[:, None, :]  # (P, N, Dxu)
        zd2 = jnp.sum(zd * zd, axis=-1)
        var = jnp.broadcast_to(kern.variance, (ld,))
        drift_w = None
    else:
        inv_ls = 1.0 / kern.lengthscales  # (Ld, Dxu)
        zd = drift_model.z * inv_ls[:, None, :]
        zd2 = jnp.sum(zd * zd, axis=-1)
        var = kern.variance
        ld = int(drift_model.z.shape[0])
        drift_w = drift_model.w
    scale = jnp.sqrt(2.0 * var / num_bases)
    w_s = paths.w * scale[None, :, None]
    v_s = paths.v * var[None, :, None]
    if drift_w is not None:
        wd = drift_w  # (D, Ld)
    else:
        if ld != d:
            raise ValueError("w=None drift requires num_latent == state_dim")
        wd = jnp.eye(d, dtype=x0.dtype)

    pk = policy_model.kernel
    lp = int(policy_model.z.shape[0])
    ilp = 1.0 / pk.lengthscales  # (Lp, De)
    zp = policy_model.z * ilp[:, None, :]
    zp2 = jnp.sum(zp * zp, axis=-1)
    cache = svgp_match_cache(policy_model, uncertainty=False)
    alpha = pk.variance[:, None] * cache.alpha  # (Lp, Mp)
    if policy_model.w is not None:
        wp = policy_model.w  # (U, Lp)
    else:
        wp = jnp.eye(lp, dtype=x0.dtype)
    u_dim = wp.shape[0]
    if zd.shape[-1] != 2 * len(active_dims) + d - len(active_dims) + u_dim:
        raise ValueError("drift input dim != enc_dim + act_dim")

    meta = RolloutMeta(
        num_steps=num_steps,
        dt=float(dt),
        squash_scale=float(2.0 * action_scale - 1e-5),
        active_dims=tuple(active_dims),
        state_dim=d,
        enc_dim=2 * len(active_dims) + d - len(active_dims),
        act_dim=u_dim,
        num_latent=ld,
        pol_latent=lp,
        interpret=interpret,
    )
    head = (
        zp, zp2, alpha, ilp, wp,
        jnp.broadcast_to(policy_model.mean_const, (u_dim,)),
        paths.omega, paths.phase, inv_ls, zd, zd2,
    )
    tail = (
        wd,
        jnp.broadcast_to(drift_model.mean_const, (d,)),
        jnp.asarray(target), jnp.asarray(precis),
    )
    return meta, head, tail, w_s, v_s


def _interpret_reference(meta, x0, zp, zp2, alpha, ilp, wp, mc_p, omega,
                         phase, ild, zd, zd2, w, v, wd, mc_d, target, precis):
    """Pure-JAX re-statement of the kernel math (same A-S ndtr) for CPU parity
    tests; differentiable everywhere."""

    def step(x):
        e = _encode(meta, x)
        glat_cols = []
        for l in range(meta.pol_latent):
            es = e * ilp[l]
            d2 = jnp.maximum(
                jnp.sum(es * es, 1)[:, None] + zp2[l] - 2.0 * es @ zp[l].T, 0.0
            )
            glat_cols.append((jnp.exp(-0.5 * d2) @ alpha[l])[:, None])
        graw = jnp.concatenate(glat_cols, 1) @ wp.T + mc_p
        u = meta.squash_scale * (_ndtr(graw) - 0.5)
        xu = jnp.concatenate([e, u], 1)
        fs = []
        for l in range(meta.num_latent):
            proj = xu @ omega[l].T + phase[l]
            xs = xu * ild[l]
            d2l = jnp.maximum(
                jnp.sum(xs * xs, 1)[:, None] + zd2[l] - 2.0 * xs @ zd[l].T, 0.0
            )
            k = jnp.exp(-0.5 * d2l)
            fs.append(
                (jnp.sum(jnp.cos(proj) * w[:, l], 1) + jnp.sum(k * v[:, l], 1))[:, None]
            )
        f = jnp.concatenate(fs, 1) @ wd.T + mc_d
        return x + meta.dt * f

    def body(carry, _):
        x, acc = carry
        xn = step(x)
        e = _encode(meta, xn)
        err = e - target
        c = -jnp.exp(-0.5 * jnp.sum(err * (err @ precis), 1))
        return (xn, acc + c), None

    (xf, loss), _ = jax.lax.scan(
        body, (x0, jnp.zeros((x0.shape[0],), x0.dtype)), None,
        length=meta.num_steps,
    )
    return loss
