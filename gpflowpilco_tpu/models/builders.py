"""Model construction from data: the `initialize` classmethods of the reference
(/root/reference/gpflow_pilco/models/svgp.py:47-121, gpr.py:39-55) as functions.

Built models are plain pytrees; trainability is expressed as a separate bool mask
pytree (see utils/trees.py) rather than mutating parameter state.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import bijectors as bij
from ..utils.trees import mask_from_names
from .gp import GPR, SVGP
from .initializers import (
    inducing_points_kmeans,
    lengthscales_median,
    replace_duplicates,
)
from .kernels import RBF, SharedRBF


def build_svgp(
    x: np.ndarray,
    y: np.ndarray,
    num_inducing: int,
    key: jax.Array,
    coregionalize: Optional[bool] = None,
    num_latent: Optional[int] = None,
    max_corr: float = 1.0,
    q_mu: Optional[jax.Array] = None,
    noise_variance: float = 1.0,
    per_output_noise: bool = False,
    whiten: bool = True,
    shared_kernel: bool = False,
    pad_inducing_multiple: int = 0,
    ls_low: float = 0.01,
    ls_high: float = 100.0,
    dtype=jnp.float64,
) -> SVGP:
    """Initialize an SVGP: RBF kernels with median-heuristic lengthscales,
    k-means inducing points, optional LCK mixing. ``shared_kernel`` ties one
    set of hyperparameters across all latents (the reference's gpflow
    SharedIndependent variant); default is per-latent (SeparateIndependent).

    ``pad_inducing_multiple`` > 0 rounds the inducing count up to that multiple
    (capped at ``num_inducing``) so the model's array shapes — and therefore
    every downstream executable — stay constant as the episode buffer grows
    (compile hygiene: each distinct M otherwise recompiles the dynamics fit AND
    the policy optimization, 5-15 min per graph through a remote-compile
    tunnel). Slots beyond the k-means centers are filled with
    lengthscale-jittered resamples of the data, kept distinct for Kuu
    conditioning."""
    x = np.asarray(x)
    y = np.asarray(y)
    num_data, num_out = y.shape
    if num_latent is None:
        num_latent = num_out
    if coregionalize is None:
        coregionalize = num_out != num_latent

    # raising ls_low above the default floors the sigmoid-interval constraint:
    # the fit cannot chase a fast, noisy output dim into a near-interpolating
    # kernel (the double-pendulum theta2-dot failure mode)
    ls = lengthscales_median(jnp.asarray(x, dtype), lower=ls_low, upper=ls_high)  # (D,)
    if shared_kernel:
        kernel = SharedRBF.create_shared(
            jnp.ones((), dtype), ls, num_outputs=num_latent,
            ls_low=ls_low, ls_high=ls_high,
        )
    else:
        kernel = RBF.create(
            jnp.ones((num_latent,), dtype), jnp.tile(ls[None], (num_latent, 1)),
            ls_low=ls_low, ls_high=ls_high,
        )

    m = min(num_inducing, num_data)
    if pad_inducing_multiple > 0:
        m_target = min(
            num_inducing,
            -(-m // pad_inducing_multiple) * pad_inducing_multiple,
        )
    else:
        m_target = m
    z0 = inducing_points_kmeans(x, m, key=key)
    if m_target > m:
        # fill the remaining slots with jittered resamples of the data so the
        # shape bucket is reached without duplicated (Kuu-degenerate) points
        k_pick, k_noise = jax.random.split(jax.random.fold_in(key, 7))
        idx = jax.random.randint(k_pick, (m_target - m,), 0, num_data)
        # spread ~1 lengthscale: closer packing leaves Kuu columns nearly
        # collinear and degrades the f32 fit
        noise = 1.0 * np.asarray(ls) * jax.random.normal(
            k_noise, (m_target - m, x.shape[-1])
        )
        z0 = np.concatenate([z0, x[np.asarray(idx)] + np.asarray(noise)], 0)
        m = m_target
    if max_corr < 1.0:
        z0 = replace_duplicates(z0, 1.0, np.asarray(ls), tol=max_corr)
    z = jnp.tile(jnp.asarray(z0, dtype)[None], (num_latent, 1, 1))

    if q_mu is None:
        q_mu = jnp.zeros((m, num_latent), dtype)
    q_sqrt = jnp.tile(jnp.eye(m, dtype=dtype)[None], (num_latent, 1, 1))

    if coregionalize:
        if num_out == num_latent:
            w = jnp.eye(num_out, dtype=dtype)
        else:
            w_raw = jax.random.normal(key, (num_out, num_latent), dtype)
            w = w_raw / jnp.linalg.norm(w_raw, axis=-1, keepdims=True)
    else:
        assert num_out == num_latent
        w = None

    # per-output noise: scale each output's initial variance to its target's
    # empirical variance so no dim starts under another dim's noise floor
    if per_output_noise:
        y_var = jnp.asarray(y.var(axis=0) + 1e-12, dtype)
        noise0 = noise_variance * y_var
    else:
        noise0 = jnp.asarray(noise_variance, dtype)

    return SVGP(
        kernel=kernel,
        z=z,
        q_mu=q_mu,
        q_sqrt=q_sqrt,
        mean_const=jnp.zeros((num_out,), dtype),
        raw_noise=bij.positive_inv(noise0),
        w=w,
        whiten=whiten,
    )


def build_gpr(
    x, y, noise_variance: float = 1.0,
    ls_low: float = 0.01, ls_high: float = 100.0,
    dtype=jnp.float64,
) -> GPR:
    x = jnp.asarray(x, dtype)
    y = jnp.asarray(y, dtype)
    ls = lengthscales_median(x, lower=ls_low, upper=ls_high)
    return GPR(
        kernel=RBF.create(jnp.asarray(1.0, dtype), ls, ls_low=ls_low, ls_high=ls_high),
        x=x,
        y=y,
        mean_const=jnp.zeros((y.shape[-1],), dtype),
        raw_noise=bij.positive_inv(jnp.asarray(noise_variance, dtype)),
    )


def dynamics_mask(model: SVGP, freeze_inducing: bool):
    """Everything trainable, optionally freezing inducing inputs when M >= N
    (reference pilco.py:67-68). The LCK mixing matrix ``w`` trains with the
    other hyperparameters — in the reference it is a gpflow Parameter that is
    never frozen (reference svgp.py:102-114)."""

    def pred(name):
        if freeze_inducing and name == "z":
            return False
        return True

    return mask_from_names(model, pred)


def policy_mask(model: SVGP):
    """Deterministic kernel-regressor policy: freeze q_sqrt, kernel variance,
    noise, and the (zero) mean function (reference pilco.py:70-74, 100-104)."""

    def pred(name):
        frozen = ("q_sqrt", "raw_noise", "mean_const", "w")
        if any(name.endswith(f) for f in frozen):
            return False
        if name.endswith("raw_variance"):
            return False
        return True

    return mask_from_names(model, pred)
