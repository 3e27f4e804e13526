"""One SDE drift evaluation through encoder/policy/drift compositions.

Re-derivation of the reference's ``forward_sde`` dispatcher
(/root/reference/gpflow_pilco/dynamics/forward_sde.py). Two entry points:

  * ``forward_concrete`` — tensors (particle rollouts): encode, append policy
    action, evaluate drift (reference forward_sde.py:23-31).
  * ``forward_moments`` — GaussianMoments (moment-matched rollouts): compose the
    encoder/policy/drift matches and reconstruct Cov(x, f) through the composition
    (reference forward_sde.py:34-137).

The reference's index surgery for the encoder+policy case (forward_sde.py:106-126:
active/inactive row gathers + a sort-based permutation) is replaced by a simpler,
equivalent identity. Writing e = encoder(x), u = policy(e), d = (e, u):

    Cov(x, e) is *exact* from the encoder match (Stein's lemma), and
    Cov(x, u) ~= Cov(x, e) Cov(e,e)^{-1} Cov(e, u)           (linearization)
    Cov(x, f) ~= [Cov(x, e), Cov(x, u)] Cov(d,d)^{-1} Cov(d, f)

For inactive dims b (b subset of e) the reference reads Cov(b, d) directly off the
joint; since row b of Cov(x, e) *is* Cov(b, e), both formulations coincide —
verified in tests/test_dynamics.py against MC.

Which components are present (encoder/policy None or not) is static at trace time,
so the composition compiles to a single fused graph per configuration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..moments import GaussianMatch, GaussianMoments, psd_project


def forward_concrete(x, drift, policy=None, encoder=None):
    e = x if encoder is None else encoder(x)
    if policy is None:
        eu = e
    else:
        eu = jnp.concatenate([e, policy(e)], axis=-1)
    return drift(eu)


def forward_moments(
    x: GaussianMoments,
    drift,
    policy=None,
    encoder=None,
    fused_glue: bool = False,
) -> GaussianMatch:
    """Moment-matched drift evaluation; returns a GaussianMatch from x to f.

    fused_glue=True runs the joint-PSD guards as single Pallas ops (in-kernel
    Jacobi lambda_min, stop-grad boost; ops/mm_glue_pallas.py) instead of
    eigvalsh-based psd_project — identical gradients, same boost semantics."""
    dx = x.ndim

    def _psd(mom: GaussianMoments) -> GaussianMoments:
        if fused_glue:
            from ..ops.mm_glue_pallas import fused_psd_boost

            return GaussianMoments(mean=mom.mean, cov=fused_psd_boost(mom.cov))
        return psd_project(mom)

    if encoder is None and policy is None:
        return drift.moment_match(x)

    if encoder is None:
        # d = (x, u): Cov(x, f) = first Dx rows of Cov(d, f)
        match_policy = policy.moment_match(x)
        d = _psd(match_policy.joint())
        match_drift = drift.moment_match(d)
        sdf = match_drift.cross_covariance(preinv=False)  # (..., Dx+U, F)
        cross = sdf[..., :dx, :]
        return GaussianMatch(x=x, y=match_drift.y, cross=cross, preinv=False)

    match_encoder = encoder.moment_match(x)
    sxe = match_encoder.cross_covariance(preinv=False)  # (..., Dx, De) exact

    if policy is None:
        # f = drift(e): Cov(x, f) = Cov(x, e) Cov(e,e)^{-1} Cov(e, f)
        match_drift = drift.moment_match(match_encoder.y)
        cross = sxe @ match_drift.cross_covariance(preinv=True)
        return GaussianMatch(x=x, y=match_drift.y, cross=cross, preinv=False)

    # full case: e = encoder(x), u = policy(e), d = (e, u)
    # the squash-chain linearization does not guarantee a PSD joint — project
    # before the drift match's Cholesky-based kernel expectations
    match_policy = policy.moment_match(match_encoder.y)
    d = _psd(match_policy.joint())
    match_drift = drift.moment_match(d)

    sxu = sxe @ match_policy.cross_covariance(preinv=True)  # (..., Dx, U)
    sxd = jnp.concatenate([sxe, sxu], axis=-1)  # (..., Dx, De+U)
    sxf = sxd @ match_drift.cross_covariance(preinv=True)  # (..., Dx, F)
    return GaussianMatch(x=x, y=match_drift.y, cross=sxf, preinv=False)
