"""Task components: Gaussian cost objective and feature encoders.

Re-design of /root/reference/gpflow_pilco/components.py and the encoder moment rule
(moment_matching/components.py:19-57). Encoders are static-index transforms (active
dims resolved at trace time), so partition/stitch indexing compiles away.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .moments import GaussianMatch, GaussianMoments, pytree_dataclass
from .moment_matching.rules import SinCos


@pytree_dataclass(meta_fields=("active_dims", "fused"))
class Encoder:
    """Apply ``transform`` to active dims, append untouched dims
    (reference components.py:44-70).

    ``fused=True`` (SinCos transform only) runs the whole match — trig moments
    + stitch — as one Pallas kernel (ops/enc_match_pallas.py) with a
    hand-derived adjoint; used inside the sequential MM rollout where the
    ~15-HLO match is pure dispatch latency."""

    transform: object  # a moment-matchable transform (e.g. SinCos)
    active_dims: Tuple[int, ...] = ()
    fused: bool = False

    def partition(self, ndims: int) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
        active = tuple(self.active_dims)
        assert len(set(active)) == len(active)
        inactive = tuple(i for i in range(ndims) if i not in set(active))
        return active, inactive

    def __call__(self, x: jax.Array) -> jax.Array:
        active, inactive = self.partition(x.shape[-1])
        out = self.transform(x[..., list(active)])
        if inactive:
            out = jnp.concatenate([out, x[..., list(inactive)]], axis=-1)
        return out

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        """Partition x into (active a, inactive b), match the transform on a, and
        stitch the joint covariance back together (reference
        moment_matching/components.py:19-57)."""
        if self.fused:
            if not isinstance(self.transform, SinCos):
                raise ValueError("fused encoder match supports SinCos only")
            from .ops.enc_match_pallas import fused_encoder_match, make_enc_meta

            meta = make_enc_meta(self.active_dims, x.ndim)
            y_mean, y_cov, cross = fused_encoder_match(meta, x.mean, x.cov)
            y = GaussianMoments(mean=y_mean, cov=y_cov)
            return GaussianMatch(x=x, y=y, cross=cross, preinv=False)
        active, inactive = self.partition(x.ndim)
        a_idx = jnp.asarray(active)
        mean_a = x.mean[..., a_idx]
        sxa = x.cov[..., :, a_idx]  # (..., D, Da)
        saa = sxa[..., a_idx, :]  # (..., Da, Da)
        match_t = self.transform.moment_match(GaussianMoments(mean=mean_a, cov=saa))

        # Cov(x, T(a)) = Cov(x, a) @ (Saa^{-1} Cov(a, T(a))) — exact by Stein's lemma
        sxy_t = sxa @ match_t.cross_covariance(preinv=True)  # (..., D, Dy)

        if not inactive:
            return GaussianMatch(x=x, y=match_t.y, cross=sxy_t, preinv=False)

        b_idx = jnp.asarray(inactive)
        mean_b = x.mean[..., b_idx]
        sxb = x.cov[..., :, b_idx]  # (..., D, Db)
        sbb = sxb[..., b_idx, :]  # (..., Db, Db)
        sby = sxy_t[..., b_idx, :]  # (..., Db, Dy)

        y_mean = jnp.concatenate([match_t.y.mean, mean_b], axis=-1)
        syy_t = match_t.y.cov
        top = jnp.concatenate([syy_t, jnp.swapaxes(sby, -1, -2)], axis=-1)
        bot = jnp.concatenate([sby, sbb], axis=-1)
        y_cov = jnp.concatenate([top, bot], axis=-2)

        cross = jnp.concatenate([sxy_t, sxb], axis=-1)  # (..., D, Dy + Db)
        y = GaussianMoments(mean=y_mean, cov=y_cov)
        return GaussianMatch(x=x, y=y, cross=cross, preinv=False)


def trigonometric_encoder(active_dims: Tuple[int, ...]) -> Encoder:
    """Encoder(sincos) (reference components.py:73-75)."""
    return Encoder(transform=SinCos(), active_dims=tuple(active_dims))


@pytree_dataclass
class GaussianObjective:
    """cost(x) = -exp(-0.5 (x - target)^T precis (x - target)).

    On GaussianMoments computes the exact expectation via (I + S W)^{-1} algebra
    (reference components.py:26-41). With ``precis_sqrt`` (B = W^{1/2}, use
    ``create``) the nonsymmetric LU solve + slogdet pair becomes ONE SPD
    Cholesky of A = I + B S B (eigenvalues >= 1, so f32-perfect conditioning):
        det(I + S W) = det(A)            (similarity)
        W (I + S W)^{-1} = B A^{-1} B    (push-through identity)
    — two fewer LU custom calls (plus their VJPs) in every MM rollout step.
    """

    target: jax.Array  # (D,)
    precis: jax.Array  # (D, D)
    precis_sqrt: jax.Array = None  # optional symmetric PSD sqrt of precis

    @classmethod
    def create(cls, target, precis) -> "GaussianObjective":
        """Precompute the symmetric PSD square root once (eigh at build time,
        not inside the per-step graph)."""
        precis = jnp.asarray(precis)
        w, v = jnp.linalg.eigh(precis)
        b = (v * jnp.sqrt(jnp.maximum(w, 0.0))[..., None, :]) @ jnp.swapaxes(
            v, -1, -2
        )
        return cls(target=jnp.asarray(target), precis=precis, precis_sqrt=b)

    def __call__(self, x, t=None) -> jax.Array:
        if isinstance(x, GaussianMoments):
            d = self.precis.shape[-1]
            eye = jnp.eye(d, dtype=x.dtype)
            err = x.mean - self.target  # (..., D)
            if self.precis_sqrt is not None:
                b = jnp.asarray(self.precis_sqrt, x.dtype)
                a = eye + jnp.einsum(
                    "ij,...jk,kl->...il", b, x.cov, b,
                    precision=jax.lax.Precision.HIGHEST,
                )
                chol = jnp.linalg.cholesky(a)
                berr = jnp.einsum("ij,...j->...i", b, err)
                from .ops.linalg import bcho_solve

                u = bcho_solve(chol, berr[..., None])[..., 0]
                dist2 = jnp.sum(berr * u, axis=-1)
                logdet = 2.0 * jnp.sum(
                    jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
                )
                return -jnp.exp(-0.5 * (logdet + dist2))
            ipsw = eye + x.cov @ self.precis  # (..., D, D)
            u = jnp.linalg.solve(ipsw, err[..., None])[..., 0]  # (I+SW)^{-1} err
            dist2 = jnp.sum(err * jnp.einsum("ij,...j->...i", self.precis, u), -1)
            _, logdet = jnp.linalg.slogdet(ipsw)
            return -jnp.exp(-0.5 * (logdet + dist2))

        err = x - self.target
        dist2 = jnp.sum(err * jnp.einsum("ij,...j->...i", self.precis, err), -1)
        return -jnp.exp(-0.5 * dist2)
