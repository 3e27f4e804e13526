"""Gaussian moment containers (pytrees).

TPU-native re-design of the reference's ``Moments``/``GaussianMoments``/``GaussianMatch``
(/root/reference/gpflow_pilco/moment_matching/core.py:69-116 and gaussian.py:23-63).

Differences from the reference, by design (SURVEY.md §7):
  * Pure dataclass pytrees — no TF LinearOperators. Covariances are stored dense and
    *centered*; with state dims D <= 8 in the PILCO workloads, structure propagation
    buys nothing on TPU while dense ops fuse cleanly into XLA.
  * The one structural optimization that matters algorithmically is kept: the
    cross-covariance of a match may be stored **pre-multiplied by Cov(x,x)^{-1}**
    (``preinv=True``), which lets chained matches compose by plain matmuls without any
    Cholesky solves (reference gaussian.py:27-51, 66-83). For elementary transforms the
    pre-multiplied cross is exactly E[Jacobian] (Stein's lemma), which is how the trig
    and probit rules produce it for free.
  * Leading batch dimensions broadcast: mean is (..., D), cov is (..., D, D).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


def pytree_dataclass(cls=None, *, meta_fields: Tuple[str, ...] = ()):
    """Register a (frozen) dataclass as a JAX pytree with the given static fields."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        return c

    return wrap if cls is None else wrap(cls)


@pytree_dataclass
class GaussianMoments:
    """A Gaussian distribution represented by mean (..., D) and covariance (..., D, D)."""

    mean: jax.Array
    cov: jax.Array

    @property
    def ndim(self) -> int:
        return self.mean.shape[-1]

    @property
    def dtype(self):
        return self.mean.dtype

    def variance(self) -> jax.Array:
        return jnp.diagonal(self.cov, axis1=-2, axis2=-1)


@pytree_dataclass(meta_fields=("preinv",))
class GaussianMatch:
    """A moment-matched pair: base measure ``x``, push-forward ``y``, and their
    cross-covariance Cov(x, y), stored raw or pre-multiplied by Cov(x,x)^{-1}."""

    x: GaussianMoments
    y: GaussianMoments
    cross: jax.Array  # (..., Dx, Dy); premultiplied by Sxx^{-1} iff preinv
    preinv: bool

    def cross_covariance(self, preinv: bool = False) -> jax.Array:
        if preinv == self.preinv:
            return self.cross
        if not preinv and self.preinv:
            return self.x.cov @ self.cross
        # preinv requested but stored raw: solve Sxx^{-1} Sxy
        chol = jnp.linalg.cholesky(self.x.cov)
        return jax.scipy.linalg.cho_solve((chol, True), self.cross)

    def joint(self) -> GaussianMoments:
        """Gaussian approximation to the joint distribution of (x, y).

        Mirrors reference gaussian.py:53-63.
        """
        m = jnp.concatenate([self.x.mean, self.y.mean], axis=-1)
        sxx = self.x.cov
        sxy = self.cross_covariance(preinv=False)
        syy = self.y.cov
        syx = jnp.swapaxes(sxy, -1, -2)
        top = jnp.concatenate([sxx, sxy], axis=-1)
        bot = jnp.concatenate([syx, syy], axis=-1)
        return GaussianMoments(mean=m, cov=jnp.concatenate([top, bot], axis=-2))


def psd_project(x: "GaussianMoments", min_eig: float = 0.0) -> "GaussianMoments":
    """Project the covariance onto the PSD cone via a stop-gradient eigenvalue
    boost: S <- S + max(-lambda_min + min_eig, 0) I.

    Linearized moment compositions (Gaussian chain rule, policy squash joints)
    are not guaranteed PSD; in f32 an indefinite covariance entering a Cholesky
    produces NaN. The boost is wrapped in stop_gradient so optimization geometry
    is untouched; for valid inputs it is ~machine-epsilon-sized.
    """
    cov = 0.5 * (x.cov + jnp.swapaxes(x.cov, -1, -2))
    lam_min = jnp.min(jnp.linalg.eigvalsh(cov), axis=-1)
    boost = jax.lax.stop_gradient(jnp.maximum(-lam_min + min_eig, 0.0))
    cov = cov + boost[..., None, None] * jnp.eye(cov.shape[-1], dtype=cov.dtype)
    return GaussianMoments(mean=x.mean, cov=cov)


class Chain(tuple):
    """Composite transform applying ops right-to-left, i.e. Chain(f, g)(x) = f(g(x)).

    Mirrors reference core.py:119-126. Members must implement ``__call__`` on arrays
    and ``moment_match`` on GaussianMoments (see moment_matching/rules.py).
    """

    def __new__(cls, *ops):
        return super().__new__(cls, ops)

    def __call__(self, x):
        for op in reversed(self):
            x = op(x)
        return x

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        """Linear (conditional-expectation) composition of matches.

        Mirrors the Gaussian chain rule of reference gaussian.py:66-83: the first
        match's cross is kept verbatim (incl. its preinv convention); every later
        stage contributes its pre-multiplied cross by right-multiplication.
        """
        state = x
        cross = None
        preinv = None
        for i, op in enumerate(reversed(self)):
            match = op.moment_match(state)
            state = match.y
            if i == 0:
                cross, preinv = match.cross, match.preinv
            else:
                cross = cross @ match.cross_covariance(preinv=True)
        return GaussianMatch(x=x, y=state, cross=cross, preinv=preinv)


@pytree_dataclass(meta_fields=("dtype", "outer"))
class DtypeIsland:
    """Run ``inner``'s match/eval at ``dtype`` inside a composition that runs
    at ``outer``: moments are cast down on entry, the match is cast back up on
    exit, and the returned match keeps the OUTER ``x`` so preinv conversions
    and joints stay at the outer precision.

    Motivation (docs/perf_notes.md round-3 MM precision study): at a fitted
    drift the f32 MM rollout gradient decorrelates from the f64 truth (chaos
    amplifies per-step drift-match rounding), but the POLICY match, probit/BVN
    squash, and cost tolerate f32 — so a mixed-precision loss only needs the
    carry + drift match at f64, and the f64-emulation cost of the
    transcendental-heavy squash stage (the worst case on a v5e with no f64
    ALU) is avoided by fencing the policy chain inside a f32 island."""

    inner: object  # a transform: __call__ on arrays, moment_match on moments
    dtype: object  # island compute dtype
    outer: object  # composition dtype

    def __call__(self, x):
        return self.inner(x.astype(self.dtype)).astype(self.outer)

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        xm = GaussianMoments(
            mean=x.mean.astype(self.dtype), cov=x.cov.astype(self.dtype)
        )
        m = self.inner.moment_match(xm)
        y = GaussianMoments(
            mean=m.y.mean.astype(self.outer), cov=m.y.cov.astype(self.outer)
        )
        return GaussianMatch(
            x=x, y=y, cross=m.cross.astype(self.outer), preinv=m.preinv
        )
