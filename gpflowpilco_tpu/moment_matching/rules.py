"""Closed-form Gaussian moment-matching rules for elementary transforms.

TPU-native re-design of the reference's dispatch-registered rules
(/root/reference/gpflow_pilco/moment_matching/maths.py and bijectors.py). Instead of
runtime multiple dispatch keyed on function objects (reference core.py:46-66), each
transform is a small pytree with two methods:

    __call__(x: Array) -> Array                      # concrete evaluation
    moment_match(x: GaussianMoments) -> GaussianMatch # Gaussian pushforward

Under ``jit`` this Python-level polymorphism resolves once at trace time, so there is
no dispatch machinery to rebuild. All rules return *centered* second moments and
pre-multiplied crosses where exact (Stein's lemma: Sxx^{-1} Cov(x, g(x)) = E[dg/dx]
for jointly Gaussian inputs), matching the reference's ``preinv`` optimization.

The trig identities (exact; classic PILCO "saturating" moments), for x ~ N(m, S),
v = diag(S), A = exp(-(v_i+v_j+2S_ij)/2), B = exp(-(v_i+v_j-2S_ij)/2):

    E[sin x_i]          = e^{-v_i/2} sin m_i
    E[cos x_i]          = e^{-v_i/2} cos m_i
    E[sin x_i sin x_j]  = (B cos(m_i-m_j) - A cos(m_i+m_j)) / 2
    E[cos x_i cos x_j]  = (B cos(m_i-m_j) + A cos(m_i+m_j)) / 2
    E[sin x_i cos x_j]  = (B sin(m_i-m_j) + A sin(m_i+m_j)) / 2
    Cov(x_k, sin x_i)   = S_ki e^{-v_i/2} cos m_i
    Cov(x_k, cos x_i)   = -S_ki e^{-v_i/2} sin m_i

The probit rule (policy squashing; reference bijectors.py:37-69): for y = Phi(x),
h_i = m_i / sqrt(1+v_i), rho_ij = S_ij / sqrt((1+v_i)(1+v_j)),

    E[y_i]       = Phi(h_i)
    E[y_i y_j]   = Phi_2(h_i, h_j, rho_ij)       (Genz BVN)
    Cov(x_i,y_i) = v_i (1+v_i)^{-1/2} phi(h_i)   (=> preinv cross is diagonal)
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp

from ..moments import Chain, GaussianMatch, GaussianMoments, pytree_dataclass
from ..ops.bvn import bvnu, ndtr


def _diag_embed(v):
    return jnp.eye(v.shape[-1], dtype=v.dtype) * v[..., None, :]


def sincos(x, axis: int = -1):
    """concat[sin x, cos x] (reference maths.py:22-23)."""
    return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=axis)


# ----------------------------------------------------------------------------------
# Affine transforms
# ----------------------------------------------------------------------------------
@pytree_dataclass
class Identity:
    def __call__(self, x):
        return x

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        eye = jnp.eye(x.ndim, dtype=x.dtype)
        return GaussianMatch(x=x, y=x, cross=eye, preinv=True)


@pytree_dataclass
class Shift:
    """y = x + c (reference maths.py:46-60 add/sub rules)."""

    shift: jax.Array

    def __call__(self, x):
        return x + self.shift

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        y = GaussianMoments(mean=x.mean + self.shift, cov=x.cov)
        eye = jnp.eye(x.ndim, dtype=x.dtype)
        return GaussianMatch(x=x, y=y, cross=eye, preinv=True)


@pytree_dataclass
class Scale:
    """y = c * x, elementwise (reference maths.py:63-79)."""

    scale: jax.Array

    def __call__(self, x):
        return self.scale * x

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        c = jnp.asarray(self.scale, x.dtype)
        cvec = jnp.broadcast_to(c, (x.ndim,))
        y = GaussianMoments(
            mean=c * x.mean, cov=x.cov * cvec[..., :, None] * cvec[..., None, :]
        )
        return GaussianMatch(x=x, y=y, cross=_diag_embed(cvec), preinv=True)


@pytree_dataclass
class MatVec:
    """y = A x (reference maths.py:82-94)."""

    matrix: jax.Array  # (P, D): y = matrix @ x

    def __call__(self, x):
        return jnp.einsum("pd,...d->...p", self.matrix, x)

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        a = self.matrix
        y = GaussianMoments(
            mean=self(x.mean), cov=jnp.einsum("pd,...de,qe->...pq", a, x.cov, a)
        )
        return GaussianMatch(x=x, y=y, cross=jnp.swapaxes(a, -1, -2), preinv=True)


# ----------------------------------------------------------------------------------
# Trigonometric transforms (exact moments)
# ----------------------------------------------------------------------------------
def _trig_terms(x: GaussianMoments):
    m = x.mean
    s = x.cov
    # f32 moment propagation can leave tiny negative variances on the diagonal;
    # exp(-v/2) would blow up, so clamp at zero (exact for valid inputs)
    v = jnp.maximum(x.variance(), 0.0)
    vpv = v[..., :, None] + v[..., None, :]
    spst = s + jnp.swapaxes(s, -1, -2)
    a = jnp.exp(-0.5 * (vpv + spst))
    b = jnp.exp(-0.5 * (vpv - spst))
    madd = m[..., :, None] + m[..., None, :]
    msub = m[..., :, None] - m[..., None, :]
    ev = jnp.exp(-0.5 * v)
    return m, v, a, b, madd, msub, ev


@pytree_dataclass
class Sin:
    def __call__(self, x):
        return jnp.sin(x)

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        m, v, a, b, madd, msub, ev = _trig_terms(x)
        y1 = ev * jnp.sin(m)
        raw2 = 0.5 * (b * jnp.cos(msub) - a * jnp.cos(madd))
        cov = raw2 - y1[..., :, None] * y1[..., None, :]
        y = GaussianMoments(mean=y1, cov=cov)
        return GaussianMatch(x=x, y=y, cross=_diag_embed(ev * jnp.cos(m)), preinv=True)


@pytree_dataclass
class Cos:
    def __call__(self, x):
        return jnp.cos(x)

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        m, v, a, b, madd, msub, ev = _trig_terms(x)
        y1 = ev * jnp.cos(m)
        raw2 = 0.5 * (b * jnp.cos(msub) + a * jnp.cos(madd))
        cov = raw2 - y1[..., :, None] * y1[..., None, :]
        y = GaussianMoments(mean=y1, cov=cov)
        return GaussianMatch(x=x, y=y, cross=_diag_embed(-ev * jnp.sin(m)), preinv=True)


@pytree_dataclass
class SinCos:
    """y = concat[sin x, cos x], with the exact sin-cos cross block
    (reference maths.py:143-176)."""

    def __call__(self, x):
        return sincos(x)

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        m, v, a, b, madd, msub, ev = _trig_terms(x)
        sin_m, cos_m = jnp.sin(m), jnp.cos(m)
        s1 = ev * sin_m
        c1 = ev * cos_m

        ss = 0.5 * (b * jnp.cos(msub) - a * jnp.cos(madd))
        cc = 0.5 * (b * jnp.cos(msub) + a * jnp.cos(madd))
        sc = 0.5 * (b * jnp.sin(msub) + a * jnp.sin(madd))  # E[sin x_i cos x_j]

        y1 = jnp.concatenate([s1, c1], axis=-1)
        raw2 = jnp.concatenate(
            [
                jnp.concatenate([ss, sc], axis=-1),
                jnp.concatenate([jnp.swapaxes(sc, -1, -2), cc], axis=-1),
            ],
            axis=-2,
        )
        cov = raw2 - y1[..., :, None] * y1[..., None, :]
        y = GaussianMoments(mean=y1, cov=cov)
        cross = jnp.concatenate([_diag_embed(c1), _diag_embed(-s1)], axis=-1)
        return GaussianMatch(x=x, y=y, cross=cross, preinv=True)


# ----------------------------------------------------------------------------------
# Probit (NormalCDF) — the PILCO policy squash
# ----------------------------------------------------------------------------------
@pytree_dataclass
class Probit:
    """y = Phi(x), elementwise standard-normal CDF (reference bijectors.py:37-69)."""

    def __call__(self, x):
        return ndtr(x)

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        m = x.mean
        s = x.cov
        v = jnp.maximum(x.variance(), 0.0)  # see _trig_terms
        isq_vw = jax.lax.rsqrt(1.0 + v)
        h = m * isq_vw  # (..., D)
        y1 = ndtr(h)

        # second moment: E[Phi(x_i) Phi(x_j)] = Phi_2(h_i, h_j, rho_ij)
        # any valid covariance gives |rho| <= 1, but f32 rounding of
        # v * rsqrt(1+v)^2 can land at 1 + ulp for large v (saturated policies);
        # clip so the BVN density derivative stays bounded (see ops/bvn.py JVP)
        rho = jnp.clip(s * isq_vw[..., :, None] * isq_vw[..., None, :], -1.0, 1.0)
        hi = jnp.broadcast_to(h[..., :, None], rho.shape)
        hj = jnp.broadcast_to(h[..., None, :], rho.shape)
        raw2 = bvnu(-hi, -hj, rho)
        cov = raw2 - y1[..., :, None] * y1[..., None, :]

        # Cov(x_i, y_i) = v_i / sqrt(1+v_i) * phi(h_i)  => preinv cross = diag(phi(h)/sqrt(1+v))
        phi_h = jnp.exp(-0.5 * h * h) / math.sqrt(2.0 * math.pi)
        cross = _diag_embed(isq_vw * phi_h)

        y = GaussianMoments(mean=y1, cov=cov)
        return GaussianMatch(x=x, y=y, cross=cross, preinv=True)


@pytree_dataclass
class SquashedProbit:
    """y = scale * (Phi(x) - 0.5) — the PILCO policy squash
    Chain(Scale(scale), Shift(-0.5), Probit()) collapsed into one exact rule.

    The affine stages compose exactly (E[y] = c(E[Phi]-1/2), Cov scales by c^2,
    the premultiplied cross by c), so folding them removes two chain
    compositions (~10 tiny HLOs) from every sequential MM rollout step.
    Reference semantics: bijectors.py:21-34 Chain/Shift/Scale rules applied to
    the NormalCDF rule (swingup_loops.py:84-91 squash)."""

    scale: jax.Array  # (broadcastable to the action dim)

    def __call__(self, x):
        return self.scale * (ndtr(x) - 0.5)

    def moment_match(self, x: GaussianMoments) -> GaussianMatch:
        inner = Probit().moment_match(x)
        c = jnp.asarray(self.scale, x.dtype)
        cvec = jnp.broadcast_to(c, (x.ndim,))
        y = GaussianMoments(
            mean=c * (inner.y.mean - 0.5),
            cov=inner.y.cov * cvec[..., :, None] * cvec[..., None, :],
        )
        cross = inner.cross * cvec[..., None, :]  # premultiplied, scaled
        return GaussianMatch(x=x, y=y, cross=cross, preinv=True)


# ----------------------------------------------------------------------------------
# Generic entry point
# ----------------------------------------------------------------------------------
def moment_matching(x: GaussianMoments, op) -> GaussianMatch:
    """Push Gaussian moments through ``op`` (reference core.py:134-141 equivalent).

    Accepts any object with a ``moment_match`` method, or a ``Chain``.
    """
    if isinstance(op, Chain):
        return op.moment_match(x)
    return op.moment_match(x)
