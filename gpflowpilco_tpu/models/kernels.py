"""Squared-exponential kernels with stacked (vmap-native) multioutput parameters.

TPU-first re-design of the reference's kernel usage (GPflow SquaredExponential /
SeparateIndependent / LinearCoregionalization; see SURVEY.md §2.3). Instead of Python
lists of kernel objects dispatched at runtime, a multioutput kernel is a *single* RBF
pytree whose parameter arrays carry a leading latent axis L:

    variance:      ()      or (L,)
    lengthscales:  (D,)    or (L, D)

Everything downstream (gram matrices, kernel expectations, SVGP predictions) vmaps
over that axis, which keeps all latent-GP math in one fused XLA computation instead of
L separate op graphs.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..moments import pytree_dataclass
from ..utils import bijectors as bij


@pytree_dataclass(meta_fields=("ls_low", "ls_high"))
class RBF:
    """k(a, b) = variance * exp(-0.5 * sum_d ((a_d - b_d) / lengthscales_d)^2).

    ``raw_*`` fields are unconstrained; ``variance`` uses a shifted softplus and
    ``lengthscales`` a sigmoid onto (ls_low, ls_high) — matching the reference's
    constraint choices (models/initializers.py:36-41).
    """

    raw_variance: jax.Array
    raw_lengthscales: jax.Array
    ls_low: float = 0.01
    ls_high: float = 100.0

    @property
    def variance(self) -> jax.Array:
        return bij.positive(self.raw_variance)

    @property
    def lengthscales(self) -> jax.Array:
        if self.ls_low is None:
            return bij.positive(self.raw_lengthscales)
        return bij.sigmoid_interval(self.raw_lengthscales, self.ls_low, self.ls_high)

    @classmethod
    def create(
        cls,
        variance,
        lengthscales,
        ls_low: Optional[float] = 0.01,
        ls_high: Optional[float] = 100.0,
    ) -> "RBF":
        variance = jnp.asarray(variance)
        lengthscales = jnp.asarray(lengthscales)
        raw_v = bij.positive_inv(variance)
        if ls_low is None:
            raw_l = bij.positive_inv(lengthscales)
        else:
            raw_l = bij.sigmoid_interval_inv(lengthscales, ls_low, ls_high)
        return cls(
            raw_variance=raw_v, raw_lengthscales=raw_l, ls_low=ls_low, ls_high=ls_high
        )

    @property
    def num_latent(self) -> Optional[int]:
        """Leading latent axis size, or None for a single-output kernel."""
        shape = jnp.shape(self.raw_variance)
        return shape[0] if len(shape) else None

    def gram(self, a: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
        """Dense Gram matrix k(a, b).

        a: (..., N, D), b: (..., M, D) -> (..., N, M). Latent-stacked parameters
        broadcast against matching leading axes of a/b.

        Uses the direct (a-b)^2 form rather than the inner-product expansion:
        on TPU the default matmul precision (bf16 passes) puts O(1e-2)-relative
        noise on the |a|^2+|b|^2-2ab cancellation, which is fatal for Cholesky
        factorizations whose smallest eigenvalues sit at the jitter floor.
        Cost is an (N, M, D) VPU pass — fine at gram sizes (M <= 256, D <= 8).
        """
        if b is None:
            b = a
        ls = self.lengthscales
        if ls.ndim == 0:
            ls = ls[None]
        sa = a / ls[..., None, :]
        sb = b / ls[..., None, :]
        diff = sa[..., :, None, :] - sb[..., None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        var = self.variance
        return var[..., None, None] * jnp.exp(-0.5 * d2)

    def kdiag(self, a: jax.Array) -> jax.Array:
        """Diagonal of k(a, a): (..., N)."""
        var = self.variance
        return jnp.broadcast_to(var[..., None], a.shape[:-1])


@pytree_dataclass(meta_fields=("ls_low", "ls_high", "num_outputs"))
class SharedRBF(RBF):
    """SharedIndependent multioutput kernel: ONE set of RBF hyperparameters used
    by all L latent GPs (the reference's gpflow SharedIndependent case,
    models/priors.py:22-40 and svgp.py:102-114).

    Raw parameters are stored unstacked (variance (), lengthscales (D,)); the
    public ``variance``/``lengthscales`` properties broadcast them to (L,) and
    (L, D), so every latent-stacked consumer (gram, kernel expectations, SVGP
    predictions) works unchanged — and reverse-mode AD sums the per-latent
    cotangents back onto the single shared parameter, which is exactly the
    shared-kernel training semantics.
    """

    num_outputs: int = 1

    @property
    def variance(self) -> jax.Array:
        v = bij.positive(self.raw_variance)
        return jnp.broadcast_to(v, (self.num_outputs,))

    @property
    def lengthscales(self) -> jax.Array:
        if self.ls_low is None:
            ls = bij.positive(self.raw_lengthscales)
        else:
            ls = bij.sigmoid_interval(self.raw_lengthscales, self.ls_low, self.ls_high)
        return jnp.broadcast_to(ls[None], (self.num_outputs,) + ls.shape)

    @classmethod
    def create_shared(
        cls,
        variance,
        lengthscales,
        num_outputs: int,
        ls_low: Optional[float] = 0.01,
        ls_high: Optional[float] = 100.0,
    ) -> "SharedRBF":
        variance = jnp.asarray(variance)
        lengthscales = jnp.asarray(lengthscales)
        raw_v = bij.positive_inv(variance)
        if ls_low is None:
            raw_l = bij.positive_inv(lengthscales)
        else:
            raw_l = bij.sigmoid_interval_inv(lengthscales, ls_low, ls_high)
        return cls(
            raw_variance=raw_v,
            raw_lengthscales=raw_l,
            ls_low=ls_low,
            ls_high=ls_high,
            num_outputs=num_outputs,
        )

    @property
    def num_latent(self) -> Optional[int]:
        return self.num_outputs


def square_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """||a_i - b_j||^2 with the numerically-robust inner-product expansion."""
    aa = jnp.sum(a * a, axis=-1)
    bb = jnp.sum(b * b, axis=-1)
    ab = jnp.einsum("...nd,...md->...nm", a, b)
    d2 = aa[..., :, None] + bb[..., None, :] - 2.0 * ab
    return jnp.maximum(d2, 0.0)
