"""Mountain-car environment (jittable), continuous force variant.

Dynamics re-derived from /root/reference/gpflow_pilco/envs/mountain_car.py:47-74:
2-D state (x, dx), force in [-4, 4], car mass 1.0, piecewise height curve

    h(x) = x + x^2 + 0.5            (x < 0)
           x / sqrt(1 + 5 x^2) + 0.5 (x >= 0)

and the EoM of a point mass constrained to the curve:
    ddx = (f / m) / sqrt(s^2 + 1) - g s / (s^2 + 1),  s = h'(x).
Position is clipped to [-1.5, 1.5] via derivative clipping.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..moments import pytree_dataclass
from .base import Box, clip_derivative


@pytree_dataclass(meta_fields=("action_space",))
class MountainCar:
    gravity: jax.Array = 9.81
    mass: jax.Array = 1.0
    action_space: Box = Box(low=(-4.0,), high=(4.0,))

    state_dim = 2
    action_dim = 1
    obs_low = (-1.5, -jnp.inf)
    obs_high = (1.5, jnp.inf)

    def height(self, x):
        return jnp.where(x < 0, x + x**2, x * jax.lax.rsqrt(1.0 + 5.0 * x**2)) + 0.5

    def slope(self, x):
        return jnp.where(x < 0, 1.0 + 2.0 * x, (1.0 + 5.0 * x**2) ** -1.5)

    def ode(self, state, action):
        x, d_x = state[..., 0], state[..., 1]
        f = action[..., 0]
        s = self.slope(x)
        inv = 1.0 / (s**2 + 1.0)
        dd_x = (f / self.mass) * jnp.sqrt(inv) - self.gravity * s * inv
        deriv = jnp.stack([d_x, dd_x], axis=-1)
        return clip_derivative(deriv, state, (self.obs_low[0], -1e30), (self.obs_high[0], 1e30))

    def reset(self, key, dtype=None):
        x0 = jax.random.uniform(key, (), dtype or jnp.float32, minval=-0.6, maxval=-0.4)
        return jnp.stack([x0, jnp.zeros_like(x0)])
