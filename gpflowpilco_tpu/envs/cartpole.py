"""Cart-pole swing-up environment (jittable).

Dynamics re-derived to match /root/reference/gpflow_pilco/envs/cart_pole.py:55-85:
4-D state (x, theta, dx, dtheta), 1-D force in [-10, 10], cart m=0.5 friction=0.1,
pole m=0.5 length=0.5, reset ~ N([0, pi, 0, 0], 0.01^2) — pole hanging down.
The equations of motion for a pole modeled as a uniform rod (hence the 0.75 / (2/3)
moment-of-inertia factors):

  ddx = [f - b dx + 0.5 m s (h w^2 + 1.5 g c)] / [(M + m) - 0.75 m c^2]
  dda = [c (f - b dx + 0.5 m s h w^2) + (M + m) g s]
        / [(2/3) h (M + m) - 0.5 m h c^2]
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp

from ..moments import pytree_dataclass
from .base import Box


@pytree_dataclass(meta_fields=("action_space",))
class CartPole:
    gravity: jax.Array = 9.81
    cart_mass: jax.Array = 0.5
    cart_friction: jax.Array = 0.1
    pole_mass: jax.Array = 0.5
    pole_height: jax.Array = 0.5
    action_space: Box = Box(low=(-10.0,), high=(10.0,))

    state_dim = 4
    action_dim = 1

    def ode(self, state, action):
        g = self.gravity
        h = self.pole_height
        m = self.pole_mass
        big_m = self.cart_mass
        x, a, d_x, d_a = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
        f = action[..., 0]

        s = jnp.sin(a)
        c = jnp.cos(a)
        drag = -self.cart_friction * d_x
        dd_x = (f + drag + 0.5 * s * m * (h * d_a**2 + 1.5 * g * c)) / (
            (big_m + m) - 0.75 * m * c**2
        )
        dd_a = (c * (f + drag + 0.5 * s * m * h * d_a**2) + (big_m + m) * g * s) / (
            (2.0 / 3.0) * h * (big_m + m) - 0.5 * m * h * c**2
        )
        return jnp.stack([d_x, d_a, dd_x, dd_a], axis=-1)

    def reset(self, key, dtype=None):
        loc = jnp.asarray([0.0, math.pi, 0.0, 0.0], dtype or jnp.float32)
        return loc + 0.01 * jax.random.normal(key, (4,), loc.dtype)

    def get_tip_coordinates(self, states):
        """Cartesian pole-tip coordinates (reference cart_pole.py:87-95)."""
        cart_x = states[..., 0]
        pole_a = states[..., 1]
        x = cart_x - self.pole_height * jnp.sin(pole_a)
        y = self.pole_height * jnp.cos(pole_a)
        return x, y
