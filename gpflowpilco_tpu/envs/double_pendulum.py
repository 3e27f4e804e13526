"""Double pendulum with absolute angles and per-joint torques (jittable).

Dynamics re-derived from /root/reference/gpflow_pilco/envs/double_pendulum.py:56-93:
4-D state (a0, a1, da0, da1) with *absolute* link angles measured from upright,
2-D torque in [-2, 2], both links uniform rods of mass 0.5, length 0.5.
Mass-matrix EoM (2x2, closed-form inverse instead of the reference's per-step SciPy
Cholesky — a 2x2 solve is two fused VPU ops on TPU):

  A = [[ l0^2 (m0/3 + m1),        0.5 l0 l1 m1 cos(a0-a1) ],
       [ 0.5 l0 l1 m1 cos(a0-a1), l1^2 m1 / 3             ]]
  b0 = f0 - mu0 da0 + l0 [ (0.5 m0 + m1) g sin a0 - 0.5 m1 l1 sin(a0-a1) da1^2 ]
  b1 = f1 - mu1 da1 + l1 [ 0.5 m1 (g sin a1 + l0 sin(a0-a1) da0^2) ]
  [dda0, dda1] = A^{-1} b
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..moments import pytree_dataclass
from .base import Box


@pytree_dataclass(meta_fields=("action_space",))
class DoublePendulum:
    gravity: jax.Array = 9.81
    mass0: jax.Array = 0.5
    mass1: jax.Array = 0.5
    length0: jax.Array = 0.5
    length1: jax.Array = 0.5
    friction0: jax.Array = 0.0
    friction1: jax.Array = 0.0
    action_space: Box = Box(low=(-2.0, -2.0), high=(2.0, 2.0))

    state_dim = 4
    action_dim = 2

    def ode(self, state, action):
        g = self.gravity
        l0, l1 = self.length0, self.length1
        m0, m1 = self.mass0, self.mass1
        a0, a1 = state[..., 0], state[..., 1]
        d_a0, d_a1 = state[..., 2], state[..., 3]
        f0, f1 = action[..., 0], action[..., 1]

        z = a0 - a1
        c, s = jnp.cos(z), jnp.sin(z)

        a00 = l0**2 * (m0 / 3.0 + m1)
        a01 = 0.5 * l0 * l1 * m1 * c
        a11 = l1**2 * m1 / 3.0

        b0 = f0 - self.friction0 * d_a0 + l0 * (
            (0.5 * m0 + m1) * g * jnp.sin(a0) - 0.5 * m1 * l1 * s * d_a1**2
        )
        b1 = f1 - self.friction1 * d_a1 + l1 * (
            0.5 * m1 * (g * jnp.sin(a1) + l0 * s * d_a0**2)
        )

        det = a00 * a11 - a01 * a01
        dd_a0 = (a11 * b0 - a01 * b1) / det
        dd_a1 = (a00 * b1 - a01 * b0) / det
        return jnp.stack([d_a0, d_a1, dd_a0, dd_a1], axis=-1)

    def reset(self, key, dtype=None):
        dtype = dtype or jnp.float32
        loc = jnp.asarray([math.pi, math.pi, 0.0, 0.0], dtype)
        scale = jnp.asarray([0.01, 0.01, 0.1, 0.1], dtype)
        return loc + scale * jax.random.normal(key, (4,), dtype)

    def get_vertex_coordinates(self, state):
        a0, a1 = state[..., 0], state[..., 1]
        x0 = -self.length0 * jnp.sin(a0)
        y0 = self.length0 * jnp.cos(a0)
        x1 = x0 - self.length1 * jnp.sin(a1)
        y1 = y0 + self.length1 * jnp.cos(a1)
        return (x0, y0), (x1, y1)
