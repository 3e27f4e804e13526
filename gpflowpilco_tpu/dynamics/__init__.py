from .forward import forward_concrete, forward_moments
from .solvers import (
    euler_rollout,
    moment_matching_euler_rollout,
    rk4_integrate,
    rk4_step,
)
