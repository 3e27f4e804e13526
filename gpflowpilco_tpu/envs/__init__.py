from .base import Box, env_step, rollout
from .cartpole import CartPole
from .double_pendulum import DoublePendulum
from .mountain_car import MountainCar
