"""gpflowpilco_tpu — a TPU-native PILCO framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of j-wilson/GPflowPILCO (GPflow/TF,
reference mounted at /root/reference) as pure-function JAX over parameter pytrees:

  moments / moment_matching   Gaussian moment containers and closed-form pushforward
                              rules (affine, trig, probit, GP posteriors)
  ops                         Genz BVN / Owen's T, RBF kernel expectations,
                              batched linear algebra
  models                      GPR + SVGP pytrees (LML/ELBO/predictions), pathwise
                              (decoupled RFF) sampling, initializers, SNR priors
  dynamics                    encoder/policy/drift composition + lax.scan solvers
  envs                        jittable CartPole / MountainCar / DoublePendulum
  loops                       MomentMatchingPILCO / PathwisePILCO outer loops,
                              episode buffer, checkpointing
  parallel                    device-mesh sharding of particle rollouts
  utils                       bijectors, pytree partitioning, Adam/L-BFGS drivers
"""

from . import config
from .components import Encoder, GaussianObjective, trigonometric_encoder
from .moments import Chain, GaussianMatch, GaussianMoments

__all__ = [
    "Chain",
    "Encoder",
    "GaussianMatch",
    "GaussianMoments",
    "GaussianObjective",
    "config",
    "trigonometric_encoder",
]

__version__ = "0.1.0"
