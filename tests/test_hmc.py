"""HMC sampler tests: exact-Gaussian target moments + GP hyperposterior smoke."""
import jax
import jax.numpy as jnp
import numpy as np

from gpflowpilco_tpu.models.gp import GPR, gpr_lml
from gpflowpilco_tpu.models.hmc import HMCConfig, run_hmc
from gpflowpilco_tpu.models.kernels import RBF
from gpflowpilco_tpu.utils import bijectors as bij

from .utils import TestConfig


def test_hmc_recovers_gaussian_moments():
    config = TestConfig(seed=21)
    mean = jnp.asarray([1.0, -2.0, 0.5])
    scales = jnp.asarray([0.5, 1.5, 1.0])

    def log_prob(tree):
        z = (tree["x"] - mean) / scales
        return -0.5 * jnp.sum(z * z)

    num_chains = 8
    init = {"x": jax.random.normal(config.next_key(), (num_chains, 3), config.dtype)}
    result = jax.jit(
        lambda p, k: run_hmc(
            log_prob, p, k, HMCConfig(num_warmup=400, num_samples=600, num_leapfrog=8)
        )
    )(init, config.next_key())

    xs = np.asarray(result.samples["x"]).reshape(-1, 3)  # (T*C, 3)
    np.testing.assert_allclose(xs.mean(0), np.asarray(mean), atol=0.1)
    np.testing.assert_allclose(xs.std(0), np.asarray(scales), rtol=0.15)
    mean_accept = float(np.mean(np.asarray(result.accept_prob)))
    assert 0.5 < mean_accept <= 1.0, mean_accept


def test_hmc_gpr_hyperposterior_smoke():
    """Chains over (raw lengthscales, raw variance, raw noise) of a GPR — the
    BASELINE 'HMC chains over kernel hyperparameters' configuration."""
    config = TestConfig(seed=23)
    n, d = 40, 2
    x = jax.random.uniform(config.next_key(), (n, d), dtype=config.dtype, minval=-2, maxval=2)
    y = jnp.sin(x[:, :1]) + 0.1 * jax.random.normal(config.next_key(), (n, 1), config.dtype)

    def make_model(hypers):
        kernel = RBF(
            raw_variance=hypers["v"], raw_lengthscales=hypers["l"], ls_low=0.01, ls_high=100.0
        )
        return GPR(kernel=kernel, x=x, y=y, mean_const=jnp.zeros((1,)), raw_noise=hypers["n"])

    def log_prob(hypers):
        lml = gpr_lml(make_model(hypers))
        # weak N(0, 3^2) prior on raw params keeps the chain proper
        prior = -0.5 * sum(jnp.sum((h / 3.0) ** 2) for h in jax.tree.leaves(hypers))
        return lml + prior

    num_chains = 4
    init = {
        "v": jnp.zeros((num_chains,)),
        "l": jnp.zeros((num_chains, d)),
        "n": bij.positive_inv(jnp.full((num_chains,), 0.1)),
    }
    result = jax.jit(
        lambda p, k: run_hmc(
            log_prob, p, k, HMCConfig(num_warmup=150, num_samples=150, num_leapfrog=8)
        )
    )(init, config.next_key())

    assert bool(jnp.all(jnp.isfinite(result.final_logp)))
    mean_accept = float(jnp.mean(result.accept_prob))
    assert 0.4 < mean_accept <= 1.0, mean_accept
    # noise posterior should concentrate near the true 0.1^2 = 0.01 variance
    noise_samples = bij.positive(np.asarray(result.samples["n"])).reshape(-1)
    med = float(np.median(noise_samples))
    assert 0.002 < med < 0.05, med


def test_chees_hmc_adapts_trajectory_and_recovers_moments():
    """ChEES trajectory adaptation (Hoffman et al. 2021) on a strongly
    anisotropic Gaussian: posterior moments recovered, and the adapted
    integration time grows toward the slow direction's scale (where fixed-L
    jittered HMC would need hand tuning)."""
    config = TestConfig(seed=29)
    scales = jnp.asarray([10.0, 1.0, 0.1])

    def log_prob(tree):
        z = tree["x"] / scales
        return -0.5 * jnp.sum(z * z)

    num_chains = 16
    init = {"x": jax.random.normal(config.next_key(), (num_chains, 3), config.dtype)}
    cfg = HMCConfig(
        num_warmup=500, num_samples=500, adapt_trajectory="chees",
        max_leapfrog=128, init_step_size=0.05,
    )
    result = jax.jit(lambda p, k: run_hmc(log_prob, p, k, cfg))(
        init, config.next_key()
    )

    xs = np.asarray(result.samples["x"]).reshape(-1, 3)
    np.testing.assert_allclose(xs.mean(0), np.zeros(3), atol=0.6)
    np.testing.assert_allclose(xs.std(0), np.asarray(scales), rtol=0.25)
    mean_accept = float(np.mean(np.asarray(result.accept_prob)))
    assert 0.5 < mean_accept <= 1.0, mean_accept
    # tau must have adapted well beyond its initialization (0.05 * 16 = 0.8):
    # the 10-sigma direction needs O(sigma) integration time to decorrelate
    tau = float(result.trajectory_length)
    assert tau > 2.0, tau
