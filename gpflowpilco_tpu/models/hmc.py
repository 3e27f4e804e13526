"""Hamiltonian Monte Carlo over GP hyperparameters, vmapped/shardable chains.

North-star extension beyond the reference (SURVEY.md §2.4: "HMC chains over
hyperparameters — not in reference"): fully Bayesian treatment of kernel
hyperparameters as an alternative to the reference's point-estimate L-BFGS fits.

Design (TPU-first):
  * the sampled state is the *unconstrained* parameter pytree (bijectors make the
    posterior unconstrained-friendly), flattened per chain with `ravel_pytree`;
  * leapfrog is a `lax.scan`; warmup and sampling are scans of scans — one device
    program for the whole run;
  * chains are a vmapped leading axis; step-size dual averaging (Nesterov 2009,
    as in Stan) adapts on the *cross-chain mean* acceptance statistic, which is
    the only cross-chain communication — a single mean/psum per warmup step, so
    chains shard cleanly across a mesh axis (BASELINE.md pod-scale config);
  * trajectory lengths are jittered per iteration (uniform over [1, L]) — the
    standard robust alternative to NUTS's dynamic trees that keeps control flow
    static for XLA.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


@dataclasses.dataclass(frozen=True)
class HMCConfig:
    num_warmup: int = 500
    num_samples: int = 500
    num_leapfrog: int = 16
    init_step_size: float = 0.05
    target_accept: float = 0.8
    jitter_trajectory: bool = True
    # dual averaging constants (Stan defaults)
    da_gamma: float = 0.05
    da_t0: float = 10.0
    da_kappa: float = 0.75


class HMCResult(NamedTuple):
    samples: object  # pytree with leading (num_samples, num_chains) axes
    accept_prob: jax.Array  # (num_samples, num_chains)
    step_size: jax.Array  # () adapted step size
    final_logp: jax.Array  # (num_chains,)


def run_hmc(
    log_prob_fn: Callable,
    init_params,
    key: jax.Array,
    config: HMCConfig = HMCConfig(),
) -> HMCResult:
    """Sample from exp(log_prob_fn(params)).

    init_params: parameter pytree with a leading chain axis on every leaf.
    log_prob_fn: pytree (single chain, no chain axis) -> scalar.
    """
    num_chains = jax.tree.leaves(init_params)[0].shape[0]
    chain0 = jax.tree.map(lambda x: x[0], init_params)
    flat0, unravel = ravel_pytree(chain0)
    dim = flat0.shape[0]
    dtype = flat0.dtype

    def flat_logp(q):
        return log_prob_fn(unravel(q))

    logp_and_grad = jax.value_and_grad(flat_logp)

    q_init = jax.vmap(lambda tree: ravel_pytree(tree)[0])(
        jax.tree.map(lambda x: x, init_params)
    )  # (C, dim) — vmapped ravel is safe: same structure per chain

    def leapfrog(q, p, eps, num_steps_mask):
        """num_steps_mask: (L,) 0/1 mask implementing jittered trajectory length."""

        def body(carry, active):
            q, p, g = carry
            p_half = p + active * 0.5 * eps * g
            q_new = q + active * eps * p_half
            _, g_new = logp_and_grad(q_new)
            p_new = p_half + active * 0.5 * eps * g_new
            # hold state when inactive
            q = jnp.where(active > 0, q_new, q)
            p = jnp.where(active > 0, p_new, p)
            g = jnp.where(active > 0, g_new, g)
            return (q, p, g), None

        _, g0 = logp_and_grad(q)
        (qf, pf, _), _ = jax.lax.scan(body, (q, p, g0), num_steps_mask)
        return qf, pf

    def hmc_step(q, key, eps):
        k_mom, k_len, k_acc = jax.random.split(key, 3)
        p = jax.random.normal(k_mom, (dim,), dtype)
        logp0 = flat_logp(q)
        h0 = logp0 - 0.5 * jnp.sum(p * p)

        if config.jitter_trajectory:
            length = jax.random.randint(k_len, (), 1, config.num_leapfrog + 1)
        else:
            length = config.num_leapfrog
        mask = (jnp.arange(config.num_leapfrog) < length).astype(dtype)

        q_new, p_new = leapfrog(q, p, eps, mask)
        logp1 = flat_logp(q_new)
        h1 = logp1 - 0.5 * jnp.sum(p_new * p_new)
        log_accept = jnp.minimum(0.0, h1 - h0)
        accept_prob = jnp.exp(log_accept)
        # NaN-safe: reject non-finite proposals
        ok = jnp.isfinite(h1)
        accept_prob = jnp.where(ok, accept_prob, 0.0)
        u = jax.random.uniform(k_acc, (), dtype)
        take = jnp.logical_and(ok, jnp.log(u) < log_accept)
        q_out = jnp.where(take, q_new, q)
        return q_out, accept_prob

    steps_v = jax.vmap(hmc_step, in_axes=(0, 0, None))

    # ---- warmup with dual averaging on mean cross-chain acceptance ------------
    mu = jnp.log(10.0 * config.init_step_size)

    def warmup_body(carry, it):
        q, key, log_eps_bar, h_bar = carry
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, num_chains)
        eps = jnp.exp(mu - jnp.sqrt(it + 1.0) / config.da_gamma * h_bar)
        q, accept = steps_v(q, keys, eps)
        mean_accept = jnp.mean(accept)  # cross-chain reduction
        t = it + 1.0 + config.da_t0
        h_bar = (1.0 - 1.0 / t) * h_bar + (config.target_accept - mean_accept) / t
        log_eps = mu - jnp.sqrt(it + 1.0) / config.da_gamma * h_bar
        w = (it + 1.0) ** (-config.da_kappa)
        log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
        return (q, key, log_eps_bar, h_bar), None

    key, k_warm = jax.random.split(key)
    (q, _, log_eps_bar, _), _ = jax.lax.scan(
        warmup_body,
        (q_init, k_warm, jnp.log(jnp.asarray(config.init_step_size, dtype)), jnp.zeros((), dtype)),
        jnp.arange(config.num_warmup, dtype=dtype),
    )
    eps_final = jnp.exp(log_eps_bar)

    # ---- sampling -------------------------------------------------------------
    def sample_body(carry, _):
        q, key = carry
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, num_chains)
        q, accept = steps_v(q, keys, eps_final)
        return (q, key), (q, accept)

    key, k_samp = jax.random.split(key)
    (q_last, _), (qs, accepts) = jax.lax.scan(
        sample_body, (q, k_samp), None, length=config.num_samples
    )

    samples = jax.vmap(jax.vmap(unravel))(qs)  # (T, C, ...)
    final_logp = jax.vmap(flat_logp)(q_last)
    return HMCResult(
        samples=samples,
        accept_prob=accepts,
        step_size=eps_final,
        final_logp=final_logp,
    )
