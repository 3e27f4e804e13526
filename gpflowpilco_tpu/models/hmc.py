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
    # trajectory-length adaptation: "jitter" (uniform over [1, num_leapfrog],
    # the static-L default) or "chees" (ChEES-HMC, Hoffman/Radul/Sountsov 2021:
    # gradient-ascend the Change-in-Estimator-of-Expected-Square criterion on a
    # continuous trajectory time, capped at max_leapfrog steps). ChEES uses only
    # cross-chain means as its adaptation signal, so it shards over a chain mesh
    # axis exactly like the step-size dual averaging — the accelerator-friendly
    # alternative to NUTS's dynamic trees (ROADMAP 3).
    adapt_trajectory: str = "jitter"
    max_leapfrog: int = 64
    chees_lr: float = 0.025


class HMCResult(NamedTuple):
    samples: object  # pytree with leading (num_samples, num_chains) axes
    accept_prob: jax.Array  # (num_samples, num_chains)
    step_size: jax.Array  # () adapted step size
    final_logp: jax.Array  # (num_chains,)
    # Python 0.0, not jnp.zeros(()): a device-array default would initialize
    # the JAX backend (grabbing the TPU on this machine) at import time
    trajectory_length: jax.Array = 0.0  # () adapted integration time


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

    chees = config.adapt_trajectory == "chees"
    num_lf = config.max_leapfrog if chees else config.num_leapfrog

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

    def hmc_step(q, key, eps, length):
        """length: () int32 active leapfrog steps (<= num_lf)."""
        k_mom, k_acc = jax.random.split(key)
        p = jax.random.normal(k_mom, (dim,), dtype)
        logp0 = flat_logp(q)
        h0 = logp0 - 0.5 * jnp.sum(p * p)

        mask = (jnp.arange(num_lf) < length).astype(dtype)
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
        return q_out, accept_prob, q_new, p_new

    steps_v = jax.vmap(hmc_step, in_axes=(0, 0, None, 0))

    def draw_lengths(key, tau, eps):
        """Per-iteration active-step counts (C,): shared h*tau/eps for ChEES
        (chains stay in lockstep, as in the paper), per-chain uniform jitter
        otherwise."""
        if chees:
            h = jax.random.uniform(key, (), dtype)
            steps = jnp.ceil(h * tau / eps).astype(jnp.int32)
            steps = jnp.clip(steps, 1, num_lf)
            return jnp.full((num_chains,), steps, jnp.int32)
        if config.jitter_trajectory:
            return jax.random.randint(key, (num_chains,), 1, num_lf + 1)
        return jnp.full((num_chains,), num_lf, jnp.int32)

    # ---- warmup: dual-averaged step size + (optionally) ChEES trajectory time --
    mu = jnp.log(10.0 * config.init_step_size)
    tau0 = jnp.asarray(config.init_step_size * config.num_leapfrog, dtype)

    def chees_grad(q, q_prop, p_prop, accept):
        """d ChEES / d tau estimate (Hoffman et al. 2021, eq. 14): cross-chain
        centered squared-radius change times proposal direction, weighted by
        acceptance. Only cross-chain *means* are used — shards over chains."""
        dq = q - jnp.mean(q, 0)
        dqp = q_prop - jnp.mean(q_prop, 0)
        delta = jnp.sum(dqp * dqp, -1) - jnp.sum(dq * dq, -1)  # (C,)
        dot = jnp.sum(dqp * p_prop, -1)  # (C,)
        num = jnp.mean(accept * delta * dot)
        den = jnp.maximum(jnp.mean(accept), 1e-6)
        g = num / den
        return jnp.where(jnp.isfinite(g), g, 0.0)

    def warmup_body(carry, it):
        q, key, log_eps_bar, h_bar, log_tau, m_ad, v_ad = carry
        key, k_len, sub = jax.random.split(key, 3)
        keys = jax.random.split(sub, num_chains)
        eps = jnp.exp(mu - jnp.sqrt(it + 1.0) / config.da_gamma * h_bar)
        tau = jnp.exp(log_tau)
        lengths = draw_lengths(k_len, tau, eps)
        q_new, accept, q_prop, p_prop = steps_v(q, keys, eps, lengths)
        mean_accept = jnp.mean(accept)  # cross-chain reduction
        t = it + 1.0 + config.da_t0
        h_bar = (1.0 - 1.0 / t) * h_bar + (config.target_accept - mean_accept) / t
        log_eps = mu - jnp.sqrt(it + 1.0) / config.da_gamma * h_bar
        w = (it + 1.0) ** (-config.da_kappa)
        log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar

        if chees:
            # Adam ascent on log tau; d tau_iter/d tau = h is folded into the
            # shared jitter already applied inside draw_lengths' trajectory
            g = chees_grad(q, q_prop, p_prop, accept)
            m_ad = 0.9 * m_ad + 0.1 * g
            v_ad = 0.999 * v_ad + 0.001 * g * g
            mhat = m_ad / (1.0 - 0.9 ** (it + 1.0))
            vhat = v_ad / (1.0 - 0.999 ** (it + 1.0))
            log_tau = log_tau + config.chees_lr * mhat / (jnp.sqrt(vhat) + 1e-8)
            # keep tau realizable: at most max_leapfrog steps at current eps
            log_tau = jnp.clip(
                log_tau, jnp.log(eps), jnp.log(num_lf * eps)
            )
        return (q_new, key, log_eps_bar, h_bar, log_tau, m_ad, v_ad), None

    key, k_warm = jax.random.split(key)
    carry0 = (
        q_init,
        k_warm,
        jnp.log(jnp.asarray(config.init_step_size, dtype)),
        jnp.zeros((), dtype),
        jnp.log(tau0),
        jnp.zeros((), dtype),
        jnp.zeros((), dtype),
    )
    (q, _, log_eps_bar, _, log_tau_f, _, _), _ = jax.lax.scan(
        warmup_body, carry0, jnp.arange(config.num_warmup, dtype=dtype)
    )
    eps_final = jnp.exp(log_eps_bar)
    tau_final = jnp.exp(log_tau_f) if chees else eps_final * config.num_leapfrog

    # ---- sampling -------------------------------------------------------------
    def sample_body(carry, _):
        q, key = carry
        key, k_len, sub = jax.random.split(key, 3)
        keys = jax.random.split(sub, num_chains)
        lengths = draw_lengths(k_len, tau_final, eps_final)
        q, accept, _, _ = steps_v(q, keys, eps_final, lengths)
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
        trajectory_length=tau_final,
    )
