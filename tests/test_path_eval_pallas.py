"""Fused Pallas path-eval kernel vs the reference JAX implementation.

Runs in Pallas interpreter mode on CPU; numeric parity in f32 plus VJP parity
for the differentiated operands (x, w, v).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpflowpilco_tpu.models.gp import SVGP
from gpflowpilco_tpu.models.kernels import RBF
from gpflowpilco_tpu.models.pathwise import eval_paths_svgp, generate_paths_svgp
from gpflowpilco_tpu.utils import bijectors as bij

from .utils import TestConfig


def _setup(s=200, num_latent=3, m=16, b=64, d=5):
    config = TestConfig(seed=77, dtype=jnp.float32)
    kernel = RBF.create(
        jnp.asarray([1.0, 0.7, 1.3], jnp.float32)[:num_latent],
        jnp.ones((num_latent, d), jnp.float32),
    )
    z = jax.random.normal(config.next_key(), (num_latent, m, d), jnp.float32)
    model = SVGP(
        kernel=kernel,
        z=z,
        q_mu=0.5 * jax.random.normal(config.next_key(), (m, num_latent), jnp.float32),
        q_sqrt=0.1 * jnp.tile(jnp.eye(m, dtype=jnp.float32)[None], (num_latent, 1, 1)),
        mean_const=jnp.asarray([0.1] * num_latent, jnp.float32),
        raw_noise=bij.positive_inv(jnp.asarray(0.01, jnp.float32)),
        w=None,
        whiten=True,
    )
    paths = generate_paths_svgp(model, config.next_key(), s, b)
    x = jax.random.normal(config.next_key(), (s, d), jnp.float32)
    return model, paths, x


def test_fused_matches_reference_interpret():
    from gpflowpilco_tpu.ops import path_eval_pallas as pe

    model, paths, x = _setup()
    want = eval_paths_svgp(model, paths, x)

    with jax.disable_jit():  # not needed, but keeps interpret deterministic
        pass
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = pe.eval_paths_svgp_fused(model, paths, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_vjp_matches_reference_interpret():
    from jax.experimental.pallas import tpu as pltpu

    from gpflowpilco_tpu.ops import path_eval_pallas as pe

    model, paths, x = _setup(s=100, b=32, m=8)

    def loss_ref(x, w, v):
        import dataclasses

        p = dataclasses.replace(paths, w=w, v=v)
        f = eval_paths_svgp(model, p, x)
        return jnp.sum(jnp.sin(f))

    def loss_fused(x, w, v):
        import dataclasses

        p = dataclasses.replace(paths, w=w, v=v)
        f = pe.eval_paths_svgp_fused(model, p, x)
        return jnp.sum(jnp.sin(f))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, paths.w, paths.v)
    with pltpu.force_tpu_interpret_mode():  # must cover the bwd kernel too
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, paths.w, paths.v)
    for a, b_, name in zip(g_fused, g_ref, ("dx", "dw", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_fused_vjp_frozen_paths_dx_only_interpret(monkeypatch):
    """Policy-optimization shape of differentiation: paths (w, v) are constants,
    only x is perturbed — the symbolic-zeros route must pick the dx-only
    backward kernel and still match the reference dx."""
    from jax.experimental.pallas import tpu as pltpu

    from gpflowpilco_tpu.ops import path_eval_pallas as pe

    used = []
    orig_dx = pe._bwd_dx_kernel
    monkeypatch.setattr(
        pe, "_bwd_dx_kernel",
        lambda *a: (used.append("dx"), orig_dx(*a))[1],
    )
    orig_full = pe._bwd_kernel
    monkeypatch.setattr(
        pe, "_bwd_kernel",
        lambda *a: (used.append("full"), orig_full(*a))[1],
    )

    model, paths, x = _setup(s=100, b=32, m=8)

    def loss_ref(x):
        f = eval_paths_svgp(model, paths, x)
        return jnp.sum(jnp.sin(f))

    def loss_fused(x):
        f = pe.eval_paths_svgp_fused(model, paths, x)
        return jnp.sum(jnp.sin(f))

    g_ref = jax.grad(loss_ref)(x)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused)(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=2e-4, atol=2e-5
    )
    # dx-only kernel selected, full bwd never traced (interpret mode invokes
    # the kernel body once per grid cell, so compare as a set)
    assert set(used) == {"dx"}


def test_fused_vmap_multistart_lck_interpret():
    """The production shape that first crashed on-chip (double-pendulum run):
    vmap over K policy candidates wrapping grad-of-rollout through the fused
    kernel, with an LCK (W-mixed) drift, D=8 inputs and a non-128-multiple M.
    Interpret mode checks the lowering + numerics; the chip fault is tracked
    separately (docs/perf_notes.md)."""
    from jax.experimental.pallas import tpu as pltpu

    from gpflowpilco_tpu.models.gp import SVGP
    from gpflowpilco_tpu.models.kernels import RBF
    from gpflowpilco_tpu.models.pathwise import generate_paths_svgp
    from gpflowpilco_tpu.ops import path_eval_pallas as pe
    from gpflowpilco_tpu.utils import bijectors as bij

    config = TestConfig(seed=5, dtype=jnp.float32)
    s, num_latent, m, b, d, k_cand = 64, 3, 40, 32, 8, 3
    kernel = RBF.create(
        jnp.asarray([1.0, 0.7, 1.3], jnp.float32),
        jnp.ones((num_latent, d), jnp.float32),
    )
    model = SVGP(
        kernel=kernel,
        z=jax.random.normal(config.next_key(), (num_latent, m, d), jnp.float32),
        q_mu=0.5 * jax.random.normal(config.next_key(), (m, num_latent), jnp.float32),
        q_sqrt=0.1 * jnp.tile(jnp.eye(m, dtype=jnp.float32)[None], (num_latent, 1, 1)),
        mean_const=jnp.zeros(2, jnp.float32),
        raw_noise=bij.positive_inv(jnp.asarray(0.01, jnp.float32)),
        w=jax.random.normal(config.next_key(), (2, num_latent), jnp.float32),
        whiten=True,
    )
    paths = generate_paths_svgp(model, config.next_key(), s, b)
    x0 = jax.random.normal(config.next_key(), (k_cand, s, d), jnp.float32)

    def rollout_loss(eval_fn, x):
        def body(c, _):
            f = eval_fn(model, paths, c)  # (S, 2)
            c = c + 0.1 * jnp.concatenate([f, jnp.zeros((s, d - 2), jnp.float32)], -1)
            return c, None
        out, _ = jax.lax.scan(body, x, None, length=4)
        return jnp.sum(out**2)

    g_ref = jax.vmap(jax.grad(lambda x: rollout_loss(eval_paths_svgp, x)))(x0)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.vmap(jax.grad(lambda x: rollout_loss(pe.eval_paths_svgp_fused, x)))(x0)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=5e-4, atol=5e-5
    )
