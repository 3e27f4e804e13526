"""Sharded pathwise policy training: particles over 'dp', Fourier bases over 'tp'.

GSPMD-style: arrays carry NamedSharding constraints, XLA inserts the collectives
(the scaling-book recipe). The only cross-device traffic is (a) the per-step RFF
contraction's psum over 'tp' and (b) the mean-of-particle-losses gradient
reduction over 'dp' (the reduction point of reference train_utils.py:131-133) —
both tiny, latency-bound collectives; rollouts themselves are embarrassingly
parallel (SURVEY.md §5 "Distributed communication backend").
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dynamics.forward import forward_concrete
from ..dynamics.solvers import euler_rollout
from ..models.gp import GPREnsemble, SVGP
from ..models.pathwise import (
    PathState,
    PathwiseGPRTransform,
    PathwiseSVGPTransform,
    generate_paths_gpr,
    generate_paths_svgp,
)


def constrain_paths(paths: PathState, mesh: Mesh) -> PathState:
    """Sharding constraints: sample axis -> dp, basis axis -> tp."""
    c = jax.lax.with_sharding_constraint
    return PathState(
        omega=c(paths.omega, NamedSharding(mesh, P(None, "tp", None))),
        phase=c(paths.phase, NamedSharding(mesh, P(None, "tp"))),
        w=c(paths.w, NamedSharding(mesh, P("dp", None, "tp"))),
        v=c(paths.v, NamedSharding(mesh, P("dp", None, None))),
    )


def make_pathwise_train_step(
    mesh: Mesh,
    drift_model: SVGP,
    policy_chain_fn: Callable,  # policy_model -> callable transform chain
    encoder,
    objective,
    episode_spec,
    batch_size: int,
    num_bases: int,
    optimizer: optax.GradientTransformation,
    dtype=jnp.float32,
    fused: bool = False,
    fused_rollout: bool = False,
    action_scale: float = 10.0,
):
    """Build a jitted (policy, opt_state, key) -> (policy, opt_state, loss) step
    whose particle rollout shards across the mesh.

    fused=True routes drift evals through the Pallas kernel inside a `shard_map`
    over the particle axis (pallas_call does not auto-partition under GSPMD;
    particles are embarrassingly parallel so each shard runs the kernel on its
    local slab and only the final loss mean crosses devices).

    fused_rollout=True runs the WHOLE T-step rollout loss as one Pallas kernel
    per particle slab (ops/rollout_pallas.py) inside the same `shard_map`,
    made multi-chip. FROZEN/off by default: the round-4 on-chip probe
    (docs/perf_notes.md round 4) measured the kernel slower at the cartpole
    shape and gradient-inconsistent with the unfused path over 30 chaotic
    steps at every production shape — keep it off unless re-validated. The kernel materializes the
    full Fourier basis per device, so the mesh must have tp=1 (basis sharding
    and whole-rollout fusion are mutually exclusive by construction); the only
    collective is the loss/grad psum over 'dp'. The kernel differentiates only
    the trainable policy leaves (models/builders.py policy_mask), so the
    returned train_step partitions the policy and routes zero gradients to the
    frozen leaves — caller API (full policy + full-tree opt_state) unchanged.
    Requires a SinCos-encoder + GaussianObjective task (the cartpole/double-
    pendulum shape); `action_scale` is the squash half-range (reference
    swingup_loops.py:84-91).

    drift_model may also be a GPREnsemble (HMC hyperposterior draws, the
    BASELINE.md north-star config): the particle budget splits across the K
    members (loops/pilco.py policy_loss_fn semantics), each member's slab
    shards over 'dp', and members evaluate vmapped on every device — K ~ 8 is
    far below the per-device particle count, so replicating members costs
    nothing while keeping the only collective the loss/grad reduction.
    Supported with fused_rollout=True (whole-rollout kernel, exact-GPR drift
    path) or plain GSPMD; the per-step `fused` kernel is SVGP-only."""

    num_steps = episode_spec.num_steps
    mean0 = jnp.asarray(episode_spec.state_mean, dtype)
    tril0 = jnp.asarray(episode_spec.state_scale_tril, dtype)
    if fused_rollout and mesh.shape.get("tp", 1) != 1:
        raise ValueError(
            "fused_rollout shards particles only (the kernel holds the full "
            "Fourier basis in VMEM); build the mesh with tp=1"
        )
    is_ensemble = isinstance(drift_model, GPREnsemble)
    if is_ensemble:
        # fully-Bayesian drift (HMC hyperposterior ensemble, the BASELINE.md
        # north-star config): the particle budget splits across members
        # (loops/pilco.py policy_loss_fn semantics) and each member's slab
        # shards over 'dp' — members stay replicated (K is small, ~8), so the
        # cross-device traffic is still just the loss/grad reduction
        k_m = drift_model.num_members
        dp_size = mesh.shape.get("dp", 1)
        if batch_size % (k_m * dp_size):
            raise ValueError(
                f"batch_size ({batch_size}) must divide num_members*dp "
                f"({k_m}*{dp_size}) for the ensemble-sharded step"
            )
        s_per = batch_size // k_m
        if fused:
            raise ValueError(
                "the per-step fused drift kernel supports SVGP drifts only; "
                "use fused_rollout=True (whole-rollout kernel, GPR-capable) "
                "or fused=False for a GPREnsemble"
            )

    def rollout_loss(policy_model, drift_fn, x0):
        pol = policy_chain_fn(policy_model)

        def f(t, x):
            return forward_concrete(x, drift_fn, policy=pol, encoder=encoder)

        def acc(t, x, loss):
            feats = x if encoder is None else encoder(x)
            return loss + objective(feats)

        _, loss, _ = euler_rollout(
            f, x0, dt=1.0, num_steps=num_steps,
            accumulate=acc, acc_init=jnp.zeros((x0.shape[0],), dtype),
            remat=False,
        )
        return loss

    def loss_fn(policy_model, key):
        if is_ensemble:
            return _ensemble_loss(policy_model, key)
        k_paths, k_init = jax.random.split(key)
        paths = generate_paths_svgp(drift_model, k_paths, batch_size, num_bases)
        rvs = jax.random.normal(k_init, (batch_size, mean0.shape[-1]), dtype)
        x0 = mean0 + rvs @ tril0.T

        if fused_rollout:
            from jax import shard_map

            from ..ops.rollout_pallas import (
                fused_rollout_loss,
                fused_rollout_operands,
            )

            # operand construction (cholesky solves, center scaling) is
            # per-model, not per-particle: build it ONCE in the Auto context —
            # concrete closure arrays may not enter the Manual region anyway
            meta, head, tail, w_s, v_s = fused_rollout_operands(
                policy_model, drift_model, paths,
                state_dim=mean0.shape[-1], dtype=dtype,
                active_dims=tuple(encoder.active_dims),
                action_scale=float(action_scale),
                target=objective.target, precis=objective.precis,
                dt=1.0, num_steps=num_steps,
                interpret=jax.default_backend() != "tpu",
            )

            def shard_body(x0_l, w_l, v_l, head_l, tail_l):
                local = fused_rollout_loss(meta, x0_l, *head_l, w_l, v_l, *tail_l)
                return jax.lax.psum(jnp.sum(local), "dp")

            total = shard_map(
                shard_body,
                mesh=mesh,
                in_specs=(P("dp", None), P("dp", None, None),
                          P("dp", None, None), P(), P()),
                out_specs=P(),
                check_vma=False,  # pallas_call outputs carry no vma metadata
            )(x0, w_s, v_s, head, tail)
            return total / batch_size

        if fused:
            # explicit particle sharding: each device runs the Pallas kernel on
            # its local particle slab; psum only the loss sum
            from jax import shard_map

            def shard_body(w, v, x0_l):
                local_paths = PathState(
                    omega=paths.omega, phase=paths.phase, w=w, v=v
                )
                drift_fn = PathwiseSVGPTransform(
                    model=drift_model, paths=local_paths, fused=True
                )
                local = rollout_loss(policy_model, drift_fn, x0_l)
                return jax.lax.psum(jnp.sum(local), "dp")

            total = shard_map(
                shard_body,
                mesh=mesh,
                in_specs=(P("dp", None, None), P("dp", None, None), P("dp", None)),
                out_specs=P(),
                check_vma=False,  # pallas_call outputs carry no vma metadata
            )(paths.w, paths.v, x0)
            return total / batch_size

        paths = constrain_paths(paths, mesh)
        x0 = jax.lax.with_sharding_constraint(
            x0, NamedSharding(mesh, P("dp", None))
        )
        drift_fn = PathwiseSVGPTransform(model=drift_model, paths=paths)
        return rollout_loss(policy_model, drift_fn, x0).mean()

    def _ensemble_loss(policy_model, key):
        k_paths, k_init = jax.random.split(key)
        keys = jax.random.split(k_paths, k_m)
        paths = jax.vmap(
            lambda m, kk: generate_paths_gpr(m, kk, s_per, num_bases)
        )(drift_model.members, keys)
        rvs = jax.random.normal(k_init, (k_m, s_per, mean0.shape[-1]), dtype)
        x0 = mean0 + rvs @ tril0.T  # (K, s_per, D)

        if fused_rollout:
            from jax import shard_map

            from ..ops.rollout_pallas import (
                fused_rollout_loss,
                fused_rollout_operands,
            )

            kw = dict(
                state_dim=int(mean0.shape[-1]), dtype=dtype,
                active_dims=tuple(encoder.active_dims),
                action_scale=float(action_scale),
                target=objective.target, precis=objective.precis,
                dt=1.0, num_steps=num_steps,
                interpret=jax.default_backend() != "tpu",
            )
            # meta is static (shape-only) and identical across members; the
            # per-member operand arrays stack under vmap with a leading K axis
            # (policy-derived arrays broadcast to K — K ~ 8, negligible)
            meta, *_ = fused_rollout_operands(
                policy_model,
                jax.tree.map(lambda a: a[0], drift_model.members),
                jax.tree.map(lambda a: a[0], paths),
                **kw,
            )

            def ops_of(m, p):
                _, head, tail, w_s, v_s = fused_rollout_operands(
                    policy_model, m, p, **kw
                )
                return head, tail, w_s, v_s

            head, tail, w_s, v_s = jax.vmap(ops_of)(drift_model.members, paths)

            def shard_body(x0_l, w_l, v_l, head_l, tail_l):
                def member_sum(x0_m, w_m, v_m, h_m, t_m):
                    return jnp.sum(
                        fused_rollout_loss(meta, x0_m, *h_m, w_m, v_m, *t_m)
                    )

                local = jax.vmap(member_sum)(x0_l, w_l, v_l, head_l, tail_l)
                return jax.lax.psum(jnp.sum(local), "dp")

            total = shard_map(
                shard_body,
                mesh=mesh,
                in_specs=(P(None, "dp"), P(None, "dp"), P(None, "dp"),
                          P(), P()),
                out_specs=P(),
                check_vma=False,  # pallas_call outputs carry no vma metadata
            )(x0, w_s, v_s, head, tail)
            return total / batch_size

        c = jax.lax.with_sharding_constraint
        paths = PathState(
            omega=paths.omega,
            phase=paths.phase,
            w=c(paths.w, NamedSharding(mesh, P(None, "dp"))),
            v=c(paths.v, NamedSharding(mesh, P(None, "dp"))),
        )
        x0 = c(x0, NamedSharding(mesh, P(None, "dp")))

        def member_loss(m, p, x0_m):
            drift_fn = PathwiseGPRTransform(model=m, paths=p)
            return rollout_loss(policy_model, drift_fn, x0_m)

        return jax.vmap(member_loss)(drift_model.members, paths, x0).mean()

    if fused_rollout:
        from ..models.builders import policy_mask
        from ..utils.trees import combine, partition

        @jax.jit
        def train_step(policy_model, opt_state, key):
            # the whole-rollout kernel's VJP covers the trainable policy
            # leaves only (z, q_mu, lengthscales) and REFUSES perturbed
            # frozen inputs — differentiate the trainable partition and
            # feed zero gradients to the frozen leaves (adam keeps them
            # exactly fixed), so the caller's full-tree opt_state works
            mask = policy_mask(policy_model)
            train, frozen = partition(policy_model, mask)
            loss, g_train = jax.value_and_grad(
                lambda tr: loss_fn(combine(tr, frozen), key)
            )(train)
            grads = combine(g_train, jax.tree.map(jnp.zeros_like, policy_model))
            updates, opt_state = optimizer.update(grads, opt_state, policy_model)
            policy_model = optax.apply_updates(policy_model, updates)
            return policy_model, opt_state, loss

        return train_step, loss_fn

    @jax.jit
    def train_step(policy_model, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(policy_model, key)
        updates, opt_state = optimizer.update(grads, opt_state, policy_model)
        policy_model = optax.apply_updates(policy_model, updates)
        return policy_model, opt_state, loss

    return train_step, loss_fn
