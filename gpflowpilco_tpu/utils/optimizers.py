"""Training drivers: chunked-scan Adam and L-BFGS over parameter pytrees.

Replaces the reference's GradientDescent wrapper (utils/optimizers.py:46-78: Keras
Adam + tqdm) and gpflow's SciPy L-BFGS bridge (swingup_loops.py:70, which crossed
the TF<->numpy boundary on every function evaluation). Here both optimizers run
fully on-device:

  * ``adam_minimize`` — optax adam + piecewise-constant decay + global-norm clip
    (the reference policy-training recipe, swingup_loops.py:93-103), stepping
    inside `lax.scan` chunks so 5000 steps launch as ~50 device executions.
  * ``lbfgs_minimize`` — optax L-BFGS with zoom linesearch driven by a
    `while_loop`, for dynamics-model fitting (ELBO/LML + SNR penalty).

Frozen leaves: pass a bool mask pytree; frozen parts are closed over via
utils.trees.partition, so L-BFGS curvature never sees them.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from .trees import combine, partition


def make_policy_schedule(step_limit: int, initial_lr: float = 0.01, num_drops: int = 3):
    """lr / 10 at each third of the budget (reference swingup_loops.py:93-98)."""
    values = [initial_lr * (0.1**k) for k in range(num_drops)]
    bounds = {
        int(k * step_limit // num_drops): values[k] / values[k - 1]
        for k in range(1, num_drops)
    }
    return optax.piecewise_constant_schedule(values[0], bounds)


def _guarded_adam(schedule, global_clipnorm):
    """clip -> adam -> apply_if_finite, the policy-training recipe shared by the
    single-start and multi-start drivers. Non-finite-gradient steps are skipped
    (not applied) — f32 moment propagation can produce rare NaN losses, and one
    poisoned step must not corrupt the parameters for the remaining thousands.
    The effectively-infinite error budget means a persistently-NaN loss freezes
    the parameters at their last finite value instead of poisoning them."""
    chain = []
    if global_clipnorm is not None:
        chain.append(optax.clip_by_global_norm(global_clipnorm))
    chain.append(optax.adam(schedule))
    return optax.apply_if_finite(optax.chain(*chain), max_consecutive_errors=10**8)


def _count_notfinite(opt_state):
    """Optimizer steps skipped because gradients were non-finite (summed over
    any leading candidate axis); 0 if the optax state shape ever changes."""
    try:
        return int(jnp.sum(optax.tree_utils.tree_get(opt_state, "total_notfinite")))
    except Exception:
        return 0


def adam_minimize(
    loss_fn: Callable,
    params,
    num_steps: int,
    learning_rate=0.01,
    schedule=None,
    global_clipnorm: Optional[float] = 1.0,
    mask=None,
    chunk_size: int = 100,
    key: Optional[jax.Array] = None,
    loss_args: tuple = (),
    compiler_options: Optional[dict] = None,
):
    """Minimize loss_fn for num_steps of Adam; returns (params, losses).

    If ``key`` is given, loss_fn has signature loss_fn(params, key) and receives a
    fresh fold of the key every step — this is how pathwise policy training draws
    new sample paths per optimizer step (reference pilco.py:279-287, where fresh
    paths come from TF's stateful RNG inside the compiled closure).

    ``loss_args`` are appended to each call (loss_fn(params[, key], *loss_args))
    and traced as jit *arguments* — pass big constant pytrees (e.g. the frozen
    dynamics model) here instead of closing over them, or they get baked into the
    executable as literals (slow compiles, bloated binaries).
    """
    if schedule is None:
        schedule = learning_rate

    opt = _guarded_adam(schedule, global_clipnorm)

    if mask is not None:
        train, frozen = partition(params, mask)
    else:
        train, frozen = params, None

    def full_loss(train_part, step_key, args):
        full = combine(train_part, frozen) if frozen is not None else train_part
        if key is None:
            return loss_fn(full, *args)
        return loss_fn(full, step_key, *args)

    opt_state = opt.init(train)

    def make_step(args):
        def step(carry, _):
            train, opt_state, k = carry
            k, sub = jax.random.split(k)
            loss, grads = jax.value_and_grad(full_loss)(train, sub, args)
            updates, opt_state = opt.update(grads, opt_state, train)
            train = optax.apply_updates(train, updates)
            return (train, opt_state, k), loss

        return step

    from functools import partial as _partial

    @_partial(
        jax.jit, static_argnames=("n",),
        **({"compiler_options": compiler_options} if compiler_options else {}),
    )
    def run_chunk(train, opt_state, k, args, n):
        return jax.lax.scan(make_step(args), (train, opt_state, k), None, length=n)

    k = key if key is not None else jax.random.PRNGKey(0)
    losses = []
    remaining = num_steps
    while remaining > 0:
        n = min(chunk_size, remaining)
        (train, opt_state, k), chunk_losses = run_chunk(
            train, opt_state, k, loss_args, n
        )
        losses.append(chunk_losses)
        remaining -= n

    final = combine(train, frozen) if frozen is not None else train
    return final, jnp.concatenate(losses), _count_notfinite(opt_state)


def make_multistart_runner(
    loss_fn: Callable,
    schedule,
    global_clipnorm: Optional[float],
    use_mask: bool,
    compiler_options: Optional[dict] = None,
) -> Callable:
    """Build a REUSABLE K-candidate lock-step Adam runner.

    The chunk executable is one jit object created here and closed over by
    the returned ``run`` — so a caller that keeps the runner alive (e.g. the
    PILCO loop, one policy update per episode) pays the trace/lower cost of
    the chunk graph ONCE per process instead of once per episode. At the
    round-5 full-dd MM workload the per-episode retrace of the 180k-line
    chunk graph cost more wall-clock than the 2000 optimization steps
    themselves (~130 s lower vs ~100 s exec; docs/perf_notes.md round 5).
    Calls with new ARRAY SHAPES (e.g. a drift cache that grows with the
    dataset) still retrace just those signatures, as with any jit.

    ``run(stacked_params, keys, num_steps, loss_args=(), chunk_size=250)``
    returns (stacked_bests, best_losses (K,), losses (K, num_steps),
    notfinite_steps summed over candidates).

    K-candidate lock-step semantics: all candidates step in one vmapped
    program (clipping and apply_if_finite state are per-candidate),
    dispatched in bounded lax.scan chunks.

    Chunking matters beyond progress reporting: a single-dispatch 3000-step x
    K x rollout program runs minutes on-device, which crashed the (tunneled)
    TPU worker on the double-pendulum workload — bounded segments keep every
    dispatch well under any runtime watchdog while adding only ~num_steps /
    chunk_size host round-trips.

    Each candidate returns its BEST-SEEN parameters (and that loss), not the
    final step's: chaotic MM losses and stochastic pathwise losses both
    oscillate, and taking the final point let an update end *worse* than the
    incumbent it started from (observed as episode-level policy collapses).
    With best-seen tracking, candidate 0 (the incumbent continuation) can never
    score worse than its starting loss, so accepted updates are monotone
    non-worsening w.r.t. the current model. For stochastic losses this picks a
    slightly lucky draw (selection bias ~ the per-eval noise), which is small
    at 1024 particles and a price worth paying for the monotonicity.
    """
    opt = _guarded_adam(schedule, global_clipnorm)

    from functools import partial as _partial

    @_partial(
        jax.jit, static_argnames=("n",),
        **({"compiler_options": compiler_options} if compiler_options else {}),
    )
    def run_chunk(train, frozen, opt_state, keys, best_loss, best_train, args, n):
        def one(train, frozen, opt_state, k, best_loss, best_train):
            def step(carry, _):
                train, opt_state, k, best_loss, best_train = carry
                k, sub = jax.random.split(k)

                def full_loss(tr):
                    full = combine(tr, frozen) if use_mask else tr
                    return loss_fn(full, sub, *args)

                loss, grads = jax.value_and_grad(full_loss)(train)
                # track in the param dtype: a mixed-precision loss (f64 loss
                # over f32 params, PolicySpec.loss_dtype) must not widen the
                # scan carry
                loss = loss.astype(best_loss.dtype)
                # loss belongs to the params entering the step (pre-update);
                # NaN losses never improve (NaN < x is False)
                better = loss < best_loss
                best_loss = jnp.where(better, loss, best_loss)
                best_train = jax.tree.map(
                    lambda b, t: jnp.where(better, t, b), best_train, train
                )
                updates, opt_state = opt.update(grads, opt_state, train)
                train = optax.apply_updates(train, updates)
                return (train, opt_state, k, best_loss, best_train), loss

            (train, opt_state, k, best_loss, best_train), losses = jax.lax.scan(
                step, (train, opt_state, k, best_loss, best_train), None, length=n
            )
            return train, opt_state, k, best_loss, best_train, losses

        if use_mask:
            return jax.vmap(
                lambda tr, fz, os, kk, bl, bt: one(tr, fz, os, kk, bl, bt)
            )(train, frozen, opt_state, keys, best_loss, best_train)
        return jax.vmap(
            lambda tr, os, kk, bl, bt: one(tr, None, os, kk, bl, bt)
        )(train, opt_state, keys, best_loss, best_train)

    def run(stacked_params, keys, num_steps, mask=None, loss_args=(), chunk_size=250):
        assert (mask is not None) == use_mask
        if use_mask:
            train, frozen = partition(stacked_params, mask)
        else:
            train, frozen = stacked_params, None

        opt_state = jax.vmap(opt.init)(train)
        num_candidates = jax.tree.leaves(train)[0].shape[0]
        best_loss = jnp.full(
            (num_candidates,), jnp.inf, jax.tree.leaves(train)[0].dtype
        )
        best_train = train
        losses = []
        remaining = num_steps
        while remaining > 0:
            n = min(chunk_size, remaining)
            train, opt_state, keys, best_loss, best_train, chunk_losses = run_chunk(
                train, frozen, opt_state, keys, best_loss, best_train, loss_args, n
            )
            losses.append(chunk_losses)
            remaining -= n

        bests = combine(best_train, frozen) if use_mask else best_train
        all_losses = jnp.concatenate(losses, axis=-1)  # (K, num_steps)
        return bests, best_loss, all_losses, _count_notfinite(opt_state)

    return run


def adam_minimize_multistart(
    loss_fn: Callable,
    stacked_params,
    keys: jax.Array,
    num_steps: int,
    schedule,
    global_clipnorm: Optional[float],
    mask,
    loss_args: tuple = (),
    chunk_size: int = 250,
    compiler_options: Optional[dict] = None,
):
    """One-shot wrapper around make_multistart_runner (see its docstring for
    the semantics); callers with repeated same-shaped updates should hold a
    runner instead to amortize the chunk-graph trace."""
    run = make_multistart_runner(
        loss_fn, schedule, global_clipnorm, mask is not None, compiler_options
    )
    return run(
        stacked_params, keys, num_steps,
        mask=mask, loss_args=loss_args, chunk_size=chunk_size,
    )


def lbfgs_minimize(
    loss_fn: Callable,
    params,
    max_iters: int = 1000,
    tol: float = 1e-6,
    mask=None,
    memory_size: int = 20,
    loss_args: tuple = (),
):
    """Full-batch L-BFGS with zoom linesearch; returns (params, final_loss, iters).

    ``loss_args`` are appended to each call (loss_fn(params, *loss_args)) and —
    like the frozen leaves — traced as jit *arguments*. Closing over per-episode
    data instead would bake it into the lowered HLO as constants, producing a
    byte-different module (and a persistent-cache miss → minutes-long remote
    recompile) every episode even when padding holds the shapes fixed.
    """
    if mask is not None:
        train, frozen = partition(params, mask)
    else:
        train, frozen = params, None

    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=30, verbose=False
        ),
    )

    @jax.jit
    def run(train, frozen, args):
        def full_loss(train_part):
            full = combine(train_part, frozen) if mask is not None else train_part
            return loss_fn(full, *args)

        value_and_grad = optax.value_and_grad_from_state(full_loss)

        def cond(carry):
            train, state, prev_loss, it = carry
            grad = optax.tree_utils.tree_get(state, "grad")
            gnorm = optax.global_norm(grad)
            # state.grad is zeros before the first step — always take iteration 0
            return jnp.logical_or(
                it == 0, jnp.logical_and(it < max_iters, gnorm > tol)
            )

        def body(carry):
            train, state, _, it = carry
            loss, grad = value_and_grad(train, state=state)
            updates, state = opt.update(
                grad, state, train, value=loss, grad=grad, value_fn=full_loss
            )
            train = optax.apply_updates(train, updates)
            return train, state, loss, it + 1

        state = opt.init(train)
        init_loss = full_loss(train)
        train, state, loss, iters = jax.lax.while_loop(
            cond, body, (train, state, init_loss, 0)
        )
        return train, loss, iters

    train, loss, iters = run(train, frozen, loss_args)
    final = combine(train, frozen) if mask is not None else train
    return final, loss, iters
