"""Env parity: RK4 jittable envs vs scipy adaptive integration of the same ODEs."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

from gpflowpilco_tpu.envs.base import env_step, rollout
from gpflowpilco_tpu.envs.cartpole import CartPole
from gpflowpilco_tpu.envs.double_pendulum import DoublePendulum
from gpflowpilco_tpu.envs.mountain_car import MountainCar


def _scipy_trajectory(ode_np, x0, actions, dt):
    state = np.asarray(x0, np.float64)
    out = [state]
    for a in actions:
        sol = solve_ivp(
            lambda t, s: ode_np(s, a), (0.0, dt), state, rtol=1e-10, atol=1e-12
        )
        state = sol.y[:, -1]
        out.append(state)
    return np.stack(out)


def test_cartpole_matches_scipy():
    env = CartPole()
    x0 = np.array([0.0, np.pi - 0.1, 0.0, 0.0])
    actions = 5.0 * np.sin(np.linspace(0, 3, 30))[:, None]

    def ode_np(s, a):
        return np.asarray(env.ode(jnp.asarray(s), jnp.asarray(a)))

    ref = _scipy_trajectory(ode_np, x0, actions, dt=0.1)

    state = jnp.asarray(x0)
    traj = [x0]
    for a in actions:
        state = env_step(env, state, jnp.asarray(a), dt=0.1, substeps=10)
        traj.append(np.asarray(state))
    got = np.stack(traj)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)


def test_mountain_car_matches_scipy():
    env = MountainCar()
    x0 = np.array([-0.5, 0.0])
    actions = 3.0 * np.ones((20, 1))

    def ode_np(s, a):
        return np.asarray(env.ode(jnp.asarray(s), jnp.asarray(a)))

    ref = _scipy_trajectory(ode_np, x0, actions, dt=0.1)
    state = jnp.asarray(x0)
    traj = [x0]
    for a in actions:
        state = env_step(env, state, jnp.asarray(a), dt=0.1, substeps=10)
        traj.append(np.asarray(state))
    got = np.stack(traj)
    np.testing.assert_allclose(got, ref, rtol=0, atol=5e-4)


def test_double_pendulum_matches_scipy():
    env = DoublePendulum()
    x0 = np.array([np.pi - 0.05, np.pi, 0.0, 0.0])
    actions = np.stack(
        [1.0 * np.sin(np.linspace(0, 2, 20)), -0.5 * np.ones(20)], axis=-1
    )

    def ode_np(s, a):
        return np.asarray(env.ode(jnp.asarray(s), jnp.asarray(a)))

    ref = _scipy_trajectory(ode_np, x0, actions, dt=0.1)
    state = jnp.asarray(x0)
    traj = [x0]
    for a in actions:
        state = env_step(env, state, jnp.asarray(a), dt=0.1, substeps=20)
        traj.append(np.asarray(state))
    got = np.stack(traj)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-3)


def test_vmapped_rollouts():
    env = CartPole()
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    x0 = jax.vmap(env.reset)(keys)

    def policy(state):
        return jnp.asarray([2.0]) * jnp.tanh(state[..., 1:2])

    states, actions = jax.vmap(
        lambda x: rollout(env, policy, x, dt=0.1, num_steps=30)
    )(x0)
    assert states.shape == (16, 31, 4)
    assert actions.shape == (16, 30, 1)
    assert bool(jnp.all(jnp.isfinite(states)))
    # jit the whole batch rollout
    jitted = jax.jit(
        lambda x: jax.vmap(lambda s: rollout(env, policy, s, dt=0.1, num_steps=30))(x)
    )
    s2, _ = jitted(x0)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(states), rtol=1e-12)


def test_tip_coordinates_upright_goal():
    env = CartPole()
    up = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    x, y = env.get_tip_coordinates(up)
    assert float(x) == 0.0 and abs(float(y) - 0.5) < 1e-12
    down = jnp.asarray([0.0, jnp.pi, 0.0, 0.0])
    _, y2 = env.get_tip_coordinates(down)
    assert abs(float(y2) + 0.5) < 1e-9


def test_rendering_writes_files(tmp_path):
    """Headless renderers (the reference's pyglet viewers' replacement): one
    frame, a filmstrip, and a GIF per environment."""
    from gpflowpilco_tpu.envs.render import render_frame, render_gif, render_trajectory

    for env, dim in ((CartPole(), 4), (MountainCar(), 2), (DoublePendulum(), 4)):
        states = np.linspace(0.1, 1.0, 5)[:, None] * np.ones((5, dim))
        name = type(env).__name__
        f1 = render_frame(env, states[0], path=tmp_path / f"{name}.png")
        f2 = render_trajectory(env, states, tmp_path / f"{name}_strip.png", num_frames=3)
        f3 = render_gif(env, states, tmp_path / f"{name}.gif", stride=2)
        for f in (f1, f2, f3):
            assert f.exists() and f.stat().st_size > 0, f


def test_env_physics_smoke_fast_tier():
    """Cheap fast-tier physics canary (ADVICE r4): 5 steps of each env vs
    scipy at reduced tolerance, so a physics regression is caught pre-commit
    even though the full 20-30-step parity tests live in the slow tier."""
    cases = [
        (CartPole(), np.array([0.0, np.pi - 0.1, 0.0, 0.0]),
         5.0 * np.ones((5, 1)), 2e-4),
        (MountainCar(), np.array([-0.5, 0.0]), 3.0 * np.ones((5, 1)), 5e-4),
        (DoublePendulum(), np.array([np.pi - 0.05, np.pi, 0.0, 0.0]),
         np.ones((5, 2)), 5e-3),
    ]
    for env, x0, actions, atol in cases:
        def ode_np(s, a, env=env):
            return np.asarray(env.ode(jnp.asarray(s), jnp.asarray(a)))

        ref = _scipy_trajectory(ode_np, x0, actions, dt=0.1)
        state = jnp.asarray(x0)
        traj = [x0]
        for a in actions:
            state = env_step(env, state, jnp.asarray(a), dt=0.1, substeps=10)
            traj.append(np.asarray(state))
        np.testing.assert_allclose(np.stack(traj), ref, rtol=0, atol=atol)
