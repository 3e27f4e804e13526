"""Loop-level tests: episode plumbing, checkpoint/resume determinism.

The reference validates loops only by running the example experiment (SURVEY.md §4
"Not tested"); these add the loop/solver unit tests the survey calls for.
"""
import math
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from gpflowpilco_tpu.loops.pilco import (
    DriftSpec,
    MomentMatchingPILCO,
    PathwisePILCO,
    PolicySpec,
)


def _tiny_loop(cls, directory=None, seed=5, policy_overrides=None, **kwargs):
    import sys, pathlib

    sys.path.insert(
        0, str(pathlib.Path(__file__).resolve().parents[1] / "examples" / "cartpole_swingup")
    )
    from experiment import build_loop
    import dataclasses

    policy_spec = PolicySpec(
        num_centers=5, step_limit=10, batch_size=8, num_bases=16, num_restarts=2
    )
    if policy_overrides:
        policy_spec = dataclasses.replace(policy_spec, **policy_overrides)
    return build_loop(
        cls,
        directory,
        seed=seed,
        drift_spec=DriftSpec(num_centers=6, max_iters=10, pad_data_multiple=0),
        policy_spec=policy_spec,
        horizon=0.8,  # 8 steps
        validation_samples=2,
        **kwargs,
    )


@pytest.mark.parametrize("cls", [MomentMatchingPILCO, PathwisePILCO])
def test_outer_iteration_runs(cls):
    loop = _tiny_loop(cls)
    loop.step()  # random-policy init episode
    assert len(loop.episodes) == 1
    num_steps = loop.episode_spec.num_steps
    assert loop.episodes[0].states.shape == (num_steps + 1, 4)
    assert loop.episodes[0].actions.shape == (num_steps, 1)
    assert np.all(np.abs(loop.episodes[0].actions) <= 10.0)

    info_d = loop.update_dynamics()
    assert np.isfinite(info_d["loss"])
    info_p = loop.update_policy()
    assert np.isfinite(info_p["loss"])

    ep = loop.step()
    assert len(loop.episodes) == 2
    assert "rewards" in ep.metrics and np.isfinite(ep.metrics["rewards"])
    assert "vReward" in ep.metrics and np.isfinite(ep.metrics["vReward"])


def test_checkpoint_roundtrip_and_deterministic_resume():
    with tempfile.TemporaryDirectory() as tmp:
        # Run A: three episodes straight through
        a = _tiny_loop(MomentMatchingPILCO, seed=9)
        a.step()
        a.update_dynamics()
        a.update_policy()
        a.step()
        a.update_dynamics()
        a.update_policy()
        a.step()

        # Run B: two episodes, checkpoint, restore into C, continue
        b = _tiny_loop(MomentMatchingPILCO, directory=tmp, seed=9)
        b.step()
        b.update_dynamics()
        b.update_policy()
        b.step()
        b.save()

        c = _tiny_loop(MomentMatchingPILCO, directory=tmp, seed=9)
        assert len(c.episodes) == 2
        np.testing.assert_array_equal(c.episodes[1].states, b.episodes[1].states)
        np.testing.assert_allclose(
            np.asarray(c.policy_model.q_mu), np.asarray(b.policy_model.q_mu)
        )

        c.update_dynamics()
        c.update_policy()
        c.step()

        # checkpoint-deterministic resume: C's third episode == A's third episode
        np.testing.assert_allclose(
            c.episodes[2].states, a.episodes[2].states, rtol=1e-8, atol=1e-9
        )


def test_checkpoint_manager_semantics():
    """Numbered checkpoints with last-K retention; restore survives a
    truncated (crash-mid-write) latest file by falling back to the previous
    one (reference model_based_rl.py:97-161 CheckpointManager semantics)."""
    import pathlib

    with tempfile.TemporaryDirectory() as tmp:
        a = _tiny_loop(MomentMatchingPILCO, directory=tmp, seed=9)
        for _ in range(2):
            a.step()
            a.save()
        a.update_dynamics()
        a.update_policy()
        a.step()
        a.save()
        a.step()
        a.save()

        files = sorted(pathlib.Path(tmp).glob("ckpt-*.pkl"))
        # 4 saves, keep=3: the oldest was pruned
        assert [f.name for f in files] == ["ckpt-2.pkl", "ckpt-3.pkl", "ckpt-4.pkl"]
        assert not list(pathlib.Path(tmp).glob("*.tmp"))

        # corrupt the latest (truncate to half): restore must fall back to
        # ckpt-3 and keep going, not crash or lose the run
        latest = pathlib.Path(tmp) / "ckpt-4.pkl"
        data = latest.read_bytes()
        latest.write_bytes(data[: len(data) // 2])

        b = _tiny_loop(MomentMatchingPILCO, directory=tmp, seed=9)
        assert len(b.episodes) == 3  # ckpt-3's state
        np.testing.assert_array_equal(b.episodes[2].states, a.episodes[2].states)

        # schema guard: a future-schema checkpoint raises instead of misreading
        import pickle as _pickle

        with (pathlib.Path(tmp) / "ckpt-9.pkl").open("wb") as f:
            _pickle.dump({"schema": 99, "episodes": []}, f)
        with pytest.raises(ValueError, match="schema"):
            _tiny_loop(MomentMatchingPILCO, directory=tmp, seed=9)


def _tiny_mountain_car_loop(cls, directory=None, seed=5):
    import importlib.util, pathlib

    # load by file path under a unique module name: every example harness is
    # called experiment.py (sys.modules collision, see the dp test below)
    path = (
        pathlib.Path(__file__).resolve().parents[1]
        / "examples" / "mountain_car" / "experiment.py"
    )
    spec = importlib.util.spec_from_file_location("mc_experiment", path)
    mc_experiment = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mc_experiment)

    return mc_experiment.build_loop(
        cls,
        directory,
        seed=seed,
        drift_spec=DriftSpec(num_centers=6, max_iters=10, pad_data_multiple=0),
        policy_spec=PolicySpec(
            num_centers=5, step_limit=10, batch_size=8, num_bases=16,
            num_restarts=2, action_scale=4.0,
        ),
        validation_samples=2,
    )


@pytest.mark.parametrize("cls", [MomentMatchingPILCO, PathwisePILCO])
def test_mountain_car_iteration_runs(cls):
    """The mountain-car harness (no encoder, 2-D state, 1-D force) through a
    full fit-policy-collect iteration — the loop layer is task-agnostic."""
    loop = _tiny_mountain_car_loop(cls)
    loop.step()
    assert len(loop.episodes) == 1
    num_steps = loop.episode_spec.num_steps
    assert loop.episodes[0].states.shape == (num_steps + 1, 2)
    assert loop.episodes[0].actions.shape == (num_steps, 1)
    assert np.all(np.abs(loop.episodes[0].actions) <= 4.0)

    info_d = loop.update_dynamics()
    assert np.isfinite(info_d["loss"])
    info_p = loop.update_policy()
    assert np.isfinite(info_p["loss"])

    ep = loop.step()
    assert len(loop.episodes) == 2
    for k in ("rewards", "eReward", "vReward"):
        assert k in ep.metrics and np.isfinite(ep.metrics[k]), k
    assert "vSuccess" in ep.metrics


def test_mm_mixed_precision_loss_dtype():
    """PolicySpec.loss_dtype=f64 with an f32 loop: the MM rollout loss (and
    eReward/the acting gate) compute in f64, params and optimizer state stay
    f32, gradients flow back f32 — and the f64 loss agrees with the f32 one
    at a loose tolerance on a benign (non-chaotic-yet) state."""
    import jax
    import jax.numpy as jnp

    loop = _tiny_loop(
        MomentMatchingPILCO, seed=13, dtype=jnp.float32,
        policy_overrides={"loss_dtype": jnp.float64},
    )
    loop.step()
    loop.update_dynamics()
    info = loop.update_policy()
    assert np.isfinite(info["loss"])
    # params stayed f32 through the f64-loss optimization
    assert loop.policy_model.q_mu.dtype == jnp.float32

    loss64 = loop.policy_loss_fn(loop.policy_model, jax.random.PRNGKey(0))
    assert loss64.dtype == jnp.float64

    loop.policy_spec = __import__("dataclasses").replace(
        loop.policy_spec, loss_dtype=None
    )
    loss32 = loop.policy_loss_fn(loop.policy_model, jax.random.PRNGKey(0))
    assert loss32.dtype == jnp.float32
    np.testing.assert_allclose(float(loss64), float(loss32), rtol=2e-3)

    ep = loop.step()
    assert np.isfinite(ep.metrics["rewards"])


def test_dynamics_fit_natgrad_adam():
    loop = _tiny_loop(MomentMatchingPILCO, seed=12)
    loop.drift_spec = DriftSpec(
        num_centers=8, max_iters=100, optimizer="natgrad_adam", hyper_lr=0.05
    )
    loop.step()
    info = loop.update_dynamics()
    assert np.isfinite(info["loss"])
    # should reach a sane ELBO on one episode of data
    from gpflowpilco_tpu.models.gp import svgp_elbo

    x, y = loop.get_data_dynamics()
    assert np.isfinite(float(svgp_elbo(loop.drift_model, x, y)))


def test_gpr_dynamics_variant():
    for cls in (MomentMatchingPILCO, PathwisePILCO):
        loop = _tiny_loop(cls, seed=14)
        loop.drift_spec = DriftSpec(model_type="gpr", max_iters=25)
        loop.step()
        info = loop.update_dynamics()
        assert np.isfinite(info["loss"])
        loop.update_policy()
        ep = loop.step()
        assert np.isfinite(ep.metrics["rewards"])


def test_best_policy_snapshot():
    loop = _tiny_loop(MomentMatchingPILCO, seed=21)
    loop.step()
    loop.update_dynamics()
    loop.update_policy()
    loop.step()
    assert loop.best_policy_model is not None
    assert np.isfinite(loop.best_policy_score)
    first_best = loop.best_policy_score
    loop.update_dynamics()
    loop.update_policy()
    ep = loop.step()
    if ep.metrics["fallback"]:
        # the snapshot acted: its score is REFRESHED to the new measurement
        assert loop.best_policy_score == pytest.approx(ep.metrics["vReward"])
    else:
        # the trained policy acted: the snapshot only improves
        assert loop.best_policy_score >= first_best


def test_acting_gate_deploys_snapshot_when_trained_policy_predicts_worse():
    loop = _tiny_loop(MomentMatchingPILCO, seed=21)
    loop.step()
    loop.update_dynamics()
    loop.update_policy()
    loop.step()
    assert loop.best_policy_model is not None
    loop.update_dynamics()
    loop.update_policy()

    # force the gate: an (unbeatable) measured snapshot score means the trained
    # policy's model-predicted reward cannot exceed it, so the snapshot acts
    loop.best_policy_score = 1e6
    ep = loop.step()
    assert ep.metrics["fallback"] is True
    assert loop.acting_model is loop.best_policy_model
    assert loop.acting_model is not loop.policy_model
    # ...and the stale high-water mark was refreshed to the fresh measurement
    assert loop.best_policy_score == pytest.approx(ep.metrics["vReward"])
    assert loop.best_policy_score < 1e6

    # force the other branch: any finite predicted reward beats -1e6
    loop.best_policy_score = -1e6
    ep = loop.step()
    assert ep.metrics["fallback"] is False
    assert loop.acting_model is loop.policy_model


@pytest.mark.parametrize("cls", [MomentMatchingPILCO, PathwisePILCO])
def test_hmc_drift_ensemble_iteration(cls):
    """DriftSpec.optimizer='hmc': a full PILCO iteration with the dynamics
    posterior represented as an HMC hyperparameter ensemble (posterior-averaged
    MM / per-particle hyperparameter draws in pathwise rollouts)."""
    import sys, pathlib

    sys.path.insert(
        0, str(pathlib.Path(__file__).resolve().parents[1] / "examples" / "cartpole_swingup")
    )
    from experiment import build_loop
    from gpflowpilco_tpu.models.gp import GPREnsemble

    loop = build_loop(
        cls,
        None,
        seed=11,
        drift_spec=DriftSpec(
            model_type="gpr", optimizer="hmc", max_iters=15,
            hmc_chains=2, hmc_warmup=10, hmc_samples=10, hmc_leapfrog=4,
            hmc_ensemble=3, pad_data_multiple=0,
            # exercise the ChEES plumb-through on one variant
            hmc_adapt="chees" if cls is PathwisePILCO else "jitter",
        ),
        policy_spec=PolicySpec(num_centers=5, step_limit=8, batch_size=9, num_bases=16, num_restarts=2),
        horizon=0.5,  # 5 steps
        validation_samples=2,
    )
    loop.step()
    info = loop.update_dynamics()
    assert isinstance(loop.drift_model, GPREnsemble)
    assert loop.drift_model.num_members == 3
    assert loop.drift_model.members.x.shape[0] == 3  # stacked leading axis
    assert np.isfinite(info["loss"]) and 0.0 <= info["hmc_accept"] <= 1.0

    info_p = loop.update_policy()
    assert np.isfinite(info_p["loss"])
    ep = loop.step()
    assert len(loop.episodes) == 2
    assert np.isfinite(ep.metrics["rewards"])
    assert np.isfinite(ep.metrics["eReward"])  # loss fn works as a metric too


@pytest.mark.parametrize("cls", [MomentMatchingPILCO, PathwisePILCO])
def test_double_pendulum_lck_iteration(cls):
    """Full PILCO iteration on the double-pendulum task: 2-D torque through an
    LCK (W-mixed) policy and LCK dynamics — the multi-output mixing path no
    other experiment exercises end-to-end."""
    import importlib.util, pathlib

    # load by file path under a unique module name: both example harnesses are
    # called experiment.py, and a bare `import experiment` would return
    # whichever the suite imported first (sys.modules collision)
    path = (
        pathlib.Path(__file__).resolve().parents[1]
        / "examples" / "double_pendulum" / "experiment.py"
    )
    spec = importlib.util.spec_from_file_location("dp_experiment", path)
    dp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dp)

    loop = dp.build_loop(
        cls,
        None,
        seed=7,
        drift_spec=DriftSpec(num_centers=8, max_iters=10, pad_data_multiple=0,
                             coregionalize=True),
        policy_spec=PolicySpec(num_centers=5, step_limit=10, batch_size=8,
                               num_bases=16, num_restarts=2, action_scale=2.0,
                               coregionalize=True),
        horizon=0.6,  # 6 steps
        validation_samples=2,
    )
    loop.step()
    num_steps = loop.episode_spec.num_steps
    assert loop.episodes[0].states.shape == (num_steps + 1, 4)
    assert loop.episodes[0].actions.shape == (num_steps, 2)
    assert np.all(np.abs(loop.episodes[0].actions) <= 2.0)

    info_d = loop.update_dynamics()
    assert loop.drift_model.w is not None and loop.drift_model.w.shape == (4, 4)
    assert np.isfinite(info_d["loss"])
    info_p = loop.update_policy()
    assert loop.policy_model.w is not None and loop.policy_model.w.shape == (2, 2)
    assert np.isfinite(info_p["loss"])

    ep = loop.step()
    assert len(loop.episodes) == 2
    for k in ("rewards", "eReward", "vReward"):
        assert np.isfinite(ep.metrics[k]), (k, ep.metrics)


def test_hmc_requires_gpr():
    loop = _tiny_loop(MomentMatchingPILCO)
    loop.step()
    object.__setattr__(loop, "drift_spec", DriftSpec(optimizer="hmc", model_type="svgp"))
    with pytest.raises(ValueError):
        loop.update_dynamics()


def test_refit_from_incumbent_considers_previous_fit():
    """The second dynamics refit must also optimize from the incumbent's
    parameters and report both candidates (bad-basin from-scratch refits
    collapsed a swing-up run for two episodes; see update_dynamics)."""
    loop = _tiny_loop(MomentMatchingPILCO)
    loop.step()
    info1 = loop.update_dynamics()
    assert info1.get("refit_candidates") == 1  # no incumbent yet
    loop.step()
    info2 = loop.update_dynamics()
    assert info2.get("refit_candidates") == 2
    assert np.isfinite(info2["loss"])
    # disabled -> back to a single candidate
    loop.drift_spec = DriftSpec(
        num_centers=6, max_iters=10, pad_data_multiple=0,
        refit_from_incumbent=False,
    )
    info3 = loop.update_dynamics()
    assert info3.get("refit_candidates") == 1


def test_dynamics_fit_minibatched_adam_matches_lbfgs():
    """DriftSpec.optimizer='adam' (minibatched stochastic ELBO, the reference's
    external-data GradientDescent path, train_utils.py:65-88) reaches an ELBO
    comparable to the L-BFGS full-batch fit on the same data."""
    from gpflowpilco_tpu.models.gp import svgp_elbo

    loop = _tiny_loop(MomentMatchingPILCO, seed=17)
    loop.step()
    x, y = loop.get_data_dynamics()

    loop.drift_spec = DriftSpec(num_centers=6, max_iters=60, pad_data_multiple=0)
    loop.update_dynamics()
    elbo_lbfgs = float(svgp_elbo(loop.drift_model, x, y))

    loop.drift_model = None  # force re-initialization for the adam fit
    loop.drift_spec = DriftSpec(
        num_centers=6, max_iters=800, optimizer="adam", adam_lr=0.03,
        batch_size=64, pad_data_multiple=0,
    )
    info = loop.update_dynamics()
    assert np.isfinite(info["loss"])
    elbo_adam = float(svgp_elbo(loop.drift_model, x, y))

    assert np.isfinite(elbo_lbfgs) and np.isfinite(elbo_adam)
    # stochastic-batch Adam should land within a few nats per datum of L-BFGS
    n = x.shape[0]
    assert elbo_adam >= elbo_lbfgs - 3.0 * n, (elbo_adam, elbo_lbfgs)


def test_loop_callbacks_fire():
    """Registered step/unroll hooks (reference loops/core.py:50-70, 84-94) fire
    with (loop, episode) / (loop, states, actions)."""
    loop = _tiny_loop(MomentMatchingPILCO, seed=23)
    seen = {"step": [], "unroll": []}
    loop.step_callbacks.append(lambda lp, ep: seen["step"].append((lp, ep)))
    loop.unroll_callbacks.append(
        lambda lp, states, actions: seen["unroll"].append((states.shape, actions.shape))
    )
    ep = loop.step()
    assert len(seen["step"]) == 1 and len(seen["unroll"]) == 1
    assert seen["step"][0][0] is loop and seen["step"][0][1] is ep
    t = loop.episode_spec.num_steps
    assert seen["unroll"][0] == ((t + 1, 4), (t, 1))


def test_pessimistic_refit_noise_floor():
    """The optimism guard (DriftSpec.optimism_tolerance) floors the refit's
    likelihood noise at the incumbent's held-out episode MSE when eReward
    overshot the realized reward — and stays inert otherwise."""
    import dataclasses

    loop = _tiny_loop(MomentMatchingPILCO, seed=31)
    loop.drift_spec = dataclasses.replace(
        loop.drift_spec, optimism_tolerance=1.0, optimism_noise_mult=2.0
    )
    loop.step()
    info0 = loop.update_dynamics()
    assert "pessimistic" not in info0  # no metrics yet -> guard inert
    loop.update_policy()
    loop.step()

    # forge an optimistic episode: model-predicted reward far above realized
    m = dict(loop.episodes[-1].metrics)
    m["eReward"] = float(m["rewards"]) + 50.0
    loop.episodes[-1] = loop.episodes[-1]._replace(metrics=m)

    prev = loop.drift_model
    floor = loop._optimism_noise_floor(prev)
    assert floor is not None and np.all(np.asarray(floor) > 0)
    info = loop.update_dynamics()
    assert info.get("pessimistic") is True
    fitted_noise = np.asarray(loop.drift_model.noise_variance)
    assert np.all(fitted_noise >= float(np.mean(np.asarray(floor))) - 1e-6)

    # non-optimistic episode -> no floor
    m2 = dict(loop.episodes[-1].metrics)
    m2["eReward"] = float(m2["rewards"])
    loop.episodes[-1] = loop.episodes[-1]._replace(metrics=m2)
    assert loop._optimism_noise_floor(loop.drift_model) is None
