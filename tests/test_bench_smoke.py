"""Guard bench.py and __graft_entry__.py against bitrot (tiny CPU shapes)."""
import sys
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def test_bench_build_step_runs_small():
    from bench import build_step

    policy, opt_state, step, loss_eval = build_step(
        jnp.float64, batch_size=8, num_bases=16, num_steps=3, m_drift=8
    )
    p2, opt_state, loss = step(policy, opt_state, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    l = loss_eval(policy, jax.random.PRNGKey(1))
    assert np.isfinite(float(l))


def test_bench_scaling_smoke():
    """The weak-scaling harness emits one JSON point per dp plus a summary
    (tiny shapes; the conftest CPU mesh provides the 8 virtual devices)."""
    import argparse
    import contextlib
    import io
    import json

    from bench import run_scaling

    args = argparse.Namespace(
        scaling_backend="cpu", scaling_devices=8,
        per_device=4, num_bases=16, m_drift=8, reps=1,
        scaling_ensemble=False, scaling_fused_rollout=False,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_scaling(args)
    lines = [json.loads(l) for l in buf.getvalue().splitlines() if l.startswith("{")]
    pts = [l for l in lines if l["metric"] == "pathwise_weak_scaling_point"]
    assert [p["dp"] for p in pts] == [1, 2, 4, 8]
    assert all(np.isfinite(p["loss"]) for p in pts)
    summary = lines[-1]
    assert summary["metric"] == "pathwise_weak_scaling_efficiency"
    assert np.isfinite(summary["value"])


def test_graft_entry_fn():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    mean, cov, cost = out
    assert mean.shape == (1, 4) and cov.shape == (1, 4, 4) and cost.shape == (1,)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in out)


def test_bench_mm_dd_loss_small():
    from bench import build_mm_loss_dd

    policy, pack, vg = build_mm_loss_dd(num_steps=3, m_drift=8, m_policy=4)
    v, g = vg(policy, pack)
    assert np.isfinite(float(v))
    assert all(bool(np.all(np.isfinite(x))) for x in jax.tree.leaves(g))
