"""Training-driver tests: Adam/L-BFGS on pytrees, SVGP fit, initializers, priors."""
import jax
import jax.numpy as jnp
import numpy as np

from gpflowpilco_tpu.models.gp import SVGP, svgp_elbo, svgp_predict_f
from gpflowpilco_tpu.models.initializers import (
    inducing_points_kmeans,
    lengthscales_median,
    replace_duplicates,
)
from gpflowpilco_tpu.models.kernels import RBF
from gpflowpilco_tpu.models.priors import pilco_snr_penalty
from gpflowpilco_tpu.utils import bijectors as bij
from gpflowpilco_tpu.utils.optimizers import (
    adam_minimize,
    lbfgs_minimize,
    make_policy_schedule,
)
from gpflowpilco_tpu.utils.trees import mask_from_names, partition, combine

from .utils import TestConfig


def test_adam_minimize_quadratic():
    params = {"a": jnp.asarray([3.0, -2.0]), "b": jnp.asarray(5.0)}

    def loss(p):
        return jnp.sum(p["a"] ** 2) + (p["b"] - 1.0) ** 2

    out, losses, _ = adam_minimize(loss, params, num_steps=500, learning_rate=0.1,
                                   global_clipnorm=None)
    assert losses[-1] < 1e-3
    np.testing.assert_allclose(np.asarray(out["b"]), 1.0, atol=1e-2)


def test_adam_respects_mask():
    params = {"a": jnp.asarray([3.0]), "b": jnp.asarray(5.0)}

    def loss(p):
        return jnp.sum(p["a"] ** 2) + (p["b"] - 1.0) ** 2

    mask = {"a": True, "b": False}
    out, _, _ = adam_minimize(loss, params, num_steps=200, learning_rate=0.1, mask=mask,
                              global_clipnorm=None)
    assert abs(float(out["b"]) - 5.0) < 1e-12  # frozen
    assert abs(float(out["a"][0])) < 1e-2


def test_lbfgs_rosenbrock():
    def loss(p):
        x, y = p
        return (1 - x) ** 2 + 100.0 * (y - x**2) ** 2

    out, final_loss, iters = lbfgs_minimize(
        loss, (jnp.asarray(-1.2), jnp.asarray(1.0)), max_iters=200
    )
    assert float(final_loss) < 1e-10
    np.testing.assert_allclose(float(out[0]), 1.0, atol=1e-4)


def test_svgp_fit_lbfgs_learns_function():
    config = TestConfig(seed=99)
    n, d = 120, 2
    x = jax.random.uniform(config.next_key(), (n, d), dtype=config.dtype, minval=-2, maxval=2)
    y = jnp.sin(x[:, :1]) * jnp.cos(x[:, 1:]) + 0.05 * jax.random.normal(
        config.next_key(), (n, 1), dtype=config.dtype
    )

    m, num_latent = 20, 1
    z0 = inducing_points_kmeans(np.asarray(x), m)
    model = SVGP(
        kernel=RBF.create(jnp.ones(num_latent), jnp.stack([lengthscales_median(x)])),
        z=jnp.asarray(z0)[None],
        q_mu=jnp.zeros((m, num_latent)),
        q_sqrt=jnp.eye(m)[None],
        mean_const=jnp.zeros(num_latent),
        raw_noise=bij.positive_inv(jnp.asarray(0.1)),
        w=None,
        whiten=True,
    )

    def loss(p):
        return -(svgp_elbo(p, x, y) + pilco_snr_penalty(p))

    fitted, final_loss, iters = lbfgs_minimize(loss, model, max_iters=300, tol=1e-4)
    mean, var = svgp_predict_f(fitted, x)
    rmse = float(jnp.sqrt(jnp.mean((mean - y) ** 2)))
    assert rmse < 0.12, rmse
    assert float(fitted.noise_variance) < 0.05
    assert int(iters) > 3


def test_mask_from_names_and_partition():
    model_like = {"kernel": {"raw_variance": jnp.ones(2)}, "z": jnp.ones((2, 3))}
    mask = mask_from_names(model_like, lambda name: "z" not in name)
    train, frozen = partition(model_like, mask)
    assert train["z"] is None and frozen["kernel"]["raw_variance"] is None
    back = combine(train, frozen)
    np.testing.assert_array_equal(np.asarray(back["z"]), np.ones((2, 3)))


def test_kmeans_and_duplicates():
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(0, 0.1, (50, 2)), rng.normal(3, 0.1, (50, 2))])
    centers = inducing_points_kmeans(x, 2)
    centers = centers[np.argsort(centers[:, 0])]
    np.testing.assert_allclose(centers[0], [0, 0], atol=0.15)
    np.testing.assert_allclose(centers[1], [3, 3], atol=0.15)

    # exact duplicates get perturbed apart (perturbation scale ~1e-3..2e-2 only
    # decorrelates at fine lengthscales — same schedule as the reference)
    pts = np.asarray([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]])
    fixed = replace_duplicates(pts, 1.0, np.asarray([0.005, 0.005]), tol=0.99)
    d01 = np.linalg.norm(fixed[0] - fixed[1])
    assert d01 > 1e-4
    corr = np.exp(-0.5 * np.sum(((fixed[0] - fixed[1]) / 0.005) ** 2))
    assert corr < 0.99


def test_policy_schedule_drops_twice():
    sched = make_policy_schedule(step_limit=3000, initial_lr=0.01)
    assert abs(float(sched(0)) - 0.01) < 1e-12
    assert abs(float(sched(1500)) - 0.001) < 1e-12
    assert abs(float(sched(2500)) - 0.0001) < 1e-12


def test_natgrad_one_step_optimal_gaussian_likelihood():
    """Conjugate case: one natural-gradient step with gamma=1 reaches the exact
    optimal q(u); a second step changes nothing."""
    from gpflowpilco_tpu.models.natgrad import natgrad_step

    config = TestConfig(seed=31)
    n, d, m = 60, 2, 12
    x = jax.random.uniform(config.next_key(), (n, d), dtype=config.dtype, minval=-2, maxval=2)
    y = jnp.sin(x[:, :1]) + 0.1 * jax.random.normal(config.next_key(), (n, 1), config.dtype)

    z0 = inducing_points_kmeans(np.asarray(x), m)
    for whiten in (True, False):
        model = SVGP(
            kernel=RBF.create(jnp.ones(1), jnp.stack([lengthscales_median(x)])),
            z=jnp.asarray(z0)[None],
            q_mu=jnp.zeros((m, 1)),
            q_sqrt=jnp.eye(m)[None],
            mean_const=jnp.zeros(1),
            raw_noise=bij.positive_inv(jnp.asarray(0.05)),
            w=None,
            whiten=whiten,
        )
        e0 = float(svgp_elbo(model, x, y))
        m1 = natgrad_step(model, x, y, gamma=1.0)
        e1 = float(svgp_elbo(m1, x, y))
        m2 = natgrad_step(m1, x, y, gamma=1.0)
        e2 = float(svgp_elbo(m2, x, y))
        assert e1 > e0 + 1.0, (whiten, e0, e1)
        assert abs(e2 - e1) < 1e-6 * max(1.0, abs(e1)), (whiten, e1, e2)


def test_module_summary_renders():
    from gpflowpilco_tpu.utils.summary import PhaseTimer, module_summary

    tree = {"kernel": {"raw_variance": jnp.ones(2)}, "z": jnp.zeros((2, 3))}
    text = module_summary(tree, name="m")
    assert "raw_variance" in text and "(2, 3)" in text

    timer = PhaseTimer()
    with timer.phase("fit"):
        pass
    assert "fit=" in timer.summary()


def test_shared_kernel_svgp_ties_hyperparameters():
    """SharedIndependent variant (reference gpflow SharedIndependent,
    priors.py:22-40): one hyperparameter set drives all latents; predictions
    match a SeparateIndependent model built with identical per-latent values,
    and gradients accumulate onto the single shared parameter."""
    from gpflowpilco_tpu.models.builders import build_svgp
    from gpflowpilco_tpu.models.kernels import SharedRBF

    config = TestConfig(seed=77)
    key = config.next_key()
    x = np.asarray(jax.random.normal(key, (40, 3), dtype=config.dtype))
    y = np.asarray(jax.random.normal(config.next_key(), (40, 2), dtype=config.dtype))

    shared = build_svgp(x, y, num_inducing=8, key=config.next_key(), shared_kernel=True)
    assert isinstance(shared.kernel, SharedRBF)
    assert shared.kernel.raw_variance.shape == ()
    assert shared.kernel.raw_lengthscales.shape == (3,)
    # public properties broadcast to the latent axis
    assert shared.kernel.variance.shape == (2,)
    assert shared.kernel.lengthscales.shape == (2, 3)

    separate = build_svgp(x, y, num_inducing=8, key=config.next_key())
    # same init values (median heuristic), same inducing k-means seed semantics
    sep_same = jax.tree.map(lambda a: a, separate)
    xs = jnp.asarray(x)

    mu_s, var_s = svgp_predict_f(shared, xs)
    # a separate model with the shared model's broadcast params predicts identically
    from dataclasses import replace
    sep_matched = replace(
        sep_same,
        kernel=RBF.create(shared.kernel.variance, shared.kernel.lengthscales),
        z=shared.z, q_mu=shared.q_mu, q_sqrt=shared.q_sqrt,
        mean_const=shared.mean_const, raw_noise=shared.raw_noise,
    )
    mu_p, var_p = svgp_predict_f(sep_matched, xs)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_p), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_p), rtol=1e-9)

    # gradient of the ELBO w.r.t. the single shared raw_variance is a scalar and
    # equals the sum of per-latent grads of the matched separate model
    ys = jnp.asarray(y)
    g_shared = jax.grad(lambda m: svgp_elbo(m, xs, ys))(shared)
    assert g_shared.kernel.raw_variance.shape == ()
    g_sep = jax.grad(lambda m: svgp_elbo(m, xs, ys))(sep_matched)
    np.testing.assert_allclose(
        float(g_shared.kernel.raw_variance),
        float(jnp.sum(g_sep.kernel.raw_variance)),
        rtol=1e-8,
    )

    # moment matching works through the shared kernel too
    from gpflowpilco_tpu.moment_matching.gp import match_svgp
    from gpflowpilco_tpu.moments import GaussianMoments

    mx = jnp.zeros((1, 3), config.dtype)
    sxx = 0.1 * jnp.eye(3, dtype=config.dtype)[None]
    match_s = match_svgp(shared, GaussianMoments(mean=mx, cov=sxx))
    match_p = match_svgp(sep_matched, GaussianMoments(mean=mx, cov=sxx))
    np.testing.assert_allclose(
        np.asarray(match_s.y.mean), np.asarray(match_p.y.mean), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(match_s.y.cov), np.asarray(match_p.y.cov), rtol=1e-9, atol=1e-12
    )


def test_svgp_fit_minibatched_adam_matches_lbfgs():
    """Minibatched stochastic-ELBO path (reference train_utils.py:65-88):
    with-replacement batches + traced num_data scale must reach the same fit
    quality as full-batch L-BFGS on the toy regression task."""
    config = TestConfig(seed=99)  # same data as the L-BFGS test
    n, d = 120, 2
    x = jax.random.uniform(config.next_key(), (n, d), dtype=config.dtype, minval=-2, maxval=2)
    y = jnp.sin(x[:, :1]) * jnp.cos(x[:, 1:]) + 0.05 * jax.random.normal(
        config.next_key(), (n, 1), dtype=config.dtype
    )

    m, num_latent = 20, 1
    z0 = inducing_points_kmeans(np.asarray(x), m)
    model = SVGP(
        kernel=RBF.create(jnp.ones(num_latent), jnp.stack([lengthscales_median(x)])),
        z=jnp.asarray(z0)[None],
        q_mu=jnp.zeros((m, num_latent)),
        q_sqrt=jnp.eye(m)[None],
        mean_const=jnp.zeros(num_latent),
        raw_noise=bij.positive_inv(jnp.asarray(0.1)),
        w=None,
        whiten=True,
    )

    from gpflowpilco_tpu.models.gp import svgp_elbo as elbo

    batch = 32
    n_real = jnp.asarray(n)

    def minibatch_loss(p, step_key, xp, yp, nn):
        idx = jax.random.randint(step_key, (batch,), 0, nn)
        return -(elbo(p, xp[idx], yp[idx], num_data=nn) + pilco_snr_penalty(p))

    fitted, losses, _ = adam_minimize(
        minibatch_loss, model, num_steps=1500, learning_rate=0.01,
        global_clipnorm=None, key=config.next_key(), loss_args=(x, y, n_real),
    )
    mean, _ = svgp_predict_f(fitted, x)
    rmse = float(jnp.sqrt(jnp.mean((mean - y) ** 2)))
    assert rmse < 0.15, rmse
    assert float(fitted.noise_variance) < 0.08


def test_padded_inducing_bucket():
    """pad_inducing_multiple rounds M up to a shape bucket with jittered-resample
    inducing points (compile hygiene: M shapes every downstream executable)."""
    from gpflowpilco_tpu.models.builders import build_svgp
    from gpflowpilco_tpu.models.gp import svgp_elbo, svgp_predict_f

    config = TestConfig(seed=31)
    x = np.asarray(jax.random.normal(config.next_key(), (30, 4), dtype=config.dtype))
    y = np.asarray(jax.random.normal(config.next_key(), (30, 2), dtype=config.dtype))

    m = build_svgp(x, y, num_inducing=240, key=config.next_key(),
                   pad_inducing_multiple=120)
    assert m.num_inducing == 120  # 30 -> next multiple of 120
    # padded points are distinct enough for a healthy Kuu
    elbo = svgp_elbo(m, jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(elbo))
    mu, var = svgp_predict_f(m, jnp.asarray(x))
    assert np.all(np.isfinite(np.asarray(mu))) and np.all(np.asarray(var) > 0)

    # cap at num_inducing
    m2 = build_svgp(x, y, num_inducing=64, key=config.next_key(),
                    pad_inducing_multiple=120)
    assert m2.num_inducing == 64


def test_adam_multistart_chunking_invariant():
    """Chunk boundaries are pure dispatch boundaries: the K-candidate lock-step
    run must produce identical trajectories regardless of chunk_size (the
    chunking exists to bound on-device dispatch duration — the monolithic
    program crashed the tunneled TPU worker on the double-pendulum workload)."""
    from gpflowpilco_tpu.utils.optimizers import adam_minimize_multistart

    k_cand = 3
    stacked = {
        "a": jnp.stack([jnp.asarray([3.0, -2.0]) + i for i in range(k_cand)]),
        "b": jnp.stack([jnp.asarray(5.0) - i for i in range(k_cand)]),
    }
    keys = jax.random.split(jax.random.PRNGKey(0), k_cand)

    def loss(p, key):
        # key-dependent term exercises the per-step key folding
        noise = 1e-3 * jax.random.normal(key, ())
        return jnp.sum(p["a"] ** 2) + (p["b"] - 1.0) ** 2 + noise

    def run(chunk):
        return adam_minimize_multistart(
            loss, stacked, keys, num_steps=53,
            schedule=make_policy_schedule(53, 0.05),
            global_clipnorm=1.0, mask=None, chunk_size=chunk,
        )

    f_small, l_small, traces_small, nf_small = run(7)
    f_big, l_big, traces_big, _ = run(1000)
    np.testing.assert_array_equal(np.asarray(traces_small), np.asarray(traces_big))
    np.testing.assert_array_equal(np.asarray(l_small), np.asarray(l_big))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        f_small, f_big,
    )
    assert np.asarray(traces_small).shape == (k_cand, 53)
    # candidates actually differ (per-candidate clipping/optimizer state)
    assert len({float(x) for x in np.asarray(l_small)}) > 1
    assert nf_small == 0


def test_per_output_noise_recovers_disparate_scales():
    """A shared scalar noise floor rises to the largest output's residual scale
    and erases smaller outputs' signal; per-output noise (builders
    per_output_noise=True) must recover both dims. (No reference counterpart:
    gpflow's Gaussian likelihood is scalar — this failure mode is what broke
    the double-pendulum dynamics fit at dt=0.05.)"""
    from gpflowpilco_tpu.models.builders import build_svgp, dynamics_mask

    config = TestConfig(seed=17)
    n, d = 200, 2
    x = jax.random.uniform(
        config.next_key(), (n, d), dtype=config.dtype, minval=-2, maxval=2
    )
    noise = jax.random.normal(config.next_key(), (n, 2), dtype=config.dtype)
    # output scales differ by ~100x, true noise stds 0.005 / 0.5
    y = jnp.stack(
        [
            0.05 * jnp.sin(2.0 * x[:, 0]) + 0.005 * noise[:, 0],
            5.0 * jnp.cos(x[:, 1]) + 0.5 * noise[:, 1],
        ],
        axis=-1,
    )

    def fit(per_out):
        model = build_svgp(
            np.asarray(x), np.asarray(y), num_inducing=24,
            key=jax.random.PRNGKey(0), per_output_noise=per_out,
            noise_variance=0.1,
        )
        mask = dynamics_mask(model, freeze_inducing=False)

        def loss(p):
            return -(svgp_elbo(p, x, y) + pilco_snr_penalty(p))

        # disparate output scales slow L-BFGS; 400 iters leaves the small
        # dim's lengthscales unconverged, 1500 recovers the truth
        fitted, _, _ = lbfgs_minimize(loss, model, max_iters=1500, mask=mask)
        mean, _ = svgp_predict_f(fitted, x)
        return fitted, np.sqrt(np.mean((np.asarray(mean - y)) ** 2, axis=0))

    fitted, rmse_per = fit(True)
    noise_fitted = np.atleast_1d(np.asarray(fitted.noise_variance))
    assert noise_fitted.shape == (2,)
    # each output's noise lands near its own truth, orders of magnitude apart
    assert noise_fitted[0] < 1e-3, noise_fitted
    assert 0.05 < noise_fitted[1] < 1.0, noise_fitted
    # the small-scale dim is genuinely learned (signal std is 0.035)
    assert rmse_per[0] < 0.012, rmse_per

    _, rmse_shared = fit(False)
    # the shared-noise fit cannot see the small dim's signal
    assert rmse_per[0] < 0.5 * rmse_shared[0], (rmse_per, rmse_shared)


def test_adam_multistart_returns_best_seen_not_final():
    """A late learning-rate explosion throws the iterate away from the optimum;
    the driver must return the best-seen parameters/loss, not the final step's
    (final-point selection let policy updates end worse than their incumbent
    start — the episode-level collapse mode)."""
    import optax
    from gpflowpilco_tpu.utils.optimizers import adam_minimize_multistart

    def loss_fn(p, key):
        return (p["x"] - 1.0) ** 2

    stacked = {"x": jnp.asarray([0.0, 3.0])}
    schedule = optax.piecewise_constant_schedule(0.05, {60: 2000.0})  # explode late
    bests, best_losses, traces, _ = adam_minimize_multistart(
        loss_fn, stacked, jax.random.split(jax.random.PRNGKey(0), 2),
        num_steps=100, schedule=schedule, global_clipnorm=None, mask=None,
        chunk_size=30,
    )
    traces = np.asarray(traces)
    # the explosion made the final loss much worse than the best seen
    assert traces[:, -1].min() > 1e2 * np.asarray(best_losses).max()
    np.testing.assert_allclose(np.asarray(best_losses), traces.min(axis=1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bests["x"]), 1.0, atol=0.2)


def test_lengthscale_floor_constrains_fit_bounds():
    """DriftSpec.ls_low/ls_high reach the kernel constraint: lengthscales of a
    freshly built model and of any optimized raw value stay inside the
    interval, and the floor actually binds (a raw value driven to -inf maps to
    ls_low, the double-pendulum theta2-dot underfit guard)."""
    from gpflowpilco_tpu.models.builders import build_gpr, build_svgp

    config = TestConfig(seed=5)
    x = np.asarray(jax.random.normal(config.next_key(), (30, 4), config.dtype))
    y = np.asarray(jax.random.normal(config.next_key(), (30, 2), config.dtype))

    m = build_svgp(x, y, num_inducing=8, key=config.next_key(),
                   ls_low=0.25, ls_high=10.0)
    ls = m.kernel.lengthscales
    assert float(ls.min()) >= 0.25 and float(ls.max()) <= 10.0
    # the floor binds: an optimizer pushing raw -> -inf lands on ls_low
    import dataclasses
    pinned = dataclasses.replace(
        m.kernel, raw_lengthscales=jnp.full_like(m.kernel.raw_lengthscales, -50.0)
    )
    np.testing.assert_allclose(np.asarray(pinned.lengthscales), 0.25, rtol=1e-6)

    g = build_gpr(x, y, ls_low=0.5, ls_high=2.0)
    ls_g = g.kernel.lengthscales
    assert float(ls_g.min()) >= 0.5 and float(ls_g.max()) <= 2.0


def test_lengthscale_init_not_saturated_at_raised_floor():
    """Dense data whose median pairwise distance falls BELOW a raised ls_low
    must initialize strictly inside the interval (1.1*ls_low), not inverted
    through the constraint's clip to a raw value where d(ls)/d(raw) ~ 1e-10 —
    a numerically frozen, untrainable lengthscale (ADVICE round-2 medium)."""
    from gpflowpilco_tpu.models.builders import build_gpr, build_svgp

    config = TestConfig(seed=7)
    # median pairwise distance ~ 0.02*sqrt(2*4) << ls_low = 0.1
    x = 0.02 * np.asarray(
        jax.random.normal(config.next_key(), (40, 4), config.dtype)
    )
    y = np.asarray(jax.random.normal(config.next_key(), (40, 2), config.dtype))

    m = build_svgp(x, y, num_inducing=8, key=config.next_key(),
                   ls_low=0.1, ls_high=100.0)
    raw = np.asarray(m.kernel.raw_lengthscales)
    assert np.all(np.abs(raw) < 10.0), raw  # not pinned at the boundary
    assert float(m.kernel.lengthscales.min()) >= 1.1 * 0.1 - 1e-6

    g = build_gpr(x, y, ls_low=0.1, ls_high=100.0)
    raw_g = np.asarray(g.kernel.raw_lengthscales)
    assert np.all(np.abs(raw_g) < 10.0), raw_g
    assert float(g.kernel.lengthscales.min()) >= 1.1 * 0.1 - 1e-6
