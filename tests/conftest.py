"""Test env: CPU backend with 8 virtual devices, float64 enabled for MC parity.

The session environment registers an axon (remote TPU tunnel) PJRT plugin from
``sitecustomize`` at interpreter startup and pins ``jax_platforms=axon``. Backends
initialize lazily, so flipping the config here (before any computation) moves all
tests onto the local CPU with 8 virtual devices for sharding tests.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = _flags
# NOTE (round 4): the XLA:CPU fusion pass is hostile to double-float code —
# LLVM reassociates EFT chains inside fused kernels (collapsing ops/dd.py
# compensation terms to f32) and duplicates expensive producers into
# multi-consumer reductions (minutes of recompute on an M=8 dd grid). dd
# computations therefore carry jit(compiler_options=...) via
# ops.dd.eft_compiler_options() / dd.jit — scoped per-computation, because
# disabling fusion GLOBALLY segfaults Pallas interpret tests. The dd tests
# are the canary; TPU codegen is verified by scripts/dd_tpu_probe.py.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

# Two-tier suite (README "Testing"): the names below are the measured >13 s
# tests (serial 4-CPU run, round 3) — large-sample MC-parity estimators,
# multi-iteration loop tests, and interpret-mode Pallas parity. Marked here
# centrally (one list, no per-file decoration) so `pytest -m "not slow"` is a
# <5-minute pre-commit tier while the default run stays the full correctness
# bar. Parametrized variants inherit the mark via the base name.
_SLOW_TESTS = {
    "test_dd_svgp_match_parity_f64",
    "test_dd_match_grad_through_moments",
    "test_dd_rollout_loss_matches_f64_island",
    "test_dd_rollout_trains_end_to_end",
    "test_full_dd_policy_chain_matches_f64_island",
    "test_bench_mm_dd_loss_small",
    "test_hmc_gpr_hyperposterior_smoke",
    "test_whole_match_in_loop_interpret",
    "test_checkpoint_roundtrip_and_deterministic_resume",
    "test_checkpoint_manager_semantics",
    "test_acting_gate_deploys_snapshot_when_trained_policy_predicts_worse",
    "test_best_policy_snapshot",
    "test_mm_mixed_precision_loss_dtype",
    "test_fused_glue_psd_and_euler",
    "test_fused_gpr_match_parity_and_grads",
    "test_fused_match_gradients",
    "test_hmc_drift_ensemble_iteration",
    "test_outer_iteration_runs",
    "test_mountain_car_iteration_runs",
    "test_gpr_dynamics_variant",
    "test_double_pendulum_lck_iteration",
    "test_whole_match_full_gradients",
    "test_whole_match_rollout_loss_parity",
    "test_whole_match_frozen_gradients",
    "test_fused_match_parity",
    "test_fused_match_vmapped",
    "test_moment_matching_svgp_multioutput_lck",
    "test_moment_matching_svgp_single_output",
    "test_moment_matching_gpr",
    "test_match_svgp_diag_path_consistency",
    "test_shared_kernel_svgp_ties_hyperparameters",
    "test_gpr_whole_match_parity_and_grads",
    "test_gpr_whole_match_ensemble_vmap",
    "test_per_output_noise_recovers_disparate_scales",
    "test_fused_encoder_match_parity_and_grads",
    "test_forward_moments_gp_drift_tracks_mc",
    "test_natgrad_one_step_optimal_gaussian_likelihood",
    "test_fused_vmap_multistart_lck_interpret",
    "test_two_process_pathwise_train_step_and_hmc",
    "test_squashed_policy_chain_moments",
    "test_fused_vjp_matches_reference_interpret",
    "test_pathwise_svgp_matches_posterior",
    "test_sharded_fused_loss_matches_unsharded",
    "test_kernel_expectations_mc_parity",
    "test_refit_from_incumbent_considers_previous_fit",
    "test_padded_inducing_bucket",
    "test_bench_scaling_smoke",
    # round 4: restore the <5-min fast-tier budget (VERDICT r3 #7). The
    # whole-rollout kernel is FROZEN and off-by-default (perf_notes round 4),
    # so its 9 interpret/lowering tests (16-25 s each) move behind `slow`;
    # plus the measured >12 s multi-iteration-loop / MC-parity stragglers.
    "test_pessimistic_refit_noise_floor",
    "test_rollout_kernel_lowers_for_tpu",
    "test_loop_fused_rollout_hmc_ensemble",
    "test_loop_fused_rollout_parity_and_update",
    "test_lck_reference_matches_unfused",
    "test_lck_interpret_kernel_and_gradients",
    "test_policy_gradients_match",
    "test_reference_matches_unfused",
    "test_gpr_drift_fused_matches_unfused",
    "test_sharded_fused_rollout_matches_dp1_loss_and_grad",
    "test_whole_match_parity",
    "test_dynamics_fit_natgrad_adam",
    "test_multioutput_stacks_match_singleoutput",
    "test_fused_vjp_frozen_paths_dx_only_interpret",
    "test_svgp_fit_lbfgs_learns_function",
    "test_pathwise_gpr_matches_posterior",
    "test_gpr_match_finite_at_tiny_noise_f32",
    "test_squashed_probit_collapses_chain",
    "test_probit_rule_gradients_finite_at_saturation",
    "test_deterministic_match_drops_uncertainty",
    "test_dynamics_fit_minibatched_adam_matches_lbfgs",
    "test_pathwise_svgp_whitened_matches_posterior",
    "test_cartpole_matches_scipy",
    "test_double_pendulum_matches_scipy",
    "test_paths_are_deterministic_functions",
    "test_stall_triggers_restart_then_success",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
