#!/bin/bash
# Round-3b serialized TPU job queue: close the MM-on-chip gap with the
# validated mixed-precision lever (f64 carry + f64 drift match, f32 policy
# island — PolicySpec.loss_dtype=f64 + loss_policy_f32; see
# docs/perf_notes.md "MM f32 precision — root cause found").
#
# One job at a time on the single chip; 20 s settle between jobs. The x64
# mixed graphs compile slowly through the remote tunnel (>9 min for the bare
# loss+grad) — the persistent cache at /root/.jax_cache makes launcher
# restarts resume where the last compile left off, so stall-timeouts are set
# high and restarts generous.
set -u
cd /root/repo
LOG=/tmp/queue_r3b
mkdir -p "$LOG"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] start $name ===" | tee -a "$LOG/queue.log"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] done $name rc=$rc ===" | tee -a "$LOG/queue.log"
  sleep 20
  return $rc
}

# 1. probe rerun against the FIXED truth (bench.build_mm_loss now builds
#    params at f32 and casts — the old f64 truth was a different model).
#    Truth must be regenerated on CPU first.
if run probe_truth 1200 env JAX_PLATFORMS=cpu python scripts/tpu_fused_match_probe.py --truth; then
  run probe_tpu 1800 python -m gpflowpilco_tpu.utils.launch --stall-timeout 900 --max-restarts 2 -- \
      python scripts/tpu_fused_match_probe.py
else
  echo "probe_truth FAILED - skipping probe_tpu" | tee -a "$LOG/queue.log"
fi

# 2. MM evidence with the island'd mixed-precision loss, SAME reduced recipe
#    as the f32 control that plateaued (M=64, 2000 steps): if the gradient
#    quality was the gap, this solves like the CPU-f64 run did (ep 5-6).
run mm_island 19800 python -m gpflowpilco_tpu.utils.launch --stall-timeout 2400 --max-restarts 4 -- \
    python examples/cartpole_swingup/run_tpu_full.py --variant mm --mm-loss-f64 --mm-unroll 1 \
    --num-centers 64 --step-limit 2000 \
    --dest /tmp/swingup_mm_island_r3 --seed 3 --episodes 10

echo "=== [$(date +%H:%M:%S)] queue r3b complete ===" | tee -a "$LOG/queue.log"
