#!/bin/bash
# Round-2 session-4 serialized TPU job queue. One job at a time on the single
# chip; 20 s settle between jobs so a killed predecessor's pool claim clears.
set -u
cd /root/repo
LOG=/tmp/queue_r2s4
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

# 1. fused-match on-chip validation probe (truth on CPU first)
run probe_truth 1200 env JAX_PLATFORMS=cpu python scripts/tpu_fused_match_probe.py --truth
run probe_tpu 1800 python -m gpflowpilco_tpu.utils.launch --stall-timeout 900 --max-restarts 2 -- \
    python scripts/tpu_fused_match_probe.py

# 2. bench (headline pathwise step + whole-match MM variant)
run bench 2400 python -m gpflowpilco_tpu.utils.launch --stall-timeout 1200 --max-restarts 2 -- \
    python bench.py

# 3. cartpole MM evidence rerun: seed 3, all robustness fixes, fused-match
run mm_evidence 5400 python -m gpflowpilco_tpu.utils.launch --stall-timeout 1500 --max-restarts 2 -- \
    python examples/cartpole_swingup/run_tpu_full.py --variant mm --fused-match \
    --dest /tmp/swingup_mm_r2s4 --seed 3 --episodes 10

# 4. pathwise evidence rerun (fused path-eval kernels)
run pw_evidence 5400 python -m gpflowpilco_tpu.utils.launch --stall-timeout 1500 --max-restarts 2 -- \
    python examples/cartpole_swingup/run_tpu_full.py --variant pathwise --fused \
    --dest /tmp/swingup_pw_r2s4 --seed 3 --episodes 10

echo "=== [$(date +%H:%M:%S)] queue complete ===" | tee -a "$LOG/queue.log"
