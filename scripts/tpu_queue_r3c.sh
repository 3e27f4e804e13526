#!/bin/bash
# Round-3c follow-on TPU queue: waits for the mm_island evidence run to
# release the single chip (marker line in /tmp/queue_r3c/queue.log), then
# serially runs (1) the fused-match probe against the regenerated truth
# (floor 0.95, ROADMAP r3b item 1) and (2) the whole-rollout kernel timing
# probe at the LCK / HMC-GPR production shapes (ROADMAP "on-chip timing").
# One TPU job at a time; 30 s settle between jobs (tunnel re-claim).
set -u
cd /root/repo
LOG=/tmp/queue_r3c
mkdir -p "$LOG"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] start $name ===" | tee -a "$LOG/queue.log"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] done $name rc=$rc ===" | tee -a "$LOG/queue.log"
  sleep 30
  return $rc
}

# wait for mm_island to drain (it was launched separately with its own
# timeout, so this always terminates)
while ! grep -q "done mm_island" "$LOG/queue.log" 2>/dev/null; do sleep 60; done
sleep 30

if [ -f /tmp/fused_match_truth.npz ]; then
  run probe_tpu 2400 python -m gpflowpilco_tpu.utils.launch --stall-timeout 900 --max-restarts 2 -- \
      python scripts/tpu_fused_match_probe.py
else
  echo "no truth file - skipping probe_tpu" | tee -a "$LOG/queue.log"
fi

run rollout_probe 3600 python -m gpflowpilco_tpu.utils.launch --stall-timeout 1200 --max-restarts 2 -- \
    python scripts/rollout_kernel_probe.py

echo "=== [$(date +%H:%M:%S)] queue r3c complete ===" | tee -a "$LOG/queue.log"
