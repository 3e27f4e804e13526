#!/bin/bash
# Round-3 serialized TPU job queue. One job at a time on the single chip;
# 20 s settle between jobs so a killed predecessor's pool claim clears.
# Dependents are gated on predecessor rc (ADVICE r2: don't burn hours of chip
# time after a failed validation stage).
set -u
cd /root/repo
LOG=/tmp/queue_r3
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

# 1. fused-match on-chip validation probe (truth on CPU first; TPU phase only
#    if truth built). Round-2 session-4 ran the probe with the old absolute
#    criterion and FAILed despite fused beating xla (0.7929 vs 0.7835); this
#    rerun records the PASS under the relative+floor criterion.
if run probe_truth 1200 env JAX_PLATFORMS=cpu python scripts/tpu_fused_match_probe.py --truth; then
  run probe_tpu 1800 python -m gpflowpilco_tpu.utils.launch --stall-timeout 900 --max-restarts 2 -- \
      python scripts/tpu_fused_match_probe.py
  PROBE_RC=$?
else
  echo "probe_truth FAILED - skipping probe_tpu" | tee -a "$LOG/queue.log"
  PROBE_RC=1
fi

# 2. pathwise evidence rerun (fused path-eval kernels, acting-policy gate):
#    round-2 solved at ep 5 then collapsed at ep 8; the gate should hold it.
run pw_evidence 6000 python -m gpflowpilco_tpu.utils.launch --stall-timeout 1500 --max-restarts 2 -- \
    python examples/cartpole_swingup/run_tpu_full.py --variant pathwise --fused \
    --dest /tmp/swingup_pw_r3 --seed 3 --episodes 10

# 3. MM control experiment: the exact CPU-f64-winning reduced recipe
#    (drift M=64, 2000-step policy opt) in f32 on-chip. Round-2's M=240/5000
#    f32 run never found the swing-up basin; this isolates config from
#    precision.
run mm_small 5400 python -m gpflowpilco_tpu.utils.launch --stall-timeout 1500 --max-restarts 2 -- \
    python examples/cartpole_swingup/run_tpu_full.py --variant mm \
    --num-centers 64 --step-limit 2000 \
    --dest /tmp/swingup_mm_small_r3 --seed 3 --episodes 10

# 4. MM mixed precision: f32 models/fits, f64 MM rollout loss+grad
#    (PolicySpec.loss_dtype) — the production lever if f32 gradient quality is
#    what blocked the round-2 on-chip MM solve
run mm_lossf64 7200 python -m gpflowpilco_tpu.utils.launch --stall-timeout 1800 --max-restarts 2 -- \
    python examples/cartpole_swingup/run_tpu_full.py --variant mm --mm-loss-f64 \
    --num-centers 64 --step-limit 2000 \
    --dest /tmp/swingup_mm_lossf64_r3 --seed 3 --episodes 10

# 5. MM full-f64 isolation: only if the mixed run did not solve (vSuccess>=0.9
#    anywhere in its log short-circuits this slow software-emulated run)
if grep -q "vSuccess': *0\.9" "$LOG/mm_lossf64.log" 2>/dev/null || \
   grep -q "vSuccess': *1\.0" "$LOG/mm_lossf64.log" 2>/dev/null; then
  echo "mm_lossf64 solved - skipping mm_f64 isolation run" | tee -a "$LOG/queue.log"
else
  run mm_f64 10800 python -m gpflowpilco_tpu.utils.launch --stall-timeout 2400 --max-restarts 2 -- \
      python examples/cartpole_swingup/run_tpu_full.py --variant mm --f64 \
      --num-centers 64 --step-limit 2000 \
      --dest /tmp/swingup_mm_f64_r3 --seed 3 --episodes 10
fi

# 5. HMC-drift evidence: fully Bayesian particle rollouts (GPR hyperparameter
#    ensemble), pathwise loop
run hmc_evidence 7200 python -m gpflowpilco_tpu.utils.launch --stall-timeout 1800 --max-restarts 2 -- \
    python examples/cartpole_swingup/run_tpu_full.py --variant pathwise --drift-optimizer hmc \
    --dest /tmp/swingup_hmc_r3 --seed 3 --episodes 10

# 6. double pendulum (VERDICT r2 #2): classic recipe (20 Hz, 2.5 s, 100 policy
#    centers), per_output_noise, raised lengthscale floor — which only now
#    works as intended: the ADVICE-r2 builders fix stops a median init below
#    ls_low from freezing at the constraint boundary.
run dp_evidence 14400 python -m gpflowpilco_tpu.utils.launch --stall-timeout 1800 --max-restarts 2 -- \
    python examples/double_pendulum/run_double_pendulum.py --variant pathwise --f32 --fused \
    --ls-low 0.1 --episodes 25 --seed 3 --dest /tmp/dp_pw_r3

echo "=== [$(date +%H:%M:%S)] queue complete (probe_rc=$PROBE_RC) ===" | tee -a "$LOG/queue.log"
