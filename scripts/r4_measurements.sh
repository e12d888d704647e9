#!/usr/bin/env bash
# Round-4 TPU measurement queue (VERDICT r3 items 2/5/6/7), run solo —
# one TPU process at a time.  Logs under runs/r4/.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=runs/r4
mkdir -p "$OUT"

step() {
  echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a "$OUT/queue.log"
}

# 1. params-const A/B (headline drift mechanism): the constant form pays
#    the slow HloEvaluator folds at compile, then A/Bs the steady rate.
step "params_const run 1"
ECNF_BENCH_TASK=lj13_sample_logprob ECNF_BENCH_REPS=8 ECNF_BENCH_PARAMS_CONST=1 \
  timeout 1500 python bench.py > "$OUT/params_const_1.json" 2> "$OUT/params_const_1.log"
echo "rc=$?" >> "$OUT/queue.log"
step "params_const run 2"
ECNF_BENCH_TASK=lj13_sample_logprob ECNF_BENCH_REPS=8 ECNF_BENCH_PARAMS_CONST=1 \
  timeout 1500 python bench.py > "$OUT/params_const_2.json" 2> "$OUT/params_const_2.log"
echo "rc=$?" >> "$OUT/queue.log"

# 2. ESS-eval dispatch tax at reference scale (10k samples).
step "ess_eval_timing"
timeout 1800 python scripts/ess_eval_timing.py > "$OUT/ess_eval_timing.log" 2>&1
echo "rc=$?" >> "$OUT/queue.log"

# 3. bf16 stage decomposition at flagship (QM9) scale.
step "bf16_stage_decomposition qm9"
timeout 1800 python scripts/bf16_stage_decomposition.py --scale qm9 \
  > "$OUT/bf16_decomp_qm9.log" 2>&1
echo "rc=$?" >> "$OUT/queue.log"

# 4. Pallas tangent kernel at flagship scale, VMEM-tile sweep.
step "tangent_kernel qm9 B=64"
timeout 1800 python scripts/bench_tangent_kernel.py --scale qm9 --tiles 2 4 8 16 \
  > "$OUT/tangent_qm9_b64.log" 2>&1
echo "rc=$?" >> "$OUT/queue.log"
step "tangent_kernel qm9 B=256"
timeout 1800 python scripts/bench_tangent_kernel.py --scale qm9 --batch 256 --tiles 2 4 8 16 \
  > "$OUT/tangent_qm9_b256.log" 2>&1
echo "rc=$?" >> "$OUT/queue.log"

step "queue done"
