#!/usr/bin/env bash
# Classify the LJ13 headline drift 289.0 (r1) -> 283.1 (r2) -> 277.7 (r3)
# samples/s/chip (VERDICT r3 item 2): same-day, fixed-seed, process-restart
# reps of the HEADLINE-ONLY bench at each round-end commit, via git
# worktrees.  If today's r1-code rate ~= today's r3-code rate, the
# historical trend was environmental (tunnel/host state across weeks); if
# r1 > r3 today, it is a code regression and the restarts localize the
# transition.  One TPU process at a time (axon tunnel).
#
# Usage (TPU, solo): scripts/headline_drift_study.sh [restarts=3]
set -uo pipefail
cd "$(dirname "$0")/.."
RESTARTS=${1:-3}
OUT=runs/drift_study
mkdir -p "$OUT"

declare -A COMMITS=( [r1]=10b51ac [r2]=56bef7d [r3]=535dff1 )

for name in r1 r2 r3; do
  c=${COMMITS[$name]}
  wt=.drift/$name
  if [ ! -d "$wt" ]; then
    git worktree add --detach "$wt" "$c" >/dev/null
  fi
done

run_one() {
  local dir=$1 tag=$2 i=$3
  echo "=== $tag restart $i ($(date +%H:%M:%S)) ==="
  ( cd "$dir" && ECNF_BENCH_TASK=lj13_sample_logprob ECNF_BENCH_REPS=8 \
      timeout 1500 python bench.py ) \
    > "$OUT/${tag}_${i}.json" 2> "$OUT/${tag}_${i}.log"
  echo "rc=$? $(cat "$OUT/${tag}_${i}.json" 2>/dev/null | head -c 300)"
}

for i in $(seq 1 "$RESTARTS"); do
  # Interleave rounds within each restart pass so slow environment drift
  # over the campaign hits every commit equally.
  run_one .drift/r1 r1 "$i"
  run_one .drift/r2 r2 "$i"
  run_one .drift/r3 r3 "$i"
  run_one . r4head "$i"
done
echo "done; results in $OUT/"
