#!/usr/bin/env bash
# Full 16k-iteration QM9-config soak (VERDICT r1 item 4).
#
# Two runs, one TPU process at a time (axon tunnel — see
# .claude/skills/verify/SKILL.md):
#   g64  full 16,000-iteration run with `training.epochs_per_dispatch=64`
#        (the TPU-native grouped dispatch; k=64 divides every 1600-epoch
#        eval segment exactly, so one compiled program covers the run)
#   g1   reference-style per-epoch dispatch, stopped by runtime_limit at
#        the first checkpoint (iteration 3199) — the trajectory prefix the
#        grouped run must reproduce metric-for-metric
#
# Compare the trajectories afterwards with scripts/qm9_soak_compare.py.
# Data: data/qm9pos_*.npy (SYNTHETIC stand-in — scripts/make_synthetic_qm9.py;
# real QM9 requires egress, data/QM9_SYNTHETIC_NOTE.txt).
set -euo pipefail
cd "$(dirname "$0")/.."
RUN=${1:-g64}
case "$RUN" in
  g64)
    exec env ECNF_ALLOW_SYNTHETIC_QM9=1 python examples/qm9.py \
      training.epochs_per_dispatch=64 \
      training.save_dir=runs/qm9_soak_g64 \
      "logger={csv_logger: {save_period: 2000}}"
    ;;
  g1)
    exec env ECNF_ALLOW_SYNTHETIC_QM9=1 python examples/qm9.py \
      training.epochs_per_dispatch=1 \
      training.runtime_limit=1.0 \
      training.save_dir=runs/qm9_soak_g1 \
      "logger={csv_logger: {save_period: 2000}}"
    ;;
  *)
    echo "usage: $0 [g64|g1]" >&2
    exit 2
    ;;
esac
