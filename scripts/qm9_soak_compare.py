"""Compare the grouped-dispatch QM9 soak against the per-epoch prefix run.

Reads the CSV histories written by `scripts/qm9_soak.sh` (g64 and g1) and
reports, per shared metric column over the shared row prefix: the fraction
of bit-identical entries and the max absolute / relative difference, plus
the eval rows side by side.  The grouped dispatch is schedule-preserving
and bit-identical by construction at small scale
(`tests/test_examples_e2e.py::test_epochs_per_dispatch_equivalence`); this
script measures whether that holds for the real-scale bf16 program, where
XLA may fuse the k-epoch scan differently.
"""
import sys
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent


def main(dir_a: str, dir_b: str) -> int:
    a = pd.read_csv(Path(dir_a) / "logging_history.csv", index_col=0)
    b = pd.read_csv(Path(dir_b) / "logging_history.csv", index_col=0)
    n = min(len(a), len(b))
    print(f"rows: {dir_a}={len(a)} {dir_b}={len(b)} -> comparing first {n}")
    a, b = a.iloc[:n], b.iloc[:n]
    cols = [c for c in a.columns if c in b.columns]
    missing = set(a.columns).symmetric_difference(b.columns)
    if missing:
        print(f"columns only in one run: {sorted(missing)}")

    worst_rel = 0.0
    for c in cols:
        va, vb = a[c].to_numpy(float), b[c].to_numpy(float)
        both = np.isfinite(va) & np.isfinite(vb)
        nan_mismatch = int((np.isfinite(va) != np.isfinite(vb)).sum())
        if both.sum() == 0:
            print(f"{c:>24}: no finite overlap ({nan_mismatch} NaN mismatches)")
            continue
        diff = np.abs(va[both] - vb[both])
        scale = np.maximum(np.abs(va[both]), np.abs(vb[both]))
        rel = np.max(diff / np.maximum(scale, 1e-12))
        exact = float((diff == 0).mean())
        worst_rel = max(worst_rel, rel)
        print(
            f"{c:>24}: exact {exact:6.1%}  max|d| {diff.max():.3e}  "
            f"max rel {rel:.3e}  n {int(both.sum())}"
            + (f"  NaN mismatches {nan_mismatch}" if nan_mismatch else "")
        )

    if "iteration" in cols:
        evals = a[a.get("test_log_lik", a[cols[0]]).notna()]
        eval_iters = sorted(set(evals["iteration"].astype(int)))
        print(f"\neval rows (iterations {eval_iters}):")
        keep = [c for c in cols if a[c].notna().any()]
        for it in eval_iters:
            ra = a[a["iteration"] == it].iloc[-1]
            rb = b[b["iteration"] == it].iloc[-1]
            for c in keep:
                if np.isfinite(ra[c]) and c not in ("iteration",):
                    print(f"  iter {it:>6} {c:>24}: {ra[c]:.6f} vs {rb[c]:.6f}")

    print(f"\nworst relative difference over shared prefix: {worst_rel:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else str(REPO / "runs/qm9_soak_g64"),
            sys.argv[2] if len(sys.argv) > 2 else str(REPO / "runs/qm9_soak_g1"),
        )
    )
