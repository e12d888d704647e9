"""CLOSED Pallas kernels — measured, lost to XLA, kept for the record.

Nothing in here is a live path.  Each module carries a measured negative
verdict at both LJ13 and flagship (QM9) scale (docs/PERF.md: "Pallas
kernel study" / "Pallas at flagship (QM9) scale — closed"):

- ``egcl_kernel``: fused EGCL forward — numerically exact, 0.85x plain
  XLA at the only VMEM-feasible tile; 0.50x at flagship scale.
- ``trace_kernel``: fused forward + exact Jacobian trace — VMEM-infeasible
  at the headline config; the winning descendant (the structured-tangent
  XLA form, `ecnf_tpu/ops/pallas/tangent_kernel.py`) shipped instead and
  is default-on.

Interpret-mode correctness tests still cover both (tests/test_pallas_kernel
.py, tests/test_trace_kernel.py) so the math stays verified.  Do NOT
re-litigate these verdicts without new hardware or new shapes.
"""
