"""TPU Pallas kernel work for the EGNN compute path.

Live module:

- ``tangent_kernel`` — the hand-linearized exact-trace path.  Its
  pure-XLA form (``use_kernel=False``) is the shipped default
  (`SolveConfig(structured_tangent=True)`): 1.42x f32 / 1.25x bf16 over
  `jax.linearize` per ODE stage.  Its Pallas branch is CLOSED (4-5x
  slower, docs/PERF.md).

Closed kernels live in ``attic/`` (fused EGCL forward, fused
forward+trace) — measured losers vs XLA at these shapes, kept with
interpret-mode tests only.  See `attic/__init__.py` for the verdicts.
"""
