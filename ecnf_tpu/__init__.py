"""ecnf_tpu: a TPU-native framework for SE(3)-equivariant continuous
normalizing flows trained by flow matching.

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capabilities
of the `ecnf` reference baseline (NeurIPS 2023, arXiv 2308.10364):

- ``ecnf_tpu.ops``       — numerics, batched ODE engine (fixed + adaptive
  Dopri5), divergence/trace estimators, Pallas kernels.
- ``ecnf_tpu.models``    — MLP / StableMLP / dense-edge batched EGNN vector
  fields.
- ``ecnf_tpu.cnf``       — flow-matching CNF: OT conditional path, zero-CoM
  Gaussian base, loss, sampling / exact + Hutchinson log-prob.
- ``ecnf_tpu.parallel``  — device mesh, sharded (pjit/GSPMD) train/eval steps,
  multi-host init.
- ``ecnf_tpu.training``  — training state, loop harness, evaluation (ESS),
  checkpoints, loggers, typed config.
- ``ecnf_tpu.targets``   — datasets (DW4 / LJ13 / QM9 / ALDP), Boltzmann
  energies, MCMC data regeneration.

Design stance (vs. the reference's per-sample + vmap + diffrax + scatter_sum
style): everything is batched-first with static shapes; graphs are dense
``[B, N, N]`` tensors (N <= 22 here, so dense masked edges beat gather/scatter
on the TPU MXU); the ODE integrator is a ``lax.while_loop`` with per-sample
PI-controlled adaptive steps; training/eval steps are written once against a
``jax.sharding.Mesh`` and run 1 chip -> pod slice unchanged.
"""

__version__ = "0.1.0"
