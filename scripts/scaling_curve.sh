#!/usr/bin/env bash
# Real multi-chip scaling curve, single command (standing VERDICT item —
# run the moment >1 TPU chip is visible to this process).  Weak scaling
# on the data axis: fixed per-chip batch, growing global batch; the
# sharded train step and eval paths are the production ones
# (`training/setup.py`), identical to the 8-device CPU-mesh dryrun that
# already validates the mechanics.
#
# Usage (on a host with N chips):  scripts/scaling_curve.sh [per_chip_batch]
# Record the resulting samples/s-per-chip curve (target: >=80% efficiency
# to 2 hosts, BASELINE.json north star) in BASELINE.md.
set -euo pipefail
cd "$(dirname "$0")/.."
PER_CHIP=${1:-64}

python - << EOF
import time

import jax
import jax.numpy as jnp

from ecnf_tpu.utils.host_trace import host_tracing
from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.parallel.mesh import get_mesh, replicated, data_sharded
from ecnf_tpu.training.optim import build_optimizer
from ecnf_tpu.training.state import init_training_state, make_update_fn

n_dev = jax.device_count()
print(f"{n_dev} device(s): {jax.devices()[0].device_kind}")
assert n_dev > 1, "one chip visible - this script measures multi-chip scaling"

N, PER_CHIP = 19, ${PER_CHIP}
cnf = build_cnf(
    n_frames=N, dim=3, sigma_min=1e-6, base_scale=2.0, n_blocks_egnn=5,
    mlp_units=(256, 256, 256, 256), n_invariant_feat_hidden=32,
    time_embedding_dim=8, n_features=1, compute_dtype="bfloat16",
)
opt = build_optimizer(1e-4, use_schedule=False)

# Sub-meshes of 1, 2, 4, ... n_dev devices: per-chip batch fixed.
sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
rates = {}
for s in sizes:
    mesh = get_mesh(devices=jax.devices()[:s])
    B = PER_CHIP * s
    with host_tracing():
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N * 3))
        feats = jnp.zeros((B, N), dtype=jnp.int32)
        state = init_training_state(
            cnf, opt, jax.random.PRNGKey(1), x[:2], feats[:2], use_ema=True
        )
    update = make_update_fn(cnf, opt, mesh=mesh, use_ema=True)
    x = jax.device_put(x, data_sharded(mesh))
    feats = jax.device_put(feats, data_sharded(mesh))
    state = jax.device_put(state, replicated(mesh))
    state, info = update(state, x, feats)  # compile + warm
    jax.block_until_ready(info["loss"])
    n_steps, t0 = 50, time.perf_counter()
    for _ in range(n_steps):
        state, info = update(state, x, feats)
    jax.block_until_ready(info["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    rates[s] = B / dt
    eff = rates[s] / (s * rates[1]) * 100 if 1 in rates else 100.0
    print(f"{s:3d} chips: {dt*1e3:7.2f} ms/step, {rates[s]:,.0f} samples/s "
          f"({rates[s]/s:,.0f}/chip, {eff:.0f}% efficiency)")
EOF
