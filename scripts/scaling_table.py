"""Measured train-step scaling table on the virtual CPU mesh (VERDICT r4 #4).

`scripts/scaling_dryrun.py` validates sharding *mechanics* at LJ13-small
scale; this script records the numbers a hardware day can diff against:
steps/s for the FLAGSHIP (QM9-scale) train step at 1/2/4/8 devices, in
both regimes the verdict asks for:

  - **weak scaling**  — fixed per-device batch (global batch grows with
    the mesh; ideal = flat step time),
  - **strong scaling** — fixed global batch (per-device batch shrinks;
    ideal = step time / n_devices).

On the virtual mesh all 8 "devices" share this host's 2 cores, so
absolute times mean nothing and the IDEAL curves are unreachable by
construction (weak: total work grows 8x over the same cores; strong:
total work constant, so flat time is the CPU-mesh ideal).  What the table
pins down, per regime, is (a) the partitioned programs run and produce
identical-quality losses at every mesh size, and (b) the collective /
resharding overhead on top of pure compute — visible as deviation from
the work-per-core prediction ``t(n) ∝ global_batch(n)`` (both regimes
collapse onto it on a shared-core host).  On real chips the same script
reports true efficiency; run it with JAX_PLATFORMS unset on a pod slice.

Reference context: the reference has NO multi-device training path
(SURVEY §2b — a vestigial pmap resume hook only, `utils/loop.py:104-106`);
this table is net-new TPU framework surface.

Usage (CPU mesh, ~15 min, do NOT run concurrently with TPU work):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/scaling_table.py
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.parallel.mesh import get_mesh, replicated, data_sharded
from ecnf_tpu.training.optim import build_optimizer
from ecnf_tpu.training.state import init_training_state, make_update_fn

# Flagship model scale (`examples/configs/qm9.yaml`).
N_NODES, DIM = 19, 3
PER_DEVICE_BATCH = 16   # weak scaling: global = 16 * n_dev
GLOBAL_BATCH = 64       # strong scaling: fixed across mesh sizes
WARMUP, REPS = 1, 3
DEVICE_COUNTS = (1, 2, 4, 8)


def _qm9_cnf():
    return build_cnf(
        n_frames=N_NODES, dim=DIM, sigma_min=1e-6, base_scale=2.0,
        n_blocks_egnn=5, mlp_units=(256, 256, 256, 256),
        n_invariant_feat_hidden=32, time_embedding_dim=8, n_features=1,
        compute_dtype="bfloat16",
    )


def measure(cnf, optimizer, n_dev: int, batch: int):
    mesh = get_mesh(jax.devices()[:n_dev])
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, N_NODES * DIM))
    feats = jnp.zeros((batch, N_NODES), dtype=jnp.int32)
    state = init_training_state(
        cnf, optimizer, jax.random.PRNGKey(1), x[:2], feats[:2], use_ema=True
    )
    update = make_update_fn(cnf, optimizer, use_ema=True, mesh=mesh)
    state = jax.device_put(state, replicated(mesh))
    xs = jax.device_put(x, data_sharded(mesh))
    fs = jax.device_put(feats, data_sharded(mesh))
    for _ in range(WARMUP + 1):  # first call compiles
        state, info = update(state, xs, fs)
        jax.block_until_ready(info["loss"])
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        state, info = update(state, xs, fs)
        jax.block_until_ready(info["loss"])
        ts.append(time.perf_counter() - t0)
    return min(ts), float(info["loss"])


def main():
    assert len(jax.devices()) >= max(DEVICE_COUNTS), (
        f"need {max(DEVICE_COUNTS)} devices, have {len(jax.devices())}"
    )
    platform = jax.devices()[0].platform
    cnf = _qm9_cnf()
    optimizer = build_optimizer(1e-4, use_schedule=False)
    out = {"platform": platform, "device_kind": jax.devices()[0].device_kind,
           "model": "qm9-scale (5 blocks, 256x4, hid 32, N=19, bf16)",
           "weak": [], "strong": []}

    print(f"platform={platform}  regimes: weak(per-dev {PER_DEVICE_BATCH}) / "
          f"strong(global {GLOBAL_BATCH})", flush=True)
    for regime, batches in (
        ("weak", {n: PER_DEVICE_BATCH * n for n in DEVICE_COUNTS}),
        ("strong", {n: GLOBAL_BATCH for n in DEVICE_COUNTS}),
    ):
        print(f"-- {regime} scaling --", flush=True)
        base = None
        for n_dev in DEVICE_COUNTS:
            B = batches[n_dev]
            t, loss = measure(cnf, optimizer, n_dev, B)
            if base is None:
                base = (t, B)
            # On real hardware t/t1 vs the regime ideal (weak: 1.0; strong:
            # 1/n) is the efficiency; on the shared-core CPU mesh both
            # regimes' honest comparator is work/work1 (= B/B1).
            work_ratio = B / base[1]
            row = {
                "n_devices": n_dev, "global_batch": B,
                "step_ms": round(t * 1e3, 2),
                "steps_per_s": round(1.0 / t, 3),
                "samples_per_s": round(B / t, 1),
                "t_over_t1": round(t / base[0], 3),
                "work_over_work1": round(work_ratio, 3),
                "loss": round(loss, 4),
            }
            out[regime].append(row)
            print(
                f"  dev={n_dev}  B={B:4d}  {row['step_ms']:9.2f} ms/step  "
                f"{row['samples_per_s']:8.1f} samples/s  "
                f"t/t1={row['t_over_t1']:5.2f} (work/work1={work_ratio:.2f})  "
                f"loss={loss:.4f}",
                flush=True,
            )
    path = Path("measurements/r5/scaling_table.json")
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
