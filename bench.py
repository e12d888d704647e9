"""Benchmark: LJ13 sampling with exact log-prob, samples/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline task (BASELINE.md): draw LJ13 flow samples *with* exact
log-density — the reference's most expensive inference path
(`ecnf/cnf/sample_and_log_prob.py:97-149`: Dopri5 + D-column exact trace
per stage).  Fixed-step Dopri5 (20 steps, the reference's 0.05 step-size
option) is used so the measured cost is deterministic and independent of
model weights; the exact trace runs all D=39 Jacobian columns.

vs_baseline: the reference cannot run in this container (diffrax/distrax
absent), so the recorded baseline is this same program measured on the host
CPU (JAX_PLATFORMS=cpu) — a *favorable-to-the-baseline* proxy, since this
framework's batched CPU path is itself faster than the reference's
per-sample vmap+diffrax stack.  Override with ECNF_BENCH_BASELINE.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from ecnf_tpu.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

# Measured on this machine (see module docstring): our own CPU throughput on
# the identical program (JAX_PLATFORMS=cpu, batch 16, best of 2: 64.1 s /
# 16 samples), in samples/s.
DEFAULT_CPU_BASELINE = float(os.environ.get("ECNF_BENCH_BASELINE", "0.25"))

# Batch 48 is the sweep optimum with rk4 + the structured tangent
# (docs/PERF.md: 287.6 samples/s at 48 vs 274.5 at 64, 249.8 at 128).
BATCH = int(os.environ.get("ECNF_BENCH_BATCH", "48"))
REPS = int(os.environ.get("ECNF_BENCH_REPS", "5"))
# The EGNN MLP stack runs in bf16 by default (the TPU-production setting:
# geometry, aggregation and the ODE state stay f32, equivariance is exact,
# and the edge tensors are HBM-bandwidth-bound so bf16 is ~2x).  Set
# ECNF_BENCH_DTYPE=float32 for the full-f32 variant (69.6 samples/s/chip on
# v5e vs 143.0 in bf16).
COMPUTE_DTYPE = os.environ.get("ECNF_BENCH_DTYPE", "bfloat16")
if COMPUTE_DTYPE in ("float32", "f32", ""):
    COMPUTE_DTYPE = None
# Jacobian columns per scan chunk for the exact trace (smaller chunks
# pipeline better; 0/unset = all columns at once).
TRACE_CHUNK = int(os.environ.get("ECNF_BENCH_TRACE_CHUNK", "0")) or None
# Use the fused forward+trace Pallas kernel (ops/pallas/trace_kernel.py).
FUSED = os.environ.get("ECNF_BENCH_FUSED", "") not in ("", "0")
# Hand-linearized trace (ops/pallas/tangent_kernel.py; default on — measured
# 1.16x bf16 / 1.42x f32 per stage vs jax.linearize).  Set =0 to disable.
TANGENT = os.environ.get("ECNF_BENCH_TANGENT", "1") not in ("", "0")
# Fixed-step method: rk4 (default; 4 instead of 6 field evals/step = 1.47x,
# and equal log-density accuracy to dopri5 at step 0.05 on a trained model —
# both are step-size-dominated; scripts/method_accuracy_study.py, docs/PERF.md)
# or dopri5 (the reference's fixed-step stepper, ECNF_BENCH_METHOD=dopri5).
METHOD = os.environ.get("ECNF_BENCH_METHOD", "rk4")


TASK = os.environ.get("ECNF_BENCH_TASK", "lj13_sample_logprob")


def bench_train_step() -> None:
    """Secondary task: jitted train-step throughput (DW4-scale, steps/s)."""
    import jax.numpy as jnp

    from ecnf_tpu.cnf.build import build_cnf
    from ecnf_tpu.training.optim import build_optimizer
    from ecnf_tpu.training.state import init_training_state, make_update_fn

    n_nodes, dim = 13, 3
    cnf = build_cnf(
        n_frames=n_nodes, dim=dim, sigma_min=0.01, base_scale=1.0,
        n_blocks_egnn=3, mlp_units=(128, 128, 128),
        n_invariant_feat_hidden=64, time_embedding_dim=8, n_features=1,
        compute_dtype=COMPUTE_DTYPE,
    )
    opt = build_optimizer(1e-4, use_schedule=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, n_nodes * dim))
    feats = jnp.zeros((BATCH, n_nodes), dtype=jnp.int32)
    state = init_training_state(cnf, opt, jax.random.PRNGKey(1), x[:2], feats[:2])
    update = make_update_fn(cnf, opt)

    state, info = update(state, x, feats)
    jax.block_until_ready(info["loss"])
    n_steps = 50
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, info = update(state, x, feats)
    jax.block_until_ready(info["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    print(
        json.dumps(
            {
                "metric": "lj13_train_step",
                "value": round(1.0 / dt, 1),
                "unit": "steps/s/chip",
                "vs_baseline": round((1.0 / dt) / 1.0, 2),
            }
        )
    )


def main() -> None:
    global BATCH
    if TASK == "train_step":
        bench_train_step()
        return

    from ecnf_tpu.cnf.build import build_cnf
    from ecnf_tpu.cnf.sampling import SolveConfig, sample_and_log_prob_cnf

    n_nodes, dim = 13, 3
    cnf = build_cnf(
        n_frames=n_nodes,
        dim=dim,
        sigma_min=0.01,
        base_scale=1.0,
        n_blocks_egnn=3,
        mlp_units=(128, 128, 128),
        n_invariant_feat_hidden=64,
        time_embedding_dim=8,
        n_features=1,
        compute_dtype=COMPUTE_DTYPE,
    )
    feats = jnp.zeros((BATCH, n_nodes), dtype=jnp.int32)
    x0 = jnp.zeros((2, n_nodes * dim))
    params = cnf.init(jax.random.PRNGKey(0), x0, jnp.zeros(2), feats[:2])

    cfg = SolveConfig(
        use_fixed_step_size=True,
        step_size=0.05,
        trace_column_chunk=TRACE_CHUNK,
        fused_trace=FUSED,
        structured_tangent=TANGENT,
        method=METHOD,
    )

    def run(key, feats_):
        return sample_and_log_prob_cnf(
            cnf, params, key, BATCH, features=feats_, approx=False, cfg=cfg
        )

    # Shard the batch over all chips (same GSPMD pattern as the training
    # eval paths): on 1 chip this is a no-op; on a multi-chip host the
    # solve parallelizes over the data axis instead of idling N-1 chips.
    from ecnf_tpu.parallel.mesh import get_mesh, data_sharded, replicated, pad_to_multiple

    mesh = get_mesh()
    padded = pad_to_multiple(BATCH, int(mesh.devices.size))
    if padded != BATCH:
        print(f"batch {BATCH} -> {padded} (rounded up to the mesh)", file=sys.stderr)
        BATCH = padded
        feats = jnp.zeros((BATCH, n_nodes), dtype=jnp.int32)
    feats = jax.device_put(feats, data_sharded(mesh))
    run_jit = jax.jit(
        run,
        in_shardings=(replicated(mesh), data_sharded(mesh)),
        out_shardings=replicated(mesh),
    )

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    x1, log_q = run_jit(key, feats)
    jax.block_until_ready((x1, log_q))
    compile_and_first = time.perf_counter() - t0
    print(f"compile+first run: {compile_and_first:.2f}s", file=sys.stderr)

    times = []
    for i in range(REPS):
        key = jax.random.PRNGKey(2 + i)
        t0 = time.perf_counter()
        out = run_jit(key, feats)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    throughput = BATCH / best
    n_chips = jax.device_count()
    per_chip = throughput / n_chips

    print(
        f"device={jax.devices()[0].device_kind} batch={BATCH} "
        f"best={best*1e3:.1f}ms throughput={throughput:.1f} samples/s "
        f"({per_chip:.1f}/chip, {n_chips} chip(s))",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "lj13_sample_with_exact_logprob",
                "value": round(per_chip, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(per_chip / DEFAULT_CPU_BASELINE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
