"""Time the LJ13 reverse-ESS eval at reference scale (VERDICT r2 weak #6).

The reference evaluates reverse ESS from `eval_n_model_samples: 10_000`
model samples (`examples/config/lj13.yaml:30`), which `training/setup.py`
runs as a HOST LOOP of per-batch jitted sample+log-prob solves (deliberate:
bounded device-program length, see the 3-minute device-program limit in
docs/PERF.md).  The open question was the per-dispatch tunnel tax at this
scale: 10,000 / eval_batch_size dispatches x ~28 ms.  This script measures
the whole 10k-sample ESS eval wall-clock and the per-batch breakdown, at
the shipped eval_batch_size (64) and a TPU-friendlier 512.

Run on TPU (solo): python scripts/ess_eval_timing.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ecnf_tpu.utils.host_trace import ensure_host_cpu_backend, host_tracing

ensure_host_cpu_backend()

import jax
import jax.numpy as jnp

from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.cnf.sampling import SolveConfig, sample_and_log_prob_cnf
from ecnf_tpu.parallel.mesh import get_mesh, replicated, data_sharded
from ecnf_tpu.targets.energies import lennard_jones_log_prob
from ecnf_tpu.training.evaluation import calculate_reverse_ess

N_SAMPLES = 10_000


def run_ess(batch: int, cfg: SolveConfig, label: str):
    cnf = build_cnf(
        n_frames=13, dim=3, sigma_min=0.01, base_scale=1.0,
        n_blocks_egnn=3, mlp_units=(128, 128, 128),
        n_invariant_feat_hidden=64, time_embedding_dim=8, n_features=1,
        compute_dtype="bfloat16",
    )
    mesh = get_mesh()
    with host_tracing():
        feats = jnp.zeros((batch, 13), dtype=jnp.int32)
        params = cnf.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 39)), jnp.zeros(2), feats[:2]
        )

    fn = jax.jit(
        lambda p, k: sample_and_log_prob_cnf(
            cnf, p, k, batch, features=feats, approx=True, cfg=cfg
        ),
        in_shardings=(replicated(mesh), replicated(mesh)),
        out_shardings=data_sharded(mesh),
    )
    t0 = time.perf_counter()
    with host_tracing():
        compiled = fn.lower(params, jax.random.PRNGKey(1)).compile()
    params = jax.device_put(params, replicated(mesh))
    print(f"[{label}] trace+compile {time.perf_counter() - t0:.1f}s", flush=True)

    n_batches = max(N_SAMPLES // batch, 1)
    keys = jax.random.split(jax.random.PRNGKey(2), n_batches)
    # Warm one batch so the timed loop is pure steady-state dispatches.
    jax.block_until_ready(compiled(params, keys[0]))

    t0 = time.perf_counter()
    log_ws = []
    for k in keys:
        samples, log_q = compiled(params, k)
        log_p = lennard_jones_log_prob(samples.reshape(-1, 13, 3))
        log_ws.append(log_p - log_q)
    log_w = jnp.concatenate(log_ws)
    ess = float(calculate_reverse_ess(log_w))
    dt = time.perf_counter() - t0
    print(
        f"[{label}] {n_batches} batches x {batch} = {n_batches * batch} "
        f"samples in {dt:.2f}s ({dt / n_batches * 1e3:.1f} ms/batch, "
        f"{n_batches * batch / dt:.0f} samples/s), rv_ess={ess:.4f}",
        flush=True,
    )
    return dt, n_batches


def run_ess_chunked(batch: int, chunk: int, cfg: SolveConfig, label: str):
    """The production form (`training/setup.py`): scan `chunk` sample
    batches per jitted dispatch (training.eval_dispatch_chunk)."""
    cnf = build_cnf(
        n_frames=13, dim=3, sigma_min=0.01, base_scale=1.0,
        n_blocks_egnn=3, mlp_units=(128, 128, 128),
        n_invariant_feat_hidden=64, time_embedding_dim=8, n_features=1,
        compute_dtype="bfloat16",
    )
    mesh = get_mesh()
    with host_tracing():
        feats = jnp.zeros((batch, 13), dtype=jnp.int32)
        params = cnf.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 39)), jnp.zeros(2), feats[:2]
        )

    def one_batch(p, k):
        samples, log_q = sample_and_log_prob_cnf(
            cnf, p, k, batch, features=feats, approx=True, cfg=cfg
        )
        return lennard_jones_log_prob(samples.reshape(-1, 13, 3)) - log_q

    fn = jax.jit(
        lambda p, ks: jax.lax.map(lambda k: one_batch(p, k), ks),
        in_shardings=(replicated(mesh), replicated(mesh)),
        out_shardings=replicated(mesh),
    )
    n_batches = max(N_SAMPLES // batch, 1)
    n_chunks = n_batches // chunk
    keys = jax.random.split(jax.random.PRNGKey(2), n_batches)
    ks0 = keys[:chunk]
    t0 = time.perf_counter()
    with host_tracing():
        compiled = fn.lower(params, ks0).compile()
    params = jax.device_put(params, replicated(mesh))
    jax.block_until_ready(compiled(params, ks0))  # warm
    print(f"[{label}] trace+compile+warm {time.perf_counter() - t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    log_ws = [
        compiled(params, keys[c * chunk:(c + 1) * chunk])
        for c in range(n_chunks)
    ]
    log_w = jnp.concatenate(log_ws).flatten()
    ess = float(calculate_reverse_ess(log_w))
    dt = time.perf_counter() - t0
    n = n_chunks * chunk * batch
    print(
        f"[{label}] {n_chunks} dispatches x {chunk} batches x {batch} = "
        f"{n} samples in {dt:.2f}s ({n / dt:.0f} samples/s), "
        f"rv_ess={ess:.4f}",
        flush=True,
    )
    return dt, n_chunks


def main():
    cfg = SolveConfig(use_fixed_step_size=True, step_size=0.05, method="rk4",
                      hutchinson_probes=1)
    # Shipped eval_batch_size (lj13.yaml: 64) vs a TPU-friendlier batch.
    dt_64, nb_64 = run_ess(64, cfg, "batch=64 (shipped)")
    dt_512, nb_512 = run_ess(512, cfg, "batch=512")
    # Clean A/B of the production forms (log_w fully inside the jit): the
    # per-batch host loop (chunk=1, the old default) vs the bounded scan
    # (chunk=8).  The run_ess numbers above additionally pay EAGER energy
    # evaluation per batch — a per-batch tunnel-op chain that inflates the
    # host-loop figure; they bound the worst case, not the shipped path.
    run_ess_chunked(64, 1, cfg, "batch=64 chunk=1 (old default, in-jit)")
    run_ess_chunked(64, 8, cfg, "batch=64 chunk=8 (production default)")
    # Dispatch-tax estimate: assume per-sample device work is constant, so
    # extra wall-clock per batch at 64 vs 512 bounds the host/tunnel tax.
    per_sample_512 = dt_512 / (nb_512 * 512)
    tax = dt_64 - per_sample_512 * nb_64 * 64
    print(
        f"dispatch-tax bound at batch 64: {tax:.2f}s of {dt_64:.2f}s total "
        f"({tax / dt_64 * 100:.0f}%), ~{tax / nb_64 * 1e3:.0f} ms/dispatch"
    )


if __name__ == "__main__":
    main()
