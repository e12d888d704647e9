"""Diagnose the fwd-stage 2.3 ms anomaly: does block_until_ready block?

Times the fwd-only 100-step scan three ways: block_until_ready on the
scalar accumulator, device_get of it, and scaling n_steps 25 vs 100.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ecnf_tpu.utils.host_trace import ensure_host_cpu_backend, host_tracing

ensure_host_cpu_backend()

import jax
import jax.numpy as jnp
import numpy as np

from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.cnf.loss import flow_matching_loss_fn
from ecnf_tpu.training.optim import build_optimizer
from ecnf_tpu.training.state import init_training_state

N, DIM, B = 19, 3, 256


def main():
    cnf = build_cnf(
        n_frames=N, dim=DIM, sigma_min=1e-6, base_scale=2.0,
        n_blocks_egnn=5, mlp_units=(256, 256, 256, 256),
        n_invariant_feat_hidden=32, time_embedding_dim=8, n_features=1,
        compute_dtype="bfloat16",
    )
    opt = build_optimizer(1e-4, use_schedule=False)
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    for n_steps in (25, 100):
        data = jnp.asarray(
            rng.normal(size=(n_steps, B, N * DIM)).astype(np.float32))
        feats = jnp.zeros((B, N), dtype=jnp.int32)

        def run(params, key0, xs, fts):
            def body(carry, xb):
                key, acc = carry
                key, sub = jax.random.split(key)
                loss, _ = flow_matching_loss_fn(cnf, params, xb, sub, fts)
                return (key, acc + loss.astype(jnp.float32)), None
            (key, acc), _ = jax.lax.scan(
                body, (key0, jnp.float32(0.0)), xs)
            return acc

        with host_tracing():
            state = init_training_state(
                cnf, opt, jax.random.PRNGKey(0), data[0, :2], feats[:2])
        params, key0, data_d, feats_d = jax.device_put(
            (state.params, jax.random.PRNGKey(7), data, feats), dev)
        with host_tracing():
            lowered = jax.jit(run).lower(params, key0, data_d, feats_d)
        t0 = time.perf_counter()
        compiled = lowered.compile()
        print(f"n_steps={n_steps}: compile {time.perf_counter()-t0:.1f}s",
              flush=True)
        acc = compiled(params, key0, data_d, feats_d)
        jax.block_until_ready(acc)
        for rep in range(3):
            t0 = time.perf_counter()
            acc = compiled(params, key0, data_d, feats_d)
            jax.block_until_ready(acc)
            t_block = time.perf_counter() - t0
            t0 = time.perf_counter()
            val = float(jax.device_get(acc))
            t_get = time.perf_counter() - t0
            print(f"  rep{rep}: block_until_ready {t_block*1e3:8.2f} ms | "
                  f"+device_get {t_get*1e3:8.2f} ms | acc={val:.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
