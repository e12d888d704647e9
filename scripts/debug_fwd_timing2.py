"""A/B the block_until_ready anomaly: scalar-only output vs (state, scalar).

Variant A returns only the accumulator (debug_fwd_timing.py — blocked
correctly).  Variant B returns (state, acc) with the state a pass-through
of the input (train_step_profile.py's shape — did NOT block).  Variant C
returns (state, acc) but blocks on BOTH outputs.
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

N, DIM, B, S = 19, 3, 256, 50


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
    data = jnp.asarray(rng.normal(size=(S, B, N * DIM)).astype(np.float32))
    feats = jnp.zeros((B, N), dtype=jnp.int32)
    with host_tracing():
        state = init_training_state(
            cnf, opt, jax.random.PRNGKey(0), data[0, :2], feats[:2],
            use_ema=True)

    def body(carry, xb, fts):
        st, acc = carry
        key, sub = jax.random.split(st.key)
        loss, _ = flow_matching_loss_fn(cnf, st.params, xb, sub, fts)
        return (st._replace(key=key), acc + loss.astype(jnp.float32)), None

    def run_scalar(st, xs, fts):
        (st, acc), _ = jax.lax.scan(
            lambda c, xb: body(c, xb, fts), (st, jnp.float32(0.0)), xs)
        return acc

    def run_pair(st, xs, fts):
        (st, acc), _ = jax.lax.scan(
            lambda c, xb: body(c, xb, fts), (st, jnp.float32(0.0)), xs)
        return st, acc

    st0, data_d, feats_d = jax.device_put((state, data, feats), dev)

    for label, fn, block_all in (
        ("A scalar-out", run_scalar, False),
        ("B pair-out, block acc", run_pair, False),
        ("C pair-out, block all", run_pair, True),
    ):
        with host_tracing():
            lowered = jax.jit(fn).lower(st0, data_d, feats_d)
        compiled = lowered.compile()
        for _ in range(2):
            out = compiled(st0, data_d, feats_d)
            jax.block_until_ready(out)
        for rep in range(2):
            t0 = time.perf_counter()
            out = compiled(st0, data_d, feats_d)
            target = out if (block_all or label.startswith("A")) else out[1]
            jax.block_until_ready(target)
            t_block = time.perf_counter() - t0
            t0 = time.perf_counter()
            acc = out if label.startswith("A") else out[1]
            val = float(jax.device_get(acc))
            t_get = time.perf_counter() - t0
            print(f"{label}: rep{rep} block {t_block*1e3:8.2f} ms | "
                  f"get {t_get*1e3:8.2f} ms | acc={val:.2f}", flush=True)


if __name__ == "__main__":
    main()
