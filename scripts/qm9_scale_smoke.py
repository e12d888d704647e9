"""QM9-scale training smoke on synthetic data (flagship config on TPU).

The real QM9 download needs network egress; this validates the flagship
configuration (19 atoms, 5-block EGNN, mlp_units [256]*4, batch 256, EMA)
end-to-end on hardware and measures train-step throughput + sampling time
at QM9 scale.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.cnf.sampling import SolveConfig, sample_cnf
from ecnf_tpu.training.optim import build_optimizer
from ecnf_tpu.training.state import init_training_state, make_update_fn

N, DIM = 19, 3
BATCH = 256
COMPUTE_DTYPE = None if "--f32" in sys.argv else "bfloat16"


def main():
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (2048, N, DIM)) * 1.5
    data = data - data.mean(axis=1, keepdims=True)
    data_flat = data.reshape(2048, -1)
    feats = jnp.zeros((2048, N), dtype=jnp.int32)

    cnf = build_cnf(
        n_frames=N, dim=DIM, sigma_min=1e-6, base_scale=2.0,
        n_blocks_egnn=5, mlp_units=(256, 256, 256, 256),
        n_invariant_feat_hidden=32, time_embedding_dim=8, n_features=1,
        compute_dtype=COMPUTE_DTYPE,
    )
    opt = build_optimizer(1e-4, use_schedule=False)
    state = init_training_state(
        cnf, opt, jax.random.PRNGKey(1), data_flat[:2], feats[:2], use_ema=True
    )
    update = make_update_fn(cnf, opt, use_ema=True)

    xb, fb = data_flat[:BATCH], feats[:BATCH]
    state, info = update(state, xb, fb)
    jax.block_until_ready(info["loss"])
    t0 = time.perf_counter()
    n_steps = 50
    for i in range(n_steps):
        s = slice((i * BATCH) % 1792, (i * BATCH) % 1792 + BATCH)
        state, info = update(state, data_flat[s], feats[s])
    jax.block_until_ready(info["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    print(
        f"qm9-scale train step ({COMPUTE_DTYPE or 'f32'}): {dt*1e3:.1f} ms "
        f"-> {1/dt:.1f} steps/s, {BATCH/dt:.0f} samples/s; "
        f"loss {float(info['loss']):.4f}"
    )

    # Reference headline: jitted sampling wall-clock (measure_sampling_time).
    cfg = SolveConfig(use_fixed_step_size=True, step_size=0.05)
    fn = jax.jit(
        lambda k: sample_cnf(cnf, state.params, k, BATCH, feats[:BATCH], cfg)
    )
    jax.block_until_ready(fn(jax.random.PRNGKey(2)))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(jax.random.PRNGKey(3 + i)))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(
        f"qm9-scale sampling (no log-prob, 20-step Dopri5, batch {BATCH}): "
        f"{best*1e3:.1f} ms -> {BATCH/best:.0f} samples/s/chip"
    )


if __name__ == "__main__":
    main()
