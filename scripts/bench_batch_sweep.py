"""Headline-task batch-size sweep in ONE process (TPU claims are slow)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.cnf.sampling import SolveConfig, sample_and_log_prob_cnf

N, DIM = 13, 3


def main():
    cnf = build_cnf(
        n_frames=N, dim=DIM, sigma_min=0.01, base_scale=1.0,
        n_blocks_egnn=3, mlp_units=(128, 128, 128),
        n_invariant_feat_hidden=64, time_embedding_dim=8, n_features=1,
        compute_dtype="bfloat16",
    )
    x0 = jnp.zeros((2, N * DIM))
    params = cnf.init(
        jax.random.PRNGKey(0), x0, jnp.zeros(2), jnp.zeros((2, N), jnp.int32)
    )
    cfg = SolveConfig(use_fixed_step_size=True, step_size=0.05)

    for batch in (64, 128, 192, 256, 384):
        feats = jnp.zeros((batch, N), dtype=jnp.int32)
        run = jax.jit(
            lambda key, b=batch, f=feats: sample_and_log_prob_cnf(
                cnf, params, key, b, features=f, approx=False, cfg=cfg
            )
        )
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.PRNGKey(1)))
        comp = time.perf_counter() - t0
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jax.random.PRNGKey(2 + i)))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(
            f"batch={batch}: {best*1e3:.1f} ms -> {batch/best:.1f} samples/s "
            f"(compile {comp:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
