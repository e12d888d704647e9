"""Time the Hutchinson log-prob solve: structured tangent vs jax.jvp/linearize.

The structured hand-linearized tangent (`ops/pallas/tangent_kernel.py`) now
also takes per-sample probe directions, so the Hutchinson estimator — the
reference's default for large-D eval (`examples/config/qm9.yaml:
eval_exact_log_prob: false`) — can ride the same fast path as the exact
trace.  This measures the end-to-end solve both ways at QM9 scale.

Usage: python scripts/bench_hutchinson_tangent.py  (TPU; ~4 compiles)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.cnf.sampling import SolveConfig, get_log_prob

B = 64
N_NODES, DIM = 19, 3


def main():
    cnf = build_cnf(
        n_frames=N_NODES, dim=DIM, sigma_min=1e-6, base_scale=2.0,
        n_blocks_egnn=5, mlp_units=(256,) * 4, n_invariant_feat_hidden=32,
        time_embedding_dim=8, n_features=1, compute_dtype="bfloat16",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N_NODES * DIM)) * 0.5
    x = (x.reshape(B, N_NODES, DIM) - x.reshape(B, N_NODES, DIM).mean(1, keepdims=True)).reshape(B, -1)
    feats = jnp.zeros((B, N_NODES), dtype=jnp.int32)
    params = cnf.init(jax.random.PRNGKey(1), x[:2], jnp.zeros(2), feats[:2])
    key = jax.random.PRNGKey(7)

    for probes in (1, 4):
        out = {}
        for structured in (False, True):
            cfg = SolveConfig(
                use_fixed_step_size=True, step_size=0.05,
                hutchinson_probes=probes, structured_tangent=structured,
            )
            fn = jax.jit(
                lambda xb, k, cfg=cfg: get_log_prob(
                    cnf, params, xb, k, feats, approx=True, cfg=cfg
                )[0]
            )
            t0 = time.perf_counter()
            lp = jax.block_until_ready(fn(x, key))
            compile_s = time.perf_counter() - t0
            times = []
            for i in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(x, jax.random.PRNGKey(10 + i)))
                times.append(time.perf_counter() - t0)
            best = min(times)
            out[structured] = (best, float(jnp.mean(lp)))
            print(
                f"K={probes} structured={structured}: {best*1e3:.1f} ms/solve "
                f"({B/best:.0f} pts/s), mean log_p {float(jnp.mean(lp)):.4f} "
                f"(compile {compile_s:.0f}s)"
            )
        speedup = out[False][0] / out[True][0]
        dlp = out[True][1] - out[False][1]
        print(f"K={probes}: structured speedup {speedup:.2f}x, Δmean-log_p {dlp:+.4f}")


if __name__ == "__main__":
    main()
