"""Breakdown timing of the LJ13 inference hot path on the current backend.

Measures, per component: plain batched EGNN forward, linearize+trace
columns, one Dopri5 stage with divergence, full fixed-step solve.  Used to
steer kernel-level optimization (Pallas / precision / layout).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.cnf.sampling import SolveConfig, sample_and_log_prob_cnf
from ecnf_tpu.ops.divergence import value_and_exact_divergence

BATCH = 256
N, DIM = 13, 3
D = N * DIM


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cnf = build_cnf(
        n_frames=N, dim=DIM, sigma_min=0.01, base_scale=1.0,
        n_blocks_egnn=3, mlp_units=(128, 128, 128),
        n_invariant_feat_hidden=64, time_embedding_dim=8, n_features=1,
    )
    feats = jnp.zeros((BATCH, N), dtype=jnp.int32)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, D))
    t = jnp.full((BATCH,), 0.5)
    params = cnf.init(jax.random.PRNGKey(1), x[:2], t[:2], feats[:2])

    fwd = jax.jit(lambda x, t: cnf.apply(params, x, t, feats))
    t_fwd = timeit(fwd, x, t)
    print(f"forward (B={BATCH}): {t_fwd*1e3:.2f} ms")

    def trace_fn(x, t):
        f = lambda xb: cnf.apply(params, xb, t, feats)
        return value_and_exact_divergence(f, x)

    tr = jax.jit(trace_fn)
    t_tr = timeit(tr, x, t)
    print(f"fwd+exact trace ({D} cols): {t_tr*1e3:.2f} ms  "
          f"(= {t_tr/t_fwd:.1f}x forward; ideal ~{1 + D/2:.0f}x naive, "
          f"less with batching)")

    def hutch_fn(x, t):
        eps = jnp.ones_like(x)
        f = lambda xb: cnf.apply(params, xb, t, feats)
        _, jv = jax.jvp(f, (x,), (eps,))
        return jv

    th = timeit(jax.jit(hutch_fn), x, t)
    print(f"fwd+hutchinson: {th*1e3:.2f} ms")

    cfg = SolveConfig(use_fixed_step_size=True, step_size=0.05)
    solve = jax.jit(
        lambda key: sample_and_log_prob_cnf(cnf, params, key, BATCH, feats, False, cfg)
    )
    t_solve = timeit(solve, jax.random.PRNGKey(2), reps=3)
    n_stages = 20 * 6
    print(
        f"full solve (20 steps): {t_solve*1e3:.1f} ms = {n_stages} stages "
        f"x {t_solve/n_stages*1e3:.2f} ms/stage (stage trace cost {t_tr*1e3:.2f} ms)"
    )


if __name__ == "__main__":
    main()
