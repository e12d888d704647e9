"""A/B trace-computation variants on TPU (bf16 LJ13 stage cost).

Compares: linearize+vmap columns (current), chunked columns, jacfwd,
and vjp rows — to find the fastest exact-trace formulation.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.ops.divergence import value_and_exact_divergence

B, N, DIM = 256, 13, 3
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
        compute_dtype="bfloat16",
    )
    feats = jnp.zeros((B, N), dtype=jnp.int32)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D))
    t = jnp.full((B,), 0.5)
    params = cnf.init(jax.random.PRNGKey(1), x[:2], t[:2], feats[:2])

    f = lambda xb: cnf.apply(params, xb, t, feats)

    t_fwd = timeit(jax.jit(f), x)
    print(f"forward only: {t_fwd*1e3:.2f} ms")

    for chunk in (None, 13, 3):
        fn = jax.jit(lambda x, c=chunk: value_and_exact_divergence(f, x, c))
        print(f"linearize cols chunk={chunk}: {timeit(fn, x)*1e3:.2f} ms")

    def jacfwd_div(xb):
        J = jax.vmap(jax.jacfwd(lambda v: f(v[None])[0]))(xb)
        return f(xb), jnp.trace(J, axis1=-2, axis2=-1)

    print(f"vmap(jacfwd per-sample): {timeit(jax.jit(jacfwd_div), x)*1e3:.2f} ms")

    def vjp_rows(xb):
        v, vjp = jax.vjp(f, xb)
        basis = jnp.eye(D)
        rows = jax.vmap(lambda e: vjp(jnp.broadcast_to(e, (B, D)))[0])(basis)
        return v, jnp.einsum("dbd->b", rows)

    print(f"vjp rows: {timeit(jax.jit(vjp_rows), x)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
