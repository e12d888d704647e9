"""Fused forward+trace kernel vs XLA linearize on real hardware (LJ13)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ecnf_tpu.cnf.build import FlatEGNNField
from ecnf_tpu.ops.divergence import value_and_exact_divergence
from ecnf_tpu.ops.pallas.attic.trace_kernel import egnn_value_and_div_fused

B, N, DIM = 256, 13, 3
UNITS, HID = (128, 128, 128), 64


def timeit(fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    net = FlatEGNNField(
        n_nodes=N, dim=DIM, n_features=1, n_invariant_feat_hidden=HID,
        time_embedding_dim=8, n_blocks_egnn=3, mlp_units=UNITS,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N * DIM))
    t = jnp.linspace(0.0, 1.0, B)
    feats = jnp.zeros((B, N), dtype=jnp.int32)
    variables = net.init(jax.random.PRNGKey(1), x[:2], t[:2], feats[:2])

    f = lambda xb: net.apply(variables, xb, t, feats)
    xla = jax.jit(lambda xb: value_and_exact_divergence(f, xb))
    t_xla, (v_ref, div_ref) = timeit(xla, x)
    print(f"XLA linearize (f32):  {t_xla*1e3:.2f} ms/stage", flush=True)

    for tile in (8, 16, 32):
        fused = jax.jit(
            lambda xb, tile=tile: egnn_value_and_div_fused(
                variables, xb, t, feats, n_nodes=N, dim=DIM, n_blocks=3,
                mlp_units=UNITS, time_embedding_dim=8, batch_tile=tile,
            )
        )
        try:
            t0 = time.perf_counter()
            t_fused, (v, div) = timeit(fused, x)
            compile_s = time.perf_counter() - t0
            errv = float(jnp.max(jnp.abs(v - v_ref)))
            errd = float(jnp.max(jnp.abs(div - div_ref)))
            print(
                f"fused tile={tile}: {t_fused*1e3:.2f} ms ({t_xla/t_fused:.2f}x) "
                f"errs v={errv:.2e} div={errd:.2e} (first+compile {compile_s:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"fused tile={tile} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
