"""Compare the fused Pallas EGNN forward vs plain XLA on real hardware."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ecnf_tpu.cnf.build import FlatEGNNField
from ecnf_tpu.ops.pallas.attic.egcl_kernel import flat_egnn_apply_fused

B, N, DIM = 256, 13, 3
UNITS = (128, 128, 128)
HID = 64


def timeit(fn, *args, reps=10):
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

    plain = jax.jit(lambda x, t: net.apply(variables, x, t, feats))
    t_plain, out_plain = timeit(plain, x, t)
    print(f"plain XLA forward:   {t_plain*1e3:.2f} ms")

    for tile in (8, 16, 32, 64):
        fused = jax.jit(
            lambda x, t, tile=tile: flat_egnn_apply_fused(
                variables, x, t, feats, n_nodes=N, dim=DIM, n_blocks=3,
                mlp_units=UNITS, time_embedding_dim=8, batch_tile=tile,
            )
        )
        try:
            t_fused, out_fused = timeit(fused, x, t)
            err = float(jnp.max(jnp.abs(out_fused - out_plain)))
            print(
                f"pallas fused tile={tile:3d}: {t_fused*1e3:.2f} ms "
                f"({t_plain/t_fused:.2f}x), max|diff|={err:.2e}"
            )
        except Exception as e:
            print(f"pallas fused tile={tile}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
