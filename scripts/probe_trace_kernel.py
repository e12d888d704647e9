"""One-off: compile the fused trace kernel at a given tile, print full error."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ecnf_tpu.cnf.build import FlatEGNNField
from ecnf_tpu.ops.pallas.attic.trace_kernel import egnn_value_and_div_fused

TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B, N, DIM = TILE, 13, 3
UNITS, HID = (128, 128, 128), 64


def main():
    net = FlatEGNNField(
        n_nodes=N, dim=DIM, n_features=1, n_invariant_feat_hidden=HID,
        time_embedding_dim=8, n_blocks_egnn=3, mlp_units=UNITS,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N * DIM))
    t = jnp.linspace(0.0, 1.0, B)
    feats = jnp.zeros((B, N), dtype=jnp.int32)
    variables = net.init(jax.random.PRNGKey(1), x[:2], t[:2], feats[:2])
    fused = jax.jit(
        lambda xb: egnn_value_and_div_fused(
            variables, xb, t, feats, n_nodes=N, dim=DIM, n_blocks=3,
            mlp_units=UNITS, time_embedding_dim=8, batch_tile=TILE,
        )
    )
    try:
        v, d = fused(x)
        jax.block_until_ready((v, d))
        print("OK", v.shape, d.shape)
    except Exception as e:
        print(type(e).__name__)
        print(str(e)[:8000])


if __name__ == "__main__":
    main()
