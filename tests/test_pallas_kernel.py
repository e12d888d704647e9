"""Fused EGCL Pallas kernel vs the flax EGNN (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecnf_tpu.cnf.build import FlatEGNNField
from ecnf_tpu.ops.pallas.attic.egcl_kernel import flat_egnn_apply_fused


@pytest.mark.parametrize("n_nodes,mlp_units,hid", [(5, (16, 16), 8), (13, (32,), 16)])
def test_fused_kernel_matches_flax(n_nodes, mlp_units, hid):
    dim = 3
    B = 8
    net = FlatEGNNField(
        n_nodes=n_nodes,
        dim=dim,
        n_features=3,
        n_invariant_feat_hidden=hid,
        time_embedding_dim=6,
        n_blocks_egnn=2,
        mlp_units=mlp_units,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, n_nodes * dim))
    t = jnp.linspace(0.1, 0.9, B)
    feats = jax.random.randint(jax.random.PRNGKey(1), (B, n_nodes), 0, 3)
    variables = net.init(jax.random.PRNGKey(2), x, t, feats)

    ref = net.apply(variables, x, t, feats)
    fused = flat_egnn_apply_fused(
        variables,
        x,
        t,
        feats,
        n_nodes=n_nodes,
        dim=dim,
        n_blocks=2,
        mlp_units=mlp_units,
        time_embedding_dim=6,
        batch_tile=4,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=2e-5)
