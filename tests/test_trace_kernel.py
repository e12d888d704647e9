"""Fused forward+trace kernel vs linearize on the flax field (interpret)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecnf_tpu.cnf.build import FlatEGNNField
from ecnf_tpu.ops.divergence import value_and_exact_divergence
from ecnf_tpu.ops.pallas.trace_kernel import egnn_value_and_div_fused


@pytest.mark.parametrize("n_nodes,units,hid", [(5, (16, 16), 8), (13, (32,), 16)])
def test_fused_trace_matches_linearize(n_nodes, units, hid):
    dim, B = 3, 4
    net = FlatEGNNField(
        n_nodes=n_nodes, dim=dim, n_features=3, n_invariant_feat_hidden=hid,
        time_embedding_dim=6, n_blocks_egnn=2, mlp_units=units,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, n_nodes * dim))
    t = jnp.linspace(0.1, 0.9, B)
    feats = jax.random.randint(jax.random.PRNGKey(1), (B, n_nodes), 0, 3)
    variables = net.init(jax.random.PRNGKey(2), x, t, feats)

    f = lambda xb: net.apply(variables, xb, t, feats)
    v_ref, div_ref = value_and_exact_divergence(f, x)

    v, div = egnn_value_and_div_fused(
        variables, x, t, feats,
        n_nodes=n_nodes, dim=dim, n_blocks=2, mlp_units=units,
        time_embedding_dim=6, batch_tile=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(div), np.asarray(div_ref), rtol=2e-4, atol=2e-4)
