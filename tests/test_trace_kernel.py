"""Fused forward+trace kernel vs linearize on the flax field (interpret)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecnf_tpu.cnf.build import FlatEGNNField
from ecnf_tpu.ops.divergence import value_and_exact_divergence
from ecnf_tpu.ops.pallas.attic.trace_kernel import egnn_value_and_div_fused


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


def test_get_log_prob_fused_matches_regular():
    """End-to-end: fused_trace=True through the reverse ODE solve (interpret)."""
    from ecnf_tpu.cnf.build import build_cnf
    from ecnf_tpu.cnf.sampling import SolveConfig, get_log_prob

    n_nodes, dim, B = 5, 3, 4
    cnf = build_cnf(
        n_frames=n_nodes, dim=dim, sigma_min=0.01, base_scale=1.0,
        n_blocks_egnn=2, mlp_units=(16, 16), n_invariant_feat_hidden=8,
        time_embedding_dim=6, n_features=1,
    )
    feats = jnp.zeros((B, n_nodes), dtype=jnp.int32)
    x0 = jnp.zeros((2, n_nodes * dim))
    params = cnf.init(jax.random.PRNGKey(0), x0, jnp.zeros(2), feats[:2])
    x = cnf.sample_base(jax.random.PRNGKey(1), (B,))
    key = jax.random.PRNGKey(2)

    base_cfg = dict(use_fixed_step_size=True, step_size=0.25)
    ref = get_log_prob(cnf, params, x, key, features=feats,
                       cfg=SolveConfig(**base_cfg))
    fused = get_log_prob(
        cnf, params, x, key, features=feats,
        cfg=SolveConfig(**base_cfg, fused_trace=True, fused_batch_tile=2,
                        fused_interpret=True),
    )
    for a, b in zip(ref, fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4)
