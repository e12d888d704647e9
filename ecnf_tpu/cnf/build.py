"""CNF factory: assemble base distribution + EGNN vector field.

Parity with the reference's `ecnf/cnf/build_cnf.py:34-102` (`build_cnf`,
`FlatEgnn`): zero-CoM Gaussian base scaled by ``base_scale`` with the
``(N-1)/N`` log-det correction, integer node-feature embedding, sinusoidal
time embedding, flat <-> ``[N, D]`` reshaping around the EGNN.
"""
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ecnf_tpu.cnf.core import FlowMatchingCNF, optimal_transport_conditional_vf
from ecnf_tpu.cnf.base import ZeroCoMGaussian, DiagGaussian
from ecnf_tpu.models.egnn import EGNN
from ecnf_tpu.models.vector_net import VectorNet
from ecnf_tpu.ops.numerics import timestep_embedding


class FlatEGNNField(nn.Module):
    """Flat-coordinate adapter around the EGNN (reference `build_cnf.py:65-93`).

    Takes ``x: [B, N*D]`` flat positions, ``t: [B]`` times and
    ``features: [B, N]`` integer node features; embeds features, builds the
    time embedding, runs the dense-edge EGNN, and returns a flat field.
    """

    n_nodes: int
    dim: int
    n_features: int
    n_invariant_feat_hidden: int
    time_embedding_dim: int
    n_blocks_egnn: int
    mlp_units: Sequence[int]
    stable_mlp: bool = False
    compute_dtype: Optional[str] = None  # e.g. "bfloat16"; params stay f32
    remat_blocks: object = False  # False | True | "dots"; see models/egnn.py

    @nn.compact
    def __call__(
        self, positions: jax.Array, time: jax.Array, node_features: jax.Array
    ) -> jax.Array:
        assert positions.ndim == 2 and time.ndim == 1
        B = positions.shape[0]
        pos = jnp.reshape(positions, (B, self.n_nodes, self.dim))
        feats = jnp.reshape(node_features, (B, self.n_nodes)).astype(jnp.int32)
        h = nn.Embed(
            num_embeddings=self.n_features, features=self.n_invariant_feat_hidden
        )(feats)
        t_emb = timestep_embedding(time, self.time_embedding_dim)
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        vectors = EGNN(
            n_blocks=self.n_blocks_egnn,
            mlp_units=self.mlp_units,
            n_invariant_feat_hidden=self.n_invariant_feat_hidden,
            stable_mlp=self.stable_mlp,
            dtype=dtype,
            remat_blocks=self.remat_blocks,
        )(pos, h, t_emb)
        return jnp.reshape(vectors, (B, self.n_nodes * self.dim))


def build_cnf(
    n_frames: int,
    dim: int,
    sigma_min: float,
    base_scale: float,
    n_blocks_egnn: int,
    mlp_units: Sequence[int],
    n_invariant_feat_hidden: int,
    time_embedding_dim: int,
    n_features: int,
    stable_mlp: bool = False,
    compute_dtype: Optional[str] = None,
    remat_blocks: object = False,
) -> FlowMatchingCNF:
    """Build the molecular-coordinate CNF (reference `build_cnf.py:34-102`).

    ``compute_dtype="bfloat16"`` runs the EGNN's MLP stack in bf16
    (parameters and geometry stay float32) — ~2x faster on TPU where the
    edge tensors are HBM-bandwidth-bound.  ``remat_blocks`` rematerializes
    each EGCL block in backward passes (training-only lever; see
    `models/egnn.py`).
    """
    base = ZeroCoMGaussian(n_nodes=n_frames, dim=dim, scale=base_scale)
    net = FlatEGNNField(
        n_nodes=n_frames,
        dim=dim,
        n_features=int(n_features),
        n_invariant_feat_hidden=n_invariant_feat_hidden,
        time_embedding_dim=time_embedding_dim,
        n_blocks_egnn=n_blocks_egnn,
        mlp_units=tuple(mlp_units),
        stable_mlp=stable_mlp,
        compute_dtype=compute_dtype,
        remat_blocks=remat_blocks,
    )
    # Fused forward+exact-divergence Pallas kernel (optional fast path for
    # the exact-trace ODE solves).  Only built for the plain constant-width
    # MLP EGNN, which is what every shipped config uses.
    fused = None
    if not stable_mlp and len(set(mlp_units)) == 1:
        from ecnf_tpu.ops.pallas.attic.trace_kernel import egnn_value_and_div_fused

        def fused(params, x, t, features, batch_tile=8, interpret=False):
            return egnn_value_and_div_fused(
                params, x, t, features,
                n_nodes=n_frames, dim=dim, n_blocks=n_blocks_egnn,
                mlp_units=tuple(mlp_units),
                time_embedding_dim=time_embedding_dim,
                batch_tile=batch_tile, interpret=interpret,
            )

    # Hand-linearized trace fast path (ops/pallas/tangent_kernel.py): one
    # residual-capturing primal shared by all trace columns.  Same math as
    # jax.linearize (tested exact in f32); measured faster on TPU.
    tangent = None
    if not stable_mlp:
        from ecnf_tpu.ops.pallas.tangent_kernel import egnn_value_and_trace

        def tangent(
            params, x, t, features, basis, trace_offset=None,
            use_kernel=False, batch_tile=8, interpret=False,
        ):
            return egnn_value_and_trace(
                params, x, t, features, basis,
                n_nodes=n_frames, dim=dim, n_blocks=n_blocks_egnn,
                mlp_units=tuple(mlp_units),
                time_embedding_dim=time_embedding_dim,
                compute_dtype=compute_dtype, trace_offset=trace_offset,
                use_kernel=use_kernel, batch_tile=batch_tile,
                interpret=interpret,
            )

    # Structural exact-trace shortcut: the EGNN is translation-invariant up
    # to its output recentring (`models/egnn.py:178,205`), so
    # ``f(x + 1 (x) delta) = f(x) - final_scaling * 1 (x) delta`` exactly and
    # each of the ``dim`` uniform-translation directions is a Jacobian
    # eigenvector with eigenvalue ``-final_scaling``.  The exact trace thus
    # needs JVPs only on the ``(n_frames-1)*dim`` zero-CoM basis columns,
    # plus the analytic translation term ``-dim * final_scaling`` — 3 fewer
    # network streams per ODE stage at LJ13 (39 -> 36), verified exact in
    # `tests/test_ode.py`.
    from ecnf_tpu.ops.divergence import zero_com_trace_basis

    com_basis = zero_com_trace_basis(n_frames, dim)

    def exact_trace_plan(params):
        s = params["params"]["EGNN_0"]["final_scaling"]
        return com_basis, -dim * s

    return FlowMatchingCNF(
        init=net.init,
        apply=net.apply,
        sample_base=base.sample,
        get_x_t_and_conditional_u_t=partial(
            optimal_transport_conditional_vf, sigma_min=sigma_min
        ),
        log_prob_base=base.log_prob,
        sample_and_log_prob_base=base.sample_and_log_prob,
        fused_value_and_div=fused,
        exact_trace_plan=exact_trace_plan,
        tangent_value_and_div=tangent,
    )


def build_mlp_cnf(
    dim: int,
    sigma_min: float,
    base_scale: float,
    features: Sequence[int] = (512, 512, 512),
    embedding_dim: int = 32,
) -> FlowMatchingCNF:
    """Build a plain-MLP CNF on a diagonal Gaussian base.

    Equivalent of the reference MoG example's CNF assembly
    (`examples/MoG_target.py:98-110`).
    """
    base = DiagGaussian(dim=dim, scale=base_scale)
    net = VectorNet(features=tuple(features), embedding_dim=embedding_dim)
    return FlowMatchingCNF(
        init=net.init,
        apply=net.apply,
        sample_base=base.sample,
        get_x_t_and_conditional_u_t=partial(
            optimal_transport_conditional_vf, sigma_min=sigma_min
        ),
        log_prob_base=base.log_prob,
        sample_and_log_prob_base=base.sample_and_log_prob,
    )
