"""E(n)-equivariant GNN vector field — dense-edge, batched-first.

Math parity with the reference's `ecnf/nets/egnn.py:15-190` (EGCL message
MLP on ``[h_sender, h_receiver, |x_s - x_r|^2]``, variance-scaled coordinate
gate, ``C + |vec|`` normalization, sigmoid-gated feature aggregation,
``1/(N-1)`` and ``1/sqrt(N-1)`` scalings, residuals, output recentring and
learnable ``final_scaling``) — re-architected for TPU:

- **Dense edges.** The reference gathers per-edge tensors through explicit
  sender/receiver index lists and aggregates with ``e3nn.scatter_sum``
  (`egnn.py:73-104`).  Here edges live on a dense ``[B, N, N]`` lattice with
  a diagonal mask; "scatter-sum over receivers" becomes a masked sum over
  the sender axis (an einsum the MXU loves), and gathers disappear entirely.
- **Fused concat layers.** Every ``concat -> Dense`` becomes split matmuls
  on compact operands (see `ecnf_tpu/models/mlp.py`): the hot
  ``[B, N, N, 2H+1] @ W`` edge matmul is decomposed into two ``[B, N, H]``
  matmuls plus a rank-1 length term, saving a factor ~N of FLOPs and the
  whole concat tensor of HBM traffic.
- **Batched-first.** No vmap wrapper: batch is a leading dim everywhere
  (the reference auto-vmaps rank-3 inputs at `egnn.py:136-141`).
"""
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ecnf_tpu.ops.graph import dense_edge_mask
from ecnf_tpu.models.mlp import MLP, StableMLP, ConcatDense


class EGCL(nn.Module):
    """One E(n)-equivariant graph convolution layer (dense edges).

    Attribute parity with reference `ecnf/nets/egnn.py:15-47`.
    """

    mlp_units: Sequence[int]
    n_invariant_feat_hidden: int
    activation_fn: Callable = jax.nn.silu
    residual_h: bool = True
    residual_x: bool = True
    stable_mlp: bool = False
    normalization_constant: float = 1.0
    variance_scaling_init: float = 0.001
    dtype: Optional[jnp.dtype] = None  # compute dtype for the edge MLPs

    @nn.compact
    def __call__(
        self, vectors: jax.Array, h: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Args:
            vectors: ``[B, N, D]`` equivariant coordinates.
            h: ``[B, N, H]`` invariant features.

        Returns:
            ``(vectors_out [B, N, D], features_out [B, N, H])``.
        """
        assert vectors.ndim == 3 and h.ndim == 3
        B, N, D = vectors.shape
        avg_num_neighbours = N - 1
        mlp_cls = StableMLP if self.stable_mlp else MLP

        # Pairwise squared distances WITHOUT materializing the [B, N, N, D]
        # difference tensor: Gram-matrix identity
        #   |x_i - x_j|^2 = r_i + r_j - 2 x_i . x_j
        # — one [N, D] @ [D, N] matmul per sample (MXU) instead of an
        # HBM-resident rank-4 tensor.  Clamped at 0 (float cancellation) and
        # the safe-norm convention preserved: exact zeros report length 1
        # (reference `utils/numerical.py:7-10`), keeping gradients finite on
        # the (masked-out) diagonal.
        gram = jnp.einsum("bnd,bmd->bnm", vectors, vectors)  # [B, N, N]
        r2 = jnp.diagonal(gram, axis1=-2, axis2=-1)  # [B, N]
        l2 = jnp.maximum(r2[:, :, None] + r2[:, None, :] - 2.0 * gram, 0.0)
        lengths = jnp.where(l2 == 0, 1.0, l2) ** 0.5  # [B, N, N]
        mask = dense_edge_mask(N, dtype=vectors.dtype)  # [N, N]

        # phi_e on [h_sender, h_receiver, |diff|^2] (reference `egnn.py:76-79`)
        # with the concat fused away: sender j broadcasts along axis i (1),
        # receiver i along axis j (2).
        m_ij = mlp_cls(
            self.mlp_units,
            activation=self.activation_fn,
            activate_final=True,
            dtype=self.dtype,
        )(
            h[:, None, :, :],  # senders j
            h[:, :, None, :],  # receivers i
            l2[..., None],
        )  # [B, N, N, U]

        # Coordinate update (reference `egnn.py:82-96`).
        phi_x_out = mlp_cls(
            self.mlp_units,
            activation=self.activation_fn,
            activate_final=True,
            dtype=self.dtype,
        )(m_ij)
        phi_x_out = nn.Dense(
            1,
            kernel_init=nn.initializers.variance_scaling(
                self.variance_scaling_init, "fan_avg", "uniform"
            ),
            dtype=self.dtype,
        )(phi_x_out)  # [B, N, N, 1]
        # Aggregate WITHOUT the [B, N, N, D] shift tensor: with
        #   w_ij = mask * phi_x_ij / (C + |x_i - x_j|)
        # the reference's scatter-sum of w_ij (x_i - x_j) over senders j
        # (`egnn.py:85-95`) is exactly
        #   (sum_j w_ij) x_i - (W x)_i
        # — a row-sum plus one [N, N] @ [N, D] matmul.  Geometry and
        # aggregation stay in f32 for equivariance accuracy.
        w = phi_x_out[..., 0].astype(vectors.dtype) * mask / (
            self.normalization_constant + lengths
        )  # [B, N, N]
        shifts_i = jnp.sum(w, axis=2)[:, :, None] * vectors - jnp.einsum(
            "bij,bjd->bid", w, vectors
        )
        vectors_out = shifts_i / avg_num_neighbours

        # Attention-gated feature aggregation (reference `egnn.py:99-106`).
        gate = jax.nn.sigmoid(nn.Dense(1, dtype=self.dtype)(m_ij))  # [B, N, N, 1]
        m_i = jnp.sum(
            (m_ij * gate).astype(vectors.dtype) * mask[None, :, :, None], axis=2
        ) / jnp.sqrt(
            jnp.asarray(avg_num_neighbours, dtype=vectors.dtype)
        )  # [B, N, U]
        features_out = mlp_cls(
            (*self.mlp_units, self.n_invariant_feat_hidden),
            activation=self.activation_fn,
            activate_final=False,
            dtype=self.dtype,
        )(m_i, h)  # fused concat [m_i, h] (reference `egnn.py:105-106`)
        features_out = features_out.astype(h.dtype)

        if self.residual_h:
            features_out = features_out + h
        if self.residual_x:
            vectors_out = vectors_out + vectors
        return vectors_out, features_out


class EGNN(nn.Module):
    """EGNN torso: per-block time-conditioned EGCLs over dense edges.

    Parity with reference `ecnf/nets/egnn.py:117-190`.
    """

    n_blocks: int
    mlp_units: Sequence[int]
    n_invariant_feat_hidden: int
    activation_fn: Callable = jax.nn.silu
    stable_mlp: bool = False
    residual_h: bool = True
    residual_x: bool = True
    normalization_constant: float = 1.0
    variance_scaling_init: float = 0.001
    dtype: Optional[jnp.dtype] = None
    # Rematerialize each EGCL block in the backward pass (jax.checkpoint):
    # the edge-MLP activations ([B, N, N, U] x ~10 tensors/block) dominate
    # HBM traffic, and the training backward runs at ~55-70% of achievable
    # bandwidth when they round-trip HBM between forward and backward.
    # False = store everything (default; measured fastest at QM9 scale),
    # True = full remat, "dots" = save matmul outputs, recompute only the
    # elementwise tail (jax.checkpoint_policies.dots_saveable).  Measured
    # A/B: scripts/train_step_profile.py / docs/PERF.md.
    remat_blocks: object = False

    @nn.compact
    def __call__(
        self,
        positions: jax.Array,
        node_features: jax.Array,
        global_features: jax.Array,
    ) -> jax.Array:
        """Args:
            positions: ``[B, N, D]``.
            node_features: ``[B, N, H]`` invariant features.
            global_features: ``[B, T]`` time embedding.

        Returns:
            ``[B, N, D]`` equivariant vector field.
        """
        assert positions.ndim == 3
        B, N, D = positions.shape

        pos_mean = jnp.mean(positions, axis=-2, keepdims=True)
        vectors = positions - pos_mean
        initial_vectors = vectors
        h = node_features

        # Explicit names keep parameter paths (EGCL_i) identical with and
        # without remat, so checkpoints are interchangeable.
        if self.remat_blocks == "dots":
            egcl_cls = nn.remat(
                EGCL, policy=jax.checkpoint_policies.dots_saveable)
        elif self.remat_blocks:
            egcl_cls = nn.remat(EGCL)
        else:
            egcl_cls = EGCL
        for i in range(self.n_blocks):
            # Time conditioning: Dense over [h, t_emb] with the per-node
            # repeat of t_emb fused away (reference `egnn.py:166-167`).
            h = ConcatDense(self.n_invariant_feat_hidden, dtype=self.dtype)(
                h, global_features[:, None, :]
            ).astype(positions.dtype)
            vectors, h = egcl_cls(
                mlp_units=self.mlp_units,
                n_invariant_feat_hidden=self.n_invariant_feat_hidden,
                activation_fn=self.activation_fn,
                residual_h=self.residual_h,
                residual_x=self.residual_x,
                normalization_constant=self.normalization_constant,
                variance_scaling_init=self.variance_scaling_init,
                stable_mlp=self.stable_mlp,
                dtype=self.dtype,
                name=f"EGCL_{i}",
            )(vectors, h)

        if self.residual_x:
            vectors = vectors - initial_vectors

        # Recentre the output field (reference `egnn.py:186`).
        vectors = vectors - pos_mean
        vectors = vectors * self.param(
            "final_scaling", nn.initializers.ones_init(), ()
        )
        return vectors
