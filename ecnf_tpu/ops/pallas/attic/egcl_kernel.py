"""Fused EGCL forward as a Pallas TPU kernel.  **CLOSED — attic.**

Measured loser vs plain XLA (0.85x at LJ13 scale, 0.50x at flagship; see
docs/PERF.md and `attic/__init__.py`).  Not imported by any live path;
covered by interpret-mode tests only.

The EGCL's cost is dominated by the ``[B, N, N, U]`` edge-message tensor
flowing through ~7 dense layers; under plain XLA each layer round-trips
that tensor through HBM, making the block bandwidth-bound.  This kernel
runs one entire EGCL (time-conditioning Dense -> phi_e -> phi_x ->
coordinate update -> gated aggregation -> phi_h -> residuals) per batch
tile with every edge intermediate resident in VMEM; only the tiny node
tensors (``[B, N, H]``, ``[B, N, 3]``) touch HBM between blocks.

Same math as `ecnf_tpu/models/egnn.py` (which itself carries reference
parity, `ecnf/nets/egnn.py:49-114`), including the Gram-matrix squared
distances and the shifts-as-matmul aggregation identity.

Scope: forward only (no custom VJP/JVP yet) — usable on the pure sampling
path (`sample_cnf`), which never differentiates the field.  Requires
``stable_mlp=False`` and constant-width ``mlp_units`` (all shipped configs).

Status (measured on TPU v5e, LJ13 config, B=256): numerically exact vs the
flax path (max|diff| 1.3e-5) but NOT yet faster — 0.85x plain XLA at
batch_tile=8, VMEM OOM at tile=16 (the unrolled layer chain keeps too many
live buffers).  XLA's own fusion already keeps these shapes fairly well
scheduled; the profitable lever at these sizes is bf16 compute
(`compute_dtype="bfloat16"`, ~2x end-to-end).  Kept as the foundation for a
fused forward+Jacobian-trace kernel (where XLA does leave bandwidth on the
table); treat as experimental until it beats the default path.
"""
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _edge_matmul(m, w, b):
    """[Bt, N, N, U] @ [U, V] + b — flattened to a 2-D MXU matmul."""
    Bt, N, _, U = m.shape
    out = jnp.dot(
        m.reshape(Bt * N * N, U), w, preferred_element_type=jnp.float32
    ) + b
    return out.reshape(Bt, N, N, -1)


def _egcl_kernel(
    n_weights: int,
    n_phi_layers: Tuple[int, int, int],
    normalization_constant: float,
    h_width: int,
    *refs,
):
    """Kernel body.  refs = (vec, h, temb, w_0..w_{n-1}, vec_out, h_out)."""
    vec_ref, h_ref, temb_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3 : 3 + n_weights]
    vec_out_ref, h_out_ref = refs[3 + n_weights], refs[4 + n_weights]

    ws = [r[:] for r in w_refs]
    idx = 0

    def take(n):
        nonlocal idx
        out = ws[idx : idx + n]
        idx += n
        return out

    n_e, n_x, n_h = n_phi_layers

    vec = vec_ref[:].astype(jnp.float32)  # [Bt, N, D]
    h = h_ref[:].astype(jnp.float32)  # [Bt, N, Hin]
    temb = temb_ref[:].astype(jnp.float32)  # [Bt, T]
    Bt, N, D = vec.shape

    # --- time-conditioning ConcatDense([h, temb]) -> [Bt, N, H] ----------
    cd_wh, cd_wt, cd_b = take(3)
    h = (
        jnp.dot(h.reshape(Bt * N, -1), cd_wh, preferred_element_type=jnp.float32).reshape(Bt, N, -1)
        + jnp.dot(temb, cd_wt, preferred_element_type=jnp.float32)[:, None, :]
        + cd_b
    )

    # --- pairwise geometry (Gram identity; see models/egnn.py) -----------
    gram = jax.lax.dot_general(
        vec, vec, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [Bt, N, N]
    r2 = jnp.sum(vec * vec, axis=-1)  # [Bt, N]
    l2 = jnp.maximum(r2[:, :, None] + r2[:, None, :] - 2.0 * gram, 0.0)
    lengths = jnp.where(l2 == 0, 1.0, l2) ** 0.5
    rows = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    mask = (rows != cols).astype(jnp.float32)  # [N, N]

    # --- phi_e: fused first layer + constant-width tail ------------------
    we_s, we_r, we_l, be = take(4)
    A = jnp.dot(h.reshape(Bt * N, -1), we_s, preferred_element_type=jnp.float32).reshape(Bt, N, -1)
    Bm = jnp.dot(h.reshape(Bt * N, -1), we_r, preferred_element_type=jnp.float32).reshape(Bt, N, -1)
    m = _silu(
        A[:, None, :, :] + Bm[:, :, None, :] + l2[..., None] * we_l[0] + be
    )  # [Bt, N, N, U]
    for _ in range(n_e - 1):
        w, b = take(2)
        m = _silu(_edge_matmul(m, w, b))

    # --- phi_x torso + variance-scaled output Dense ----------------------
    px = m
    for _ in range(n_x):
        w, b = take(2)
        px = _silu(_edge_matmul(px, w, b))
    xw, xb = take(2)
    px = _edge_matmul(px, xw, xb)  # [Bt, N, N, 1]

    wgt = px[..., 0] * mask[None] / (normalization_constant + lengths)
    shifts = jnp.sum(wgt, axis=2)[:, :, None] * vec - jax.lax.dot_general(
        wgt, vec, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    vec_out = vec + shifts / (N - 1)  # residual_x

    # --- gated feature aggregation + phi_h -------------------------------
    gw, gb = take(2)
    gate = jax.nn.sigmoid(_edge_matmul(m, gw, gb))  # [Bt, N, N, 1]
    m_i = jnp.sum(m * gate * mask[None, :, :, None], axis=2) / np.sqrt(N - 1)

    wh_m, wh_h, bh = take(3)
    hh = _silu(
        jnp.dot(m_i.reshape(Bt * N, -1), wh_m, preferred_element_type=jnp.float32)
        + jnp.dot(h.reshape(Bt * N, -1), wh_h, preferred_element_type=jnp.float32)
        + bh
    ).reshape(Bt, N, -1)
    for _ in range(n_h - 1):
        w, b = take(2)
        hh = _silu(
            jnp.dot(hh.reshape(Bt * N, -1), w, preferred_element_type=jnp.float32) + b
        ).reshape(Bt, N, -1)
    wout, bout = take(2)
    hh = (
        jnp.dot(hh.reshape(Bt * N, -1), wout, preferred_element_type=jnp.float32) + bout
    ).reshape(Bt, N, -1)
    h_out = h + hh  # residual_h

    assert idx == n_weights, (idx, n_weights)
    vec_out_ref[:] = vec_out
    h_out_ref[:] = h_out


def _flatten_egcl_weights(cd, egcl, mlp_units: Sequence[int], h_width: int):
    """Order the flax EGCL (+ its preceding time-ConcatDense) params into
    the kernel's flat weight list.

    Args:
        cd: the block's time-conditioning ``ConcatDense_i`` params.
        egcl: the block's ``EGCL_i`` params.
    """
    ws = []
    # time ConcatDense kernel is [(H + T), H]: split rows into h / temb parts.
    k = cd["kernel"]
    ws += [k[:h_width], k[h_width:], cd["bias"]]

    def mlp_layers(p, n_layers):
        # Our MLP's first layer is ConcatDense_0, followed by Dense_0..Dense_k.
        keys = [k for k in p if k.startswith("ConcatDense")] + sorted(
            (k for k in p if k.startswith("Dense")),
            key=lambda s: int(s.split("_")[-1]),
        )
        assert len(keys) == n_layers, (keys, n_layers)
        return [p[k] for k in keys]

    n_units = len(mlp_units)
    # phi_e (MLP_0): first layer fused over [h_s, h_r, l2].
    e_layers = mlp_layers(egcl["MLP_0"], n_units)
    k0 = e_layers[0]["kernel"]
    ws += [k0[:h_width], k0[h_width : 2 * h_width], k0[2 * h_width :], e_layers[0]["bias"]]
    for l in e_layers[1:]:
        ws += [l["kernel"], l["bias"]]
    # phi_x torso (MLP_1) + output Dense_0.
    for l in mlp_layers(egcl["MLP_1"], n_units):
        ws += [l["kernel"], l["bias"]]
    ws += [egcl["Dense_0"]["kernel"], egcl["Dense_0"]["bias"]]
    # gate Dense_1.
    ws += [egcl["Dense_1"]["kernel"], egcl["Dense_1"]["bias"]]
    # phi_h (MLP_2): units (*mlp_units, H); first layer fused over [m_i, h].
    h_layers = mlp_layers(egcl["MLP_2"], n_units + 1)
    kh = h_layers[0]["kernel"]
    u = mlp_units[0]
    ws += [kh[:u], kh[u:], h_layers[0]["bias"]]
    for l in h_layers[1:-1]:
        ws += [l["kernel"], l["bias"]]
    ws += [h_layers[-1]["kernel"], h_layers[-1]["bias"]]
    return ws


def egcl_fused(
    vec: jax.Array,
    h: jax.Array,
    temb: jax.Array,
    weights: Sequence[jax.Array],
    mlp_units: Sequence[int],
    normalization_constant: float = 1.0,
    batch_tile: int = 16,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run one fused EGCL block.

    Args:
        vec: ``[B, N, D]`` centered coordinates.
        h: ``[B, N, H]`` node features.
        temb: ``[B, T]`` time embedding.
        weights: flat list from `_flatten_egcl_weights`.
        batch_tile: batch rows per grid step (VMEM budget knob).

    Returns:
        ``(vec_out, h_out)``.
    """
    B, N, D = vec.shape
    H = h.shape[-1]
    n_units = len(mlp_units)
    Bt = min(batch_tile, B)
    assert B % Bt == 0, f"batch {B} not divisible by tile {Bt}"

    n_weights = len(weights)
    kernel = functools.partial(
        _egcl_kernel,
        n_weights,
        (n_units, n_units, n_units),
        normalization_constant,
        H,
    )

    tile = lambda shape: pl.BlockSpec(
        (Bt, *shape), lambda i: (i, *([0] * len(shape))), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    vec_out, h_out = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[tile((N, D)), tile((N, H)), tile((temb.shape[-1],))]
        + [full() for _ in range(n_weights)],
        out_specs=(tile((N, D)), tile((N, H))),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), jnp.float32),
            jax.ShapeDtypeStruct((B, N, H), jnp.float32),
        ),
        interpret=interpret,
    )(vec, h, temb, *weights)
    return vec_out, h_out


def egnn_forward_fused(
    egnn_params,
    positions: jax.Array,
    node_features: jax.Array,
    time_embedding: jax.Array,
    n_blocks: int,
    mlp_units: Sequence[int],
    normalization_constant: float = 1.0,
    batch_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Full EGNN torso forward via per-block fused Pallas kernels.

    Mirrors `ecnf_tpu.models.egnn.EGNN.__call__` (residual_x/h defaults,
    output recentring, final_scaling) with each block's edge computation in
    one VMEM-resident kernel.

    Args:
        egnn_params: the flax ``EGNN_0`` params subtree.
        positions: ``[B, N, D]``.
        node_features: ``[B, N, H]``.
        time_embedding: ``[B, T]``.
    """
    h_width = node_features.shape[-1]
    pos_mean = jnp.mean(positions, axis=-2, keepdims=True)
    vec = positions - pos_mean
    initial_vec = vec
    h = node_features
    for i in range(n_blocks):
        weights = _flatten_egcl_weights(
            egnn_params[f"ConcatDense_{i}"],
            egnn_params[f"EGCL_{i}"],
            mlp_units,
            h_width,
        )
        vec, h = egcl_fused(
            vec,
            h,
            time_embedding,
            weights,
            mlp_units,
            normalization_constant=normalization_constant,
            batch_tile=batch_tile,
            interpret=interpret,
        )
    vec = vec - initial_vec  # residual_x unwind
    vec = vec - pos_mean
    return vec * egnn_params["final_scaling"]


def flat_egnn_apply_fused(
    variables,
    x: jax.Array,
    t: jax.Array,
    features: jax.Array,
    n_nodes: int,
    dim: int,
    n_blocks: int,
    mlp_units: Sequence[int],
    time_embedding_dim: int,
    batch_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fast path for ``FlatEGNNField.apply`` on the sampling path.

    Embedding lookup + timestep embedding run in plain JAX (tiny); the EGNN
    torso runs through the fused kernels.  Forward-only: do not
    differentiate through this function.
    """
    from ecnf_tpu.ops.numerics import timestep_embedding

    p = variables["params"]
    B = x.shape[0]
    pos = jnp.reshape(x, (B, n_nodes, dim))
    feats = jnp.reshape(features, (B, n_nodes)).astype(jnp.int32)
    h = jnp.take(p["Embed_0"]["embedding"], feats, axis=0)
    t_emb = timestep_embedding(t, time_embedding_dim)
    vec = egnn_forward_fused(
        p["EGNN_0"], pos, h, t_emb, n_blocks, mlp_units,
        batch_tile=batch_tile, interpret=interpret,
    )
    return jnp.reshape(vec, (B, n_nodes * dim))
