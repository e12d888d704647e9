"""Fused EGNN forward + exact Jacobian-trace as one Pallas kernel.
**CLOSED — attic.**

VMEM-infeasible at the headline config; superseded by the shipped
structured-tangent XLA form (`ops/pallas/tangent_kernel.py`, default-on).
See docs/PERF.md and `attic/__init__.py`.  Reachable only via the
`SolveConfig(fused_trace=True)` experiment flag and the interpret-mode
tests.

The exact-trace path (39/40 of the headline workload's FLOPs) streams
every tangent tensor through HBM between layers under XLA.  This kernel
computes, per batch tile, the *entire* flat EGNN field AND its divergence
with all primal residuals and the active tangent stream resident in VMEM:

- the tile-level forward is plain jnp code (same math as
  `ecnf_tpu/models/egnn.py`, Gram distances + matmul aggregation);
- the tangent program is derived *inside the kernel body* with
  `jax.linearize` — tracing machinery runs at lowering time, so Mosaic
  sees one fused primal+JVP graph; no hand-written tangent rules;
- the D basis columns run in a `fori_loop` over the linearized function
  (compile size ~2x the forward, not D x).

Forward-only wrt autodiff (used on the sampling/log-prob path, which never
differentiates the field).  Requires stable_mlp=False and constant-width
mlp_units.
"""
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecnf_tpu.ops.pallas.attic.egcl_kernel import _flatten_egcl_weights


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _tile_egnn(
    pos, h0, temb, ws, n_blocks: int, n_units: int, C: float, N: int, D: int
):
    """[Bt, N, D] -> [Bt, N, D] EGNN field on one tile (pure jnp).

    ``ws`` is the per-block flat weight list (concatenated over blocks);
    math identical to `models/egnn.py` + `cnf/build.py` (recentring,
    residual unwind, final scaling).  No flat<->[N,D] reshapes in here:
    Mosaic cannot shape-cast across the lane dimension
    (``vector<8x39> -> vector<8x13x3>`` is rejected), so the flat view
    lives outside the kernel.
    """
    idx = 0

    def take(n):
        nonlocal idx
        out = ws[idx : idx + n]
        idx += n
        return out

    pos_mean = jnp.mean(pos, axis=-2, keepdims=True)
    vec = pos - pos_mean
    init_vec = vec
    h = h0

    rows = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    mask = (rows != cols).astype(jnp.float32)

    mm = lambda a, w: jnp.dot(
        a.reshape(-1, a.shape[-1]), w, preferred_element_type=jnp.float32
    ).reshape(*a.shape[:-1], w.shape[-1])

    for _ in range(n_blocks):
        # time-conditioning ConcatDense
        cd_wh, cd_wt, cd_b = take(3)
        h = mm(h, cd_wh) + jnp.dot(temb, cd_wt, preferred_element_type=jnp.float32)[:, None, :] + cd_b

        gram = jax.lax.dot_general(
            vec, vec, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        r2 = jnp.sum(vec * vec, axis=-1)
        l2 = jnp.maximum(r2[:, :, None] + r2[:, None, :] - 2.0 * gram, 0.0)
        lengths = jnp.where(l2 == 0, 1.0, l2) ** 0.5

        we_s, we_r, we_l, be = take(4)
        A = mm(h, we_s)
        Bm = mm(h, we_r)
        # we_l stays rank-2 ([1, H]) — Mosaic's layout inference aborts on
        # rank-1 vectors inside this body (layout.h check 1 vs 2).
        m = _silu(A[:, None, :, :] + Bm[:, :, None, :] + l2[..., None] * we_l + be)
        for _ in range(n_units - 1):
            w, b = take(2)
            m = _silu(mm(m, w) + b)

        px = m
        for _ in range(n_units):
            w, b = take(2)
            px = _silu(mm(px, w) + b)
        xw, xb = take(2)
        px = mm(px, xw) + xb

        wgt = px[..., 0] * mask[None] / (C + lengths)
        shifts = jnp.sum(wgt, axis=2)[:, :, None] * vec - jax.lax.dot_general(
            wgt, vec, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        vec = vec + shifts / (N - 1)

        gw, gb = take(2)
        gate = jax.nn.sigmoid(mm(m, gw) + gb)
        m_i = jnp.sum(m * gate * mask[None, :, :, None], axis=2) / np.sqrt(N - 1)

        wh_m, wh_h, bh = take(3)
        hh = _silu(mm(m_i, wh_m) + mm(h, wh_h) + bh)
        for _ in range(n_units - 1):
            w, b = take(2)
            hh = _silu(mm(hh, w) + b)
        wout, bout = take(2)
        h = h + (mm(hh, wout) + bout)

    final_scaling = take(1)[0][0, 0]  # scalar extract of the (1, 1) carrier
    vec = vec - init_vec
    vec = vec - pos_mean
    vec = vec * final_scaling
    return vec


def _trace_kernel(
    n_weights: int, n_blocks: int, n_units: int, C: float, N: int, D: int, *refs
):
    """refs = (x, h0, temb, w0..w_{n-1}, out_v, out_div)."""
    x_ref, h_ref, temb_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3 : 3 + n_weights]
    out_v_ref, out_div_ref = refs[3 + n_weights], refs[4 + n_weights]

    x = x_ref[:].astype(jnp.float32)  # [Bt, N, D]
    h0 = h_ref[:].astype(jnp.float32)
    temb = temb_ref[:].astype(jnp.float32)
    ws = [r[:] for r in w_refs]
    Bt = x.shape[0]

    f = functools.partial(
        _tile_egnn,
        h0=h0, temb=temb, ws=ws, n_blocks=n_blocks, n_units=n_units,
        C=C, N=N, D=D,
    )
    value, lin = jax.linearize(f, x)

    # Basis vector e_d over the flattened (node, dim) index, materialized as
    # an [N, D] one-hot (flat index = n*D + d stays outside the kernel's
    # vector reshapes).
    flat_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (N, D), 0) * D
        + jax.lax.broadcasted_iota(jnp.int32, (N, D), 1)
    )

    def col(d, acc):
        e = (flat_ids == d).astype(jnp.float32)[None]  # [1, N, D]
        jv = lin(jnp.broadcast_to(e, (Bt, N, D)))
        # Keep the carry rank-2 ([Bt, 1]): Mosaic's layout inference aborts
        # on rank-1 loop carries.
        return acc + jnp.sum(jnp.sum(jv * e, axis=-1), axis=-1, keepdims=True)

    div = jax.lax.fori_loop(0, N * D, col, jnp.zeros((Bt, 1), jnp.float32))
    out_v_ref[:] = value
    out_div_ref[:] = div


def egnn_value_and_div_fused(
    variables,
    x: jax.Array,
    t: jax.Array,
    features: jax.Array,
    n_nodes: int,
    dim: int,
    n_blocks: int,
    mlp_units: Sequence[int],
    time_embedding_dim: int,
    normalization_constant: float = 1.0,
    batch_tile: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused (field value, exact divergence) of the flat EGNN field.

    Drop-in alternative to `value_and_exact_divergence` over
    `FlatEGNNField.apply` for the augmented ODE state.

    Returns ``(v [B, N*D], div [B])``.
    """
    from ecnf_tpu.ops.numerics import timestep_embedding

    p = variables["params"]
    B = x.shape[0]
    ND = n_nodes * dim
    feats = jnp.reshape(features, (B, n_nodes)).astype(jnp.int32)
    h0 = jnp.take(p["Embed_0"]["embedding"], feats, axis=0)
    temb = timestep_embedding(t, time_embedding_dim)

    egnn = p["EGNN_0"]
    ws = []
    for i in range(n_blocks):
        ws += _flatten_egcl_weights(
            egnn[f"ConcatDense_{i}"], egnn[f"EGCL_{i}"], mlp_units, h0.shape[-1]
        )
    # 0-d refs are not indexable in pallas; carry the scalar as (1, 1).
    ws.append(jnp.asarray(egnn["final_scaling"]).reshape(1, 1))

    Bt = min(batch_tile, B)
    assert B % Bt == 0, f"batch {B} not divisible by tile {Bt}"
    # Mosaic requires the second-to-last block dim to be a multiple of 8
    # (sublane tiling) unless it spans the full array.
    assert interpret or Bt % 8 == 0 or Bt == B, f"batch tile {Bt} must be a multiple of 8"
    n_weights = len(ws)

    kernel = functools.partial(
        _trace_kernel,
        n_weights, n_blocks, len(mlp_units), normalization_constant,
        n_nodes, dim,
    )
    tile = lambda shape: pl.BlockSpec(
        (Bt, *shape), lambda i: (i, *([0] * len(shape))), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    v, div = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[
            tile((n_nodes, dim)),
            tile((n_nodes, h0.shape[-1])),
            tile((temb.shape[-1],)),
        ]
        + [full() for _ in range(n_weights)],
        out_specs=(tile((n_nodes, dim)), tile((1,))),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_nodes, dim), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        interpret=interpret,
    )(x.reshape(B, n_nodes, dim), h0, temb, *ws)
    return v.reshape(B, ND), div[:, 0]
