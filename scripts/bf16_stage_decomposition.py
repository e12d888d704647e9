"""Decompose the bf16 exact-trace stage cost: slope/intercept vs column count.

docs/PERF.md records that the structural trace plan (36 columns instead of
39 for LJ13) gains the full FLOP saving in f32 (+7.8%) but only +1.6% in
bf16 — i.e. the bf16 stage is partly bound by something that does NOT scale
with the number of tangent columns.  This script pins that down: it times
one jitted `value_and_exact_divergence` stage at the headline LJ13 shape
for K ∈ {0, 1, 2, 4, 8, 16, 36} basis columns, in bf16 and f32 compute,
and fits time(K) = intercept + slope * K.

Interpretation:
- slope   = marginal cost per Jacobian column (the streamed JVP work);
- intercept = primal pass + per-dispatch/layout cost independent of K.
If the bf16 intercept is large relative to f32, the gap is layout/transition
work between the f32 geometry segments and bf16 MLP segments, not FLOPs —
candidate fix: bf16 tangent geometry with f32 divergence accumulation.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ecnf_tpu.utils.host_trace import ensure_host_cpu_backend, host_tracing

ensure_host_cpu_backend()

import jax
import jax.numpy as jnp
import numpy as np

from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.ops.divergence import (
    value_and_exact_divergence,
    zero_com_trace_basis,
)

# Scales: the headline LJ13 shape and the flagship QM9 shape
# (VERDICT r2 item 7: confirm the "mined out" verdict transfers).
SCALES = {
    "lj13": dict(B=256, N=13, n_blocks=3, mlp_units=(128, 128, 128),
                 hidden=64, ks=(0, 1, 2, 4, 8, 16, 36)),
    "qm9": dict(B=64, N=19, n_blocks=5, mlp_units=(256, 256, 256, 256),
                hidden=32, ks=(0, 1, 2, 4, 8, 16, 54)),
}
DIM = 3
S = 20  # stages per dispatch: amortizes the ~28 ms tunnel latency


def timeit(fn, *args, reps=5):
    # Whole warmup+timing under ONE host_tracing context: the default
    # device is part of the jit cache key, so a context change between
    # warmup and timing would retrace+recompile on the first timed rep.
    # Args are device-committed, which pins execution placement.
    with host_tracing():
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
    return min(ts)


def scan_stages(stage):
    """jit(scan of S stage applications) so per-dispatch latency amortizes.

    The stage output feeds the next stage's input (shape-preserving), so
    XLA cannot collapse or overlap the repeats.
    """

    def step(x, _):
        v, div = stage(x)
        return v + 1e-3 * div[:, None], None

    return jax.jit(lambda x: jax.lax.scan(step, x, None, length=S)[0])


def study(compute_dtype, tangent=False, scale="lj13"):
    sc = SCALES[scale]
    B, N = sc["B"], sc["N"]
    D = N * DIM
    cnf = build_cnf(
        n_frames=N, dim=DIM, sigma_min=0.01, base_scale=1.0,
        n_blocks_egnn=sc["n_blocks"], mlp_units=sc["mlp_units"],
        n_invariant_feat_hidden=sc["hidden"], time_embedding_dim=8,
        n_features=1, compute_dtype=compute_dtype,
    )
    with host_tracing():  # eager init off the tunnel
        feats = jnp.zeros((B, N), dtype=jnp.int32)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, D))
        t = jnp.full((B,), 0.5)
        params = cnf.init(jax.random.PRNGKey(1), x[:2], t[:2], feats[:2])
    x, t, feats, params = jax.device_put((x, t, feats, params))
    f = lambda xb: cnf.apply(params, xb, t, feats)
    full_basis = zero_com_trace_basis(N, DIM)  # [N*DIM - DIM, D]

    ks, times = [], []
    for k in sc["ks"]:
        if k == 0:
            stage = lambda xb: (f(xb), jnp.zeros(xb.shape[0], xb.dtype))
        elif tangent:
            from ecnf_tpu.ops.pallas.tangent_kernel import egnn_value_and_trace

            basis = full_basis[:k]
            stage = lambda xb, b=basis: egnn_value_and_trace(
                params, xb, t, feats, b, n_nodes=N, dim=DIM,
                n_blocks=sc["n_blocks"], mlp_units=sc["mlp_units"],
                time_embedding_dim=8,
                compute_dtype=compute_dtype, use_kernel=False,
            )
        else:
            basis = full_basis[:k]
            stage = lambda xb, b=basis: value_and_exact_divergence(f, xb, basis=b)
        dt = timeit(scan_stages(stage), x) / S
        label = "tangent" if tangent else "linearize"
        print(f"[{scale} {compute_dtype} {label}] K={k:2d}: {dt*1e3:7.2f} ms/stage",
              flush=True)
        ks.append(float(k))
        times.append(dt)

    # Fit on K>=1 only: the K=0 program has no linearize at all, so it is a
    # different program family; report it separately as the primal floor.
    ks_f, ts_f = np.array(ks[1:]), np.array(times[1:])
    slope, intercept = np.polyfit(ks_f, ts_f, 1)
    resid = ts_f - (intercept + slope * ks_f)
    label = "tangent" if tangent else "linearize"
    print(
        f"[{scale} {compute_dtype} {label}] fit (K>=1): intercept {intercept*1e3:.2f} ms, "
        f"slope {slope*1e3:.3f} ms/col, max resid {np.abs(resid).max()*1e3:.2f} ms; "
        f"forward-only {times[0]*1e3:.2f} ms"
    )
    return intercept, slope


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--tangent", action="store_true",
                   help="decompose the structured hand-tangent path instead")
    p.add_argument("--dtypes", nargs="*", default=["float32", "bfloat16"])
    p.add_argument("--scale", default="lj13", choices=sorted(SCALES))
    args = p.parse_args()
    res = {}
    for dtype in args.dtypes:
        res[dtype] = study(dtype, tangent=args.tangent, scale=args.scale)
    if "float32" in res and "bfloat16" in res:
        i32, s32 = res["float32"]
        i16, s16 = res["bfloat16"]
        print(
            f"\nbf16/f32 slope ratio {s16/s32:.2f} (FLOP-bound would be ~0.5); "
            f"bf16/f32 intercept ratio {i16/i32:.2f}"
        )
        kmax = SCALES[args.scale]["ks"][-1]
        print(
            f"at K={kmax}: intercept share f32 {i32/(i32+kmax*s32)*100:.0f}%, "
            f"bf16 {i16/(i16+kmax*s16)*100:.0f}%"
        )


if __name__ == "__main__":
    main()
