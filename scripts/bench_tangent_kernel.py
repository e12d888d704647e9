"""A/B the hand-linearized EGNN trace vs `jax.linearize` on TPU.

Measures one exact-trace stage via a scan of 20 stages per dispatch
(amortizes the ~28 ms tunnel latency): linearize (shipped path),
hand-tangent pure-XLA, and hand-tangent with the Pallas edge kernel at
several batch tiles.  ``--scale lj13`` (default) is the headline config
(B=256, 3x[128]^3, K=36 zero-CoM columns); ``--scale qm9`` is the
flagship config (B=64, 19 atoms, 5x[256]^4, K=54) — VERDICT r3 item 7:
the round-2 kernel rejections were tuned at LJ13 shapes only.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ecnf_tpu.utils.host_trace import ensure_host_cpu_backend, host_tracing

ensure_host_cpu_backend()

import jax
import jax.numpy as jnp

from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.ops.divergence import value_and_exact_divergence
from ecnf_tpu.ops.pallas.tangent_kernel import egnn_value_and_trace

SCALES = {
    "lj13": dict(B=256, N=13, blocks=3, units=(128, 128, 128), hidden=64,
                 sigma_min=0.01, base_scale=1.0),
    "qm9": dict(B=64, N=19, blocks=5, units=(256, 256, 256, 256), hidden=32,
                sigma_min=1e-6, base_scale=2.0),
}
DIM = 3
S = 20


def timeit(fn, x, reps=5):
    # The WHOLE warmup+timing runs under one host_tracing context:
    # jax.default_device participates in the jit cache key, so warming
    # inside the context and timing outside splits the cache and forces a
    # full retrace+recompile on the first timed rep.  Timing inside is
    # valid — x is device-committed, which pins execution placement.
    with host_tracing():
        out = fn(x)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(x)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
    return min(ts)


def scan_stages(stage, augmented=False):
    """augmented=True mimics the ODE solve's carry: [B, D+1] state with a
    concat/slice around every stage (the form `_augmented_field` emits)."""
    if augmented:
        def step(y, _):
            v, div = stage(y[:, :-1])
            return y + 0.05 * jnp.concatenate([v, div[:, None]], axis=-1), None

        return jax.jit(
            lambda x: jax.lax.scan(
                step, jnp.concatenate([x, jnp.zeros((x.shape[0], 1))], -1),
                None, length=S,
            )[0]
        )

    def step(x, _):
        v, div = stage(x)
        return v + 1e-3 * div[:, None], None

    return jax.jit(lambda x: jax.lax.scan(step, x, None, length=S)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", choices=sorted(SCALES), default="lj13")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--units", type=int, default=None)
    p.add_argument("--layers", type=int, default=None)
    p.add_argument("--tiles", type=int, nargs="*", default=[16, 32])
    args = p.parse_args()
    sc = SCALES[args.scale]
    B = args.batch or sc["B"]
    N, n_blocks = sc["N"], sc["blocks"]
    D = N * DIM
    # Each flag works alone: --units keeps the scale's layer count,
    # --layers keeps the scale's width.
    units = sc["units"]
    if args.units or args.layers:
        width = args.units or units[0]
        units = (width,) * (args.layers or len(units))
    print(f"scale={args.scale} B={B} N={N} blocks={n_blocks} units={units} "
          f"dtype={args.dtype}", flush=True)

    cnf = build_cnf(
        n_frames=N, dim=DIM, sigma_min=sc["sigma_min"],
        base_scale=sc["base_scale"], n_blocks_egnn=n_blocks, mlp_units=units,
        n_invariant_feat_hidden=sc["hidden"], time_embedding_dim=8,
        n_features=1,
        compute_dtype=None if args.dtype == "float32" else args.dtype,
    )
    with host_tracing():
        feats = jnp.zeros((B, N), dtype=jnp.int32)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, D))
        t = jnp.full((B,), 0.5)
        params = cnf.init(jax.random.PRNGKey(1), x[:2], t[:2], feats[:2])
        basis, off = cnf.exact_trace_plan(params)
    x = jax.device_put(x, jax.devices()[0])
    f = lambda xb: cnf.apply(params, xb, t, feats)

    def lin_stage(xb):
        return value_and_exact_divergence(f, xb, basis=basis, trace_offset=off)

    def hand_stage(use_kernel, bt):
        def stage(xb):
            return egnn_value_and_trace(
                params, xb, t, feats, basis,
                n_nodes=N, dim=DIM, n_blocks=n_blocks, mlp_units=units,
                time_embedding_dim=8,
                compute_dtype=None if args.dtype == "float32" else args.dtype,
                trace_offset=off, use_kernel=use_kernel, batch_tile=bt,
            )
        return stage

    # Correctness on-device first (one dispatch each).  A tile that
    # exceeds VMEM must not kill the sweep — record and skip it.
    with host_tracing():
        v0, d0 = jax.jit(lin_stage)(x)
    ok_tiles = []
    for name, bt, st in [("xla", None, hand_stage(False, 16))] + [
        (f"kernel bt={bt}", bt, hand_stage(True, bt)) for bt in args.tiles
    ]:
        try:
            with host_tracing():
                v1, d1 = jax.jit(st)(x)
            dv = float(jnp.max(jnp.abs(v1 - v0)))
            dd = float(jnp.max(jnp.abs(d1 - d0))) / (float(jnp.max(jnp.abs(d0))) + 1e-9)
            print(f"check {name}: max|dv|={dv:.2e} rel|ddiv|={dd:.2e}", flush=True)
            if bt is not None:
                ok_tiles.append(bt)
        except Exception as e:
            print(f"check {name}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})", flush=True)
    args.tiles = ok_tiles

    t_lin = timeit(scan_stages(lin_stage), x) / S
    print(f"linearize: {t_lin*1e3:7.2f} ms/stage", flush=True)
    t_xla = timeit(scan_stages(hand_stage(False, 16)), x) / S
    print(f"hand-tangent XLA: {t_xla*1e3:7.2f} ms/stage ({t_lin/t_xla:.2f}x)", flush=True)
    t_lin_a = timeit(scan_stages(lin_stage, augmented=True), x) / S
    print(f"linearize (augmented carry): {t_lin_a*1e3:7.2f} ms/stage", flush=True)
    t_xla_a = timeit(scan_stages(hand_stage(False, 16), augmented=True), x) / S
    print(
        f"hand-tangent XLA (augmented carry): {t_xla_a*1e3:7.2f} ms/stage "
        f"({t_lin_a/t_xla_a:.2f}x)",
        flush=True,
    )
    for bt in args.tiles:
        t_k = timeit(scan_stages(hand_stage(True, bt)), x) / S
        print(
            f"hand-tangent kernel bt={bt}: {t_k*1e3:7.2f} ms/stage "
            f"({t_lin/t_k:.2f}x vs linearize)",
            flush=True,
        )


if __name__ == "__main__":
    main()
