"""Reproduce the 0.00 ms/stage readings from bench_tangent_kernel (r4).

Times a 20-stage scanned exact-trace program with the exact same
warmup-under-host_tracing pattern, printing raw rep times and the output's
device set — to determine whether the timed dispatches execute on the TPU
at all, and whether the host_tracing-wrapped warmup splits the jit cache.
"""
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

B, N, S = 64, 13, 20

cnf = build_cnf(
    n_frames=N, dim=3, sigma_min=0.01, base_scale=1.0, n_blocks_egnn=3,
    mlp_units=(128, 128, 128), n_invariant_feat_hidden=64,
    time_embedding_dim=8, n_features=1, compute_dtype="bfloat16",
)
with host_tracing():
    feats = jnp.zeros((B, N), dtype=jnp.int32)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N * 3))
    t = jnp.full((B,), 0.5)
    params = cnf.init(jax.random.PRNGKey(1), x[:2], t[:2], feats[:2])
    basis, off = cnf.exact_trace_plan(params)
x = jax.device_put(x, jax.devices()[0])
print("x committed to:", x.devices(), flush=True)

f = lambda xb: cnf.apply(params, xb, t, feats)
stage = lambda xb: value_and_exact_divergence(f, xb, basis=basis, trace_offset=off)


def step(xc, _):
    v, div = stage(xc)
    return v + 1e-3 * div[:, None], None


fn = jax.jit(lambda xx: jax.lax.scan(step, xx, None, length=S)[0])

t0 = time.perf_counter()
with host_tracing():
    out = fn(x)
jax.block_until_ready(out)
print(f"warmup (inside host_tracing): {time.perf_counter() - t0:.2f}s, "
      f"out devices {out.devices()}", flush=True)

for i in range(4):
    t0 = time.perf_counter()
    out = fn(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"rep {i}: {dt * 1e3:9.3f} ms total ({dt / S * 1e3:7.3f} ms/stage), "
          f"out devices {out.devices()}", flush=True)

# Control: warmup OUTSIDE host_tracing (fresh jit object).
fn2 = jax.jit(lambda xx: jax.lax.scan(step, xx, None, length=S)[0])
t0 = time.perf_counter()
out = fn2(x)
jax.block_until_ready(out)
print(f"control warmup (no host_tracing): {time.perf_counter() - t0:.2f}s",
      flush=True)
for i in range(4):
    t0 = time.perf_counter()
    out = fn2(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"control rep {i}: {dt * 1e3:9.3f} ms total "
          f"({dt / S * 1e3:7.3f} ms/stage)", flush=True)
