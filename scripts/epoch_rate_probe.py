"""Isolate the grouped-epoch step-rate gap (docs/PERF.md "Multi-epoch
dispatch": ~10.5 ms/step scanned vs 3.2 ms/step standalone at QM9 batch
256).

Methodology (tunnel-safe): every variant is timed as the SLOPE of total
wall time against program length — T(n2_steps) - T(n1_steps) over the
step difference — which cancels dispatch latency, host<->device transfer
and any fixed per-program cost.  All outputs are blocked AND a scalar is
device_get (over the axon tunnel, `block_until_ready` alone has returned
before execution finished; HANDOFF.md).

Variants:
  loop        python loop of the standalone jitted update_fn (async
              dispatch pipelining — how the 3.2 ms/step was measured)
  scan_data   lax.scan over pre-batched [n_batches, B, D] data; no
              permutation, infos stacked
  scan_noinfo lax.scan, infos discarded (carry only)
  epoch       the real `_epoch` shape: permute + gather + reshape + scan
  epoch_inner epoch but calling the raw (un-jitted) update body, to
              expose any inner-pjit boundary cost

Run on TPU:   python scripts/epoch_rate_probe.py
Run on CPU:   PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu ECNF_PROBE_SCALE=tiny \
              python scripts/epoch_rate_probe.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.training.optim import build_optimizer
from ecnf_tpu.training.state import init_training_state, make_update_fn

SCALE = os.environ.get("ECNF_PROBE_SCALE", "qm9")
if SCALE == "tiny":
    N_NODES, BATCH, MLP, BLOCKS, HID = 5, 32, (32, 32), 2, 8
    N1, N2, REPS = 20, 60, 2
else:  # qm9
    N_NODES, BATCH, MLP, BLOCKS, HID = 19, 256, (256, 256, 256, 256), 5, 32
    N1, N2, REPS = 100, 300, 2

DIM = 3
D = N_NODES * DIM

jax.config.update("jax_default_matmul_precision", "bfloat16")

cnf = build_cnf(
    n_frames=N_NODES, dim=DIM, sigma_min=1e-6, base_scale=2.0,
    n_blocks_egnn=BLOCKS, mlp_units=MLP, n_invariant_feat_hidden=HID,
    time_embedding_dim=8, n_features=1, compute_dtype="bfloat16",
)
opt = build_optimizer(1e-4, use_schedule=False)

rng = np.random.default_rng(0)
DS = BATCH * N2  # enough data for the longest variant
pos = jnp.asarray(rng.normal(size=(DS, D)).astype(np.float32))
feats = jnp.zeros((DS, N_NODES), dtype=jnp.int32)

state0 = init_training_state(
    cnf, opt, jax.random.PRNGKey(0), pos[:2], feats[:2], use_ema=True
)
update_jit = make_update_fn(cnf, opt, use_ema=True)


def update_raw(st, xb, fb):
    # Same body as make_update_fn's but NOT wrapped in jax.jit — for the
    # epoch_inner variant (no inner pjit boundary inside the scan).
    import optax
    from ecnf_tpu.cnf.loss import flow_matching_loss_fn
    from ecnf_tpu.training.state import TrainingState

    key, subkey = jax.random.split(st.key)
    grads, info = jax.grad(flow_matching_loss_fn, argnums=1, has_aux=True)(
        cnf, st.params, xb, subkey, fb
    )
    updates, new_opt = opt.update(grads, st.opt_state, params=st.params)
    new_params = optax.apply_updates(st.params, updates)
    info = dict(info)
    info.update(grad_norm=optax.global_norm(grads), update_norm=optax.global_norm(updates))
    ema = jax.tree_util.tree_map(
        lambda bar, new: bar * 0.999 + 0.001 * new, st.ema_params, new_params
    )
    return TrainingState(new_params, new_opt, key, ema), info


def force(state, info):
    jax.block_until_ready(state.params)
    if info is not None:
        jax.block_until_ready(info)
        leaf = jax.tree_util.tree_leaves(info)[0]
        float(np.asarray(jax.device_get(leaf)).ravel()[-1])  # full completion
    else:
        float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(state.params)[0])).ravel()[0])


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    force(*out if isinstance(out, tuple) else (out, None))
    return time.perf_counter() - t0


# ---- variant builders -------------------------------------------------------

def make_loop(n_steps):
    xb = pos[:BATCH]
    fb = feats[:BATCH]

    def run(st):
        info = None
        for _ in range(n_steps):
            st, info = update_jit(st, xb, fb)
        return st, info

    return run


def make_scan(n_steps, keep_infos, inner_jit):
    pos_b = pos[: n_steps * BATCH].reshape(n_steps, BATCH, D)
    feat_b = feats[: n_steps * BATCH].reshape(n_steps, BATCH, N_NODES)
    step = update_jit if inner_jit else update_raw

    def body(st, xs):
        st, info = step(st, *xs)
        return st, (info if keep_infos else None)

    @jax.jit
    def run(st):
        return jax.lax.scan(body, st, (pos_b, feat_b))

    return run


def make_epoch(n_steps, inner_jit):
    ds = n_steps * BATCH
    pos_e = pos[:ds]
    feat_e = feats[:ds]
    step = update_jit if inner_jit else update_raw

    @jax.jit
    def run(st):
        key, subkey = jax.random.split(st.key)
        perm = jax.random.permutation(subkey, ds)
        st = st._replace(key=key)
        pos_b = pos_e[perm].reshape(n_steps, BATCH, D)
        feat_b = feat_e[perm].reshape(n_steps, BATCH, N_NODES)
        return jax.lax.scan(lambda s, xs: step(s, *xs), st, (pos_b, feat_b))

    return run


VARIANTS = {
    "loop": lambda n: make_loop(n),
    "scan_data": lambda n: make_scan(n, keep_infos=True, inner_jit=True),
    "scan_noinfo": lambda n: make_scan(n, keep_infos=False, inner_jit=True),
    "epoch": lambda n: make_epoch(n, inner_jit=True),
    "epoch_inner": lambda n: make_epoch(n, inner_jit=False),
    "scan_inner": lambda n: make_scan(n, keep_infos=True, inner_jit=False),
}

only = os.environ.get("ECNF_PROBE_VARIANTS")
names = only.split(",") if only else list(VARIANTS)

print(f"scale={SCALE} batch={BATCH} D={D} slope over {N1}->{N2} steps, "
      f"{REPS} reps, device={jax.devices()[0].device_kind}")
results = {}
for name in names:
    fns = {n: VARIANTS[name](n) for n in (N1, N2)}
    t_compile = {}
    t_best = {}
    for n, fn in fns.items():
        t_compile[n] = timed(fn, state0)  # includes jit compile
        t_best[n] = min(timed(fn, state0) for _ in range(REPS))
    slope_ms = (t_best[N2] - t_best[N1]) / (N2 - N1) * 1e3
    fixed_s = t_best[N1] - slope_ms * 1e-3 * N1
    results[name] = slope_ms
    print(
        f"{name:12s} per-step {slope_ms:7.3f} ms  "
        f"(T{N1}={t_best[N1]:.3f}s T{N2}={t_best[N2]:.3f}s fixed~{fixed_s:.3f}s; "
        f"compiles {t_compile[N1]:.1f}/{t_compile[N2]:.1f}s)"
    )

base = results.get("loop")
if base:
    for name, v in results.items():
        print(f"{name:12s} {v / base:5.2f}x loop")
