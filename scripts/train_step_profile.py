"""Train-step roofline: decompose the flagship (QM9-scale) update step.

VERDICT r4 weak #1: `qm9_train_step` sits at 0.42 mixed-precision MFU while
the eval solves of the same network read 0.68-0.70, and nobody has shown
whether 0.42 is headroom or the ceiling.  This script answers it in four
parts, all on the current backend:

1. **Stage decomposition** — time, as 100-step scans (amortizing the
   ~28-48 ms tunnel dispatch latency), the nested program prefixes:
     fwd            loss forward only
     grad           value_and_grad (backward included)
     grad+opt       + adam update + apply_updates
     grad+opt+norm  + grad_norm/update_norm (two global_norms)
     full           + EMA  (== the shipped update step)
   Differences between consecutive rows are the marginal stage costs.

2. **FLOP accounting** — per variant, counted bf16/f32 FLOPs (the MFU
   convention weighs f32 4x, so a dtype-mix shift alone moves "MFU"
   without any efficiency change — quantified here).

3. **In-situ matmul roofline** — a scan of L bf16
   ``[B*N*N, U] @ [U, U] + silu`` layers at the exact train shape
   (B=256, N=19, U=256).  These layers carry ~90% of the step's FLOPs and
   are HBM-bound at this width: arithmetic intensity
   2*U / (2 bytes in + 2 bytes out) = 128 FLOP/byte vs the v5e
   compute/bandwidth balance point 197e12/819e9 = 241 FLOP/byte
   => the layer-chain speed-of-light is ~128/241 = 53% of MXU peak.
   The measured chain rate IS the realistic ceiling for the whole step.

4. **A/B levers** — batch 512 (fixed total samples), norms off, EMA off,
   f32 compute (sanity: should be ~2-4x slower).

Usage (TPU):  python scripts/train_step_profile.py
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
from ecnf_tpu.cnf.loss import flow_matching_loss_fn
from ecnf_tpu.ops.flops import count_fn_flops, PEAKS
from ecnf_tpu.training.optim import build_optimizer
from ecnf_tpu.training.state import init_training_state, make_update_fn

N_NODES, DIM = 19, 3
BATCH = 256
N_STEPS = 100
REPS = 3


def _qm9_cnf(compute_dtype="bfloat16"):
    return build_cnf(
        n_frames=N_NODES, dim=DIM, sigma_min=1e-6, base_scale=2.0,
        n_blocks_egnn=5, mlp_units=(256, 256, 256, 256),
        n_invariant_feat_hidden=32, time_embedding_dim=8, n_features=1,
        compute_dtype=compute_dtype,
    )


def _timed_scan(build_body, state, data, feats, label, n_steps=N_STEPS):
    """Compile scan(body) over `data` [S, B, D]; report ms/step + FLOPs."""
    def run(st, xs):
        def body(s, xb):
            return build_body(s, xb)
        st, out = jax.lax.scan(body, st, xs)
        return st, out

    with host_tracing():
        count = count_fn_flops(run, state, data)
        run_jit = jax.jit(run, donate_argnums=(0,))
    st, data_d, feats_d = jax.device_put((state, data, feats), jax.devices()[0])
    with host_tracing():
        lowered = jax.jit(run, donate_argnums=(0,)).lower(st, data_d)
    compiled = lowered.compile()
    st, out = compiled(st, data_d)
    jax.block_until_ready(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        st, out = compiled(st, data_d)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    ms_step = best / n_steps * 1e3
    dev = jax.devices()[0].device_kind
    peaks = PEAKS.get(dev)
    line = f"{label:18s} {ms_step:7.3f} ms/step"
    if count is not None and peaks and not count.has_while:
        tf = count.total / 1e12
        bf16_frac = count.bf16 / max(count.total, 1)
        mixed_mfu = (count.bf16 / peaks["bf16"] + count.f32 / peaks["f32"]) / best
        bf16_only_tps = count.total / best / 1e12  # achieved TFLOP/s (all math)
        line += (f"  {tf / n_steps * 1e3:8.2f} GFLOP/step"
                 f"  bf16={bf16_frac * 100:5.1f}%"
                 f"  mixedMFU={mixed_mfu:.3f}"
                 f"  achieved={bf16_only_tps:6.1f} TF/s")
    print(line, flush=True)
    return best, count


def stage_decomposition():
    print("== stage decomposition (QM9 scale, bf16, B=256) ==", flush=True)
    cnf = _qm9_cnf()
    opt = build_optimizer(1e-4, use_schedule=False)
    rng = np.random.default_rng(0)
    data = jnp.asarray(
        rng.normal(size=(N_STEPS, BATCH, N_NODES * DIM)).astype(np.float32))
    feats = jnp.zeros((BATCH, N_NODES), dtype=jnp.int32)
    with host_tracing():
        state = init_training_state(
            cnf, opt, jax.random.PRNGKey(0), data[0, :2], feats[:2],
            use_ema=True)

    import optax

    # 1) forward only (key advanced so successive steps differ, like train)
    def fwd_body(st, xb):
        key, sub = jax.random.split(st.key)
        loss, _ = flow_matching_loss_fn(cnf, st.params, xb, sub, feats)
        return st._replace(key=key), loss
    t_fwd, _ = _timed_scan(fwd_body, state, data, feats, "fwd")

    # 2) + backward
    def grad_body(st, xb):
        key, sub = jax.random.split(st.key)
        grads, info = jax.grad(flow_matching_loss_fn, argnums=1, has_aux=True)(
            cnf, st.params, xb, sub, feats)
        # keep grads live without updating params: fold into the carried key
        g0 = jax.tree_util.tree_leaves(grads)[0]
        return st._replace(key=key + (g0.ravel()[0] == jnp.inf).astype(
            key.dtype)), info["loss"]
    t_grad, _ = _timed_scan(grad_body, state, data, feats, "grad")

    # 3) + optimizer
    def opt_body(st, xb):
        key, sub = jax.random.split(st.key)
        grads, info = jax.grad(flow_matching_loss_fn, argnums=1, has_aux=True)(
            cnf, st.params, xb, sub, feats)
        updates, new_opt = opt.update(grads, st.opt_state, params=st.params)
        new_params = optax.apply_updates(st.params, updates)
        return st._replace(params=new_params, opt_state=new_opt, key=key), \
            info["loss"]
    t_opt, _ = _timed_scan(opt_body, state, data, feats, "grad+opt")

    # 4) + norms
    def norm_body(st, xb):
        key, sub = jax.random.split(st.key)
        grads, info = jax.grad(flow_matching_loss_fn, argnums=1, has_aux=True)(
            cnf, st.params, xb, sub, feats)
        updates, new_opt = opt.update(grads, st.opt_state, params=st.params)
        new_params = optax.apply_updates(st.params, updates)
        gn = optax.global_norm(grads)
        un = optax.global_norm(updates)
        return st._replace(params=new_params, opt_state=new_opt, key=key), \
            (info["loss"], gn, un)
    t_norm, _ = _timed_scan(norm_body, state, data, feats, "grad+opt+norm")

    # 5) full production step (EMA on)
    update = make_update_fn(cnf, opt, use_ema=True)
    def full_body(st, xb):
        st, info = update(st, xb, feats)
        return st, info["loss"]
    t_full, _ = _timed_scan(full_body, state, data, feats, "full(+ema)")

    ms = lambda t: t / N_STEPS * 1e3
    print(f"marginal: bwd {ms(t_grad) - ms(t_fwd):+.3f}  "
          f"opt {ms(t_opt) - ms(t_grad):+.3f}  "
          f"norms {ms(t_norm) - ms(t_opt):+.3f}  "
          f"ema {ms(t_full) - ms(t_norm):+.3f}  (ms/step)", flush=True)


def matmul_chain_roofline():
    """The in-situ ceiling: L sequential bf16 edge-layer matmuls."""
    print("== matmul-chain roofline (edge shape [B*N*N, U] @ [U, U]) ==",
          flush=True)
    M, U, L = BATCH * N_NODES * N_NODES, 256, 20
    dev = jax.devices()[0]
    with host_tracing():
        ws = [jnp.asarray(
            np.random.default_rng(i).normal(size=(U, U)).astype(np.float32)
            * 0.05, dtype=jnp.bfloat16) for i in range(L)]
        x = jnp.asarray(
            np.random.default_rng(99).normal(size=(M, U)).astype(np.float32),
            dtype=jnp.bfloat16)

        def chain(x):
            for w in ws:
                x = jax.nn.silu(x @ w)
            return x

        chain_jit = jax.jit(chain)
    x = jax.device_put(x, dev)
    out = chain_jit(x)
    jax.block_until_ready(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = chain_jit(x)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    flops = 2 * M * U * U * L
    bytes_moved = (L + 1) * M * U * 2  # each layer reads its input; writes out
    peaks = PEAKS.get(dev.device_kind, {})
    peak = peaks.get("bf16", float("nan"))
    print(f"  chain: {best / L * 1e3:.3f} ms/layer  "
          f"{flops / best / 1e12:.1f} TF/s achieved  "
          f"MFU={flops / best / peak:.3f}  "
          f"HBM={bytes_moved / best / 1e9:.0f} GB/s apparent", flush=True)
    print(f"  intensity {flops / bytes_moved:.0f} FLOP/B vs balance "
          f"{peak / 819e9:.0f} FLOP/B -> BW-bound ceiling "
          f"~{(flops / bytes_moved) / (peak / 819e9):.2f} MFU "
          f"(at 819 GB/s)", flush=True)


def ab_levers():
    print("== A/B levers ==", flush=True)
    import optax
    rng = np.random.default_rng(0)
    feats256 = jnp.zeros((BATCH, N_NODES), dtype=jnp.int32)

    # batch 512, half the steps (same total samples)
    cnf = _qm9_cnf()
    opt = build_optimizer(1e-4, use_schedule=False)
    data512 = jnp.asarray(
        rng.normal(size=(N_STEPS // 2, 512, N_NODES * DIM)).astype(np.float32))
    feats512 = jnp.zeros((512, N_NODES), dtype=jnp.int32)
    with host_tracing():
        state = init_training_state(
            cnf, opt, jax.random.PRNGKey(0), data512[0, :2], feats512[:2],
            use_ema=True)
    update512 = make_update_fn(cnf, opt, use_ema=True)
    def body512(st, xb):
        st, info = update512(st, xb, feats512)
        return st, info["loss"]
    _timed_scan(body512, state, data512, feats512, "full@B=512",
                n_steps=N_STEPS // 2)

    # f32 compute sanity point
    cnf32 = _qm9_cnf(compute_dtype=None)
    data = jnp.asarray(
        rng.normal(size=(N_STEPS, BATCH, N_NODES * DIM)).astype(np.float32))
    with host_tracing():
        state32 = init_training_state(
            cnf32, opt, jax.random.PRNGKey(0), data[0, :2], feats256[:2],
            use_ema=True)
    update32 = make_update_fn(cnf32, opt, use_ema=True)
    def body32(st, xb):
        st, info = update32(st, xb, feats256)
        return st, info["loss"]
    _timed_scan(body32, state32, data, feats256, "full@f32")


def hlo_dtype_audit():
    """Count dot ops by operand dtype in the optimized HLO of the step."""
    print("== HLO dot-op dtype audit (full step) ==", flush=True)
    cnf = _qm9_cnf()
    opt = build_optimizer(1e-4, use_schedule=False)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(size=(BATCH, N_NODES * DIM)).astype(np.float32))
    feats = jnp.zeros((BATCH, N_NODES), dtype=jnp.int32)
    with host_tracing():
        state = init_training_state(
            cnf, opt, jax.random.PRNGKey(0), xb[:2], feats[:2], use_ema=True)
        update = make_update_fn(cnf, opt, use_ema=True)
        lowered = jax.jit(update).lower(state, xb, feats)
    try:
        txt = lowered.compile().as_text()
    except Exception as e:
        print(f"  optimized HLO unavailable ({e}); using pre-opt HLO",
              flush=True)
        txt = lowered.as_text()
    import re
    counts = {}
    for line in txt.splitlines():
        if " dot(" in line or " dot_general" in line or "fusion" in line:
            m = re.match(r"\s*%?\S+\s*=\s*(\w+)\[", line)
            if m and ("dot(" in line):
                counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    for dt, c in sorted(counts.items()):
        print(f"  dot out dtype {dt}: {c}", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    stage_decomposition()
    matmul_chain_roofline()
    ab_levers()
    hlo_dtype_audit()
