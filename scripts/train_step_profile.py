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


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _qm9_cnf(compute_dtype="bfloat16", remat=False):
    return build_cnf(
        n_frames=N_NODES, dim=DIM, sigma_min=1e-6, base_scale=2.0,
        n_blocks_egnn=5, mlp_units=(256, 256, 256, 256),
        n_invariant_feat_hidden=32, time_embedding_dim=8, n_features=1,
        compute_dtype=compute_dtype, remat_blocks=remat,
    )


def _timed_scan(build_body, make_state, data, feats, label, n_steps=N_STEPS):
    """Compile scan(body) over `data` [S, B, D]; report ms/step + FLOPs.

    Follows the bench's known-good AOT pattern (`bench.py
    bench_qm9_train_step`): every array the program touches is passed as an
    EXPLICIT argument and committed to the device BEFORE ``lower()`` (a
    host-committed closure capture bakes a CPU sharding into the
    executable), the state is freshly device_put per call of this function
    (donation deletes it), and timing blocks on the final scan element.  A
    plausibility guard rejects dead-buffer readings (HANDOFF r4: after a
    failed remote compile, dispatches can return instantly with garbage).
    """
    def run(st, xs, fts):
        # Fold every per-step output into the CARRY: a stage whose state
        # chain is trivial (fwd/grad carry only the PRNG key) would
        # otherwise let XLA dead-code-eliminate 99 of the 100 scanned
        # bodies once only `out[-1]` is consumed — measured as an
        # impossible 22,728 TF/s before this guard.
        def body(carry, xb):
            s, acc = carry
            s2, y = build_body(s, xb, fts)
            acc = acc + sum(
                jnp.sum(leaf).astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(y))
            return (s2, acc), None
        (st, acc), _ = jax.lax.scan(body, (st, jnp.float32(0.0)), xs)
        return st, acc

    with host_tracing():
        state = make_state()
        count = count_fn_flops(run, state, data, feats)
    dev = jax.devices()[0]
    st0, data_d, feats_d = jax.device_put((state, data, feats), dev)
    del state
    # Timing protocol for this tunneled plugin (scripts/debug_fwd_timing*.py):
    # `block_until_ready` is FLAKY here — it sporadically returns ~instantly
    # on a freshly compiled executable while execution is still in flight
    # (measured 0.5 ms "block" followed by a 1.75 s device_get).  So each
    # rep is timed as dispatch + device_get of the scalar accumulator (a
    # forced round-trip that cannot complete before the execution), and the
    # measured tunnel RTT is subtracted.  No donation (donated programs
    # showed the same flake).
    with host_tracing():
        lowered = jax.jit(run).lower(st0, data_d, feats_d)
    compiled = lowered.compile()
    for _ in range(2):
        st, out = compiled(st0, data_d, feats_d)
        _ = jax.device_get(out)
    rtt = min(
        _timeit(lambda: jax.device_get(out)) for _ in range(5)
    )
    times = []
    vals = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        st, out = compiled(st0, data_d, feats_d)
        vals.append(float(jax.device_get(out)))
        times.append(time.perf_counter() - t0 - rtt)
    assert all(np.isfinite(v) for v in vals), \
        f"{label}: non-finite output — invalid measurement"
    best = min(times)
    ms_step = best / n_steps * 1e3
    peaks = PEAKS.get(dev.device_kind)
    line = f"{label:18s} {ms_step:7.3f} ms/step"
    if count is not None and peaks and not count.has_while:
        tf = count.total / 1e12
        bf16_frac = count.bf16 / max(count.total, 1)
        mixed_mfu = (count.bf16 / peaks["bf16"] + count.f32 / peaks["f32"]) / best
        bf16_only_tps = count.total / best / 1e12  # achieved TFLOP/s (all math)
        if bf16_only_tps > 1.2 * peaks["bf16"] / 1e12:
            raise RuntimeError(
                f"{label}: achieved {bf16_only_tps:.0f} TF/s exceeds chip peak "
                f"— dead-buffer reading; re-run in a fresh process")
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
    state = lambda: init_training_state(
        cnf, opt, jax.random.PRNGKey(0), data[0, :2], feats[:2],
        use_ema=True)

    import optax

    # 1) forward only (key advanced so successive steps differ, like train)
    def fwd_body(st, xb, fts):
        key, sub = jax.random.split(st.key)
        loss, _ = flow_matching_loss_fn(cnf, st.params, xb, sub, fts)
        return st._replace(key=key), loss
    t_fwd, _ = _timed_scan(fwd_body, state, data, feats, "fwd")

    # 2) + backward (the whole grad tree is emitted so every weight-grad
    # matmul stays live; the harness folds sums into the carry)
    def grad_body(st, xb, fts):
        key, sub = jax.random.split(st.key)
        grads, info = jax.grad(flow_matching_loss_fn, argnums=1, has_aux=True)(
            cnf, st.params, xb, sub, fts)
        return st._replace(key=key), (info["loss"], grads)
    t_grad, _ = _timed_scan(grad_body, state, data, feats, "grad")

    # 3) + optimizer
    def opt_body(st, xb, fts):
        key, sub = jax.random.split(st.key)
        grads, info = jax.grad(flow_matching_loss_fn, argnums=1, has_aux=True)(
            cnf, st.params, xb, sub, fts)
        updates, new_opt = opt.update(grads, st.opt_state, params=st.params)
        new_params = optax.apply_updates(st.params, updates)
        return st._replace(params=new_params, opt_state=new_opt, key=key), \
            info["loss"]
    t_opt, _ = _timed_scan(opt_body, state, data, feats, "grad+opt")

    # 4) + norms
    def norm_body(st, xb, fts):
        key, sub = jax.random.split(st.key)
        grads, info = jax.grad(flow_matching_loss_fn, argnums=1, has_aux=True)(
            cnf, st.params, xb, sub, fts)
        updates, new_opt = opt.update(grads, st.opt_state, params=st.params)
        new_params = optax.apply_updates(st.params, updates)
        gn = optax.global_norm(grads)
        un = optax.global_norm(updates)
        return st._replace(params=new_params, opt_state=new_opt, key=key), \
            (info["loss"], gn, un)
    t_norm, _ = _timed_scan(norm_body, state, data, feats, "grad+opt+norm")

    # 5) full production step (EMA on)
    update = make_update_fn(cnf, opt, use_ema=True)
    def full_body(st, xb, fts):
        st, info = update(st, xb, fts)
        return st, info["loss"]
    t_full, _ = _timed_scan(full_body, state, data, feats, "full(+ema)")

    ms = lambda t: t / N_STEPS * 1e3
    print(f"marginal: bwd {ms(t_grad) - ms(t_fwd):+.3f}  "
          f"opt {ms(t_opt) - ms(t_grad):+.3f}  "
          f"norms {ms(t_norm) - ms(t_opt):+.3f}  "
          f"ema {ms(t_full) - ms(t_norm):+.3f}  (ms/step)", flush=True)


def matmul_chain_roofline():
    """Clean-pattern ceiling: fwd and grad of L bf16 edge-shape matmuls.

    [M, U] @ [U, U] + silu with M = B*N*N, U = 256 — the layer shape that
    carries ~90% of the step's FLOPs.  Weights are explicit ARGUMENTS (a
    closure capture created under the host backend measured 24x slow), the
    chain is repeated R times in-program with a data dependency so one
    dispatch amortizes the tunnel RTT, and timing follows the
    device_get-of-scalar protocol.  The grad variant is THE comparator for
    the train step's backward: it shows what XLA achieves on this
    pattern's fwd+bwd with no EGNN structure around it.
    """
    print("== matmul-chain roofline (edge shape [B*N*N, U] @ [U, U]) ==",
          flush=True)
    M, U, L = BATCH * N_NODES * N_NODES, 256, 20
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    with host_tracing():
        ws = [jnp.asarray(rng.normal(size=(U, U)).astype(np.float32) * 0.05,
                          dtype=jnp.bfloat16) for _ in range(L)]
        x0 = jnp.asarray(rng.normal(size=(M, U)).astype(np.float32),
                         dtype=jnp.bfloat16)

    def chain(x, ws):
        for w in ws:
            x = jax.nn.silu(x @ w)
        return x

    def make_fwd(R):
        def fwd(ws, x):
            def body(xc, _):
                return chain(xc, ws), None
            xf, _ = jax.lax.scan(body, x, None, length=R)
            return jnp.sum(xf.astype(jnp.float32))
        return fwd

    def make_bwd(R):
        # R kept small: grad-of-scan stores every iteration's activations
        # (R*L tensors of 47 MB — R=10 asked for 36 GB of HBM temp).
        fwd = make_fwd(R)
        def bwd(ws, x):
            grads = jax.grad(fwd)(ws, x)
            return sum(jnp.sum(g.astype(jnp.float32)) for g in grads)
        return bwd

    peaks = PEAKS.get(dev.device_kind, {})
    peak = peaks.get("bf16", float("nan"))
    ws_d, x_d = jax.device_put((ws, x0), dev)
    for label, fn, R, flops1 in (
        ("chain fwd", make_fwd(10), 10, 2 * M * U * U * L),
        ("chain fwd+bwd", make_bwd(2), 2, 3 * 2 * M * U * U * L),
    ):
        flops = flops1 * R
        with host_tracing():
            lowered = jax.jit(fn).lower(ws_d, x_d)
        compiled = lowered.compile()
        for _ in range(2):
            out = compiled(ws_d, x_d)
            _ = jax.device_get(out)
        rtt = min(_timeit(lambda: jax.device_get(out)) for _ in range(5))
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = compiled(ws_d, x_d)
            v = float(jax.device_get(out))
            times.append(time.perf_counter() - t0 - rtt)
        assert np.isfinite(v)
        best = min(times)
        print(f"  {label:14s} {best / (L * R) * 1e3:7.3f} ms/layer-visit  "
              f"{flops / best / 1e12:6.1f} TF/s  MFU={flops / best / peak:.3f}",
              flush=True)
    intensity = 2 * U / 4  # bf16 in+out: 2*M*U*U FLOPs / (2 tensors * 2 B)
    print(f"  layer intensity ~{intensity:.0f} FLOP/B vs balance "
          f"{peak / 819e9:.0f} FLOP/B (819 GB/s HBM)", flush=True)


def ab_levers():
    import os
    levers = os.environ.get("ECNF_PROFILE_LEVERS", "b512,remat,f32").split(",")
    print(f"== A/B levers ({','.join(levers)}) ==", flush=True)
    rng = np.random.default_rng(0)
    feats256 = jnp.zeros((BATCH, N_NODES), dtype=jnp.int32)
    cnf = _qm9_cnf()
    opt = build_optimizer(1e-4, use_schedule=False)

    for lever, B_ab, steps_ab in (("b512", 512, N_STEPS // 2),
                                  ("b128", 128, N_STEPS * 2),
                                  ("b64", 64, N_STEPS * 4)):
        if lever not in levers:
            continue
        # alternate batch size, same total samples
        data_ab = jnp.asarray(
            rng.normal(size=(steps_ab, B_ab, N_NODES * DIM)).astype(
                np.float32))
        feats_ab = jnp.zeros((B_ab, N_NODES), dtype=jnp.int32)
        state = lambda: init_training_state(
            cnf, opt, jax.random.PRNGKey(0), data_ab[0, :2], feats_ab[:2],
            use_ema=True)
        update_ab = make_update_fn(cnf, opt, use_ema=True)
        def body_ab(st, xb, fts):
            st, info = update_ab(st, xb, fts)
            return st, info["loss"]
        _timed_scan(body_ab, state, data_ab, feats_ab, f"full@B={B_ab}",
                    n_steps=steps_ab)
    if "remat" in levers:
        # remat the EGCL blocks: recompute edge-MLP activations inside the
        # backward so fused recompute+grad tiles stay in VMEM instead of
        # round-tripping [B,N,N,U] activations through HBM (the backward
        # runs at ~55-70% of achievable bandwidth without it).
        cnf_rm = _qm9_cnf(remat=True)
        data = jnp.asarray(
            rng.normal(size=(N_STEPS, BATCH, N_NODES * DIM)).astype(
                np.float32))
        state_rm = lambda: init_training_state(
            cnf_rm, opt, jax.random.PRNGKey(0), data[0, :2], feats256[:2],
            use_ema=True)
        update_rm = make_update_fn(cnf_rm, opt, use_ema=True)
        def body_rm(st, xb, fts):
            st, info = update_rm(st, xb, fts)
            return st, info["loss"]
        _timed_scan(body_rm, state_rm, data, feats256, "full@remat")

    for lever, n_mb in (("mb2", 2), ("mb4", 4)):
        if lever not in levers:
            continue
        # Micro-batched B=256 step: grad = mean of n_mb per-chunk grads
        # (identical math to the one-shot grad; RNG draws assigned per
        # chunk).  Motivated by the measured superlinear batch cost:
        # B=128 runs 50.2 us/sample vs B=256's 61.2.
        import optax
        data = jnp.asarray(
            rng.normal(size=(N_STEPS, BATCH, N_NODES * DIM)).astype(
                np.float32))
        feats_h = feats256[:BATCH // n_mb]
        state_mb = lambda: init_training_state(
            cnf, opt, jax.random.PRNGKey(0), data[0, :2], feats256[:2],
            use_ema=True)

        def body_mb(st, xb, fts, n_mb=n_mb, feats_h=feats_h):
            key, sub = jax.random.split(st.key)
            subs = jax.random.split(sub, n_mb)
            chunks = xb.reshape(n_mb, BATCH // n_mb, -1)

            def chunk(carry, inp):
                xh, kh = inp
                g, info = jax.grad(
                    flow_matching_loss_fn, argnums=1, has_aux=True)(
                    cnf, st.params, xh, kh, feats_h)
                return jax.tree_util.tree_map(jnp.add, carry, g), info["loss"]

            g0 = jax.tree_util.tree_map(jnp.zeros_like, st.params)
            gsum, losses = jax.lax.scan(chunk, g0, (chunks, subs))
            grads = jax.tree_util.tree_map(lambda g: g / n_mb, gsum)
            updates, new_opt = opt.update(grads, st.opt_state,
                                          params=st.params)
            new_params = optax.apply_updates(st.params, updates)
            ema = jax.tree_util.tree_map(
                lambda bar, new: bar * 0.999 + 0.001 * new,
                st.ema_params, new_params)
            return st._replace(params=new_params, opt_state=new_opt,
                               key=key, ema_params=ema), jnp.mean(losses)

        _timed_scan(body_mb, state_mb, data, feats256,
                    f"full@mb{n_mb}x{BATCH // n_mb}")

    if "dots" in levers:
        # dots_saveable: keep matmul outputs, recompute only the elementwise
        # tail in backward — saves the post-silu tensor stores without the
        # full-remat recompute of the matmuls themselves.
        cnf_dots = _qm9_cnf(remat="dots")
        data = jnp.asarray(
            rng.normal(size=(N_STEPS, BATCH, N_NODES * DIM)).astype(
                np.float32))
        state_dots = lambda: init_training_state(
            cnf_dots, opt, jax.random.PRNGKey(0), data[0, :2], feats256[:2],
            use_ema=True)
        update_dots = make_update_fn(cnf_dots, opt, use_ema=True)
        def body_dots(st, xb, fts):
            st, info = update_dots(st, xb, fts)
            return st, info["loss"]
        _timed_scan(body_dots, state_dots, data, feats256, "full@remat_dots")

    if "f32" in levers:
        # f32 compute sanity point
        cnf32 = _qm9_cnf(compute_dtype=None)
        data = jnp.asarray(
            rng.normal(size=(N_STEPS, BATCH, N_NODES * DIM)).astype(
                np.float32))
        state32 = lambda: init_training_state(
            cnf32, opt, jax.random.PRNGKey(0), data[0, :2], feats256[:2],
            use_ema=True)
        update32 = make_update_fn(cnf32, opt, use_ema=True)
        def body32(st, xb, fts):
            st, info = update32(st, xb, fts)
            return st, info["loss"]
        _timed_scan(body32, state32, data, feats256, "full@f32")


def hlo_dtype_audit():
    """Count dot ops by result dtype in the PRE-OPT StableHLO of the step.

    (Fetching the optimized HLO text over the tunnel hung >10 min; the
    pre-opt module already answers the question asked — whether any
    matmul runs outside bf16.  The jaxpr FLOP counter cross-checks this:
    bf16 fraction 100.0% in the decomposition table.)
    """
    print("== dot-op dtype audit (full step, pre-opt StableHLO) ==",
          flush=True)
    import re

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
    txt = lowered.as_text()
    counts = {}
    for m in re.finditer(
        r"stablehlo\.dot_general.*?->\s*tensor<[0-9x]*(\w+)>", txt
    ):
        dt = m.group(1)
        counts[dt] = counts.get(dt, 0) + 1
    for dt, c in sorted(counts.items()):
        print(f"  dot_general result dtype {dt}: {c}", flush=True)
    if not counts:
        print("  (no dot_general matched — dialect changed?)", flush=True)


if __name__ == "__main__":
    import os
    parts = os.environ.get(
        "ECNF_PROFILE_PARTS", "decomp,roofline,levers,hlo").split(",")
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    if "decomp" in parts:
        stage_decomposition()
    if "roofline" in parts:
        matmul_chain_roofline()
    if "levers" in parts:
        ab_levers()
    if "hlo" in parts:
        hlo_dtype_audit()
