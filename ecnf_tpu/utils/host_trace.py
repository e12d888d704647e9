"""Host-side tracing for remote (tunneled) TPU backends.

Tracing a big jitted program is not free of device traffic: every
*concrete* array op executed while the trace runs — `jnp.eye`/`jnp.zeros`
constants, index tables, flax `Module.init` — dispatches eagerly to the
default device.  On a local backend that is invisible; over a tunneled
remote PJRT plugin (the ``axon`` platform: ~28 ms per dispatch, plus a
remote compile RPC for each distinct tiny executable) it dominates
wall-clock.  Measured on the LJ13 exact-trace solve (docs/PERF.md
"Compile-time anomaly, diagnosed"): the FIRST solve traced in a process
took **676.7 s to trace+lower** (XLA compile itself: 13 s) because the
trace's eager constant ops each crossed the tunnel; the second method's
trace took 1.4 s with those tiny executables already cached in-process.
This was previously mis-filed as a "233 s rk4 compile anomaly" — it is
order-dependent (whichever program traces first pays), not
method-dependent.

Fix: run tracing with the default device pinned to a *host CPU* backend,
so eager trace-time ops never touch the tunnel.  Same probe with the fix:
first trace 80.1 s (local mini-jit compiles on this 2-core host), init
51.9 s -> 7.6 s.  Correctness is unaffected — tracing only records
abstract equations; constants computed on host CPU are embedded in the
lowered program and live on the TPU at execution, and explicit
``in_shardings``/committed arguments still pin the compiled program to
the mesh.

Usage (bench.py, serving CLIs):

    ensure_host_cpu_backend()   # before the first jax backend use
    ...
    with host_tracing():
        params = cnf.init(...)              # eager init on host
        lowered = jitted.lower(*args)       # eager trace constants on host
    compiled = lowered.compile()            # XLA compile for the mesh

The reference has no analogue (single local backend assumed throughout;
its benchmark pays the full first-call cost inline,
`examples/load_checkpoint_measure_sampling_time.py:108-119`).
"""
import contextlib
import os

# Platforms whose dispatch path crosses a slow transport (shared with
# utils/compile_cache.py's remote-plugin handling).
_REMOTE_PLUGIN_PLATFORMS = ("axon",)


def ensure_host_cpu_backend() -> bool:
    """Make a host ``cpu`` backend available next to a remote plugin.

    When ``JAX_PLATFORMS`` selects a remote plugin only (e.g. ``axon``),
    appends ``,cpu`` so `host_tracing` has a local device to pin eager ops
    to.  The first-listed platform stays the default, so device selection
    elsewhere is unchanged.  Must run before jax initializes its backends
    (import-time of the calling script is safe; jax backends are lazy).

    Returns True when the env var was amended.
    """
    spec = os.environ.get("JAX_PLATFORMS", "")
    platforms = [p.strip().lower() for p in spec.split(",") if p.strip()]
    if not platforms or "cpu" in platforms:
        return False  # auto-detect configs already include a cpu backend
    if not set(platforms) & set(_REMOTE_PLUGIN_PLATFORMS):
        return False  # local backend; eager dispatch is cheap
    os.environ["JAX_PLATFORMS"] = spec + ",cpu"
    return True


def host_tracing():
    """Context manager pinning the default device to a host CPU.

    Use around `Module.init` and `jit(...).lower(...)` calls on tunneled
    backends.  A true no-op (null context) unless the default backend is a
    remote plugin: on local backends (cpu, or a directly attached
    accelerator) eager dispatch is cheap and pinning would silently move
    uncommitted eager work in user callbacks (e.g. a custom
    `eval_and_plot_fn`) onto host CPU (ADVICE r3).  Also a no-op when no
    cpu backend exists — e.g. an ``axon``-only process that never called
    `ensure_host_cpu_backend`.
    """
    import jax

    if jax.default_backend() not in _REMOTE_PLUGIN_PLATFORMS:
        return contextlib.nullcontext()
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)
