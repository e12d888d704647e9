"""Persistent XLA compilation cache.

The reference has no compile-time story (every process re-traces and
re-compiles; its only timing script prints compile time separately,
`examples/load_checkpoint_measure_sampling_time.py:108-119`).  On TPU the
big jitted programs here are expensive to build — the bf16 exact-trace
solve compiles in ~2.5-5 min — and JAX's in-memory cache dies with the
process.  Enabling JAX's persistent compilation cache makes every CLI
restart (training resume after preemption, serving, benchmarks) skip
straight to execution when the program and compiler version are
unchanged.

Safe to call multiple times; a no-op if the user already configured
`jax_compilation_cache_dir` themselves.  Disable with
``ECNF_COMPILE_CACHE=0`` (or ``off``/``none``); point it elsewhere with
``ECNF_COMPILE_CACHE=/path``.

**Remote-PJRT caveat (measured):** over a tunneled backend (the ``axon``
plugin) a cache *hit* is far slower than recompiling — deserializing a
24 MB executable through the tunnel took 867 s vs a 32 s cold compile —
so the cache defaults OFF when ``JAX_PLATFORMS`` selects a remote plugin;
set ``ECNF_COMPILE_CACHE=/path`` to force it anyway.
"""
import os
from typing import Optional

_DEFAULT_DIR = "~/.cache/ecnf_tpu/xla"

# Platforms where executable deserialization crosses a slow transport,
# making cache hits slower than recompilation (see module docstring).
_REMOTE_PLUGIN_PLATFORMS = ("axon",)


def enable_persistent_compilation_cache(
    cache_dir: Optional[str] = None,
    min_compile_time_secs: float = 5.0,
) -> Optional[str]:
    """Route compiled executables through an on-disk cache.

    Returns the cache directory in use, or None when disabled (env opt-out,
    remote-tunnel platform, or an unwritable path — callers never fail on
    cache setup).
    """
    import jax

    env = os.environ.get("ECNF_COMPILE_CACHE")
    if env is not None and not env.strip():
        env = None  # `ECNF_COMPILE_CACHE= cmd` idiom means "unset", not "on"
    if env is not None and env.strip().lower() in ("0", "off", "none", "false"):
        return None
    if jax.config.jax_compilation_cache_dir is not None:
        return jax.config.jax_compilation_cache_dir  # user already set it
    # The backend can be selected either by env var or by jax.config;
    # compare against the split platform list (exact names, not substrings).
    platform_spec = os.environ.get("JAX_PLATFORMS", "")
    cfg_platforms = getattr(jax.config, "jax_platforms", None)
    if cfg_platforms:
        platform_spec = f"{platform_spec},{cfg_platforms}"
    selected = {p.strip().lower() for p in platform_spec.split(",") if p.strip()}
    if env is None and selected & set(_REMOTE_PLUGIN_PLATFORMS):
        return None  # cache hits are slower than recompiles over a tunnel

    path = os.path.expanduser(cache_dir or env or _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    # Only programs worth the disk round-trip; tiny kernels recompile
    # faster than they deserialize.
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
