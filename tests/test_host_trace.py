"""utils/host_trace.py: the tunneled-backend trace-cost fix.

The measured effect (677 s -> 80 s first trace) only shows on the real
tunnel (docs/PERF.md "Compile-time anomaly, diagnosed"); these tests pin
the *mechanics*: env amendment rules, context safety, and that a jitted
program traced under `host_tracing()` still computes correctly with its
explicit shardings.
"""
import os
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from ecnf_tpu.utils.host_trace import ensure_host_cpu_backend, host_tracing


class TestEnsureHostCpuBackend:
    @pytest.fixture(autouse=True)
    def _restore_env(self):
        old = os.environ.get("JAX_PLATFORMS")
        yield
        if old is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = old

    def test_appends_cpu_to_remote_plugin(self):
        os.environ["JAX_PLATFORMS"] = "axon"
        assert ensure_host_cpu_backend() is True
        assert os.environ["JAX_PLATFORMS"] == "axon,cpu"

    def test_remote_plugin_stays_default(self):
        """First-listed platform is jax's default; the amendment must not
        reorder it."""
        os.environ["JAX_PLATFORMS"] = "axon"
        ensure_host_cpu_backend()
        assert os.environ["JAX_PLATFORMS"].split(",")[0] == "axon"

    def test_noop_when_cpu_already_present(self):
        os.environ["JAX_PLATFORMS"] = "axon,cpu"
        assert ensure_host_cpu_backend() is False
        assert os.environ["JAX_PLATFORMS"] == "axon,cpu"

    def test_noop_on_cpu_only(self):
        os.environ["JAX_PLATFORMS"] = "cpu"
        assert ensure_host_cpu_backend() is False
        assert os.environ["JAX_PLATFORMS"] == "cpu"

    def test_noop_on_empty_autodetect(self):
        os.environ["JAX_PLATFORMS"] = ""
        assert ensure_host_cpu_backend() is False
        assert os.environ["JAX_PLATFORMS"] == ""

    def test_noop_on_local_tpu(self):
        """A real local TPU has cheap eager dispatch — no amendment."""
        os.environ["JAX_PLATFORMS"] = "tpu"
        assert ensure_host_cpu_backend() is False
        assert os.environ["JAX_PLATFORMS"] == "tpu"


class TestHostTracing:
    def test_context_pins_default_device_to_cpu(self):
        with host_tracing():
            x = jnp.zeros((3,))
        assert x.devices() == {jax.devices("cpu")[0]}

    def test_sharded_jit_unaffected_by_context(self):
        """Tracing under the context must not move explicitly-sharded
        programs: the loop/bench call sites rely on this."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = np.array(jax.devices()[: max(1, jax.device_count() // 2) * 2])
        mesh = Mesh(devs, ("data",))
        shard = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())

        f = jax.jit(lambda w, x: (w * x).sum(axis=-1),
                    in_shardings=(rep, shard), out_shardings=shard)
        w = jax.device_put(jnp.arange(4.0), rep)
        x = jax.device_put(jnp.ones((devs.size * 2, 4)), shard)
        with host_tracing():  # first call: trace happens inside the context
            y = f(w, x)
        jax.block_until_ready(y)
        assert set(y.devices()) == set(devs.tolist())
        np.testing.assert_allclose(np.asarray(y), 6.0)

    def test_nullcontext_on_local_backend(self, monkeypatch):
        """ADVICE r3: on local backends (cpu / directly attached chips)
        the context must be a TRUE no-op — pinning would silently move
        uncommitted eager work in user callbacks onto host CPU."""
        import contextlib

        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        assert isinstance(host_tracing(), contextlib.nullcontext)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert isinstance(host_tracing(), contextlib.nullcontext)

    def test_pins_on_remote_plugin_backend(self, monkeypatch):
        """Only a remote-plugin default backend activates the pin."""
        import contextlib

        monkeypatch.setattr(jax, "default_backend", lambda: "axon")
        ctx = host_tracing()  # the test process has a cpu backend
        assert not isinstance(ctx, contextlib.nullcontext)

    def test_nullcontext_without_cpu_backend(self, monkeypatch):
        """When jax has no cpu backend the context degrades to a no-op
        (even on a remote-plugin default backend)."""
        def boom(_):
            raise RuntimeError("no cpu backend")

        monkeypatch.setattr(jax, "default_backend", lambda: "axon")
        monkeypatch.setattr(jax, "devices", boom)
        ctx = host_tracing()
        with ctx:
            pass  # must not raise
