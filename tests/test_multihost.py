"""Multi-process (multi-host) smoke: 2 JAX processes, 8 global devices."""
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_two_process_training_agrees():
    """Runs scripts/multihost_smoke.py: jax.distributed across 2 processes,
    per-process data loading, sharded train step; both must agree."""
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multihost_smoke.py")],
        capture_output=True,
        timeout=420,
        text=True,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multihost smoke OK" in out.stdout


class TestMaybeInitializeDistributed:
    """The production multi-host entry point (VERDICT r3 items 2/4): it
    must decide and act WITHOUT initializing jax backends, since after a
    backend touch `jax.distributed.initialize` is too late."""

    @pytest.fixture(autouse=True)
    def _clean_env(self, monkeypatch):
        from ecnf_tpu.parallel import distributed as dist

        for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        # The module-level re-entrancy flag (ADVICE r4) is process-lifetime
        # by design; tests need a fresh one.
        monkeypatch.setattr(dist, "_INITIALIZED", False)
        yield

    @pytest.fixture
    def _no_backend_touch(self, monkeypatch):
        """Make any backend-initializing call blow up loudly."""
        import jax

        def boom(*a, **k):
            raise AssertionError(
                "maybe_initialize_distributed touched a jax backend"
            )

        monkeypatch.setattr(jax, "process_count", boom)
        monkeypatch.setattr(jax, "process_index", boom)
        monkeypatch.setattr(jax, "devices", boom)
        monkeypatch.setattr(jax, "local_devices", boom)

    def test_explicit_args_invoke_initialize(
        self, monkeypatch, _no_backend_touch
    ):
        import jax

        from ecnf_tpu.parallel import distributed as dist

        calls = []
        monkeypatch.setattr(
            dist, "_distributed_client_active", lambda: False
        )
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: calls.append(kw),
        )
        assert dist.maybe_initialize_distributed(
            coordinator_address="127.0.0.1:1234",
            num_processes=2,
            process_id=1,
            local_device_ids=[0, 1],
        ) is True
        assert calls == [dict(
            coordinator_address="127.0.0.1:1234", num_processes=2,
            process_id=1, local_device_ids=[0, 1],
        )]

    def test_env_vars_resolve_args(self, monkeypatch, _no_backend_touch):
        import jax

        from ecnf_tpu.parallel import distributed as dist

        calls = []
        monkeypatch.setattr(
            dist, "_distributed_client_active", lambda: False
        )
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda **kw: calls.append(kw)
        )
        monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:9")
        monkeypatch.setenv("NUM_PROCESSES", "4")
        monkeypatch.setenv("PROCESS_ID", "3")
        assert dist.maybe_initialize_distributed() is True
        assert calls == [dict(
            coordinator_address="10.0.0.1:9", num_processes=4, process_id=3,
        )]

    def test_noop_without_coordinator(self, monkeypatch, _no_backend_touch):
        import jax

        from ecnf_tpu.parallel import distributed as dist

        monkeypatch.setattr(
            dist, "_distributed_client_active", lambda: False
        )
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: pytest.fail("initialize called with no coordinator"),
        )
        assert dist.maybe_initialize_distributed() is False

    def test_reentrant_after_initialize(self, monkeypatch, _no_backend_touch):
        """A second call in an initialized process must not re-initialize —
        and must answer via the distributed client state, not
        jax.process_count() (the round-3 footgun)."""
        import jax

        from ecnf_tpu.parallel import distributed as dist

        monkeypatch.setattr(
            dist, "_distributed_client_active", lambda: True
        )
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: pytest.fail("re-initialized an initialized process"),
        )
        monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:9")
        assert dist.maybe_initialize_distributed() is False

    def test_client_probe_reads_jax_internals(self):
        """`_distributed_client_active` reflects the real global state in
        this (never-initialized) test process."""
        from ecnf_tpu.parallel import distributed as dist

        assert dist._distributed_client_active() is False

    def test_own_flag_guards_reentry_without_jax_internals(
        self, monkeypatch, _no_backend_touch
    ):
        """After a successful initialize, a second call is a no-op even if
        the jax-internals probe breaks (fails open to False) — the
        module-level flag decides first (ADVICE r4)."""
        import jax

        from ecnf_tpu.parallel import distributed as dist

        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda **kw: calls.append(kw)
        )
        monkeypatch.setattr(
            dist, "_distributed_client_active", lambda: False
        )
        assert dist.maybe_initialize_distributed(
            coordinator_address="127.0.0.1:1234"
        ) is True
        # Simulate jax internals moving: the probe always answers False.
        assert dist.maybe_initialize_distributed(
            coordinator_address="127.0.0.1:1234"
        ) is False
        assert len(calls) == 1

    def test_already_initialized_runtime_error_is_noop(
        self, monkeypatch, _no_backend_touch
    ):
        """A concurrent/out-of-band prior initialize surfaces as an
        'already initialized' RuntimeError — treated as benign, and the
        flag is set so we never call initialize again (ADVICE r4)."""
        import jax

        from ecnf_tpu.parallel import distributed as dist

        calls = []

        def raise_already(**kw):
            calls.append(kw)
            # JAX's actual wording (jax/_src/distributed.py).
            raise RuntimeError(
                "distributed.initialize should only be called once."
            )

        monkeypatch.setattr(jax.distributed, "initialize", raise_already)
        monkeypatch.setattr(
            dist, "_distributed_client_active", lambda: False
        )
        assert dist.maybe_initialize_distributed(
            coordinator_address="127.0.0.1:1234"
        ) is False
        assert dist.maybe_initialize_distributed(
            coordinator_address="127.0.0.1:1234"
        ) is False
        assert len(calls) == 1

    def test_other_runtime_errors_propagate(
        self, monkeypatch, _no_backend_touch
    ):
        import jax

        from ecnf_tpu.parallel import distributed as dist

        def raise_other(**kw):
            raise RuntimeError("coordinator unreachable")

        monkeypatch.setattr(jax.distributed, "initialize", raise_other)
        monkeypatch.setattr(
            dist, "_distributed_client_active", lambda: False
        )
        with pytest.raises(RuntimeError, match="unreachable"):
            dist.maybe_initialize_distributed(
                coordinator_address="127.0.0.1:1234"
            )
        # The failure must not latch the flag: a retry still attempts.
        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda **kw: calls.append(kw)
        )
        assert dist.maybe_initialize_distributed(
            coordinator_address="127.0.0.1:1234"
        ) is True
        assert len(calls) == 1
