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
