"""Multi-host initialization and host-local data utilities.

TPU-native equivalent of "the distributed backend the reference never had"
(SURVEY §2c): `jax.distributed.initialize` for multi-host process groups;
collectives then ride ICI within a slice (DCN between slices) via GSPMD —
no NCCL/MPI analogue is needed.
"""
import os
from typing import Optional

import jax


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX's multi-host runtime when running under a launcher.

    No-op for single-process runs.  With explicit args (or the standard
    cluster env vars JAX auto-detects) this wires up the global device view
    so ``jax.devices()`` spans all hosts.
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and "COORDINATOR_ADDRESS" in os.environ:
        coordinator_address = os.environ["COORDINATOR_ADDRESS"]
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def process_batch_slice(global_batch_size: int) -> slice:
    """The slice of a global batch this host should load.

    With per-host data loading, each process reads only its shard of the
    global batch; `jax.make_array_from_process_local_data` assembles the
    global array.
    """
    n = jax.process_count()
    i = jax.process_index()
    per_host = global_batch_size // n
    return slice(i * per_host, (i + 1) * per_host)
