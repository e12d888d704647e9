"""Sharding-aware checkpointing (replacing the reference's pickle).

The reference pickles the whole `TrainingState` to
``model_checkpoints/state_%08i.pkl`` and recovers the iteration by parsing
the filename (`ecnf/utils/loop.py:97-153`, `ecnf/utils/checkpoints.py:3-20`).
Here checkpoints are orbax-backed (async-capable, works with sharded arrays
on a mesh: each host writes its shards); the directory layout keeps the
``state_%08i`` naming convention so latest-checkpoint discovery and
iteration parsing behave identically.
"""
import os
import re
from typing import Any, Optional

import jax


def get_latest_checkpoint(dir_path: str, key: str = "state_") -> Optional[str]:
    """Path of the lexicographically-latest checkpoint containing ``key``.

    Parity: reference `ecnf/utils/checkpoints.py:3-20` (file-based), extended
    to accept orbax step directories.
    """
    if not os.path.exists(dir_path):
        return None
    entries = [
        os.path.join(dir_path, f) for f in os.listdir(dir_path) if key in f
    ]
    if not entries:
        return None
    entries.sort()
    return entries[-1]


def parse_checkpoint_iteration(path: str) -> int:
    """Recover the training iteration from a ``state_%08i`` name."""
    m = re.search(r"state_(\d{8})", os.path.basename(path.rstrip("/")))
    if m is None:
        raise ValueError(f"cannot parse iteration from checkpoint path {path!r}")
    return int(m.group(1))


def checkpoint_path(checkpoints_dir: str, iteration: int) -> str:
    return os.path.join(checkpoints_dir, "state_%08i" % iteration)


def save_checkpoint(checkpoints_dir: str, iteration: int, state: Any) -> str:
    """Save a (possibly sharded) pytree state with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(checkpoint_path(checkpoints_dir, iteration))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    return path


def restore_checkpoint(path: str, target: Any, partial: bool = False) -> Any:
    """Restore a checkpoint onto the structure (and shardings) of ``target``.

    ``target`` supplies the pytree structure and the intended shardings (for
    restores onto a different mesh topology), replacing the reference's
    pmap re-replication hack (`loop.py:104-106` — which silently dropped
    ema_params; restoring onto an explicit target avoids that bug class).

    ``partial=True`` restores a subtree of the saved state (e.g. only
    ``{"params": ...}`` out of a full `TrainingState` checkpoint) — the
    serving/benchmark path, which doesn't need optimizer state.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    # Explicit per-leaf restore args carrying the target's shardings: orbax
    # then restores straight onto the intended mesh layout (same or changed
    # topology) instead of its "populate sharding from file" fallback —
    # which is unsafe when the saving topology differs and warns loudly.
    restore_args = ocp.checkpoint_utils.construct_restore_args(target)
    if partial:
        restored = ckptr.restore(
            os.path.abspath(path), item=abstract, restore_args=restore_args,
            partial_restore=True,
        )
    else:
        restored = ckptr.restore(
            os.path.abspath(path), item=abstract, restore_args=restore_args
        )
    # Re-place leaves on the target's shardings (no-op when restore_args
    # already landed them there; covers non-array leaves).
    def place(t, r):
        if hasattr(t, "sharding") and hasattr(r, "sharding") and r.sharding != t.sharding:
            return jax.device_put(r, t.sharding)
        return r

    return jax.tree_util.tree_map(place, target, restored)


def restore_serving_params(path: str, params_template: Any, ema: bool = False) -> Any:
    """Restore just the parameters (raw or EMA) for serving/scoring.

    ``ema=True`` restores ``ema_params`` — the weights the training loop
    evaluates with for ``use_ema`` configs (reference
    `setup_training.py:229-230`).  Raises ``ValueError`` with a clear
    message when the checkpoint was trained without EMA (the underlying
    orbax error type for a missing/None entry is not a stable API).
    """
    key_name = "ema_params" if ema else "params"
    try:
        return restore_checkpoint(path, {key_name: params_template}, partial=True)[
            key_name
        ]
    except (TypeError, KeyError, ValueError) as e:
        if ema:
            raise ValueError(
                "checkpoint has no EMA parameters (trained with use_ema=false)"
            ) from e
        raise
