"""Generic training loop with eval/checkpoint schedules, resume and
runtime limits.

Behavioral parity with the reference's `ecnf/utils/loop.py:39-182`
(`TrainConfig`, `run_training`): linspace eval/checkpoint schedules,
pre-training eval at iteration -1, per-batch info fan-out to the logger,
latest-checkpoint resume, runtime-limit extrapolated early stop, final
history plot for in-memory loggers.  Differences: checkpoints are
orbax-backed and sharding-aware (`ecnf_tpu/training/checkpoints.py`), and a
`jax.profiler` trace can be captured around a training slice.
"""
import os
import pathlib
import time
from typing import Any, Callable, NamedTuple, Optional, Protocol, Tuple

import jax
import numpy as np

from ecnf_tpu.ops.numerics import get_leading_axis_tree
from ecnf_tpu.training.loggers import Logger, ListLogger
from ecnf_tpu.training.checkpoints import (
    get_latest_checkpoint,
    parse_checkpoint_iteration,
    save_checkpoint,
    restore_checkpoint,
)
from ecnf_tpu.utils.host_trace import host_tracing

TrainingStateT = Any
InitStateFn = Callable[[jax.Array], TrainingStateT]
UpdateStateFn = Callable[[TrainingStateT], Tuple[TrainingStateT, dict]]


class EvalAndPlotFn(Protocol):
    def __call__(
        self,
        state: TrainingStateT,
        key: jax.Array,
        iteration_n: int,
        save: bool,
        plots_dir: str,
    ) -> dict: ...


class TrainConfig(NamedTuple):
    """Everything `run_training` needs (reference `loop.py:39-54`)."""

    n_iteration: int
    logger: Logger
    seed: int
    n_checkpoints: int
    n_eval: int
    init_state: InitStateFn
    update_state: UpdateStateFn
    eval_and_plot_fn: Optional[EvalAndPlotFn]
    save: bool = True
    save_dir: str = "/tmp"
    resume: bool = False
    use_64_bit: bool = False
    runtime_limit: Optional[float] = None
    profile_dir: Optional[str] = None
    # TPU-native (no reference analogue): run up to this many epochs in ONE
    # device dispatch (`update_state_multi(state, k)`), bounded so groups
    # never cross an eval/checkpoint iteration.  Short-epoch configs are
    # otherwise dominated by per-dispatch host latency.
    update_state_multi: Optional[Callable[[TrainingStateT, int], Tuple[TrainingStateT, dict]]] = None
    epochs_per_dispatch: int = 1


def _schedule(n_iteration: int, n_points: int) -> np.ndarray:
    """Evenly spaced iteration indices ending at the final iteration.

    Parity: reference `loop.py:77-89` (flip of a reversed linspace).
    """
    return np.flip(
        np.linspace(n_iteration - 1, 0, n_points, dtype="int", endpoint=False)
    )


def run_training(config: TrainConfig):
    """Generic training script (reference `loop.py:57-182`)."""
    start_time = time.time()

    if config.use_64_bit:
        jax.config.update("jax_enable_x64", True)

    if config.save:
        pathlib.Path(config.save_dir).mkdir(exist_ok=True, parents=True)
        plots_dir = os.path.join(config.save_dir, "plots")
        pathlib.Path(plots_dir).mkdir(exist_ok=True)
        checkpoints_dir = os.path.join(config.save_dir, "model_checkpoints")
        pathlib.Path(checkpoints_dir).mkdir(exist_ok=True)
    else:
        plots_dir = None
        checkpoints_dir = None

    checkpoint_iter_np = _schedule(config.n_iteration, config.n_checkpoints)
    checkpoint_iter = set(checkpoint_iter_np.tolist())
    eval_iter = set(_schedule(config.n_iteration, config.n_eval).tolist())

    key = jax.random.PRNGKey(config.seed)
    key, subkey = jax.random.split(key)
    # Flax init is eager; on a tunneled backend every op would round-trip
    # the tunnel (measured ~50 s for the LJ13 net).  `host_tracing` is a
    # null context except on remote-plugin backends, and the update/eval
    # jits all carry explicit shardings (`training/setup.py`), so pinning
    # eager work to the host cpu never moves compiled programs off the mesh.
    with host_tracing():
        state = config.init_state(subkey)
    # Commit to an accelerator this process can address (device_put without
    # a device does NOT commit); on a multi-host run `jax.devices()[0]`
    # would be non-addressable from processes > 0 (ADVICE r3).  The first
    # sharded update re-distributes across the mesh.
    state = jax.device_put(state, jax.local_devices()[0])

    start_iter = 0
    if config.resume and checkpoints_dir is not None:
        latest = get_latest_checkpoint(checkpoints_dir, key="state_")
        if latest:
            start_iter = parse_checkpoint_iteration(latest) + 1
            state = restore_checkpoint(latest, state)
            print(f"loaded checkpoint {latest}")
        else:
            print("no checkpoint found, starting training from scratch")

    if start_iter == 0 and config.eval_and_plot_fn is not None:
        key, subkey = jax.random.split(key)
        with host_tracing():
            eval_info = config.eval_and_plot_fn(state, subkey, -1, config.save, plots_dir)
        eval_info.update(iteration=-1)
        config.logger.write(eval_info)
        print(f"initial model eval complete, eval info: \n {eval_info}")

    profiling = False
    if config.profile_dir and start_iter == 0:
        pathlib.Path(config.profile_dir).mkdir(exist_ok=True, parents=True)
        jax.profiler.start_trace(config.profile_dir)
        profiling = True

    try:
        from tqdm.auto import tqdm

        pbar = tqdm(total=config.n_iteration, initial=start_iter)
    except ImportError:  # pragma: no cover
        pbar = None

    event_iters = np.array(sorted(eval_iter | checkpoint_iter), dtype=np.int64)

    def _write_epoch_info(info: dict, iteration_n: int) -> None:
        """Per-batch info fan-out (reference `loop.py:124-133`)."""
        leading_info_shape = get_leading_axis_tree(info, 1)
        if len(leading_info_shape) == 0 or leading_info_shape == (1,):
            info.update(iteration=iteration_n)
            config.logger.write(info)
        else:
            for batch_idx in range(leading_info_shape[0]):
                batch_info = jax.tree_util.tree_map(lambda x: x[batch_idx], info)
                batch_info.update(iteration=iteration_n)
                config.logger.write(batch_info)

    iteration = start_iter
    while iteration < config.n_iteration:
        # Group up to epochs_per_dispatch epochs into one device dispatch,
        # ending exactly on the next eval/checkpoint iteration so the
        # observable schedule (and its RNG key sequence) is unchanged.
        k = 1
        if (
            config.update_state_multi is not None
            and config.epochs_per_dispatch > 1
            and not profiling
        ):
            nxt = event_iters[event_iters >= iteration]
            next_event = int(nxt[0]) if nxt.size else config.n_iteration - 1
            k = max(
                1,
                min(
                    config.epochs_per_dispatch,
                    next_event - iteration + 1,
                    config.n_iteration - iteration,
                ),
            )

        # host_tracing: first call per distinct program traces here; eager
        # trace constants stay off the tunnel (no-op on local backends, and
        # placement is pinned by the jits' explicit shardings).
        if k > 1:
            with host_tracing():
                state, infos = config.update_state_multi(state, k)
            for j in range(k):
                _write_epoch_info(
                    jax.tree_util.tree_map(lambda x: x[j], infos), iteration + j
                )
        else:
            with host_tracing():
                state, info = config.update_state(state)
            _write_epoch_info(info, iteration)

        iteration_end = iteration + k - 1
        iteration += k
        if pbar is not None:
            pbar.update(k)
        if profiling and iteration_end >= start_iter + 2:
            jax.profiler.stop_trace()
            profiling = False

        if config.eval_and_plot_fn is not None and iteration_end in eval_iter:
            key, subkey = jax.random.split(key)
            with host_tracing():
                eval_info = config.eval_and_plot_fn(
                    state, subkey, iteration_end, config.save, plots_dir
                )
            eval_info.update(iteration=iteration_end)
            print(str(eval_info))
            config.logger.write(eval_info)

        if iteration_end in checkpoint_iter and config.save:
            save_checkpoint(checkpoints_dir, iteration_end, jax.device_get(state))

            # Runtime-limit early stop: extrapolate time to next checkpoint
            # (reference `loop.py:155-170`).
            if (
                config.runtime_limit
                and iteration_end > start_iter
                and np.any(checkpoint_iter_np > iteration_end)
            ):
                next_checkpoint_iter = np.min(
                    checkpoint_iter_np[checkpoint_iter_np > iteration_end]
                )
                time_diff = (time.time() - start_time) / 3600
                if (
                    time_diff
                    * (next_checkpoint_iter - start_iter)
                    / max(iteration_end - start_iter, 1)
                    > config.runtime_limit
                ):
                    break

    if pbar is not None:
        pbar.close()
    if profiling:
        jax.profiler.stop_trace()

    if isinstance(config.logger, ListLogger):
        try:
            from ecnf_tpu.utils.plotting import plot_history
            import matplotlib.pyplot as plt

            plot_history(config.logger.history)
            plt.close("all")
        except Exception:
            pass

    # Upload checkpoints/plots as wandb artifacts at exit (reference
    # `loop.py:176-178`); no-op when wandb is unavailable or not in use.
    from ecnf_tpu.training.loggers import WandbLogger

    if isinstance(config.logger, WandbLogger) and config.save and getattr(
        config.logger, "_wandb", None
    ):
        wandb = config.logger._wandb
        wandb.save(str(pathlib.Path(checkpoints_dir)) + "/*", base_path=config.save_dir, policy="now")
        wandb.save(str(pathlib.Path(plots_dir)) + "/*", base_path=config.save_dir, policy="now")

    config.logger.close()
    return config.logger, state
