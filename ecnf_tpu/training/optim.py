"""Optimizer construction.

Parity with the reference's `ecnf/setup_training.py:97-109`: Adam with
either a constant lr or a warmup-cosine-decay schedule over the total number
of minibatch steps.
"""
from typing import Optional

import optax


def build_optimizer(
    init_lr: float,
    use_schedule: bool = False,
    peak_lr: Optional[float] = None,
    end_lr: Optional[float] = None,
    n_iter_warmup: int = 0,
    n_iter_total: Optional[int] = None,
    optimizer_name: str = "adam",
) -> optax.GradientTransformation:
    if use_schedule:
        assert n_iter_total is not None
        # Clamp warmup for debug-scale runs (optax requires a positive
        # cosine-decay phase after warmup).
        warmup = min(n_iter_warmup, max(n_iter_total - 1, 0))
        lr = optax.warmup_cosine_decay_schedule(
            init_value=float(init_lr),
            peak_value=float(peak_lr),
            end_value=float(end_lr),
            warmup_steps=warmup,
            decay_steps=n_iter_total,
        )
    else:
        lr = float(init_lr)
    if optimizer_name == "adam":
        return optax.adam(lr)
    if optimizer_name == "adamw":
        return optax.adamw(lr)
    raise ValueError(f"unknown optimizer {optimizer_name!r}")
