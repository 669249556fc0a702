"""LR / scalar schedules (reference `utils/utils.py:250-262,264-270,529-540`)."""

from __future__ import annotations


import numpy as np
import optax


def half_cosine_schedule(lr: float, min_lr: float, total_epochs: int,
                         warmup_epochs: int, steps_per_epoch: int) -> optax.Schedule:
    """The reference's ``adjust_learning_rate`` (`utils/utils.py:250-262`):
    linear warmup then half-cosine decay to ``min_lr``; epoch is fractional
    per iteration."""

    def schedule(step):
        import jax.numpy as jnp

        epoch = step / steps_per_epoch
        warm = lr * epoch / max(warmup_epochs, 1e-8) if warmup_epochs > 0 else lr
        denom = max(total_epochs - warmup_epochs, 1e-8)
        cos = min_lr + (lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * (epoch - warmup_epochs) / denom)
        )
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def step_schedule(lr: float, total_epochs: int, steps_per_epoch: int,
                  milestones=(0.5, 0.75), gamma: float = 0.1) -> optax.Schedule:
    """Step decay at fractional milestones (`utils/utils.py:264-270`)."""

    def schedule(step):
        import jax.numpy as jnp

        epoch = step / steps_per_epoch
        factor = jnp.asarray(1.0)
        for m in milestones:
            factor = jnp.where(epoch >= m * total_epochs, factor * gamma, factor)
        return lr * factor

    return schedule


def cosine_array(base: float, final: float, epochs: int, steps_per_epoch: int,
                 warmup_epochs: int = 0, start_warmup: float = 0.0) -> np.ndarray:
    """Precomputed per-iteration cosine array for EMA momentum / mask-ratio
    schedules (`utils/utils.py:529-540`, used by MHIM)."""
    warmup_iters = warmup_epochs * steps_per_epoch
    warmup = np.linspace(start_warmup, base, warmup_iters) if warmup_iters else np.array([])
    iters = np.arange(epochs * steps_per_epoch - warmup_iters)
    denom = max(len(iters), 1)
    sched = final + 0.5 * (base - final) * (1 + np.cos(np.pi * iters / denom))
    return np.concatenate([warmup, sched])
