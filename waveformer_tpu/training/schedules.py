"""Learning-rate schedules (optax equivalents of the reference zoo).

Covers `light_training/utils/lr_scheduler.py:22-222` (PolyLR, polynomial /
cosine / constant with warmup) and `self_supervised/scheduler.py`
(WarmupCosineSchedule) as pure optax schedules.
"""

from __future__ import annotations

from typing import Optional

import optax


def poly_schedule(
    initial_lr: float, max_steps: int, exponent: float = 0.9
) -> optax.Schedule:
    """nnUNet PolyLR (`utils/lr_scheduler.py:22-38`):
    lr = initial * (1 - step/max_steps) ** exponent."""

    def fn(step):
        frac = 1.0 - jnp_clip(step / max_steps)
        return initial_lr * frac**exponent

    return fn


def jnp_clip(x):
    import jax.numpy as jnp

    return jnp.clip(x, 0.0, 1.0)


def warmup_cosine_schedule(
    initial_lr: float,
    warmup_steps: int,
    total_steps: int,
    cycles: float = 0.5,
    end_value: float = 0.0,
) -> optax.Schedule:
    """`WarmupCosineSchedule` (`self_supervised/scheduler.py`) / HF-style
    cosine-with-warmup (`utils/lr_scheduler.py:104-140`)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=initial_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=end_value,
    )


def polynomial_with_warmup_schedule(
    initial_lr: float,
    warmup_steps: int,
    total_steps: int,
    power: float = 1.0,
    end_lr: float = 1e-7,
) -> optax.Schedule:
    """`get_polynomial_decay_schedule_with_warmup`
    (`utils/lr_scheduler.py:142-198`)."""
    warm = optax.linear_schedule(0.0, initial_lr, max(warmup_steps, 1))
    poly = optax.polynomial_schedule(
        init_value=initial_lr,
        end_value=end_lr,
        power=power,
        transition_steps=max(total_steps - warmup_steps, 1),
    )
    return optax.join_schedules([warm, poly], [warmup_steps])


def constant_with_warmup_schedule(
    initial_lr: float, warmup_steps: int
) -> optax.Schedule:
    """`get_constant_schedule_with_warmup` (`utils/lr_scheduler.py:66-88`)."""
    warm = optax.linear_schedule(0.0, initial_lr, max(warmup_steps, 1))
    return optax.join_schedules(
        [warm, optax.constant_schedule(initial_lr)], [warmup_steps]
    )


def make_schedule(
    name: Optional[str],
    initial_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
) -> optax.Schedule:
    """Scheduler dispatch mirroring `Trainer` (`light_training/trainer.py:370-405`)."""
    if name is None or name == "constant":
        return optax.constant_schedule(initial_lr)
    if name in ("poly_decay", "poly"):
        return poly_schedule(initial_lr, total_steps)
    if name in ("cosine_with_warmup", "warmup_cosine"):
        return warmup_cosine_schedule(initial_lr, warmup_steps, total_steps)
    if name == "poly_with_warmup":
        return polynomial_with_warmup_schedule(
            initial_lr, warmup_steps, total_steps
        )
    if name == "constant_with_warmup":
        return constant_with_warmup_schedule(initial_lr, warmup_steps)
    raise ValueError(f"unknown scheduler {name!r}")
