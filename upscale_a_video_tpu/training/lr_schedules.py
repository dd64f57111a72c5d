"""Learning-rate schedules (ref models_video/__init__.py:4-23): linear warmup
(the u-vit 5000-step recipe) and cosine annealing, as optax schedules."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_schedule(base_lr: float, warmup_steps: int = 5000) -> optax.Schedule:
    """lr = base · min(step / warmup_steps, 1) (ref :6-13)."""
    if warmup_steps <= 0:
        return optax.constant_schedule(base_lr)
    return lambda step: base_lr * jnp.minimum(step / warmup_steps, 1.0)


def cosine_schedule(base_lr: float, decay_steps: int, eta_min: float = 0.0) -> optax.Schedule:
    """CosineAnnealingLR equivalent (ref :19-21)."""
    alpha = eta_min / base_lr if base_lr > 0 else 0.0
    return optax.cosine_decay_schedule(base_lr, decay_steps, alpha=alpha)


def get_lr_schedule(name: str, base_lr: float, **kwargs) -> optax.Schedule:
    """ref get_lr_scheduler (:16-23)."""
    if name == "warmup":
        return warmup_schedule(base_lr, **kwargs)
    if name == "cosine":
        return cosine_schedule(base_lr, **kwargs)
    raise NotImplementedError(name)
