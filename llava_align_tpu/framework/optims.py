"""LR schedulers, registered by name.

Capability parity: reference lavis/common/optims.py:14-135 —
LinearWarmupStepLRScheduler, LinearWarmupCosineLRScheduler, ConstantLR — as
optax schedules (per-step functions; under jit they fold into the update)."""

from __future__ import annotations

import math
from typing import Callable

import optax

from llava_align_tpu.framework.registry import registry

Schedule = Callable[[int], float]


@registry.register_lr_scheduler("linear_warmup_cosine_lr")
def linear_warmup_cosine_lr(
    init_lr: float,
    min_lr: float = 0.0,
    warmup_steps: int = 0,
    warmup_start_lr: float = -1.0,
    max_steps: int = 10_000,
    **_,
) -> Schedule:
    warmup_start_lr = warmup_start_lr if warmup_start_lr >= 0 else init_lr

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + (init_lr - warmup_start_lr) * step / max(warmup_steps, 1)
        progress = jnp.clip(step / max(max_steps, 1), 0.0, 1.0)
        cosine = min_lr + 0.5 * (init_lr - min_lr) * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cosine)

    return schedule


@registry.register_lr_scheduler("linear_warmup_step_lr")
def linear_warmup_step_lr(
    init_lr: float,
    min_lr: float = 0.0,
    warmup_steps: int = 0,
    warmup_start_lr: float = -1.0,
    decay_rate: float = 1.0,
    steps_per_epoch: int = 1000,
    **_,
) -> Schedule:
    warmup_start_lr = warmup_start_lr if warmup_start_lr >= 0 else init_lr

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + (init_lr - warmup_start_lr) * step / max(warmup_steps, 1)
        epoch = jnp.floor(step / steps_per_epoch)
        stepped = jnp.maximum(init_lr * (decay_rate**epoch), min_lr)
        return jnp.where(step < warmup_steps, warm, stepped)

    return schedule


@registry.register_lr_scheduler("constant_lr")
def constant_lr(init_lr: float, warmup_steps: int = 0, warmup_start_lr: float = 0.0, **_) -> Schedule:
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + (init_lr - warmup_start_lr) * step / max(warmup_steps, 1)
        return jnp.where(step < warmup_steps, warm, init_lr) if warmup_steps else jnp.full_like(step, init_lr)

    return schedule


def build_optimizer(
    lr_sched: str = "linear_warmup_cosine_lr",
    weight_decay: float = 0.05,
    beta2: float = 0.999,
    max_grad_norm: float = 1.0,
    **sched_kwargs,
) -> optax.GradientTransformation:
    sched_fn = registry.get_lr_scheduler_class(lr_sched)
    if sched_fn is None:
        raise KeyError(f"unknown lr scheduler {lr_sched}")
    schedule = sched_fn(**sched_kwargs)
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(schedule, b2=beta2, weight_decay=weight_decay))
    return optax.chain(*chain)
