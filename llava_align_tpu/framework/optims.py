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
def constant_lr(init_lr: float, warmup_steps: int = 0, warmup_start_lr: float = -1.0, **_) -> Schedule:
    # -1 sentinel → warm up from init_lr, like the reference ConstantLRScheduler
    warmup_start_lr = warmup_start_lr if warmup_start_lr >= 0 else init_lr

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + (init_lr - warmup_start_lr) * step / max(warmup_steps, 1)
        return jnp.where(step < warmup_steps, warm, init_lr) if warmup_steps else jnp.full_like(step, init_lr)

    return schedule


def decay_mask(params):
    """Weight-decay split of the reference optimizer
    (lavis/models/base_model.py:107-120 get_optimizer_params): NO decay for
    params with ndim < 2 (every bias / LayerNorm scale) or whose name
    contains bias/ln/bn/norm; decay for the 2-D+ matrices. Returns a bool
    pytree for optax.adamw(mask=...)."""
    import jax
    import jax.numpy as jnp

    no_decay = ("bias", "ln", "bn", "norm")

    def keyname(k) -> str:
        return str(getattr(k, "key", getattr(k, "idx", k))).lower()

    def f(path, x):
        if jnp.ndim(x) < 2:
            return False
        return not any(t in keyname(k) for k in path for t in no_decay)

    return jax.tree_util.tree_map_with_path(f, params)


def build_optimizer(
    lr_sched: str = "linear_warmup_cosine_lr",
    weight_decay: float = 0.05,
    beta2: float = 0.999,
    max_grad_norm: float = 1.0,
    accum_grad_iters: int = 1,
    **sched_kwargs,
) -> optax.GradientTransformation:
    """AdamW + named LR schedule with the reference's decay split applied
    via mask (biases/norm params are not decayed). `max_grad_norm=0`
    disables clipping (the reference clips only where run configs say so).

    `accum_grad_iters` reproduces the reference's gradient accumulation
    (base_task.py:223,232: each backward contributes loss/k and the
    optimizer steps every k iterations): optax.MultiSteps accumulates the
    running MEAN of the k gradients and applies the inner chain once per k
    updates — identical math, one jittable transformation."""
    sched_fn = registry.get_lr_scheduler_class(lr_sched)
    if sched_fn is None:
        raise KeyError(f"unknown lr scheduler {lr_sched}")
    schedule = sched_fn(**sched_kwargs)
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(schedule, b2=beta2, weight_decay=weight_decay, mask=decay_mask)
    )
    tx = optax.chain(*chain)
    if accum_grad_iters and int(accum_grad_iters) > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accum_grad_iters))
    return tx


def amp_cast(params):
    """TPU-native analogue of the reference's AMP autocast
    (base_task.py:221 `torch.cuda.amp.autocast`): cast fp32 leaves to
    bfloat16 for the forward/backward while the caller keeps fp32 master
    weights for the optimizer update. Gradients flow through the cast and
    arrive fp32 (the cast's transpose up-casts), so no loss scaler is
    needed — bf16 shares fp32's exponent range. Non-float leaves,
    already-low-precision leaves, and 0-d scalars (temperature /
    logit-scale knobs, which autocast's elementwise policy would leave at
    full width) pass through unchanged."""
    import jax
    import jax.numpy as jnp

    def cast(x):
        if x.dtype == jnp.float32 and jnp.ndim(x) >= 1:
            return x.astype(jnp.bfloat16)
        return x

    return jax.tree_util.tree_map(cast, params)
