"""Training loop core (capability mirror of the vendored LAVIS trainer:
RunnerBase.train runner_base.py:348-411, BaseTask._train_inner_loop
base_task.py:158-251, LR schedules optims.py:14-135 — mirrored as capability,
not implementation).

Functional core: `multimodal_lm_loss` (next-token CE with IGNORE_INDEX over
spliced multimodal sequences) + `make_train_step` (optax, grads averaged over
the 'data' mesh axis by GSPMD — no DDP wrapper, no NCCL init
(vs reference dist_utils.py:57-92)).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from llava_align_tpu.config import LlavaConfig
from llava_align_tpu.constants import IGNORE_INDEX
from llava_align_tpu.models import llama, llava

Params = Dict[str, Any]


@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: int = 0


def make_optimizer(
    lr: float = 1e-5,
    *,
    warmup_steps: int = 100,
    total_steps: int = 10_000,
    min_lr: float = 0.0,
    weight_decay: float = 0.05,
    beta2: float = 0.999,
    schedule: str = "warmup_cosine",
    max_grad_norm: Optional[float] = 1.0,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW + warmup-cosine (LAVIS LinearWarmupCosineLRScheduler capability).

    accum_steps>1 = gradient accumulation (reference base_task.py
    accum_grad_iters): the mean gradient over k micro-batches applies once
    every k steps (optax.MultiSteps). The reference's AMP GradScaler has no
    TPU counterpart by design — bf16 carries fp32 exponent range, so loss
    scaling is unnecessary."""
    if schedule == "warmup_cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=min_lr,
        )
    elif schedule == "constant":
        sched = lr
    else:
        raise ValueError(schedule)
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(sched, b2=beta2, weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def multimodal_lm_loss(
    params: Params,
    cfg: LlavaConfig,
    batch: Dict[str, jax.Array],
    *,
    attn_impl: str = "auto",
) -> jax.Array:
    """Next-token cross entropy over spliced multimodal sequences.

    batch keys (all [B, ...], built with llava.plan_splice on the host):
        tokens      [B, S] sentinel-free token ids
        tok_gather  [B, S], img_gather [B, S], is_image [B, S]
        labels      [B, S] target ids, IGNORE_INDEX at image/pad positions
                    (reference splices IGNORE_INDEX the same way,
                    llava_arch.py:138-146)
        images      [B, 3, H, W]
    """
    feats = llava.encode_images(params, cfg, batch["images"])
    embeds = llava.splice_embeds(
        params, cfg,
        batch["tokens"], batch["tok_gather"], batch["img_gather"],
        batch["is_image"], feats,
    )
    B, S, _ = embeds.shape
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    hidden, _ = llama.forward(
        params["llama"], cfg.text, embeds, positions, attn_impl=attn_impl
    )
    logits = llama.logits_from_hidden(params["llama"], hidden)  # [B,S,V] fp32

    shift_logits = logits[:, :-1]
    shift_labels = batch["labels"][:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom


def make_train_step(
    cfg: LlavaConfig,
    optimizer: optax.GradientTransformation,
    *,
    attn_impl: str = "auto",
    donate: bool = True,
    amp: bool = False,
) -> Callable:
    """Returns jitted (params, opt_state, batch) → (params, opt_state, loss).

    Under a mesh with sharded params and a batch sharded over 'data', GSPMD
    emits the gradient all-reduce — the SPMD replacement for DDP.
    amp=True computes forward/backward in bfloat16 against fp32 master
    weights (framework.optims.amp_cast; the reference's `amp` run knob)."""

    def step(params, opt_state, batch):
        from llava_align_tpu.framework.optims import amp_cast

        cast = amp_cast if amp else (lambda p: p)
        loss, grads = jax.value_and_grad(
            lambda p: multimodal_lm_loss(cast(p), cfg, batch, attn_impl=attn_impl)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def build_train_batch(
    cfg: LlavaConfig,
    samples,
    pad_to: int,
):
    """Host-side collation: list of (input_ids_with_sentinel, target_mask_fn?)
    → batch dict. `samples` is a list of dicts {input_ids, images} where
    labels default to the input ids (standard LM objective) with IGNORE at
    image and pad positions."""
    import numpy as np

    B = len(samples)
    S = pad_to
    tokens = np.zeros((B, S), np.int32)
    tok_g = np.zeros((B, S), np.int32)
    img_g = np.zeros((B, S), np.int32)
    is_img = np.zeros((B, S), bool)
    labels = np.full((B, S), IGNORE_INDEX, np.int32)
    images = np.stack([s["images"] for s in samples])
    for b, s in enumerate(samples):
        plan = llava.plan_splice(s["input_ids"], cfg.num_image_tokens, pad_to)
        tokens[b, : len(plan.tokens)] = plan.tokens
        tok_g[b] = plan.tok_gather
        img_g[b] = plan.img_gather
        is_img[b] = plan.is_image
        lab = np.where(
            plan.is_image, IGNORE_INDEX, plan.tokens[np.minimum(plan.tok_gather, len(plan.tokens) - 1)]
        )
        lab[plan.length :] = IGNORE_INDEX
        labels[b] = lab
    return {
        "tokens": tokens,
        "tok_gather": tok_g,
        "img_gather": img_g,
        "is_image": is_img,
        "labels": labels,
        "images": images,
    }
