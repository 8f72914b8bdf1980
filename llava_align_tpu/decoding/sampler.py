"""Logit pipeline for the debiased sampler.

Reproduces, as pure jit-able functions:
  * the VCD/VDD contrastive fusion with adaptive-plausibility cutoff
    (reference vcd_utils/vcd_sample.py:188-194):
        cutoff = log(beta) + max(logits)
        out    = (1+alpha)*logits - alpha*logits_cd,  -inf where logits < cutoff
  * HF's logit warpers in generation order (temperature → top-k → top-p),
    matching transformers' TemperatureLogitsWarper / TopKLogitsWarper /
    TopPLogitsWarper semantics (the reference routes fused logits through
    `logits_warper`, vcd_sample.py:196-198).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -float("inf")


def fuse_contrastive_logits(
    logits: jax.Array,
    logits_cd: jax.Array,
    cd_alpha: float | jax.Array,
    cd_beta: float | jax.Array,
) -> jax.Array:
    """logits/logits_cd [..., V] fp32 → fused [..., V]."""
    cutoff = jnp.log(jnp.asarray(cd_beta, jnp.float32)) + jnp.max(
        logits, axis=-1, keepdims=True
    )
    diffs = (1.0 + cd_alpha) * logits - cd_alpha * logits_cd
    return jnp.where(logits < cutoff, NEG_INF, diffs)


def fuse_calibrate_logits(
    logits: jax.Array,
    logits_custom: jax.Array,
    cb_cut_weight: float | jax.Array,
    cb_m_weight: float | jax.Array,
    eos_token_id: int,
) -> jax.Array:
    """Decode-time Post-Hoc 'calibrate' fusion. The reference ships this
    path COMMENTED OUT (vcd_sample.py:209-235), with the knobs plumbed
    through llava_llama.py:74-76 / modeling_qwen.py:1120 and set (unused)
    in experiments/run.sh — no live caller exists. Implemented here as a
    first-class jit-able fusion of the evident semantics:

        cutoff = cb_cut_weight * max(logits)            # NOT log-beta form
        logits = -inf where logits < cutoff
        logits[:, eos+1:] -= cb_m_weight * logits_custom[:, eos+1:]

    where `logits_custom` comes from a content-free ('images_custom')
    forward. The sub-eos special-token columns (bos/eos/pad/unk for llama)
    are left uncorrected, exactly as the commented code slices. Engine
    wiring is intentionally omitted: no reference entry point activates the
    path, so the math (oracle-pinned vs a re-enactment of the commented
    block, tests/test_sampler.py) is the whole behavior surface."""
    cutoff = cb_cut_weight * jnp.max(logits, axis=-1, keepdims=True)
    masked = jnp.where(logits < cutoff, NEG_INF, logits)
    ids = jnp.arange(logits.shape[-1])
    return jnp.where(
        ids > eos_token_id, masked - cb_m_weight * logits_custom, masked
    )


def combine_contrast_branches(
    branch_logits: jax.Array, num_contrast: int
) -> tuple[jax.Array, Optional[jax.Array]]:
    """branch_logits [nb, V] with row 0 = main, rows 1..num_contrast = contrast
    branches. Two contrast branches are averaged (the use_dd & use_dd_unk path,
    reference vcd_sample.py:171-185). Returns (main [V], contrast [V] or None).
    """
    main = branch_logits[0]
    if num_contrast == 0:
        return main, None
    contrast = jnp.mean(branch_logits[1 : 1 + num_contrast], axis=0)
    return main, contrast


def _top_k_mask(logits: jax.Array, k: int) -> jax.Array:
    """Keep the top-k scores (ties at the k-th value kept, HF semantics)."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def _top_p_mask(logits: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filtering, HF TopPLogitsWarper semantics with
    min_tokens_to_keep=1: keep the smallest descending-prob prefix whose
    exclusive cumulative probability is < top_p."""
    sorted_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    excl_cum = jnp.cumsum(probs, axis=-1) - probs
    keep_sorted = excl_cum < top_p
    keep_sorted = keep_sorted.at[..., 0].set(True)
    inv = jnp.argsort(sorted_idx, axis=-1)
    keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    return jnp.where(keep, logits, NEG_INF)


@functools.partial(jax.jit, static_argnames=("temperature", "top_k", "top_p"))
def warp_logits(
    logits: jax.Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> jax.Array:
    """HF generation warper chain. Warpers are skipped exactly when HF skips
    them (temperature==1, top_k in (None, 0), top_p in (None, >=1))."""
    x = logits.astype(jnp.float32)
    if temperature is not None and temperature != 1.0:
        x = x / temperature
    if top_k is not None and top_k > 0:
        k = min(top_k, x.shape[-1])
        x = _top_k_mask(x, k)
    if top_p is not None and top_p < 1.0:
        x = _top_p_mask(x, top_p)
    return x


def sample_token(
    rng: jax.Array, warped_logits: jax.Array, do_sample: bool = True
) -> jax.Array:
    """Categorical sample (== torch.multinomial over softmax) or greedy."""
    if do_sample:
        return jax.random.categorical(rng, warped_logits, axis=-1)
    return jnp.argmax(warped_logits, axis=-1)
