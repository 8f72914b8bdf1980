"""LLaVA: CLIP vision tower + projector + LLaMA decoder.

Parity target: reference experiments/llava/model/llava_arch.py (encode_images
:82-85, prepare_inputs_labels_for_multimodal :87-204) and llava_llama.py.

TPU-first splice: the reference loops per sample, concatenating tensor slices
around each IMAGE_TOKEN_INDEX and re-padding the ragged batch
(llava_arch.py:108-193). Here the splice is precomputed on the host as integer
gather plans (`SplicePlan`) and executed on device as ONE gather + select over
static shapes — no ragged concatenation, no data-dependent shapes under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.config import LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.models import clip_vit, llama, projector

Params = Dict[str, Any]


def init(rng: jax.Array, cfg: LlavaConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "llama": llama.init(k1, cfg.text),
        "vision": clip_vit.init(k2, cfg.vision),
        "projector": projector.init(
            k3,
            cfg.mm_projector_type,
            cfg.vision.hidden_size,
            cfg.text.hidden_size,
            cfg.text.dtype,
        ),
    }


def encode_images(params: Params, cfg: LlavaConfig, images: jax.Array) -> jax.Array:
    """[B, 3, H, W] normalized pixels → [B, num_patches, text_hidden]
    (reference llava_arch.py:82-85)."""
    feats = clip_vit.forward_features(params["vision"], cfg.vision, images)
    return projector.forward(params["projector"], feats.astype(cfg.text.dtype))


# ---------------------------------------------------------------------------
# Host-side splice planning
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SplicePlan:
    """Static-shape gather plan for one sequence.

    Output position i holds:
        is_image[i] ? image_features[img_gather[i]] : embed(tokens[tok_gather[i]])
    Positions >= length are padding.
    """

    tokens: np.ndarray      # [T] int32, sentinel removed (safe ids for gather)
    tok_gather: np.ndarray  # [S] int32
    img_gather: np.ndarray  # [S] int32
    is_image: np.ndarray    # [S] bool
    length: int             # true sequence length


def plan_splice(
    input_ids: Sequence[int], num_image_tokens: int, pad_to: int
) -> SplicePlan:
    """Expand each IMAGE_TOKEN_INDEX into `num_image_tokens` feature slots
    (reference llava_arch.py:108-166 semantics, incl. multiple images whose
    features are consumed in order)."""
    ids = list(int(t) for t in input_ids)
    tok_gather: List[int] = []
    img_gather: List[int] = []
    is_image: List[bool] = []
    tokens: List[int] = []
    img_base = 0
    for t in ids:
        if t == IMAGE_TOKEN_INDEX:
            for j in range(num_image_tokens):
                tok_gather.append(0)
                img_gather.append(img_base + j)
                is_image.append(True)
            img_base += num_image_tokens
        else:
            tok_gather.append(len(tokens))
            img_gather.append(0)
            is_image.append(False)
            tokens.append(t)
    length = len(tok_gather)
    if length > pad_to:
        raise ValueError(f"sequence length {length} exceeds pad_to={pad_to}")
    pad = pad_to - length
    tok_gather += [0] * pad
    img_gather += [0] * pad
    is_image += [False] * pad
    if not tokens:
        tokens = [0]
    return SplicePlan(
        tokens=np.asarray(tokens, np.int32),
        tok_gather=np.asarray(tok_gather, np.int32),
        img_gather=np.asarray(img_gather, np.int32),
        is_image=np.asarray(is_image, bool),
        length=length,
    )


def text_only_plan(input_ids: Sequence[int], pad_to: int) -> SplicePlan:
    """Plan with zero image slots — the VDD branches ('unk': sentinel→token 0,
    'none': sentinel dropped) are built by the caller editing input_ids first
    (reference vcd_sample.py:153-160)."""
    return plan_splice([t for t in input_ids], 0, pad_to)


def splice_embeds(
    params: Params,
    cfg: LlavaConfig,
    tokens: jax.Array,       # [B, T] int32 (sentinel-free)
    tok_gather: jax.Array,   # [B, S]
    img_gather: jax.Array,   # [B, S]
    is_image: jax.Array,     # [B, S] bool
    image_features: jax.Array,  # [B, N_img_slots, D] (unused rows may be zeros)
) -> jax.Array:
    """Device-side splice: one embedding gather + one feature gather + select.
    Returns [B, S, D]."""
    text_emb = llama.embed_tokens(params["llama"], tokens)  # [B, T, D]
    gathered_text = jnp.take_along_axis(text_emb, tok_gather[..., None], axis=1)
    gathered_img = jnp.take_along_axis(
        image_features, img_gather[..., None], axis=1
    ).astype(gathered_text.dtype)
    return jnp.where(is_image[..., None], gathered_img, gathered_text)


def forward_multimodal(
    params: Params,
    cfg: LlavaConfig,
    input_ids: Sequence[int],
    images: Optional[jax.Array],
    pad_to: int,
    *,
    attn_impl: str = "auto",
) -> Tuple[jax.Array, int]:
    """Convenience single-sequence forward (no cache): returns
    (logits [S, V] fp32, true_length). Used by tests and simple scoring."""
    n_img = cfg.num_image_tokens if images is not None else 0
    plan = plan_splice(input_ids, n_img, pad_to)
    if images is not None:
        n_sent = sum(1 for t in input_ids if t == IMAGE_TOKEN_INDEX)
        if getattr(images, "ndim", 4) == 3:
            # unbatched [3, H, W]: add the batch axis HERE — counting it as
            # one image but passing it through would crash encode_images'
            # patchify reshape with an opaque error
            images = images[None]
        n_images = images.shape[0]
        if n_sent != n_images:
            # under jit an out-of-range img_gather would CLAMP (silently
            # repeating the last feature row); fail loudly like the
            # reference's llava_arch.py:142 ValueError instead
            raise ValueError(
                f"Number of images ({n_images}) does not match number of"
                f" special image tokens ({n_sent}) in the prompt"
            )
        # [n, N, D] → [1, n*N, D]: plan_splice consumes each sentinel's
        # feature block in image order (reference llava_arch.py:128-152's
        # cur_image_idx walk), so multi-image sequences flatten here
        feats = encode_images(params, cfg, images)
        feats = feats.reshape(1, -1, feats.shape[-1])
    else:
        feats = jnp.zeros((1, 1, cfg.text.hidden_size), cfg.text.dtype)
    embeds = splice_embeds(
        params,
        cfg,
        jnp.asarray(plan.tokens)[None],
        jnp.asarray(plan.tok_gather)[None],
        jnp.asarray(plan.img_gather)[None],
        jnp.asarray(plan.is_image)[None],
        feats,
    )
    positions = jnp.arange(pad_to, dtype=jnp.int32)[None]
    hidden, _ = llama.forward(
        params["llama"], cfg.text, embeds, positions, attn_impl=attn_impl
    )
    logits = llama.logits_from_hidden(params["llama"], hidden[0])
    return logits, plan.length
