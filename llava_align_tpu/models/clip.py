"""CLIP contrastive model (ViT vision + causal text transformer).

Capability parity: the reference's vendored LAVIS CLIP family
(lavis/models/clip_models/model.py — open_clip-style CLIP registered as
"clip"/"clip_feature_extractor": encode_image/encode_text with EOT-argmax
pooling (model.py:555-568), contrastive forward loss (loss.py ClipLoss),
extract_features (model.py:603-638), zero-shot classifier from prompt
templates (model.py:658-673), zero-shot predict (model.py:640-649)). The
ViT-B/L OpenAI variants use QuickGELU; the ModifiedResNet and timm towers
are out of scope (never used by any reference experiment).

TPU-first: the vision tower reuses models/clip_vit.py (the HF-CLIP-shaped
ViT already parity-tested for LLaVA) run to the final layer with cls
pooling + post-LN + visual projection; the text tower is a stacked-scan
pre-LN transformer with a causal mask and fp32 softmax.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.config import ClipVisionConfig
from llava_align_tpu.models import clip_vit
from llava_align_tpu.ops.layers import layer_norm, quick_gelu

Params = Dict[str, Any]
NEG = -1e30


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    num_heads: int = 8
    num_layers: int = 12
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def tiny(vocab_size: int = 64) -> "ClipTextConfig":
        return ClipTextConfig(
            context_length=16, vocab_size=vocab_size, width=32, num_heads=4,
            num_layers=2,
        )


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    vision: ClipVisionConfig = dataclasses.field(
        default_factory=lambda: ClipVisionConfig(
            image_size=224, patch_size=32, hidden_size=768,
            intermediate_size=3072, num_layers=12, num_heads=12,
            select_layer=-1, select_feature="cls_patch", dtype=jnp.float32,
        )
    )
    text: ClipTextConfig = dataclasses.field(default_factory=ClipTextConfig)
    embed_dim: int = 512

    @staticmethod
    def tiny(vocab_size: int = 64) -> "ClipConfig":
        return ClipConfig(
            vision=ClipVisionConfig(
                image_size=32, patch_size=16, hidden_size=32,
                intermediate_size=64, num_layers=2, num_heads=4,
                select_layer=-1, select_feature="cls_patch", dtype=jnp.float32,
            ),
            text=ClipTextConfig.tiny(vocab_size),
            embed_dim=16,
        )


def init(rng: jax.Array, cfg: ClipConfig) -> Params:
    k1, k2 = jax.random.split(rng)
    t = cfg.text
    D, F, L, E = t.width, 4 * t.width, t.num_layers, cfg.embed_dim
    ks = iter(jax.random.split(k2, 12))

    def w(shape, fan):
        return (jax.random.normal(next(ks), shape, jnp.float32) / fan**0.5).astype(t.dtype)

    def lin(o, i):
        return {"w": w((L, o, i), i), "b": jnp.zeros((L, o), t.dtype)}

    def ln():
        return {"scale": jnp.ones((L, D), t.dtype), "bias": jnp.zeros((L, D), t.dtype)}

    return {
        "visual": clip_vit.init(k1, cfg.vision),
        "visual_proj": w((cfg.vision.hidden_size, E), cfg.vision.hidden_size),
        "token_embedding": w((t.vocab_size, D), D),
        "positional_embedding": w((t.context_length, D), D),
        "text_layers": {
            "ln1": ln(), "qkv": lin(3 * D, D), "o": lin(D, D),
            "ln2": ln(), "fc1": lin(F, D), "fc2": lin(D, F),
        },
        "ln_final": {"scale": jnp.ones((D,), t.dtype), "bias": jnp.zeros((D,), t.dtype)},
        "text_proj": w((D, E), D),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }


def _lin(h, p):
    return jnp.einsum("...d,od->...o", h, p["w"], preferred_element_type=h.dtype) + p["b"]


def encode_image(params: Params, cfg: ClipConfig, pixels: jax.Array) -> jax.Array:
    """[B, 3, H, W] → [B, embed_dim] (model.py:349-377: cls → ln_post → proj)."""
    x = clip_vit.forward_features(params["visual"], cfg.vision, pixels)  # [B, 1+N, D]
    cls = layer_norm(
        x[:, 0],
        params["visual"]["post_ln"]["scale"], params["visual"]["post_ln"]["bias"],
        cfg.vision.layer_norm_eps,
    )
    return cls @ params["visual_proj"]


def text_transformer(
    params: Params, cfg: ClipConfig, embeds: jax.Array
) -> jax.Array:
    """Causal text stack on pre-built embeddings (token + positional already
    added) → post-ln_final hidden [B, S, D]. The shared core of encode_text
    and the BLIP-diffusion ctx-CLIP variant."""
    t = cfg.text
    B, S, _ = embeds.shape
    D, H = t.width, t.num_heads
    eps = t.layer_norm_eps
    x = embeds
    mask = jnp.tril(jnp.ones((S, S), bool))[None, None]

    def body(x, lp):
        h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
        q, k, v = jnp.split(_lin(h, lp["qkv"]), 3, axis=-1)
        Dh = D // H
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q.reshape(B, S, H, Dh), k.reshape(B, S, H, Dh),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / (Dh**0.5)
        s = jnp.where(mask, s, NEG)
        p = jax.nn.softmax(s, axis=-1)
        a = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(v.dtype), v.reshape(B, S, H, Dh),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(x.dtype).reshape(B, S, D)
        x = x + _lin(a, lp["o"])
        h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
        x = x + _lin(quick_gelu(_lin(h, lp["fc1"])), lp["fc2"])
        return x, None

    x, _ = jax.lax.scan(body, x, params["text_layers"])
    return layer_norm(x, params["ln_final"]["scale"], params["ln_final"]["bias"], eps)


def encode_text(params: Params, cfg: ClipConfig, ids: jax.Array) -> jax.Array:
    """[B, ctx] → [B, embed_dim]; pools the EOT position = argmax(ids)
    (model.py:555-568)."""
    B, S = ids.shape
    emb = params["token_embedding"][ids] + params["positional_embedding"][:S]
    x = text_transformer(params, cfg, emb)
    eot = jnp.argmax(ids, axis=-1)
    pooled = x[jnp.arange(B), eot]
    return pooled @ params["text_proj"]


def _norm(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def extract_features(
    params: Params, cfg: ClipConfig,
    pixels: Optional[jax.Array] = None,
    text_ids: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """model.py:603-638: raw + normalized projections."""
    out: Dict[str, jax.Array] = {}
    if pixels is not None:
        e = encode_image(params, cfg, pixels)
        out["image_embeds"] = e
        out["image_embeds_proj"] = _norm(e)
    if text_ids is not None:
        e = encode_text(params, cfg, text_ids)
        out["text_embeds"] = e
        out["text_embeds_proj"] = _norm(e)
    return out


def contrastive_loss(
    params: Params, cfg: ClipConfig,
    pixels: jax.Array, text_ids: jax.Array,
    *,
    axis_name: Optional[str] = None,
) -> Dict[str, jax.Array]:
    """ClipLoss (clip_models/loss.py): symmetric InfoNCE over the (gathered)
    batch. Under shard_map with `axis_name`, features are all-gathered over
    the data axis — the TPU-native counterpart of the reference's
    gather_features/world_size path."""
    img = _norm(encode_image(params, cfg, pixels))
    txt = _norm(encode_text(params, cfg, text_ids))
    scale = jnp.exp(params["logit_scale"])
    b = img.shape[0]
    if axis_name is not None:
        g_img = jax.lax.all_gather(img, axis_name, tiled=True)
        g_txt = jax.lax.all_gather(txt, axis_name, tiled=True)
        rank = jax.lax.axis_index(axis_name)
    else:
        g_img, g_txt = img, txt
        rank = jnp.zeros((), jnp.int32)
    # fp32 loss logits (no-op at fp32; under bf16 AMP this mirrors
    # autocast's fp32 softmax policy)
    logits_i = (scale * img @ g_txt.T).astype(jnp.float32)
    logits_t = (scale * txt @ g_img.T).astype(jnp.float32)
    labels = jnp.arange(b) + rank * b
    li = -jnp.take_along_axis(
        jax.nn.log_softmax(logits_i, axis=-1), labels[:, None], axis=-1
    ).mean()
    lt = -jnp.take_along_axis(
        jax.nn.log_softmax(logits_t, axis=-1), labels[:, None], axis=-1
    ).mean()
    return {"loss": (li + lt) / 2, "logit_scale_exp": scale}


def zero_shot_classifier(
    params: Params, cfg: ClipConfig,
    classnames: Sequence[str],
    templates: Sequence[Callable[[str], str]],
    tokenize: Callable[[List[str]], np.ndarray],
) -> jax.Array:
    """model.py:658-673: per class, encode all prompt templates, average the
    normalized embeddings, re-normalize → [embed_dim, n_classes]."""
    enc = jax.jit(lambda p, ids: _norm(encode_text(p, cfg, ids)))
    weights = []
    for name in classnames:
        ids = jnp.asarray(tokenize([t(name) for t in templates]))
        emb = enc(params, ids).mean(axis=0)
        weights.append(emb / jnp.linalg.norm(emb))
    return jnp.stack(weights, axis=1)


def zero_shot_predict(
    params: Params, cfg: ClipConfig,
    pixels: jax.Array, classifier: jax.Array,
) -> jax.Array:
    """model.py:640-649 → [B, n_classes] logits (×100 as the reference)."""
    img = _norm(encode_image(params, cfg, pixels))
    return 100.0 * img @ classifier


def compute_sim_matrix(
    params: Params, cfg: ClipConfig,
    pixels: jax.Array, text_ids: jax.Array,
):
    """Retrieval similarity (CLIP has no ITM re-ranker — pure ITC)."""
    feats = extract_features(params, cfg, pixels=pixels, text_ids=text_ids)
    sims = np.asarray(feats["image_embeds_proj"]) @ np.asarray(feats["text_embeds_proj"]).T
    return sims, sims.T


# The 80 openai_imagenet_template prompt functions (model.py:703-785) are a
# public constant set; a compact representative subset is provided for the
# zero-shot surface, extensible by callers.
DEFAULT_PROMPT_TEMPLATES: List[Callable[[str], str]] = [
    lambda c: f"a photo of a {c}.",
    lambda c: f"a bad photo of a {c}.",
    lambda c: f"a photo of many {c}.",
    lambda c: f"a photo of the large {c}.",
    lambda c: f"a photo of the small {c}.",
    lambda c: f"a cropped photo of a {c}.",
    lambda c: f"a close-up photo of a {c}.",
    lambda c: f"a black and white photo of a {c}.",
]
