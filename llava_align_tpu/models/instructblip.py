"""InstructBLIP (blip2_vicuna_instruct): EVA-ViT-g → ln_vision → text-conditioned
Q-Former (32 queries) → llm_proj → Vicuna (LLaMA) decoder.

Capability parity: reference experiments/lavis/models/blip2_models/
blip2_vicuna_instruct.py generate (:241-418): image → ln_vision(visual) →
Qformer.bert(text, queries, cross-attn image) → llm_proj of the first 32
positions → prepended to the Vicuna token embeddings; the VCD branch is a
parallel embedding stream built from the noised image (:334-337,349-357,
369-371,385-388) — the contrast operates on EMBEDDINGS, not pixels.

Here `encode` produces the 32 projected query embeddings; the decode engine
consumes them as "image features" through the standard splice plan
([sentinel] + prompt ids with num_image_tokens=32).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from llava_align_tpu.config import LlamaConfig
from llava_align_tpu.models import eva_vit, llama, qformer
from llava_align_tpu.models.eva_vit import EvaVitConfig
from llava_align_tpu.models.qformer import QFormerConfig
from llava_align_tpu.ops.layers import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class InstructBlipConfig:
    vision: EvaVitConfig = dataclasses.field(default_factory=EvaVitConfig)
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig)
    text: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    num_query_tokens: int = 32

    @staticmethod
    def vicuna7b() -> "InstructBlipConfig":
        return InstructBlipConfig()

    @staticmethod
    def tiny(vocab_size: int = 256) -> "InstructBlipConfig":
        vision = EvaVitConfig.tiny()
        return InstructBlipConfig(
            vision=vision,
            qformer=QFormerConfig.tiny(encoder_width=vision.width),
            text=LlamaConfig.tiny(vocab_size),
            num_query_tokens=QFormerConfig.tiny().query_length,
        )


def init(rng: jax.Array, cfg: InstructBlipConfig) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    D_q = cfg.qformer.hidden_size
    D_t = cfg.text.hidden_size
    W = cfg.vision.width
    return {
        "visual": eva_vit.init(k1, cfg.vision),
        "ln_vision": {
            "scale": jnp.ones((W,), cfg.vision.dtype),
            "bias": jnp.zeros((W,), cfg.vision.dtype),
        },
        "query_tokens": (
            jax.random.normal(k2, (cfg.num_query_tokens, D_q), jnp.float32) * 0.02
        ).astype(cfg.qformer.dtype),
        "qformer": qformer.init(k3, cfg.qformer),
        "llm_proj": {
            "w": (jax.random.normal(k4, (D_t, D_q), jnp.float32) / D_q**0.5).astype(cfg.text.dtype),
            "b": jnp.zeros((D_t,), cfg.text.dtype),
        },
        "llama": llama.init(k5, cfg.text),
    }


def encode(
    params: Params,
    cfg: InstructBlipConfig,
    images: jax.Array,                      # [B, 3, H, W] normalized
    qformer_text_ids: Optional[jax.Array] = None,   # [B, T] BERT-tokenized prompt
    qformer_text_mask: Optional[jax.Array] = None,  # [B, T]
) -> jax.Array:
    """→ inputs_llm [B, num_query_tokens, text_hidden]
    (reference blip2_vicuna_instruct.py:330-366)."""
    feats = eva_vit.forward(params["visual"], cfg.vision, images)
    feats = layer_norm(
        feats, params["ln_vision"]["scale"], params["ln_vision"]["bias"],
        cfg.vision.layer_norm_eps,
    )
    B = images.shape[0]
    queries = jnp.broadcast_to(
        params["query_tokens"], (B, cfg.num_query_tokens, params["query_tokens"].shape[-1])
    )
    hidden = qformer.forward(
        params["qformer"], cfg.qformer, queries, feats.astype(cfg.qformer.dtype),
        text_ids=qformer_text_ids, text_mask=qformer_text_mask,
    )
    q_out = hidden[:, : cfg.num_query_tokens]
    w, b = params["llm_proj"]["w"], params["llm_proj"]["b"]
    return (
        jnp.einsum("...d,od->...o", q_out.astype(w.dtype), w, preferred_element_type=w.dtype)
        + b
    )
