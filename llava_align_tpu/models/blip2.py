"""BLIP-2 base variants: Blip2-OPT and Blip2-T5 (query-only Q-Former).

Capability parity: reference lavis/models/blip2_models/blip2.py (Blip2Base:
init_vision_encoder :64, init_Qformer :48, checkpoint load :86) plus the
blip2_opt / blip2_t5 model classes those serve. Unlike InstructBLIP, the
plain BLIP-2 Q-Former is NOT text-conditioned — queries only.

  image → EVA-ViT-g → ln_vision → Q-Former(32 queries) → proj → LM prefix
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.models import eva_vit, qformer
from llava_align_tpu.models.eva_vit import EvaVitConfig
from llava_align_tpu.models.opt import OptConfig
from llava_align_tpu.models.qformer import QFormerConfig
from llava_align_tpu.models.t5 import T5Config
from llava_align_tpu.ops.layers import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Blip2OptConfig:
    vision: EvaVitConfig = dataclasses.field(default_factory=EvaVitConfig)
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig)
    text: OptConfig = dataclasses.field(default_factory=OptConfig)
    num_query_tokens: int = 32

    @staticmethod
    def tiny(vocab_size: int = 256) -> "Blip2OptConfig":
        vision = EvaVitConfig.tiny()
        return Blip2OptConfig(
            vision=vision,
            qformer=QFormerConfig.tiny(encoder_width=vision.width),
            text=OptConfig.tiny(vocab_size),
            num_query_tokens=QFormerConfig.tiny().query_length,
        )


@dataclasses.dataclass(frozen=True)
class Blip2T5Config:
    vision: EvaVitConfig = dataclasses.field(default_factory=EvaVitConfig)
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig)
    text: T5Config = dataclasses.field(default_factory=T5Config)
    num_query_tokens: int = 32

    @staticmethod
    def tiny(vocab_size: int = 128) -> "Blip2T5Config":
        vision = EvaVitConfig.tiny()
        return Blip2T5Config(
            vision=vision,
            qformer=QFormerConfig.tiny(encoder_width=vision.width),
            text=T5Config.tiny(vocab_size),
            num_query_tokens=QFormerConfig.tiny().query_length,
        )


def _init_common(rng, cfg, proj_out: int, lm_init) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    D_q = cfg.qformer.hidden_size
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
        "proj": {
            "w": (jax.random.normal(k4, (proj_out, D_q), jnp.float32) / D_q**0.5).astype(cfg.text.dtype),
            "b": jnp.zeros((proj_out,), cfg.text.dtype),
        },
        "lm": lm_init(k5),
    }


def init_opt(rng: jax.Array, cfg: Blip2OptConfig) -> Params:
    from llava_align_tpu.models import opt as opt_model

    return _init_common(
        rng, cfg, cfg.text.hidden_size, lambda k: opt_model.init(k, cfg.text)
    )


def init_t5(rng: jax.Array, cfg: Blip2T5Config) -> Params:
    from llava_align_tpu.models import t5 as t5_model

    return _init_common(
        rng, cfg, cfg.text.d_model, lambda k: t5_model.init(k, cfg.text)
    )


def encode_image_queries(params: Params, cfg, images: jax.Array) -> jax.Array:
    """image → projected query embeddings [B, Q, lm_dim]
    (query-only Q-Former; reference blip2_opt/blip2_t5 generate path)."""
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
        params["qformer"], cfg.qformer, queries, feats.astype(cfg.qformer.dtype)
    )
    w, b = params["proj"]["w"], params["proj"]["b"]
    return (
        jnp.einsum("...d,od->...o", hidden.astype(w.dtype), w, preferred_element_type=w.dtype)
        + b
    )


def t5_generate(
    params: Params,
    cfg: Blip2T5Config,
    images: jax.Array,
    prompt_ids: Sequence[Sequence[int]],
    *,
    max_new_tokens: int = 32,
    decoder_start_token_id: int = 0,
    eos_token_id: int = 1,
) -> List[List[int]]:
    """BLIP-2 T5 generation: [query embeds; prompt embeds] → T5 encoder →
    decoder greedy (reference blip2_t5 generate)."""
    from llava_align_tpu.models import t5 as t5_model

    B = images.shape[0]
    q_emb = encode_image_queries(params, cfg, images)  # [B, Q, D]
    T = max(len(p) for p in prompt_ids)
    ids = np.zeros((B, T), np.int32)
    mask = np.zeros((B, cfg.num_query_tokens + T), np.int32)
    mask[:, : cfg.num_query_tokens] = 1
    for b, p in enumerate(prompt_ids):
        ids[b, : len(p)] = p
        mask[b, cfg.num_query_tokens : cfg.num_query_tokens + len(p)] = 1
    tok_emb = t5_model.embed_tokens(params["lm"], jnp.asarray(ids))
    enc_in = jnp.concatenate([q_emb.astype(tok_emb.dtype), tok_emb], axis=1)
    enc_hidden = t5_model.encode(params["lm"], cfg.text, enc_in, jnp.asarray(mask))
    return t5_model.generate_greedy(
        params["lm"], cfg.text, enc_hidden, jnp.asarray(mask),
        max_new_tokens=max_new_tokens,
        decoder_start_token_id=decoder_start_token_id,
        eos_token_id=eos_token_id,
    )
