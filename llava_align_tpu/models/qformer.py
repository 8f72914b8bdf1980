"""Q-Former (BLIP-2 querying transformer) in functional JAX.

Capability parity: reference experiments/lavis/models/blip2_models/Qformer.py —
BertEmbeddings (word+pos for text, learned queries prepended, shared LayerNorm
:51-109), post-LN BERT self-attention over [queries; text] (:111-347),
query-only cross-attention to the image stream every `cross_attention_freq`
layers (:386-443), and SPLIT feed-forward: intermediate_query/output_query for
the query positions, intermediate/output for text positions (:398-486).

Layers are a python loop (12 small layers; heterogeneous cross-attn presence
makes scan-stacking not worth it).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from llava_align_tpu.ops.attention import mha_xla
from llava_align_tpu.ops.layers import gelu_exact, layer_norm

Params = Dict[str, Any]
NEG = -1e30


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    encoder_width: int = 1408  # image stream width (EVA ViT-g)
    cross_attention_freq: int = 2
    query_length: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def blip2() -> "QFormerConfig":
        return QFormerConfig()

    @staticmethod
    def tiny(encoder_width: int = 32) -> "QFormerConfig":
        return QFormerConfig(
            vocab_size=128, hidden_size=48, num_layers=3, num_heads=4,
            intermediate_size=96, max_position_embeddings=64,
            encoder_width=encoder_width, cross_attention_freq=2,
            query_length=4, dtype=jnp.float32,
        )


def has_cross_attention(cfg: QFormerConfig, layer_num: int) -> bool:
    return layer_num % cfg.cross_attention_freq == 0


def init(rng: jax.Array, cfg: QFormerConfig) -> Params:
    D, F, E = cfg.hidden_size, cfg.intermediate_size, cfg.encoder_width
    keys = iter(jax.random.split(rng, 16 * cfg.num_layers + 8))

    def w(shape, fan_in):
        return (jax.random.normal(next(keys), shape, jnp.float32) / (fan_in**0.5)).astype(cfg.dtype)

    def dense(out_d, in_d):
        return {"w": w((out_d, in_d), in_d), "b": jnp.zeros((out_d,), cfg.dtype)}

    def ln(d=D):
        return {"scale": jnp.ones((d,), cfg.dtype), "bias": jnp.zeros((d,), cfg.dtype)}

    def attn_params(kv_dim):
        return {
            "query": dense(D, D),
            "key": dense(D, kv_dim),
            "value": dense(D, kv_dim),
            "out": dense(D, D),
            "ln": ln(),
        }

    layers: List[Dict[str, Any]] = []
    for i in range(cfg.num_layers):
        lp: Dict[str, Any] = {
            "self_attn": attn_params(D),
            "intermediate": dense(F, D),
            "output": dense(D, F),
            "output_ln": ln(),
            "intermediate_query": dense(F, D),
            "output_query": dense(D, F),
            "output_query_ln": ln(),
        }
        if has_cross_attention(cfg, i):
            lp["cross_attn"] = attn_params(E)
        layers.append(lp)

    return {
        "embeddings": {
            "word": w((cfg.vocab_size, D), D),
            "position": w((cfg.max_position_embeddings, D), D),
            "ln": ln(),
        },
        "layers": layers,
    }


def _dense(x, p):
    return jnp.einsum("...d,od->...o", x, p["w"], preferred_element_type=x.dtype) + p["b"]


def _bert_attention(ap, cfg, q_in, kv_in, mask, eps):
    """Post-LN BERT attention: out = LayerNorm(dense(attn) + q_in).
    mask: [B, Sk] 1=attend, or None."""
    B, Sq, D = q_in.shape
    H = cfg.num_heads
    q = _dense(q_in, ap["query"]).reshape(B, Sq, H, D // H)
    k = _dense(kv_in, ap["key"]).reshape(B, kv_in.shape[1], H, D // H)
    v = _dense(kv_in, ap["value"]).reshape(B, kv_in.shape[1], H, D // H)
    bias = None
    if mask is not None:
        bias = jnp.where(mask[:, None, None, None, :].astype(bool), 0.0, NEG)
        # mha_xla bias shape: [B, K(heads), group, Sq, Sk]
        bias = jnp.broadcast_to(bias, (B, H, 1, Sq, kv_in.shape[1]))
    attn = mha_xla(q, k, v, causal=False, bias=bias).reshape(B, Sq, D)
    out = _dense(attn, ap["out"])
    return layer_norm(out + q_in, ap["ln"]["scale"], ap["ln"]["bias"], eps)


def _ffn(x, inter, output, out_ln, eps):
    y = gelu_exact(_dense(x, inter))
    y = _dense(y, output)
    return layer_norm(y + x, out_ln["scale"], out_ln["bias"], eps)


def forward(
    params: Params,
    cfg: QFormerConfig,
    query_embeds: jax.Array,           # [B, Q, D] learned query tokens
    image_embeds: jax.Array,           # [B, N, E]
    text_ids: Optional[jax.Array] = None,    # [B, T]
    text_mask: Optional[jax.Array] = None,   # [B, T] 1=real
) -> jax.Array:
    """Returns the full hidden stream [B, Q(+T), D]; callers take [:, :Q]."""
    eps = cfg.layer_norm_eps
    emb = params["embeddings"]
    B, Q, D = query_embeds.shape

    if text_ids is not None:
        T = text_ids.shape[1]
        text = emb["word"][jnp.clip(text_ids, 0, cfg.vocab_size - 1)]
        text = text + emb["position"][:T]
        x = jnp.concatenate([query_embeds.astype(text.dtype), text], axis=1)
        if text_mask is None:
            text_mask = jnp.ones((B, T), jnp.int32)
        mask = jnp.concatenate([jnp.ones((B, Q), text_mask.dtype), text_mask], axis=1)
    else:
        x = query_embeds
        mask = jnp.ones((B, Q), jnp.int32)
    x = layer_norm(x, emb["ln"]["scale"], emb["ln"]["bias"], eps)

    for i, lp in enumerate(params["layers"]):
        x = _bert_attention(lp["self_attn"], cfg, x, x, mask, eps)
        q_part = x[:, :Q]
        if "cross_attn" in lp:
            q_part = _bert_attention(lp["cross_attn"], cfg, q_part, image_embeds, None, eps)
        q_out = _ffn(q_part, lp["intermediate_query"], lp["output_query"], lp["output_query_ln"], eps)
        if x.shape[1] > Q:
            t_out = _ffn(x[:, Q:], lp["intermediate"], lp["output"], lp["output_ln"], eps)
            x = jnp.concatenate([q_out, t_out], axis=1)
        else:
            x = q_out
    return x
