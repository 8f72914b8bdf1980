"""Q-Former (BLIP-2 querying transformer) in functional JAX.

Capability parity: reference experiments/lavis/models/blip2_models/Qformer.py —
BertEmbeddings (word+pos for text, learned queries prepended, shared LayerNorm
:51-109), post-LN BERT self-attention over [queries; text] (:111-347),
query-only cross-attention to the image stream every `cross_attention_freq`
layers (:386-443), and SPLIT feed-forward: intermediate_query/output_query for
the query positions, intermediate/output for text positions (:398-486).

Stage-1 BLIP-2 additions (reference blip2_qformer.py):
- `forward_text` — text-only bidirectional encode (BertModel without
  query_embeds, Qformer.py:804+ with query_length=0).
- `forward_queries` — query-only pass that also returns the per-layer
  self-attention K/V of the query positions (the `use_cache=True`
  past_key_values the reference LM path consumes, blip2_qformer.py:101-107).
- `forward_lm` — causal text decoding against the cached query K/V
  (BertLMHeadModel with past_key_values; causal+prefix mask built by
  get_extended_attention_mask, Qformer.py:743-783; text positions start at
  position id 0 because past_key_values_length subtracts query_length,
  Qformer.py:859-864).
- `lm_head_init` / `lm_logits` — BertOnlyMLMHead (transform dense → gelu →
  LayerNorm → tied decoder + bias, Qformer.py:607-651).
- `lm_loss_mean` — shifted next-token CE with label_smoothing=0.1, mean over
  non-ignored tokens (Qformer.py:1073-1080).

Layers are a python loop (12 small layers; heterogeneous cross-attn presence
makes scan-stacking not worth it).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

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


def _attn_kv(ap, cfg, kv_in):
    """Self/cross-attention K,V head-split [B, Sk, H, Dh] — the same tensors
    the reference caches as past_key_values (Qformer.py BertSelfAttention)."""
    B, Sk, _ = kv_in.shape
    H = cfg.num_heads
    Dh = cfg.hidden_size // H
    k = _dense(kv_in, ap["key"]).reshape(B, Sk, H, Dh)
    v = _dense(kv_in, ap["value"]).reshape(B, Sk, H, Dh)
    return k, v


def _attend(ap, cfg, q_in, k, v, bias, eps):
    """Post-LN BERT attention given precomputed K/V: LayerNorm(dense(attn)+q_in)."""
    B, Sq, D = q_in.shape
    H = cfg.num_heads
    q = _dense(q_in, ap["query"]).reshape(B, Sq, H, D // H)
    attn = mha_xla(q, k, v, causal=False, bias=bias).reshape(B, Sq, D)
    out = _dense(attn, ap["out"])
    return layer_norm(out + q_in, ap["ln"]["scale"], ap["ln"]["bias"], eps)


def _bert_attention(ap, cfg, q_in, kv_in, mask, eps):
    """Post-LN BERT attention: out = LayerNorm(dense(attn) + q_in).
    mask: [B, Sk] 1=attend, or None."""
    B, Sq, _ = q_in.shape
    H = cfg.num_heads
    k, v = _attn_kv(ap, cfg, kv_in)
    bias = None
    if mask is not None:
        bias = jnp.where(mask[:, None, None, None, :].astype(bool), 0.0, NEG)
        # mha_xla bias shape: [B, K(heads), group, Sq, Sk]
        bias = jnp.broadcast_to(bias, (B, H, 1, Sq, kv_in.shape[1]))
    return _attend(ap, cfg, q_in, k, v, bias, eps)


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


# ---------------------------------------------------------------------------
# stage-1 BLIP-2 paths (text-only encode, cached-query causal LM, MLM head)
# ---------------------------------------------------------------------------


def _embed_text(params: Params, cfg: QFormerConfig, text_ids: jax.Array) -> jax.Array:
    """Word + position embeddings + shared LayerNorm. Text positions always
    start at 0: the reference subtracts query_length from the past length
    (Qformer.py:859-864), so the query prefix never shifts text positions."""
    emb = params["embeddings"]
    T = text_ids.shape[1]
    x = emb["word"][jnp.clip(text_ids, 0, cfg.vocab_size - 1)] + emb["position"][:T]
    return layer_norm(x, emb["ln"]["scale"], emb["ln"]["bias"], cfg.layer_norm_eps)


def forward_text(
    params: Params, cfg: QFormerConfig,
    text_ids: jax.Array, text_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Text-only bidirectional encode → [B, T, D]
    (reference blip2_qformer.forward_text, blip2_qformer.py:356-362:
    BertModel without query_embeds; text FFN branch, no cross-attention)."""
    eps = cfg.layer_norm_eps
    x = _embed_text(params, cfg, text_ids)
    for lp in params["layers"]:
        x = _bert_attention(lp["self_attn"], cfg, x, x, text_mask, eps)
        x = _ffn(x, lp["intermediate"], lp["output"], lp["output_ln"], eps)
    return x


def forward_queries(
    params: Params, cfg: QFormerConfig,
    query_embeds: jax.Array,     # [B, Q, D]
    image_embeds: jax.Array,     # [B, N, E]
) -> Tuple[jax.Array, List[Tuple[jax.Array, jax.Array]]]:
    """Query-only pass (cross-attention to the image stream) that also returns
    the per-layer self-attention K/V of the query positions — the
    `use_cache=True` past the reference LM path decodes against
    (blip2_qformer.py:101-107, 260-266)."""
    eps = cfg.layer_norm_eps
    emb = params["embeddings"]
    x = layer_norm(query_embeds, emb["ln"]["scale"], emb["ln"]["bias"], eps)
    kv: List[Tuple[jax.Array, jax.Array]] = []
    for i, lp in enumerate(params["layers"]):
        k, v = _attn_kv(lp["self_attn"], cfg, x)
        kv.append((k, v))
        x = _attend(lp["self_attn"], cfg, x, k, v, None, eps)
        if "cross_attn" in lp:
            x = _bert_attention(lp["cross_attn"], cfg, x, image_embeds, None, eps)
        x = _ffn(x, lp["intermediate_query"], lp["output_query"], lp["output_query_ln"], eps)
    return x, kv


def forward_lm(
    params: Params, cfg: QFormerConfig,
    text_ids: jax.Array,                       # [B, T]
    text_mask: Optional[jax.Array],            # [B, T] 1=real, or None
    query_kv: List[Tuple[jax.Array, jax.Array]],
) -> jax.Array:
    """Causal text pass over the cached query K/V → text hidden [B, T, D]
    (BertLMHeadModel with past_key_values: text rows attend to every query
    column plus a causal window over text, Qformer.py:743-783; text rows run
    the TEXT feed-forward since query_length=0 in this call)."""
    eps = cfg.layer_norm_eps
    B, T = text_ids.shape
    Q = query_kv[0][0].shape[1]
    H = cfg.num_heads
    x = _embed_text(params, cfg, text_ids)
    causal = jnp.tril(jnp.ones((T, T), bool))
    cols = jnp.concatenate(
        [jnp.ones((B, T, Q), bool), jnp.broadcast_to(causal, (B, T, T))], axis=-1
    )
    if text_mask is not None:
        pad = jnp.concatenate(
            [jnp.ones((B, Q), bool), text_mask.astype(bool)], axis=1
        )
        cols = cols & pad[:, None, :]
    bias = jnp.where(cols[:, None, None, :, :], 0.0, NEG)
    bias = jnp.broadcast_to(bias, (B, H, 1, T, Q + T))
    for (qk, qv), lp in zip(query_kv, params["layers"]):
        k_t, v_t = _attn_kv(lp["self_attn"], cfg, x)
        k = jnp.concatenate([qk.astype(k_t.dtype), k_t], axis=1)
        v = jnp.concatenate([qv.astype(v_t.dtype), v_t], axis=1)
        x = _attend(lp["self_attn"], cfg, x, k, v, bias, eps)
        x = _ffn(x, lp["intermediate"], lp["output"], lp["output_ln"], eps)
    return x


def lm_head_init(rng: jax.Array, cfg: QFormerConfig, word_embeddings: jax.Array) -> Params:
    """BertOnlyMLMHead params (Qformer.py:607-651). The decoder weight is tied
    to the word embeddings at init (the reference ties via HF tie_weights);
    converters overwrite it with cls.predictions.decoder.weight."""
    D = cfg.hidden_size
    w = (jax.random.normal(rng, (D, D), jnp.float32) / D**0.5).astype(cfg.dtype)
    return {
        "transform": {"w": w, "b": jnp.zeros((D,), cfg.dtype)},
        "ln": {"scale": jnp.ones((D,), cfg.dtype), "bias": jnp.zeros((D,), cfg.dtype)},
        "decoder": word_embeddings,
        "bias": jnp.zeros((cfg.vocab_size,), cfg.dtype),
    }


def lm_logits(head: Params, hidden: jax.Array) -> jax.Array:
    """cls.predictions: dense → gelu → LayerNorm → decoder + bias, fp32 logits."""
    x = jnp.einsum("...d,od->...o", hidden, head["transform"]["w"]) + head["transform"]["b"]
    x = gelu_exact(x)
    x = layer_norm(x, head["ln"]["scale"], head["ln"]["bias"], 1e-12)
    return (
        jnp.einsum("...d,vd->...v", x, head["decoder"], preferred_element_type=jnp.float32)
        + head["bias"].astype(jnp.float32)
    )


def lm_loss_mean(
    logits: jax.Array,      # [B, T, V] fp32
    labels: jax.Array,      # [B, T] with -100 = ignore
    label_smoothing: float = 0.1,
) -> jax.Array:
    """Shifted next-token CE, label_smoothing=0.1, mean over non-ignored
    targets (Qformer.py:1073-1080 CrossEntropyLoss(reduction='mean'))."""
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = labels[:, 1:]
    valid = tgt != -100
    safe = jnp.where(valid, tgt, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    smooth = -logp.mean(-1)
    tok = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    tok = jnp.where(valid, tok, 0.0)
    return tok.sum() / jnp.maximum(valid.sum(), 1)
