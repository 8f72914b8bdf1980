"""MPT decoder (alibi attention) in functional JAX — the alternative LLaVA
language backbone.

Capability parity: reference experiments/llava/model/language_model/mpt/ —
modeling_mpt.py (MPTModel :33+, alibi position bias, tied lm weights),
attention.py (MultiheadAttention :151 / MultiQueryAttention :204, packed Wqkv,
optional qk_ln and clip_qkv, alibi slopes per head), blocks.py (pre-LN,
expansion_ratio FFN with GELU). The reference's Triton flash-attention
(flash_attn_triton.py) maps to this framework's Pallas kernel + XLA paths.

Alibi is applied as a key-position-linear bias slope_h * j — equal to the
canonical -slope*(q-j) up to a per-row constant, which softmax cancels; this
form works unchanged for packed-branch decode with per-row lengths.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.ops.attention import NEG_INF
from llava_align_tpu.ops.layers import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MptConfig:
    vocab_size: int = 50432
    d_model: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    expansion_ratio: int = 4
    max_seq_len: int = 2048
    multiquery: bool = False  # MQA: 1 kv head
    qk_ln: bool = False
    clip_qkv: Optional[float] = None
    alibi_bias_max: float = 8.0
    no_bias: bool = True
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def kv_heads(self) -> int:
        return 1 if self.multiquery else self.n_heads

    @property
    def ffn_dim(self) -> int:
        return self.expansion_ratio * self.d_model

    @staticmethod
    def mpt_7b() -> "MptConfig":
        return MptConfig()

    @staticmethod
    def tiny(vocab_size: int = 256, multiquery: bool = False) -> "MptConfig":
        return MptConfig(
            vocab_size=vocab_size, d_model=64, n_layers=2, n_heads=4,
            max_seq_len=128, multiquery=multiquery, dtype=jnp.float32,
        )


def alibi_slopes(n_heads: int, alibi_bias_max: float = 8.0) -> np.ndarray:
    """Per-head alibi slopes (reference mpt/attention.py gen_slopes; HF
    build_mpt_alibi_tensor equivalent)."""
    p2 = 2 ** math.ceil(math.log2(n_heads))
    m = np.arange(1, p2 + 1, dtype=np.float64) * alibi_bias_max / p2
    slopes = 1.0 / np.power(2.0, m)
    if p2 != n_heads:
        slopes = np.concatenate([slopes[1::2], slopes[0::2]])[:n_heads]
    return slopes.astype(np.float32)


def init(rng: jax.Array, cfg: MptConfig) -> Params:
    ks = jax.random.split(rng, 8)
    D, F, L, V = cfg.d_model, cfg.ffn_dim, cfg.n_layers, cfg.vocab_size
    KV = cfg.kv_heads * cfg.head_dim

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / (fan_in**0.5)).astype(cfg.dtype)

    def ln(dim=D):
        return {"scale": jnp.ones((L, dim), cfg.dtype), "bias": jnp.zeros((L, dim), cfg.dtype)}

    layers = {
        "norm_1": ln(),
        "wqkv": w(ks[1], (L, D + 2 * KV, D), D),
        "out_proj": w(ks[2], (L, D, D), D),
        "norm_2": ln(),
        "up_proj": w(ks[3], (L, F, D), D),
        "down_proj": w(ks[4], (L, D, F), F),
    }
    if cfg.qk_ln:
        # reference attention.py:172-175 — q_ln over d_model; k_ln over the
        # packed kv width (d_model for MHA, head_dim for MQA, :228-229)
        layers["q_ln"] = ln(D)
        layers["k_ln"] = ln(KV)
    return {
        "wte": w(ks[0], (V, D), D),
        "layers": layers,
        "norm_f": {"scale": jnp.ones((D,), cfg.dtype), "bias": jnp.zeros((D,), cfg.dtype)},
        # lm head tied to wte (reference MPT ties output weights)
    }


def init_cache(cfg: MptConfig, batch: int, max_len: int) -> Dict[str, jax.Array]:
    shape = (cfg.n_layers, batch, max_len, cfg.kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}


def embed_tokens(params: Params, ids: jax.Array) -> jax.Array:
    V = params["wte"].shape[0]
    return params["wte"][jnp.clip(ids, 0, V - 1)]


def _write_cache_full(cache_full, new, layer_idx, offsets, is_decode, row_offset=0):
    B = new.shape[0]
    if is_decode:
        return cache_full.at[layer_idx, row_offset + jnp.arange(B), offsets].set(new[:, 0])
    return jax.lax.dynamic_update_slice(
        cache_full, new[None], (layer_idx, row_offset, 0, 0, 0)
    )


def _alibi_attention(q, k, v, slopes, key_positions, mask, query_positions=None):
    """q [B,Sq,H,Dh]; k/v [B,Sk,K,Dh]; slopes [H]; key_positions [Sk];
    mask [B,Sq,Sk] bool (True=attend). fp32 softmax.

    query_positions None → causal alibi as the key-linear form slope*j
    (softmax-equivalent to -slope*(i-j)). query_positions [Sq] → the FULL
    symmetric form -slope*|i-j| required when attention is bidirectional
    (prefix-LM; reference attention.py build_alibi_bias full=not causal)."""
    B, Sq, H, Dh = q.shape
    K = k.shape[2]
    group = H // K
    scale = 1.0 / (Dh**0.5)
    qr = q.reshape(B, Sq, K, group, Dh)
    logits = jnp.einsum(
        "bqkgd,bskd->bkgqs", qr, k,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale  # [B,K,g,Sq,Sk]
    slopes_r = jnp.asarray(slopes, jnp.float32).reshape(K, group)
    if query_positions is None:
        bias = slopes_r[None, :, :, None, None] * key_positions.astype(jnp.float32)[
            None, None, None, None, :
        ]
    else:
        dist = jnp.abs(
            key_positions[None, :] - query_positions[:, None]
        ).astype(jnp.float32)  # [Sq, Sk]
        bias = -slopes_r[None, :, :, None, None] * dist[None, None, None]
    logits = logits + bias
    logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bkgqs,bskd->bqkgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(B, Sq, H, Dh).astype(q.dtype)


def forward(
    params: Params,
    cfg: MptConfig,
    embeds: jax.Array,
    positions: jax.Array,  # kept for interface parity; alibi uses key index
    cache: Optional[Dict[str, jax.Array]] = None,
    cache_offset: Optional[jax.Array] = None,
    *,
    attn_impl: str = "xla",
    cache_row_offset: int = 0,
    prefix_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    """prefix_mask [B, S] bool: prefix-LM mode — position i may attend j if
    j <= i (causal) OR prefix_mask[b, j] (bidirectional prefix); reference
    modeling_mpt.py:123-139 _apply_prefix_mask. None = pure causal. Decode
    steps are unaffected (new tokens are causal in both modes)."""
    B, S, D = embeds.shape
    H, Dh, KV = cfg.n_heads, cfg.head_dim, cfg.kv_heads
    eps = cfg.layer_norm_eps
    if cache_offset is None:
        cache_offset = jnp.zeros((B,), jnp.int32)
    is_decode = cache is not None and S == 1
    slopes = alibi_slopes(H, cfg.alibi_bias_max)

    def _lin(h, w):
        return jax.lax.dot_general(
            h, w, (((2,), (1,)), ((), ())), preferred_element_type=h.dtype
        )

    def layer_fn(x, lp, k_full, v_full, li):
        h = layer_norm(x, lp["norm_1"]["scale"], lp["norm_1"]["bias"], eps)
        qkv = _lin(h, lp["wqkv"])
        if cfg.clip_qkv:
            qkv = jnp.clip(qkv, -cfg.clip_qkv, cfg.clip_qkv)
        q_flat = qkv[..., :D]
        k_flat = qkv[..., D : D + KV * Dh]
        if cfg.qk_ln:
            # reference attention.py:197-200 — LN on the flat q/k (pre-head
            # split), value stream untouched
            q_flat = layer_norm(q_flat, lp["q_ln"]["scale"], lp["q_ln"]["bias"], eps)
            k_flat = layer_norm(k_flat, lp["k_ln"]["scale"], lp["k_ln"]["bias"], eps)
        q = q_flat.reshape(B, S, H, Dh)
        k = k_flat.reshape(B, S, KV, Dh)
        v = qkv[..., D + KV * Dh :].reshape(B, S, KV, Dh)

        if cache is not None:
            k_full = _write_cache_full(k_full, k, li, cache_offset, is_decode, cache_row_offset)
            v_full = _write_cache_full(v_full, v, li, cache_offset, is_decode, cache_row_offset)

        qp = None
        if is_decode:
            k_att = jax.lax.dynamic_index_in_dim(k_full, li, 0, keepdims=False)
            v_att = jax.lax.dynamic_index_in_dim(v_full, li, 0, keepdims=False)
            Sk = k_att.shape[1]
            kp = jnp.arange(Sk, dtype=jnp.int32)
            mask = (kp[None, None, :] <= cache_offset[:, None, None])
        else:
            k_att, v_att = k, v
            kp = jnp.arange(S, dtype=jnp.int32)
            row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
            mask = jnp.broadcast_to(col <= row, (B, S, S))
            if prefix_mask is not None:
                mask = mask | prefix_mask.astype(bool)[:, None, :]
                qp = kp  # bidirectional rows need the full |i-j| alibi

        attn = _alibi_attention(q, k_att, v_att, slopes, kp, mask, qp)
        x = x + _lin(attn.reshape(B, S, D), lp["out_proj"])

        h = layer_norm(x, lp["norm_2"]["scale"], lp["norm_2"]["bias"], eps)
        h = jax.nn.gelu(_lin(h, lp["up_proj"]), approximate=False)
        x = x + _lin(h, lp["down_proj"])
        return x, k_full, v_full

    if cache is not None:
        def scan_body(carry, lp):
            x, kf, vf, li = carry
            x, kf, vf = layer_fn(x, lp, kf, vf, li)
            return (x, kf, vf, li + 1), None

        init_c = (embeds, cache["k"], cache["v"], jnp.asarray(0, jnp.int32))
        (x, kf, vf, _), _ = jax.lax.scan(scan_body, init_c, params["layers"])
        new_cache = {"k": kf, "v": vf}
    else:
        def scan_body(x, lp):
            x, _, _ = layer_fn(x, lp, None, None, None)
            return x, None

        x, _ = jax.lax.scan(scan_body, embeds, params["layers"])
        new_cache = None

    hidden = layer_norm(x, params["norm_f"]["scale"], params["norm_f"]["bias"], eps)
    return hidden, new_cache


def logits_from_hidden(params: Params, hidden: jax.Array) -> jax.Array:
    """Tied output head: logits = hidden @ wte^T."""
    w = params["wte"]
    return jnp.einsum(
        "...d,vd->...v", hidden.astype(w.dtype), w, preferred_element_type=jnp.float32
    )
