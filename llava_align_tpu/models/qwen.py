"""Qwen(-VL) decoder in functional JAX.

Capability parity: reference experiments/Qwen_VL/modeling_qwen.py —
QWenAttention (:107-318, packed c_attn with bias, bias-free projections),
QWenMLP a1*silu(a2) (:319-336), QWenBlock pre-RMSNorm residuals (:338+),
RotaryEmbedding with dynamic-NTK base scaling (:1150-1190, :645-659),
log-n attention scaling beyond the trained context (:137-144, :292-298),
RMSNorm eps 1e-6 (:1219-1233).

Same TPU-first structure as models/llama.py: stacked [L, out, in] weights,
scan-carry KV cache, bf16 matmuls with fp32 accumulation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llava_align_tpu.ops.attention import causal_attention, decode_attention
from llava_align_tpu.ops.layers import apply_rope, rms_norm, rope_cos_sin, silu

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class QwenConfig:
    vocab_size: int = 151936
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    head_dim: int = 128  # kv_channels
    intermediate_size: int = 22016  # w1/w2 each output intermediate_size // 2
    layer_norm_eps: float = 1e-6
    rotary_emb_base: float = 10000.0
    seq_length: int = 2048  # trained context — NTK/log-n kick in beyond it
    use_dynamic_ntk: bool = True
    use_logn_attn: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def ff_dim(self) -> int:
        return self.intermediate_size // 2

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @staticmethod
    def qwen_vl_7b() -> "QwenConfig":
        return QwenConfig()

    @staticmethod
    def tiny(vocab_size: int = 256) -> "QwenConfig":
        return QwenConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            num_layers=2,
            num_heads=4,
            head_dim=16,
            intermediate_size=256,
            seq_length=128,
            dtype=jnp.float32,
        )


def init(rng: jax.Array, cfg: QwenConfig) -> Params:
    ks = jax.random.split(rng, 10)
    D, F2, L, V, QD = cfg.hidden_size, cfg.ff_dim, cfg.num_layers, cfg.vocab_size, cfg.q_dim

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / (fan_in**0.5)).astype(cfg.dtype)

    return {
        "wte": w(ks[0], (V, D), D),
        "layers": {
            "ln_1": jnp.ones((L, D), cfg.dtype),
            "c_attn_w": w(ks[1], (L, 3 * QD, D), D),
            "c_attn_b": jnp.zeros((L, 3 * QD), cfg.dtype),
            "attn_proj": w(ks[2], (L, D, QD), QD),
            "ln_2": jnp.ones((L, D), cfg.dtype),
            "w1": w(ks[3], (L, F2, D), D),
            "w2": w(ks[4], (L, F2, D), D),
            "mlp_proj": w(ks[5], (L, D, F2), F2),
        },
        "ln_f": jnp.ones((D,), cfg.dtype),
        "lm_head": w(ks[6], (V, D), D),
    }


def init_cache(
    cfg: QwenConfig, batch: int, max_len: int, kv_quant: bool = False
) -> Dict[str, jax.Array]:
    shape = (cfg.num_layers, batch, max_len, cfg.num_heads, cfg.head_dim)
    if kv_quant:
        # int8 values + per-(layer,row,pos,head) f32 absmax scales — the
        # biggest lever for Qwen's MHA cache (32 kv heads read 4x llava's
        # GQA bytes per token; models/llama.init_cache kv_quant design)
        sshape = shape[:-1] + (1,)
        return {
            "k": jnp.zeros(shape, jnp.int8), "ks": jnp.zeros(sshape, jnp.float32),
            "v": jnp.zeros(shape, jnp.int8), "vs": jnp.zeros(sshape, jnp.float32),
        }
    return {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}


def embed_tokens(params: Params, token_ids: jax.Array) -> jax.Array:
    V = params["wte"].shape[0]
    return params["wte"][jnp.clip(token_ids, 0, V - 1)]


def ntk_alpha_for_len(cfg: QwenConfig, kv_seq_len: int) -> float:
    """Dynamic-NTK alpha (reference modeling_qwen.py:645-659). Computed
    host-side from the static max sequence length of the compiled program."""
    if not cfg.use_dynamic_ntk or kv_seq_len <= cfg.seq_length:
        return 1.0
    context_value = math.log(kv_seq_len / cfg.seq_length, 2) + 1
    return max(2 ** math.ceil(context_value) - 1, 1.0)


def _logn_scale(cfg: QwenConfig, positions: jax.Array) -> jax.Array:
    """log-n query scaling factor per absolute position
    (reference :140-144: log_{seq_length}(i) for 1-based i > seq_length)."""
    i = positions.astype(jnp.float32) + 1.0
    factor = jnp.log(i) / jnp.log(float(cfg.seq_length))
    return jnp.where(i > cfg.seq_length, factor, 1.0)


def _write_cache_full(cache_full, new, layer_idx, offsets, is_decode, row_offset=0):
    B = new.shape[0]
    if is_decode:
        return cache_full.at[layer_idx, row_offset + jnp.arange(B), offsets].set(new[:, 0])
    return jax.lax.dynamic_update_slice(
        cache_full, new[None], (layer_idx, row_offset, 0, 0, 0)
    )


def forward(
    params: Params,
    cfg: QwenConfig,
    embeds: jax.Array,
    positions: jax.Array,
    cache: Optional[Dict[str, jax.Array]] = None,
    cache_offset: Optional[jax.Array] = None,
    *,
    ntk_alpha: float = 1.0,
    attn_impl: str = "auto",
    cache_row_offset: int = 0,
    shared_kv: Optional[Dict[str, jax.Array]] = None,
    shared_len: Optional[jax.Array] = None,
    shared_rows_per_prefix: Optional[int] = None,
    shared_rows_per_prefix2: int = 0,
    act_quant: bool = False,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    """shared_kv: optional read-only prefix segment {'k','v': [L, P, K, Dh]}
    (same contract as models/llama.forward: positions absolute, cache_offset
    local; optional second table 'k2'/'v2' for the shared text-branch
    prefixes, rows blocked by shared_rows_per_prefix2)."""
    B, S, D = embeds.shape
    H, Dh = cfg.num_heads, cfg.head_dim
    base = cfg.rotary_emb_base * ntk_alpha ** (Dh / (Dh - 2))
    cos, sin = rope_cos_sin(positions, Dh, base)
    if cache_offset is None:
        cache_offset = jnp.zeros((B,), jnp.int32)
    is_decode = cache is not None and S == 1
    if cfg.use_logn_attn:
        logn = _logn_scale(cfg, positions)[..., None, None]  # [B,S,1,1]
    else:
        logn = None

    # int8-quantized stacks must NOT ride the scan xs (a sliced pallas
    # operand would materialize a per-layer weight copy every step) — they
    # stay whole; the kernel indexes the layer via scalar prefetch
    # (ops/quant, same design as models/llama.py).
    all_layers = params["layers"]
    quant_names = {
        k for k, v in all_layers.items() if isinstance(v, dict) and "q" in v and "s" in v
    }
    scan_layers = {k: v for k, v in all_layers.items() if k not in quant_names}

    def _lin(h, lp, name, li):
        if name in quant_names:
            from llava_align_tpu.ops.quant import int8_matmul_stacked_dispatch

            return int8_matmul_stacked_dispatch(
                h, all_layers[name], li if li is not None else 0,
                act_quant=act_quant,
            )
        w = lp[name]
        return jax.lax.dot_general(
            h, w, (((2,), (1,)), ((), ())), preferred_element_type=h.dtype
        )

    fused_w12 = "w12" in all_layers
    kv_quant = cache is not None and "ks" in cache

    def _write_kv(c, k, v, li):
        """models/llama.forward _write_kv: int8 caches store quantized
        values + per-token/head scales (ops/quant.kv_quantize_block)."""
        off = cache_offset
        if kv_quant:
            from llava_align_tpu.ops.quant import kv_quantize_block

            kq, ks = kv_quantize_block(k)
            vq, vs = kv_quantize_block(v)
            return dict(
                c,
                k=_write_cache_full(c["k"], kq, li, off, is_decode, cache_row_offset),
                ks=_write_cache_full(c["ks"], ks, li, off, is_decode, cache_row_offset),
                v=_write_cache_full(c["v"], vq, li, off, is_decode, cache_row_offset),
                vs=_write_cache_full(c["vs"], vs, li, off, is_decode, cache_row_offset),
            )
        return dict(
            c,
            k=_write_cache_full(c["k"], k, li, off, is_decode, cache_row_offset),
            v=_write_cache_full(c["v"], v, li, off, is_decode, cache_row_offset),
        )

    def _read_kv(c, li):
        """Slice layer li from the cache dict. int8 caches come back as
        (values, scales) tuples — the attention ops fold the scales into the
        logits/probs instead of dequantizing the cache operand
        (ops/attention._kv_parts; scripts/probe_kvq_fusion.py)."""
        k_slice = jax.lax.dynamic_index_in_dim(c["k"], li, 0, keepdims=False)
        v_slice = jax.lax.dynamic_index_in_dim(c["v"], li, 0, keepdims=False)
        if kv_quant:
            return (
                (k_slice, jax.lax.dynamic_index_in_dim(c["ks"], li, 0, keepdims=False)),
                (v_slice, jax.lax.dynamic_index_in_dim(c["vs"], li, 0, keepdims=False)),
            )
        return k_slice, v_slice

    def _read_shared(li, kk, ss):
        k_sh = jax.lax.dynamic_index_in_dim(shared_kv[kk], li, 0, keepdims=False)
        if ss in shared_kv:
            return (
                k_sh,
                jax.lax.dynamic_index_in_dim(shared_kv[ss], li, 0, keepdims=False),
            )
        return k_sh

    def layer_fn(x, lp, c, li):
        h = rms_norm(x, lp["ln_1"], cfg.layer_norm_eps)
        qkv = _lin(h, lp, "c_attn_w", li) + lp["c_attn_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rope(q.reshape(B, S, H, Dh), cos, sin)
        k = apply_rope(k.reshape(B, S, H, Dh), cos, sin)
        v = v.reshape(B, S, H, Dh)
        if logn is not None:
            q = (q.astype(jnp.float32) * logn).astype(q.dtype)

        if cache is not None:
            c = _write_kv(c, k, v, li)

        if shared_kv is not None:
            from llava_align_tpu.ops.attention import (
                chunk_attention_shared, chunk_attention_shared_grouped,
                decode_attention_shared, decode_attention_shared_grouped,
            )

            k_sh = _read_shared(li, "k", "ks")
            v_sh = _read_shared(li, "v", "vs")
            # [G, P, K, Dh]: one prefix per row-group (quantized segments are
            # (values, scales) tuples — rank from the value array)
            k_sh_vals = k_sh[0] if isinstance(k_sh, tuple) else k_sh
            grouped = k_sh_vals.ndim == 4
            k_sh2 = v_sh2 = None
            if "k2" in shared_kv:  # second (text-branch) segment table
                k_sh2 = _read_shared(li, "k2", "k2s")
                v_sh2 = _read_shared(li, "v2", "v2s")
            if is_decode:
                k_slice, v_slice = _read_kv(c, li)
                if grouped:
                    attn = decode_attention_shared_grouped(
                        q, k_slice, v_slice, cache_offset, k_sh, v_sh,
                        shared_len, shared_rows_per_prefix,
                        k_sh2, v_sh2, shared_rows_per_prefix2,
                    )
                else:
                    attn = decode_attention_shared(
                        q, k_slice, v_slice, cache_offset, k_sh, v_sh, shared_len
                    )
            elif grouped:
                attn = chunk_attention_shared_grouped(
                    q, k, v, k_sh, v_sh, shared_len, shared_rows_per_prefix,
                    k_sh2, v_sh2, shared_rows_per_prefix2,
                )
            else:
                attn = chunk_attention_shared(q, k, v, k_sh, v_sh, shared_len)
        elif is_decode:
            k_slice, v_slice = _read_kv(c, li)
            attn = decode_attention(q, k_slice, v_slice, cache_offset)
        else:
            attn = causal_attention(q, k, v, impl=attn_impl)

        x = x + _lin(attn.reshape(B, S, cfg.q_dim), lp, "attn_proj", li)
        h = rms_norm(x, lp["ln_2"], cfg.layer_norm_eps)
        if fused_w12:
            w12 = _lin(h, lp, "w12", li)  # one launch streams w1|w2
            half = w12.shape[-1] // 2
            act = w12[..., :half] * silu(w12[..., half:])
        else:
            act = _lin(h, lp, "w1", li) * silu(_lin(h, lp, "w2", li))
        x = x + _lin(act, lp, "mlp_proj", li)
        return x, c

    if cache is not None:
        def scan_body(carry, lp):
            x, c, li = carry
            x, c = layer_fn(x, lp, c, li)
            return (x, c, li + 1), None

        init_c = (embeds, dict(cache), jnp.asarray(0, jnp.int32))
        (x, new_cache, _), _ = jax.lax.scan(scan_body, init_c, scan_layers)
    else:
        def scan_body(carry, lp):
            x, li = carry
            x, _ = layer_fn(x, lp, None, li)
            return (x, li + 1), None

        (x, _), _ = jax.lax.scan(
            scan_body, (embeds, jnp.asarray(0, jnp.int32)), scan_layers
        )
        new_cache = None

    hidden = rms_norm(x, params["ln_f"], cfg.layer_norm_eps)
    return hidden, new_cache


def logits_from_hidden(params: Params, hidden: jax.Array) -> jax.Array:
    w = params["lm_head"]
    if isinstance(w, dict):  # int8 quantized
        from llava_align_tpu.ops.quant import int8_matmul

        return int8_matmul(hidden, w).astype(jnp.float32)
    return jnp.einsum(
        "...d,vd->...v", hidden.astype(w.dtype), w, preferred_element_type=jnp.float32
    )
