"""LLaMA decoder in pure functional JAX.

Capability parity target: the HF LlamaForCausalLM backbone that LLaVA wraps
(reference experiments/llava/model/language_model/llava_llama.py:43-128).
TPU-first design choices:

  * layer weights are stacked on a leading [num_layers, ...] axis and the
    layer stack runs under `lax.scan` — one compiled layer body, fast compiles,
    clean pjit sharding of the stacked axis-1/2 dims;
  * the KV cache is a single [L, B, Smax, K, Dh] array pair holding ALL decode
    branches on the batch axis (the reference keeps 2-3 independent python-side
    caches and runs sequential forwards, vcd_utils/vcd_sample.py:109-185);
  * per-row cache offsets let branches of different true lengths (the VDD
    'none' branch is ~576 tokens shorter) share one static-shape cache;
  * attention softmax/logits accumulate in fp32; weights/activations bf16.

Param tree — linear kernels kept in torch convention [out, in] (stacked
[L, out, in]): XLA's preferred operand layout for the decode-time matmuls has
the contraction dim minormost on both sides; storing [in, out] made XLA hoist
1GB layout-copies of q/k/v out of the decode loop (observed OOM on v5e).
    embed:      [V, D]
    layers/attn_norm  [L, D]
    layers/{q,k,v}    [L, H*Dh, D] / [L, K*Dh, D] x2
    layers/o          [L, D, H*Dh]
    layers/mlp_norm   [L, D]
    layers/{gate,up}  [L, F, D]
    layers/down       [L, D, F]
    final_norm: [D]
    lm_head:    [V, D]
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llava_align_tpu.config import LlamaConfig
from llava_align_tpu.ops.attention import causal_attention, decode_attention
from llava_align_tpu.ops.layers import apply_rope, rms_norm, rope_cos_sin, silu

Params = Dict[str, Any]
KVCache = Dict[str, jax.Array]


def init(rng: jax.Array, cfg: LlamaConfig) -> Params:
    """Random init (tests / benchmarks; real weights come from hf_convert)."""
    ks = jax.random.split(rng, 12)
    D, F, L, V = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers, cfg.vocab_size
    QD, KD = cfg.q_dim, cfg.kv_dim

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / (fan_in**0.5)).astype(cfg.dtype)

    return {
        "embed": w(ks[0], (V, D), D),
        "layers": {
            "attn_norm": jnp.ones((L, D), cfg.dtype),
            "q": w(ks[1], (L, QD, D), D),
            "k": w(ks[2], (L, KD, D), D),
            "v": w(ks[3], (L, KD, D), D),
            "o": w(ks[4], (L, D, QD), QD),
            "mlp_norm": jnp.ones((L, D), cfg.dtype),
            "gate": w(ks[5], (L, F, D), D),
            "up": w(ks[6], (L, F, D), D),
            "down": w(ks[7], (L, D, F), F),
        },
        "final_norm": jnp.ones((D,), cfg.dtype),
        "lm_head": w(ks[8], (V, D), D),
    }


def init_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype: Optional[jnp.dtype] = None,
    kv_quant: bool = False,
) -> KVCache:
    dtype = dtype or cfg.dtype
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if kv_quant:
        # int8 values + per-(layer,row,pos,head) f32 absmax scales
        # (ops/quant.kv_quantize_block); the trailing singleton keeps the
        # scale tree rank-5 so the engine's cache sharding constraint and
        # cache-write helpers apply unchanged
        sshape = shape[:-1] + (1,)
        return {
            "k": jnp.zeros(shape, jnp.int8), "ks": jnp.zeros(sshape, jnp.float32),
            "v": jnp.zeros(shape, jnp.int8), "vs": jnp.zeros(sshape, jnp.float32),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def embed_tokens(params: Params, token_ids: jax.Array) -> jax.Array:
    """token_ids [...] int32 → embeddings [..., D]. Ids are clipped to the
    vocab so sentinel ids (IMAGE_TOKEN_INDEX=-200) are safe — the caller
    overwrites those positions with image features anyway."""
    V = params["embed"].shape[0]
    safe = jnp.clip(token_ids, 0, V - 1)
    return params["embed"][safe]


def _write_cache_full(
    cache_full: jax.Array,
    new: jax.Array,
    layer_idx: jax.Array,
    offsets: jax.Array,
    is_decode: bool,
    row_offset: int = 0,
) -> jax.Array:
    """Write new [B, S, K, Dh] into cache_full [L, B, Smax, K, Dh] at layer
    `layer_idx`, per-row sequence offsets `offsets` [B].

    Both paths lower to in-place updates when the cache is a loop carry:
    prefill (offsets==0 by contract) is a static-start dynamic_update_slice;
    decode (S==1) is a batched scatter at per-branch lengths.
    """
    B, S = new.shape[0], new.shape[1]
    if is_decode:
        return cache_full.at[layer_idx, row_offset + jnp.arange(B), offsets].set(new[:, 0])
    return jax.lax.dynamic_update_slice(
        cache_full, new[None], (layer_idx, row_offset, 0, 0, 0)
    )


def forward(
    params: Params,
    cfg: LlamaConfig,
    embeds: jax.Array,
    positions: jax.Array,
    cache: Optional[KVCache] = None,
    cache_offset: Optional[jax.Array] = None,
    *,
    attn_impl: str = "auto",
    cache_row_offset: int = 0,
    tp_mesh=None,
    shared_kv: Optional[KVCache] = None,
    shared_len: Optional[jax.Array] = None,
    shared_rows_per_prefix: Optional[int] = None,
    shared_rows_per_prefix2: int = 0,
    act_quant: bool = False,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder stack.

    act_quant: opt-in W8A8 — int8-quantized stacks run compute-bound row
    counts through dynamic activation quant + int8 MXU matmuls
    (ops/quant.int8_matmul_w8a8; ~1.4x prefill, NOT bit-exact vs the exact
    int8 kernels, but the sharded W8A8 path IS bit-exact vs single-device
    W8A8 — ops/quant.int8_matmul_stacked_tp act_quant). Decode rows keep the
    exact weight-streaming kernels in both the single-device and TP paths.

    shared_kv: optional read-only prefix KV segment {'k','v': [L, P, K, Dh]}
    shared by all rows (ops/attention shared-prefix design). shared_len [B]
    gives each row's valid prefix length (0 = no shared segment). When set,
    `positions` must be absolute (shared_len[b] + local index) while
    `cache_offset` stays LOCAL; prefill blocks are the first local content.
    A grouped shared_kv may carry a SECOND segment table ('k2','v2':
    [L, G2, P2, K, Dh], rows blocked by shared_rows_per_prefix2) covering the
    rows right after the first table's span — the engine's shared text-branch
    prefixes (ops/attention grouped two-table variants).

    tp_mesh: optional Mesh — int8-quantized stacks run tensor-parallel via
    shard_map around the weight-streaming kernel (column-parallel qkv/gate
    stacks, row-parallel o/down with psum; ops/quant.int8_matmul_stacked_tp).
    GSPMD cannot partition the Pallas custom call itself, so this is the
    explicit Megatron dataflow for int8 weights.

    embeds       [B, S, D]   (token or spliced multimodal embeddings)
    positions    [B, S]      absolute RoPE positions
    cache        optional KV cache to read/extend
    cache_offset [B] int32   where this block starts in the cache. Prefill
                 requires offset == 0 (fresh cache, causal within the block);
                 decode uses S == 1 at the per-row current length.

    Returns (hidden [B, S, D] after final norm, updated cache).
    """
    B, S, D = embeds.shape
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    if cache_offset is None:
        cache_offset = jnp.zeros((B,), jnp.int32)

    is_decode = cache is not None and S == 1

    # quantized stacks ([L,O,D] int8 / [L,O,D/2] packed-int4 dicts) must NOT
    # ride the scan xs — the sliced pallas operand would materialize a
    # per-layer weight copy every step. They stay whole; the kernel indexes
    # the layer via scalar prefetch.
    all_layers = params["layers"]
    quant_names = {
        k for k, v in all_layers.items() if isinstance(v, dict) and "q" in v and "s" in v
    }
    quant4_names = {
        k for k, v in all_layers.items()
        if isinstance(v, dict) and "q4" in v and "gs" in v
    }
    scan_layers = {
        k: v for k, v in all_layers.items()
        if k not in quant_names and k not in quant4_names
    }

    def _lin(h, lp, name, li):  # h [B,S,in] -> [B,S,out]
        if name in quant4_names:
            from llava_align_tpu.ops.quant import int4_matmul_stacked_dispatch

            # int4 has no shard_map TP path (group scales live inside the
            # contraction); under a mesh the stacks are replicated — the
            # engine warns at init
            return int4_matmul_stacked_dispatch(
                h, all_layers[name], li if li is not None else 0
            )
        if name in quant_names:
            from llava_align_tpu.ops.quant import (
                int8_matmul_stacked_dispatch,
                int8_matmul_stacked_tp,
                int8_tp_mode,
            )

            if tp_mesh is not None:
                return int8_matmul_stacked_tp(
                    h, all_layers[name], li if li is not None else 0,
                    tp_mesh, int8_tp_mode(name),
                    act_quant=act_quant,
                )
            return int8_matmul_stacked_dispatch(
                h, all_layers[name], li if li is not None else 0,
                act_quant=act_quant,
            )
        w = lp[name]
        return jax.lax.dot_general(
            h, w, (((2,), (1,)), ((), ())), preferred_element_type=h.dtype
        )

    QD, KD = cfg.q_dim, cfg.kv_dim
    fused_qkv = "qkv" in all_layers
    fused_gu = "gateup" in all_layers

    kv_quant = cache is not None and "ks" in cache

    def _write_kv(c, k, v, li):
        """Write the new K/V block into the cache dict (quantizing when the
        cache is int8 — ops/quant.kv_quantize_block per-token/head scales)."""
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
        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        if fused_qkv:
            qkv = _lin(h, lp, "qkv", li)  # one launch streams q|k|v
            q = qkv[..., :QD].reshape(B, S, cfg.num_heads, cfg.head_dim)
            k = qkv[..., QD : QD + KD].reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
            v = qkv[..., QD + KD : QD + 2 * KD].reshape(
                B, S, cfg.num_kv_heads, cfg.head_dim
            )
        else:
            q = _lin(h, lp, "q", li).reshape(B, S, cfg.num_heads, cfg.head_dim)
            k = _lin(h, lp, "k", li).reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
            v = _lin(h, lp, "v", li).reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

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

        x = x + _lin(attn.reshape(B, S, cfg.q_dim), lp, "o", li)

        h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        if fused_gu:
            gu = _lin(h, lp, "gateup", li)  # one launch streams gate|up
            # split at the stack's own half-width, not cfg.intermediate_size:
            # TP lane-alignment may have padded each half (quant.
            # pad_llama_quantized_for_tp); padded columns are exact zeros and
            # silu(0)*0 = 0 feeds down's zero contraction columns.
            Fh = gu.shape[-1] // 2
            act = silu(gu[..., :Fh]) * gu[..., Fh:]
        else:
            act = silu(_lin(h, lp, "gate", li)) * _lin(h, lp, "up", li)
        x = x + _lin(act, lp, "down", li)
        return x, c

    if cache is not None:
        # The cache rides the scan CARRY (not xs/ys) so XLA updates it in
        # place inside the loop — scan ys would allocate a fresh cache-sized
        # buffer every call, which both doubles HBM traffic and OOMs 7B+cache
        # on a 16GB chip. The carry holds the whole cache dict (k/v, plus
        # ks/vs scale planes for int8 caches).
        def scan_body(carry, lp):
            x, c, li = carry
            x, c = layer_fn(x, lp, c, li)
            return (x, c, li + 1), None

        init = (embeds, dict(cache), jnp.asarray(0, jnp.int32))
        (x, new_cache, _), _ = jax.lax.scan(scan_body, init, scan_layers)
    else:
        def scan_body(carry, lp):
            x, li = carry
            x, _ = layer_fn(x, lp, None, li)
            return (x, li + 1), None

        (x, _), _ = jax.lax.scan(
            scan_body, (embeds, jnp.asarray(0, jnp.int32)), scan_layers
        )
        new_cache = None

    hidden = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return hidden, new_cache


def logits_from_hidden(params: Params, hidden: jax.Array) -> jax.Array:
    """lm_head with fp32 MXU accumulation (parity-critical; SURVEY §7 hard
    part 1). Inputs stay in the weight dtype (bf16 on TPU) so no fp32 copy of
    the [D, V] matrix is ever materialized."""
    w = params["lm_head"]  # [V, D]
    if isinstance(w, dict):  # int8 quantized
        from llava_align_tpu.ops.quant import int8_matmul

        return int8_matmul(hidden, w).astype(jnp.float32)
    return jnp.einsum(
        "...d,vd->...v",
        hidden.astype(w.dtype),
        w,
        preferred_element_type=jnp.float32,
    )


def last_token_logits(
    params: Params, hidden: jax.Array, last_index: jax.Array
) -> jax.Array:
    """Gather hidden at per-row last valid position, then one [B,D]x[D,V]
    matmul — avoids the full [B,S,V] prefill logits the reference computes."""
    B = hidden.shape[0]
    gathered = hidden[jnp.arange(B), last_index]  # [B, D]
    return logits_from_hidden(params, gathered)


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
