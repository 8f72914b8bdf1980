"""Attention ops: Pallas flash-attention TPU kernel + XLA reference paths.

The reference's only native kernel is a Triton flash-attention for its MPT
stack (experiments/llava/model/language_model/mpt/flash_attn_triton.py:50-306).
This module is the TPU-native equivalent: a blockwise online-softmax causal
attention kernel in Pallas (Mosaic) for the prefill hot path, plus an XLA
decode attention over the packed-branch KV cache.

Layouts:
    q        [B, S, H, Dh]
    k, v     [B, S, K, Dh]          (K = num kv heads; GQA via H % K == 0)
    cache    [B, Smax, K, Dh]

All softmax math is float32; inputs may be bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


# ---------------------------------------------------------------------------
# XLA reference attention (used on CPU, for tests, and for short sequences)
# ---------------------------------------------------------------------------


def mha_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Plain XLA attention. q [B,Sq,H,Dh], k/v [B,Sk,K,Dh] → [B,Sq,H,Dh]."""
    B, Sq, H, Dh = q.shape
    K = k.shape[2]
    group = H // K
    scale = 1.0 / (Dh**0.5)

    # No fp32 input upcasts (that would materialize fp32 copies of K/V):
    # the MXU accumulates bf16 x bf16 into fp32 via preferred_element_type.
    qr = q.reshape(B, Sq, K, group, Dh)
    logits = jnp.einsum(
        "bqkgd,bskd->bkgqs", qr, k,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale  # [B, K, group, Sq, Sk] fp32
    if causal:
        Sk = k.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 1)
        logits = jnp.where(col <= row, logits, NEG_INF)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)  # fp32
    out = jnp.einsum(
        "bkgqs,bskd->bqkgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(B, Sq, H, Dh).astype(q.dtype)


def _kv_parts(x):
    """Cache/segment operands are either a plain array or an int8-quantized
    (values, scales) tuple (ops/quant.kv_quantize_block layout: scales carry
    a trailing singleton over Dh). Quantized operands are consumed by
    SCALE-FOLDED einsums — the per-(pos,head) scale multiplies the small
    [.., S] logits/probs tensors, never the [.., S, K, Dh]-sized operand, so
    no dequantized cache copy is ever materialized (scripts/
    probe_kvq_fusion.py: dequantize-then-dot measured 1.16x the bf16 cost;
    folding measured 0.93x)."""
    if isinstance(x, tuple):
        return x
    return x, None


def _fold_rows(scales):
    """[B, S, K, 1] scale plane → [B, K, 1, S] logits/probs multiplier."""
    return scales[..., 0].transpose(0, 2, 1)[:, :, None, :]


def decode_attention(
    q: jax.Array,
    k_cache,
    v_cache,
    lengths: jax.Array,
) -> jax.Array:
    """Single-step decode attention over a KV cache.

    q        [B, 1, H, Dh]   (query token already written to cache at lengths[b])
    k/v      [B, Smax, K, Dh] (or int8 (values, scales) tuples — _kv_parts)
    lengths  [B] int32 — index of the current token; keys j <= lengths[b] attend.

    Per-branch lengths make the packed VDD branch axis honest: the 'none'
    branch is genuinely shorter (reference removes image positions outright,
    vcd_sample.py:156-160) — masking here reproduces physical removal exactly
    because the padded slots were never written with attended content.
    """
    k_cache, k_s = _kv_parts(k_cache)
    v_cache, v_s = _kv_parts(v_cache)
    B, _, H, Dh = q.shape
    Smax, K = k_cache.shape[1], k_cache.shape[2]
    group = H // K
    scale = 1.0 / (Dh**0.5)

    # bf16 cache reads with fp32 MXU accumulation — never upcast the cache
    # (an fp32 copy of a GB-scale cache per step would dominate HBM traffic).
    if k_s is None:
        qr = q.astype(k_cache.dtype).reshape(B, K, group, Dh)
        logits = jnp.einsum(
            "bkgd,bskd->bkgs", qr, k_cache,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * scale  # [B, K, group, Smax] fp32
    else:
        qr = q.astype(jnp.float32).reshape(B, K, group, Dh)
        logits = jnp.einsum(
            "bkgd,bskd->bkgs", qr, k_cache.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * (scale * _fold_rows(k_s))
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1, Smax), 3)
    mask = pos <= lengths[:, None, None, None]
    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_s is None:
        out = jnp.einsum(
            "bkgs,bskd->bkgd", probs.astype(v_cache.dtype), v_cache,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        out = jnp.einsum(
            "bkgs,bskd->bkgd", probs * _fold_rows(v_s),
            v_cache.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return out.reshape(B, 1, H, Dh).astype(q.dtype)


# ---------------------------------------------------------------------------
# Shared-prefix (two-segment) attention.
#
# POPE-style workloads share one [system + image] prefix across many rows:
# every split ships exactly 6 questions per image, and the reference prefills
# the full prompt from scratch for every question and branch
# (vcd_sample.py:109-185). Here the shared prefix is prefilled ONCE into a
# read-only KV segment; per-row caches hold only the suffix + generated
# tokens. Queries attend [shared | local] with one joint softmax — the
# logit layout matches the contiguous-cache order exactly (prefix keys
# first), so the math is identical to an unshared prefill.
#
# k_sh/v_sh: [P, K, Dh] (one prefix per call, broadcast over rows);
# sh_len: [B] int32 — valid prefix keys per row (0 = row has no shared
# segment, e.g. the text-only VDD branches).
# ---------------------------------------------------------------------------


def _fold_seg(scales):
    """[P, K, 1] segment scale plane → [1, K, 1, (1,) P] multiplier (callers
    broadcast over the leading B and any S axis)."""
    return scales[..., 0].transpose(1, 0)[None, :, None, :]


def _shared_logits(q4: jax.Array, k_sh, sh_len: jax.Array, scale):
    """q4 [B,K,g,S,Dh] x k_sh [P,K,Dh] → masked fp32 logits [B,K,g,S,P].
    k_sh may be an int8 (values, scales) tuple (_kv_parts)."""
    k_sh, k_s = _kv_parts(k_sh)
    B, K, g, S, Dh = q4.shape
    P = k_sh.shape[0]
    if k_s is None:
        logits = jnp.einsum(
            "bkgsd,pkd->bkgsp", q4, k_sh.astype(q4.dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * scale
    else:
        logits = jnp.einsum(
            "bkgsd,pkd->bkgsp", q4.astype(jnp.float32),
            k_sh.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * (scale * _fold_seg(k_s)[:, :, None])
    col = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1, 1, P), 4)
    return jnp.where(col < sh_len[:, None, None, None, None], logits, NEG_INF)


def _seg_value_einsum(subs, probs, v_sh, compute_dtype, fold_shape=None):
    """probs x segment values, folding int8 segment scales into probs."""
    v_sh, v_s = _kv_parts(v_sh)
    if v_s is None:
        return jnp.einsum(
            subs, probs.astype(compute_dtype), v_sh.astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    fold = _fold_seg(v_s)
    if fold_shape is not None:
        fold = fold.reshape(fold_shape)
    return jnp.einsum(
        subs, probs * fold, v_sh.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def chunk_attention_shared(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_sh,
    v_sh,
    sh_len: jax.Array,
) -> jax.Array:
    """Suffix prefill: causal within the local block [B,S] + full attention to
    the shared prefix. The local block is the FIRST local cache content
    (local offset 0); absolute positions are sh_len[b] + i (caller applies
    RoPE before this). k_sh/v_sh may be int8 (values, scales) tuples."""
    B, S, H, Dh = q.shape
    K = k.shape[2]
    group = H // K
    scale = 1.0 / (Dh**0.5)

    qr = q.astype(k.dtype).reshape(B, S, K, group, Dh).transpose(0, 2, 3, 1, 4)
    sh = _shared_logits(qr, k_sh, sh_len, scale)  # [B,K,g,S,P]
    loc = jnp.einsum(
        "bkgsd,btkd->bkgst", qr, k,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale  # [B,K,g,S,S]
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    loc = jnp.where((col <= row)[None, None, None], loc, NEG_INF)

    logits = jnp.concatenate([sh, loc], axis=-1)  # prefix keys first
    probs = jnp.nan_to_num(jax.nn.softmax(logits, axis=-1))
    P = _kv_parts(k_sh)[0].shape[0]
    out = _seg_value_einsum(
        "bkgsp,pkd->bkgsd", probs[..., :P], v_sh, v.dtype,
        fold_shape=(1, K, 1, 1, P),
    ) + jnp.einsum(
        "bkgst,btkd->bkgsd", probs[..., P:].astype(v.dtype), v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, H, Dh).astype(q.dtype)


def decode_attention_shared(
    q: jax.Array,
    k_cache,
    v_cache,
    lengths: jax.Array,
    k_sh,
    v_sh,
    sh_len: jax.Array,
) -> jax.Array:
    """decode_attention over [shared prefix | local cache]. lengths indexes
    the LOCAL cache (current token already written at lengths[b]). The cache
    and segment operands may be int8 (values, scales) tuples."""
    k_cache, k_s = _kv_parts(k_cache)
    v_cache, v_s = _kv_parts(v_cache)
    B, _, H, Dh = q.shape
    Smax, K = k_cache.shape[1], k_cache.shape[2]
    group = H // K
    scale = 1.0 / (Dh**0.5)

    qdt = jnp.float32 if k_s is not None else k_cache.dtype
    qr = q.astype(qdt).reshape(B, K, group, 1, Dh)
    sh = _shared_logits(qr, k_sh, sh_len, scale)[:, :, :, 0]
    if k_s is None:
        loc = jnp.einsum(
            "bkgd,bskd->bkgs", qr[:, :, :, 0], k_cache,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * scale
    else:
        loc = jnp.einsum(
            "bkgd,bskd->bkgs", qr[:, :, :, 0].astype(jnp.float32),
            k_cache.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * (scale * _fold_rows(k_s))
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1, Smax), 3)
    loc = jnp.where(pos <= lengths[:, None, None, None], loc, NEG_INF)

    logits = jnp.concatenate([sh, loc], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    P = _kv_parts(k_sh)[0].shape[0]
    vdt = jnp.float32 if v_s is not None else v_cache.dtype
    out = _seg_value_einsum(
        "bkgp,pkd->bkgd", probs[..., :P], v_sh, vdt,
        fold_shape=(1, K, 1, P),
    )
    if v_s is None:
        out = out + jnp.einsum(
            "bkgs,bskd->bkgd", probs[..., P:].astype(v_cache.dtype), v_cache,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        out = out + jnp.einsum(
            "bkgs,bskd->bkgd", probs[..., P:] * _fold_rows(v_s),
            v_cache.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return out.reshape(B, 1, H, Dh).astype(q.dtype)


# ---------------------------------------------------------------------------
# Multi-prefix (grouped) variants: G shared prefixes, rows statically blocked
# as [g0 rows | g1 rows | ...] with `rows_per_prefix` rows per group
# (engine.generate_batch_groups packs several image-groups into one lockstep
# call to amortize per-call dispatch/transfer). k_sh/v_sh: [G, P, K, Dh];
# sh_len: [B] per-row valid prefix length.
#
# An optional SECOND segment table (k_sh2/v_sh2, its own prefix bucket)
# covers the rows immediately after the first table's span — the engine uses
# it for the text-only degraded VDD branches, whose (transformed) prompt
# prefix is shared across each group's questions just like the image prefix
# (reference re-prefills those branches per question, vcd_sample.py:147-185).
# ---------------------------------------------------------------------------


def _fold_gseg(scales):
    """[G, P, K, 1] grouped segment scale plane → [G, 1, K, 1, P]."""
    return scales[..., 0].transpose(0, 2, 1)[:, None, :, None, :]


def _chunk_span_shared(
    qr: jax.Array,  # [Bs, K, g, S, Dh] rows of this span
    k: jax.Array,   # [Bs, S, K, Dh] local keys
    v: jax.Array,
    k_sh,           # [G, P, K, Dh] (or int8 (values, scales) tuple)
    v_sh,
    sh_len: jax.Array,  # [Bs]
    R: int,
    scale: float,
) -> jax.Array:
    """One-table grouped chunk attention over a contiguous row span.
    Returns [Bs, K, g, S, Dh] fp32."""
    k_sh, k_s = _kv_parts(k_sh)
    v_sh, v_s = _kv_parts(v_sh)
    Bs, K, g, S, Dh = qr.shape
    G = k_sh.shape[0]
    P = k_sh.shape[1]
    qg = qr.reshape(G, R, K, g, S, Dh)
    if k_s is None:
        sh = jnp.einsum(
            "Grkgsd,Gpkd->Grkgsp", qg, k_sh.astype(qr.dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * scale
    else:
        sh = jnp.einsum(
            "Grkgsd,Gpkd->Grkgsp", qg.astype(jnp.float32),
            k_sh.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * (scale * _fold_gseg(k_s)[:, :, :, :, None])
    col = jax.lax.broadcasted_iota(jnp.int32, (G, R, 1, 1, 1, P), 5)
    sh = jnp.where(
        col < sh_len.reshape(G, R, 1, 1, 1, 1), sh, NEG_INF
    ).reshape(Bs, K, g, S, P)

    loc = jnp.einsum(
        "bkgsd,btkd->bkgst", qr, k,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    colc = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    loc = jnp.where((colc <= row)[None, None, None], loc, NEG_INF)

    logits = jnp.concatenate([sh, loc], axis=-1)
    probs = jnp.nan_to_num(jax.nn.softmax(logits, axis=-1))
    p_sh = probs[..., :P].reshape(G, R, K, g, S, P)
    if v_s is None:
        out_sh = jnp.einsum(
            "Grkgsp,Gpkd->Grkgsd", p_sh.astype(v.dtype), v_sh.astype(v.dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(Bs, K, g, S, Dh)
    else:
        out_sh = jnp.einsum(
            "Grkgsp,Gpkd->Grkgsd", p_sh * _fold_gseg(v_s)[:, :, :, :, None],
            v_sh.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(Bs, K, g, S, Dh)
    return out_sh + jnp.einsum(
        "bkgst,btkd->bkgsd", probs[..., P:].astype(v.dtype), v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def chunk_attention_shared_grouped(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_sh,
    v_sh,
    sh_len: jax.Array,
    rows_per_prefix: int,
    k_sh2=None,
    v_sh2=None,
    rows_per_prefix2: int = 0,
) -> jax.Array:
    """Suffix prefill with one shared prefix per static row-group. Rows are
    [table-1 span | table-2 span (optional)]; each span's rows block by its
    own rows_per_prefix. Segment tables may be int8 (values, scales) tuples."""
    B, S, H, Dh = q.shape
    K = k.shape[2]
    group = H // K
    scale = 1.0 / (Dh**0.5)
    M1 = _kv_parts(k_sh)[0].shape[0] * rows_per_prefix

    qr = q.astype(k.dtype).reshape(B, S, K, group, Dh).transpose(0, 2, 3, 1, 4)
    out1 = _chunk_span_shared(
        qr[:M1], k[:M1], v[:M1], k_sh, v_sh,
        sh_len[:M1], rows_per_prefix, scale,
    )
    if k_sh2 is None:
        out = out1
    else:
        out2 = _chunk_span_shared(
            qr[M1:], k[M1:], v[M1:], k_sh2, v_sh2,
            sh_len[M1:], rows_per_prefix2, scale,
        )
        out = jnp.concatenate([out1, out2], axis=0)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, H, Dh).astype(q.dtype)


def _slice_kv(x, sl):
    """Row-slice a cache operand that may be a (values, scales) tuple."""
    vals, scales = _kv_parts(x)
    if scales is None:
        return vals[sl]
    return (vals[sl], scales[sl])


def _decode_span_shared(
    qr: jax.Array,  # [Ms, K, g, Dh]
    k_cache,        # [Ms, Smax, K, Dh] (or int8 (values, scales) tuple)
    v_cache,
    lengths: jax.Array,  # [Ms]
    k_sh,           # [G, P, K, Dh] (or tuple)
    v_sh,
    sh_len: jax.Array,  # [Ms]
    R: int,
    scale: float,
) -> jax.Array:
    """One-table grouped decode attention over a row span → [Ms, K, g, Dh]."""
    k_cache, k_s = _kv_parts(k_cache)
    v_cache, v_s = _kv_parts(v_cache)
    k_sh, ksh_s = _kv_parts(k_sh)
    v_sh, vsh_s = _kv_parts(v_sh)
    Ms, K, g, Dh = qr.shape
    G = k_sh.shape[0]
    P = k_sh.shape[1]
    Smax = k_cache.shape[1]
    qg = qr.reshape(G, R, K, g, Dh)
    if ksh_s is None:
        sh = jnp.einsum(
            "Grkgd,Gpkd->Grkgp", qg, k_sh.astype(qr.dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * scale
    else:
        sh = jnp.einsum(
            "Grkgd,Gpkd->Grkgp", qg.astype(jnp.float32),
            k_sh.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * (scale * _fold_gseg(ksh_s))
    col = jax.lax.broadcasted_iota(jnp.int32, (G, R, 1, 1, P), 4)
    sh = jnp.where(
        col < sh_len.reshape(G, R, 1, 1, 1), sh, NEG_INF
    ).reshape(Ms, K, g, P)
    if k_s is None:
        loc = jnp.einsum(
            "bkgd,bskd->bkgs", qr, k_cache,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * scale
    else:
        loc = jnp.einsum(
            "bkgd,bskd->bkgs", qr.astype(jnp.float32),
            k_cache.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * (scale * _fold_rows(k_s))
    pos = jax.lax.broadcasted_iota(jnp.int32, (Ms, 1, 1, Smax), 3)
    loc = jnp.where(pos <= lengths[:, None, None, None], loc, NEG_INF)
    logits = jnp.concatenate([sh, loc], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    p_sh = probs[..., :P].reshape(G, R, K, g, P)
    vdt = v_cache.dtype if v_s is None else jnp.float32
    if vsh_s is None:
        out_sh = jnp.einsum(
            "Grkgp,Gpkd->Grkgd", p_sh.astype(vdt), v_sh.astype(vdt),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(Ms, K, g, Dh)
    else:
        out_sh = jnp.einsum(
            "Grkgp,Gpkd->Grkgd", p_sh * _fold_gseg(vsh_s),
            v_sh.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(Ms, K, g, Dh)
    if v_s is None:
        out_loc = jnp.einsum(
            "bkgs,bskd->bkgd", probs[..., P:].astype(v_cache.dtype), v_cache,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        out_loc = jnp.einsum(
            "bkgs,bskd->bkgd", probs[..., P:] * _fold_rows(v_s),
            v_cache.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return out_sh + out_loc


def decode_attention_shared_grouped(
    q: jax.Array,
    k_cache,
    v_cache,
    lengths: jax.Array,
    k_sh,
    v_sh,
    sh_len: jax.Array,
    rows_per_prefix: int,
    k_sh2=None,
    v_sh2=None,
    rows_per_prefix2: int = 0,
) -> jax.Array:
    """Decode over [group's shared prefix | local cache]. Row layout:
    [table-1 span | table-2 span (optional) | plain rows]; plain rows (text
    branches with no shared segment) attend their local cache only. All
    cache/segment operands may be int8 (values, scales) tuples."""
    B = q.shape[0]
    k_vals, k_s = _kv_parts(k_cache)
    M1 = _kv_parts(k_sh)[0].shape[0] * rows_per_prefix
    M2 = (
        _kv_parts(k_sh2)[0].shape[0] * rows_per_prefix2
        if k_sh2 is not None else 0
    )
    M = M1 + M2
    _, _, H, Dh = q.shape
    K = k_vals.shape[2]
    group = H // K
    scale = 1.0 / (Dh**0.5)

    qdt = jnp.float32 if k_s is not None else k_vals.dtype
    qr = q[:M].astype(qdt).reshape(M, K, group, Dh)
    out1 = _decode_span_shared(
        qr[:M1], _slice_kv(k_cache, slice(None, M1)),
        _slice_kv(v_cache, slice(None, M1)), lengths[:M1],
        k_sh, v_sh, sh_len[:M1], rows_per_prefix, scale,
    )
    outs = [out1]
    if M2:
        outs.append(
            _decode_span_shared(
                qr[M1:M], _slice_kv(k_cache, slice(M1, M)),
                _slice_kv(v_cache, slice(M1, M)), lengths[M1:M],
                k_sh2, v_sh2, sh_len[M1:M],
                rows_per_prefix2, scale,
            )
        )
    out_m = (
        jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    ).reshape(M, 1, H, Dh).astype(q.dtype)
    if M == B:
        return out_m
    out_r = decode_attention(
        q[M:], _slice_kv(k_cache, slice(M, None)),
        _slice_kv(v_cache, slice(M, None)), lengths[M:],
    )
    return jnp.concatenate([out_m, out_r], axis=0)


# ---------------------------------------------------------------------------
# Pallas flash attention (causal, prefill)
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, block_q, block_k):
    """Grid: (batch*kv_head*group, num_q_blocks, num_k_blocks); k innermost.

    Carries the online-softmax state (m, l, acc) in VMEM scratch across the
    innermost (k) grid dimension — the canonical TPU flash pattern.
    """
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_start = iq * block_q
    k_start = ik * block_k

    # Causal: the whole k block is masked out iff k_start > q_end.
    @pl.when(k_start <= q_start + block_q - 1)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # [block_q, Dh]
        k = k_ref[0].astype(jnp.float32)  # [block_k, Dh]
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [block_q, block_k]

        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_start
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + k_start
        s = jnp.where(col <= row, s, NEG_INF)

        # m/l scratch are [block_q, 128] with the value replicated across all
        # lanes (narrow 1-lane stores are inefficient on TPU).
        m_prev = m_ref[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
        m_new = jnp.maximum(m_prev, m_cur)  # broadcast → [block_q, 128]

        p = jnp.exp(s - m_new[:, :1])  # [block_q, block_k]
        corr = jnp.exp(m_prev - m_new)  # [block_q, 128], lanes equal
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, Dh]
        acc_ref[:] = acc_ref[:] * corr[:, :1] + pv
        m_ref[:] = m_new

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def flash_attention_tpu(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Causal flash attention. q [B,S,H,Dh], k/v [B,S,K,Dh] → [B,S,H,Dh].

    Requires S % block == 0 (callers pad to the sequence bucket anyway) and
    Dh in {64, 128, 256}. GQA is handled by indexing the kv head as h // group
    in the BlockSpec index maps — no materialized head repetition.
    """
    B, S, H, Dh = q.shape
    K = k.shape[2]
    group = H // K
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    assert S % block_q == 0 and S % block_k == 0, (S, block_q, block_k)
    scale = 1.0 / (Dh**0.5)

    # [B,S,H,Dh] -> [B*H, S, Dh] layout for clean blocking
    qt = q.transpose(0, 2, 1, 3).reshape(B * H, S, Dh)
    kt = k.transpose(0, 2, 1, 3).reshape(B * K, S, Dh)
    vt = v.transpose(0, 2, 1, 3).reshape(B * K, S, Dh)

    grid = (B * H, S // block_q, S // block_k)

    def q_index(bh, iq, ik):
        return (bh, iq, 0)

    def kv_index(bh, iq, ik):
        b = bh // H
        h = bh % H
        return (b * K + h // group, ik, 0)

    kernel = functools.partial(
        _flash_kernel, scale=scale, block_q=block_q, block_k=block_k
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh), q_index, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, S, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # m
            pltpu.VMEM((block_q, 128), jnp.float32),  # l
            pltpu.VMEM((block_q, Dh), jnp.float32),  # acc
        ],
        interpret=interpret,
    )(qt, kt, vt)
    return out.reshape(B, H, S, Dh).transpose(0, 2, 1, 3)


def causal_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, impl: str = "auto"
) -> jax.Array:
    """Causal self-attention dispatcher: 'pallas' | 'xla' | 'auto'.

    auto: XLA below 1536 tokens (measured faster on v5e — the S² score
    materialization is cheap there and XLA fuses better), the blockwise
    Pallas flash kernel beyond (where S² memory/traffic dominates)."""
    if impl == "auto":
        use_pallas = (
            _on_tpu()
            and q.shape[1] > 1536
            and q.shape[1] % 128 == 0
            and q.shape[3] in (64, 128, 256)
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        return flash_attention_tpu(q, k, v)
    if impl == "pallas_interpret":
        return flash_attention_tpu(q, k, v, interpret=True)
    return mha_xla(q, k, v, causal=True)
