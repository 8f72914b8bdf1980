"""T5 / Flan-T5 encoder-decoder in functional JAX — BLIP-2's third LLM backend.

Capability parity: reference experiments/lavis/models/blip2_models/
modeling_t5.py (vendored HF T5, used by blip2_t5 / flan-t5 variants):
T5LayerNorm (rms, no bias), UNSCALED attention (no 1/sqrt(d)), bucketed
relative position bias held by layer 0 and shared, causal decoder with
cross-attention, gated-GELU FFN (flan) or ReLU (t5v1.0), optional tied
embedding output scaling.

Interface: `encode` (instruction/image-prefixed encoder stream is built by the
caller as inputs_embeds, matching BLIP-2's usage), `decode_step` with
(self-KV cache, precomputed cross-KV), and a `generate` loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.ops.layers import rms_norm

Params = Dict[str, Any]
NEG = -1e30


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 2048       # flan-t5-xl
    d_kv: int = 64
    num_heads: int = 32
    d_ff: int = 5120
    num_layers: int = 24       # encoder layers
    num_decoder_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    gated_act: bool = True     # flan: gated-gelu; t5 v1.0: relu
    tie_word_embeddings: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv

    @staticmethod
    def flan_t5_xl() -> "T5Config":
        return T5Config()

    @staticmethod
    def tiny(vocab_size: int = 128) -> "T5Config":
        return T5Config(
            vocab_size=vocab_size, d_model=32, d_kv=8, num_heads=4, d_ff=64,
            num_layers=2, num_decoder_layers=2, dtype=jnp.float32,
        )


def relative_position_bucket(
    relative_position: jax.Array,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jax.Array:
    """T5 bucketing of key_pos - query_pos."""
    ret = jnp.zeros_like(relative_position)
    n = relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = -jnp.minimum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def _rel_bias(params_side, cfg: T5Config, q_pos, k_pos, bidirectional):
    """[H, Sq, Sk] from the side's shared rel-attention embedding [B, H]."""
    rel = k_pos[None, :] - q_pos[:, None]
    buckets = relative_position_bucket(
        rel, bidirectional,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    table = params_side["rel_bias"]  # [num_buckets, H]
    return table[buckets].transpose(2, 0, 1).astype(jnp.float32)


def init(rng: jax.Array, cfg: T5Config) -> Params:
    keys = iter(jax.random.split(rng, 200))
    D, I, F, V = cfg.d_model, cfg.inner_dim, cfg.d_ff, cfg.vocab_size

    def w(out_d, in_d):
        return (jax.random.normal(next(keys), (out_d, in_d), jnp.float32) / in_d**0.5).astype(cfg.dtype)

    def attn():
        return {"q": w(I, D), "k": w(I, D), "v": w(I, D), "o": w(D, I)}

    def ffn():
        if cfg.gated_act:
            return {"wi_0": w(F, D), "wi_1": w(F, D), "wo": w(D, F)}
        return {"wi": w(F, D), "wo": w(D, F)}

    def ln():
        return jnp.ones((D,), cfg.dtype)

    def enc_layer():
        return {"ln1": ln(), "attn": attn(), "ln2": ln(), "ffn": ffn()}

    def dec_layer():
        return {"ln1": ln(), "attn": attn(), "ln_x": ln(), "xattn": attn(),
                "ln2": ln(), "ffn": ffn()}

    return {
        "shared": w(V, D),
        "encoder": {
            "rel_bias": w(cfg.relative_attention_num_buckets, cfg.num_heads),
            "layers": [enc_layer() for _ in range(cfg.num_layers)],
            "final_ln": ln(),
        },
        "decoder": {
            "rel_bias": w(cfg.relative_attention_num_buckets, cfg.num_heads),
            "layers": [dec_layer() for _ in range(cfg.num_decoder_layers)],
            "final_ln": ln(),
        },
        "lm_head": w(V, D) if not cfg.tie_word_embeddings else None,
    }


def _lin(h, w):
    return jnp.einsum("...d,od->...o", h, w, preferred_element_type=h.dtype)


def _attention(ap, cfg: T5Config, q_in, k_in, v_in, bias, mask):
    """UNSCALED T5 attention; bias [H,Sq,Sk] or None; mask [B,Sq,Sk] or None."""
    B, Sq, _ = q_in.shape
    Sk = k_in.shape[1]
    H, Dk = cfg.num_heads, cfg.d_kv
    q = _lin(q_in, ap["q"]).reshape(B, Sq, H, Dk)
    k = _lin(k_in, ap["k"]).reshape(B, Sk, H, Dk)
    v = _lin(v_in, ap["v"]).reshape(B, Sk, H, Dk)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if bias is not None:
        scores = scores + bias[None]
    if mask is not None:
        scores = jnp.where(mask[:, None], scores, NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(q_in.dtype)
    return _lin(out.reshape(B, Sq, cfg.inner_dim), ap["o"])


def _ffn(fp, cfg: T5Config, h):
    if cfg.gated_act:
        # T5 'gated-gelu' is gelu_new — the tanh approximation, not erf
        gate = jax.nn.gelu(_lin(h, fp["wi_0"]), approximate=True)
        return _lin(gate * _lin(h, fp["wi_1"]), fp["wo"])
    return _lin(jax.nn.relu(_lin(h, fp["wi"])), fp["wo"])


def encode(
    params: Params, cfg: T5Config, inputs_embeds: jax.Array,
    attention_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """inputs_embeds [B, S, D] (caller embeds tokens/image prefix) → [B, S, D]."""
    B, S, D = inputs_embeds.shape
    enc = params["encoder"]
    pos = jnp.arange(S, dtype=jnp.int32)
    bias = _rel_bias(enc, cfg, pos, pos, bidirectional=True)
    mask = None
    if attention_mask is not None:
        mask = jnp.broadcast_to(attention_mask[:, None, :].astype(bool), (B, S, S))
    x = inputs_embeds
    for lp in enc["layers"]:
        h = rms_norm(x, lp["ln1"], cfg.layer_norm_eps)
        x = x + _attention(lp["attn"], cfg, h, h, h, bias, mask)
        h = rms_norm(x, lp["ln2"], cfg.layer_norm_eps)
        x = x + _ffn(lp["ffn"], cfg, h)
    return rms_norm(x, enc["final_ln"], cfg.layer_norm_eps)


def embed_tokens(params: Params, ids: jax.Array) -> jax.Array:
    V = params["shared"].shape[0]
    return params["shared"][jnp.clip(ids, 0, V - 1)]


def decode(
    params: Params, cfg: T5Config,
    decoder_ids: jax.Array,          # [B, T]
    encoder_hidden: jax.Array,       # [B, S, D]
    encoder_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Full (non-incremental) decoder pass → logits [B, T, V]."""
    B, T = decoder_ids.shape
    S = encoder_hidden.shape[1]
    dec = params["decoder"]
    x = embed_tokens(params, decoder_ids)
    pos = jnp.arange(T, dtype=jnp.int32)
    bias = _rel_bias(dec, cfg, pos, pos, bidirectional=False)
    causal = jnp.tril(jnp.ones((T, T), bool))[None]
    xmask = None
    if encoder_mask is not None:
        xmask = jnp.broadcast_to(encoder_mask[:, None, :].astype(bool), (B, T, S))
    for lp in dec["layers"]:
        h = rms_norm(x, lp["ln1"], cfg.layer_norm_eps)
        x = x + _attention(lp["attn"], cfg, h, h, h, bias, jnp.broadcast_to(causal, (B, T, T)))
        h = rms_norm(x, lp["ln_x"], cfg.layer_norm_eps)
        x = x + _attention(lp["xattn"], cfg, h, encoder_hidden, encoder_hidden, None, xmask)
        h = rms_norm(x, lp["ln2"], cfg.layer_norm_eps)
        x = x + _ffn(lp["ffn"], cfg, h)
    x = rms_norm(x, dec["final_ln"], cfg.layer_norm_eps)
    if cfg.tie_word_embeddings:
        x = x * (cfg.d_model**-0.5)
        head = params["shared"]
    else:
        head = params["lm_head"]
    return jnp.einsum(
        "...d,vd->...v", x.astype(head.dtype), head, preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# incremental decoding (KV cache)
# ---------------------------------------------------------------------------
# Parity: the reference T5 generates through past_key_values — self-attention
# caches extended per step and cross-attention K/V computed once from the
# encoder stream (reference lavis/models/blip2_models/modeling_t5.py,
# T5Attention past_key_value plumbing). Here: one stacked [L, B, Smax, H, Dk]
# self cache pair plus a one-shot cross KV pair, so per-step cost is
# independent of the generated length (the round-1 full re-decode was O(n²)).


def init_self_cache(
    cfg: T5Config, batch: int, max_len: int, dtype: Optional[jnp.dtype] = None
) -> Dict[str, jax.Array]:
    shape = (cfg.num_decoder_layers, batch, max_len, cfg.num_heads, cfg.d_kv)
    dtype = dtype or cfg.dtype
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def precompute_cross_kv(
    params: Params, cfg: T5Config, encoder_hidden: jax.Array
) -> Dict[str, jax.Array]:
    """Cross-attention K/V for every decoder layer, computed once per prompt:
    [L, B, S, H, Dk] pairs."""
    B, S, _ = encoder_hidden.shape
    H, Dk = cfg.num_heads, cfg.d_kv
    ks, vs = [], []
    for lp in params["decoder"]["layers"]:
        ks.append(_lin(encoder_hidden, lp["xattn"]["k"]).reshape(B, S, H, Dk))
        vs.append(_lin(encoder_hidden, lp["xattn"]["v"]).reshape(B, S, H, Dk))
    return {"k": jnp.stack(ks), "v": jnp.stack(vs)}


def decode_step(
    params: Params, cfg: T5Config,
    token_ids: jax.Array,            # [B] int32 — current decoder input token
    t: jax.Array,                    # scalar int32 — its position (0-based)
    cache: Dict[str, jax.Array],     # self-attention cache, init_self_cache
    cross_kv: Dict[str, jax.Array],  # precompute_cross_kv
    encoder_mask: Optional[jax.Array] = None,  # [B, S]
):
    """One decoder step → (logits [B, V] fp32, updated cache)."""
    B = token_ids.shape[0]
    H, Dk = cfg.num_heads, cfg.d_kv
    dec = params["decoder"]
    Smax = cache["k"].shape[2]
    S = cross_kv["k"].shape[2]
    x = embed_tokens(params, token_ids[:, None])  # [B, 1, D]

    k_pos = jnp.arange(Smax, dtype=jnp.int32)
    bias = _rel_bias(dec, cfg, t[None], k_pos, bidirectional=False)  # [H,1,Smax]
    self_mask = (k_pos <= t)[None, None, None, :]  # [1,1,1,Smax]
    xmask = None
    if encoder_mask is not None:
        xmask = encoder_mask[:, None, None, :].astype(bool)  # [B,1,1,S]

    kc, vc = cache["k"], cache["v"]
    for li, lp in enumerate(dec["layers"]):
        h = rms_norm(x, lp["ln1"], cfg.layer_norm_eps)
        q = _lin(h, lp["attn"]["q"]).reshape(B, 1, H, Dk)
        k_new = _lin(h, lp["attn"]["k"]).reshape(B, H, Dk)
        v_new = _lin(h, lp["attn"]["v"]).reshape(B, H, Dk)
        kc = kc.at[li, :, t].set(k_new)
        vc = vc.at[li, :, t].set(v_new)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, kc[li],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + bias[None]  # unscaled + rel bias, T5 semantics
        scores = jnp.where(self_mask, scores, NEG)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(vc.dtype), vc[li],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(x.dtype)
        x = x + _lin(attn.reshape(B, 1, cfg.inner_dim), lp["attn"]["o"])

        h = rms_norm(x, lp["ln_x"], cfg.layer_norm_eps)
        q = _lin(h, lp["xattn"]["q"]).reshape(B, 1, H, Dk)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, cross_kv["k"][li],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # no bias on cross-attention
        if xmask is not None:
            scores = jnp.where(xmask, scores, NEG)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(cross_kv["v"].dtype), cross_kv["v"][li],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(x.dtype)
        x = x + _lin(attn.reshape(B, 1, cfg.inner_dim), lp["xattn"]["o"])

        h = rms_norm(x, lp["ln2"], cfg.layer_norm_eps)
        x = x + _ffn(lp["ffn"], cfg, h)

    x = rms_norm(x, dec["final_ln"], cfg.layer_norm_eps)
    if cfg.tie_word_embeddings:
        x = x * (cfg.d_model**-0.5)
        head = params["shared"]
    else:
        head = params["lm_head"]
    logits = jnp.einsum(
        "bqd,vd->bqv", x.astype(head.dtype), head, preferred_element_type=jnp.float32
    )[:, 0]
    return logits, {"k": kc, "v": vc}


def generate_greedy(
    params: Params, cfg: T5Config,
    encoder_hidden: jax.Array,
    encoder_mask: Optional[jax.Array] = None,
    *, max_new_tokens: int = 32, decoder_start_token_id: int = 0, eos_token_id: int = 1,
):
    """Greedy decode via the incremental KV-cache path: per-step cost is
    independent of generated length. Returns List[List[int]]."""
    B = encoder_hidden.shape[0]
    cache = init_self_cache(cfg, B, max_new_tokens)
    cross_kv = jax.jit(
        lambda p, e: precompute_cross_kv(p, cfg, e)
    )(params, encoder_hidden)
    step = jax.jit(
        lambda p, tok, t, c, x, m: decode_step(p, cfg, tok, t, c, x, m),
        donate_argnums=(3,),
    )
    token = np.full((B,), decoder_start_token_id, np.int32)
    done = np.zeros((B,), bool)
    rows = []
    for t in range(max_new_tokens):
        logits, cache = step(
            params, jnp.asarray(token), jnp.asarray(t, jnp.int32),
            cache, cross_kv, encoder_mask,
        )
        nxt = np.asarray(logits.argmax(-1)).astype(np.int32)
        nxt = np.where(done, eos_token_id, nxt)
        rows.append(nxt)
        done |= nxt == eos_token_id
        token = nxt
        if done.all():
            break
    ids = np.stack(rows, axis=1) if rows else np.zeros((B, 0), np.int32)
    out = []
    for b in range(B):
        row = ids[b].tolist()
        if eos_token_id in row:
            row = row[: row.index(eos_token_id)]
        out.append(row)
    return out
