"""OPT decoder in functional JAX — BLIP-2's alternative LLM backend.

Capability parity: reference experiments/lavis/models/blip2_models/
modeling_opt.py (vendored HF OPT): learned positional embeddings with the
+2 offset, pre-LN decoder layers (do_layer_norm_before=True, the config every
BLIP-2 OPT uses), ReLU MLP, biased linears, final_layer_norm, tied lm head.

Same TPU structure as models/llama.py: stacked [L, out, in] weights,
scan-carry in-place KV cache.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llava_align_tpu.ops.attention import causal_attention, decode_attention
from llava_align_tpu.ops.layers import layer_norm

Params = Dict[str, Any]

POS_OFFSET = 2  # OPT's learned-position quirk


@dataclasses.dataclass(frozen=True)
class OptConfig:
    vocab_size: int = 50272
    hidden_size: int = 2560  # opt-2.7b
    num_layers: int = 32
    num_heads: int = 32
    ffn_dim: int = 10240
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def opt_2_7b() -> "OptConfig":
        return OptConfig()

    @staticmethod
    def tiny(vocab_size: int = 256) -> "OptConfig":
        return OptConfig(
            vocab_size=vocab_size, hidden_size=64, num_layers=2, num_heads=4,
            ffn_dim=128, max_position_embeddings=128, dtype=jnp.float32,
        )


def init(rng: jax.Array, cfg: OptConfig) -> Params:
    ks = jax.random.split(rng, 10)
    D, F, L, V = cfg.hidden_size, cfg.ffn_dim, cfg.num_layers, cfg.vocab_size

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / (fan_in**0.5)).astype(cfg.dtype)

    def dense(key, out_d, in_d):
        return {"w": w(key, (L, out_d, in_d), in_d), "b": jnp.zeros((L, out_d), cfg.dtype)}

    def ln():
        return {"scale": jnp.ones((L, D), cfg.dtype), "bias": jnp.zeros((L, D), cfg.dtype)}

    return {
        "embed_tokens": w(ks[0], (V, D), D),
        "embed_positions": w(ks[1], (cfg.max_position_embeddings + POS_OFFSET, D), D),
        "layers": {
            "attn_ln": ln(),
            "q": dense(ks[2], D, D),
            "k": dense(ks[3], D, D),
            "v": dense(ks[4], D, D),
            "out": dense(ks[5], D, D),
            "ffn_ln": ln(),
            "fc1": dense(ks[6], F, D),
            "fc2": dense(ks[7], D, F),
        },
        "final_ln": {"scale": jnp.ones((D,), cfg.dtype), "bias": jnp.zeros((D,), cfg.dtype)},
    }


def init_cache(cfg: OptConfig, batch: int, max_len: int) -> Dict[str, jax.Array]:
    shape = (cfg.num_layers, batch, max_len, cfg.num_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}


def embed_tokens(params: Params, ids: jax.Array) -> jax.Array:
    V = params["embed_tokens"].shape[0]
    return params["embed_tokens"][jnp.clip(ids, 0, V - 1)]


def _write_cache_full(cache_full, new, layer_idx, offsets, is_decode, row_offset=0):
    B = new.shape[0]
    if is_decode:
        return cache_full.at[layer_idx, row_offset + jnp.arange(B), offsets].set(new[:, 0])
    return jax.lax.dynamic_update_slice(
        cache_full, new[None], (layer_idx, row_offset, 0, 0, 0)
    )


def forward(
    params: Params,
    cfg: OptConfig,
    embeds: jax.Array,
    positions: jax.Array,
    cache: Optional[Dict[str, jax.Array]] = None,
    cache_offset: Optional[jax.Array] = None,
    *,
    attn_impl: str = "xla",
    cache_row_offset: int = 0,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    B, S, D = embeds.shape
    H, Dh = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    if cache_offset is None:
        cache_offset = jnp.zeros((B,), jnp.int32)
    is_decode = cache is not None and S == 1

    x = embeds + params["embed_positions"][positions + POS_OFFSET]

    def _lin(h, p):
        out = jax.lax.dot_general(
            h, p["w"], (((2,), (1,)), ((), ())), preferred_element_type=h.dtype
        )
        return out + p["b"]

    def layer_fn(x, lp, k_full, v_full, li):
        h = layer_norm(x, lp["attn_ln"]["scale"], lp["attn_ln"]["bias"], eps)
        q = _lin(h, lp["q"]).reshape(B, S, H, Dh)
        k = _lin(h, lp["k"]).reshape(B, S, H, Dh)
        v = _lin(h, lp["v"]).reshape(B, S, H, Dh)
        if cache is not None:
            k_full = _write_cache_full(k_full, k, li, cache_offset, is_decode, cache_row_offset)
            v_full = _write_cache_full(v_full, v, li, cache_offset, is_decode, cache_row_offset)
        if is_decode:
            k_s = jax.lax.dynamic_index_in_dim(k_full, li, 0, keepdims=False)
            v_s = jax.lax.dynamic_index_in_dim(v_full, li, 0, keepdims=False)
            attn = decode_attention(q, k_s, v_s, cache_offset)
        else:
            attn = causal_attention(q, k, v, impl=attn_impl)
        x = x + _lin(attn.reshape(B, S, D), lp["out"])

        h = layer_norm(x, lp["ffn_ln"]["scale"], lp["ffn_ln"]["bias"], eps)
        h = jax.nn.relu(_lin(h, lp["fc1"]))
        x = x + _lin(h, lp["fc2"])
        return x, k_full, v_full

    if cache is not None:
        def scan_body(carry, lp):
            x, kf, vf, li = carry
            x, kf, vf = layer_fn(x, lp, kf, vf, li)
            return (x, kf, vf, li + 1), None

        (x, kf, vf, _), _ = jax.lax.scan(
            scan_body, (x, cache["k"], cache["v"], jnp.asarray(0, jnp.int32)),
            params["layers"],
        )
        new_cache = {"k": kf, "v": vf}
    else:
        def scan_body(x, lp):
            x, _, _ = layer_fn(x, lp, None, None, None)
            return x, None

        x, _ = jax.lax.scan(scan_body, x, params["layers"])
        new_cache = None

    hidden = layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"], eps)
    return hidden, new_cache


def logits_from_hidden(params: Params, hidden: jax.Array) -> jax.Array:
    """Tied lm head (OPT ties to embed_tokens)."""
    w = params["embed_tokens"]
    return jnp.einsum(
        "...d,vd->...v", hidden.astype(w.dtype), w, preferred_element_type=jnp.float32
    )
