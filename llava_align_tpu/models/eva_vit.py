"""EVA-CLIP ViT-g vision encoder (InstructBLIP's tower) in functional JAX.

Capability parity: reference experiments/lavis/models/eva_vit.py —
Attention with q/v-only qkv bias (:64-117, bias = [q_bias, 0, v_bias] :122-125),
pre-LN Block (:151-181), PatchEmbed conv (:183-205), VisionTransformer
(:246-352: cls token + abs pos embed, NO final norm — BLIP-2 applies an
external ln_vision). The BLIP-2 config is create_eva_vit_g (:428-439):
patch 14, width 1408, depth 39, heads 16, mlp 4.3637, eps 1e-6.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from llava_align_tpu.ops.attention import mha_xla
from llava_align_tpu.ops.layers import gelu_exact, layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EvaVitConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1408
    num_layers: int = 39
    num_heads: int = 16
    mlp_ratio: float = 4.3637
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def mlp_width(self) -> int:
        return int(self.width * self.mlp_ratio)

    @staticmethod
    def eva_vit_g(image_size: int = 224) -> "EvaVitConfig":
        return EvaVitConfig(image_size=image_size)

    @staticmethod
    def tiny() -> "EvaVitConfig":
        return EvaVitConfig(
            image_size=28, patch_size=14, width=32, num_layers=2, num_heads=2,
            mlp_ratio=2.0, dtype=jnp.float32,
        )


def init(rng: jax.Array, cfg: EvaVitConfig) -> Params:
    ks = jax.random.split(rng, 10)
    W, F, L, P, N = cfg.width, cfg.mlp_width, cfg.num_layers, cfg.patch_size, cfg.num_patches

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / (fan_in**0.5)).astype(cfg.dtype)

    def ln():
        return {"scale": jnp.ones((L, W), cfg.dtype), "bias": jnp.zeros((L, W), cfg.dtype)}

    return {
        "patch_embed": {"w": w(ks[0], (W, 3 * P * P), 3 * P * P), "b": jnp.zeros((W,), cfg.dtype)},
        "cls": w(ks[1], (W,), W),
        "pos_embed": w(ks[2], (1 + N, W), W),
        "layers": {
            "norm1": ln(),
            "qkv_w": w(ks[3], (L, 3 * W, W), W),
            "q_bias": jnp.zeros((L, W), cfg.dtype),
            "v_bias": jnp.zeros((L, W), cfg.dtype),
            "proj": {"w": w(ks[4], (L, W, W), W), "b": jnp.zeros((L, W), cfg.dtype)},
            "norm2": ln(),
            "fc1": {"w": w(ks[5], (L, F, W), W), "b": jnp.zeros((L, F), cfg.dtype)},
            "fc2": {"w": w(ks[6], (L, W, F), F), "b": jnp.zeros((L, W), cfg.dtype)},
        },
    }


def _lin(h, w, b=None):
    out = jnp.einsum("...d,od->...o", h, w, preferred_element_type=h.dtype)
    return out if b is None else out + b


def forward(params: Params, cfg: EvaVitConfig, images: jax.Array) -> jax.Array:
    """images [B, 3, H, W] normalized → [B, 1+N, width] (cls + patches, no
    final norm — reference forward_features returns the raw stream)."""
    B, C = images.shape[0], images.shape[1]
    P, W, H = cfg.patch_size, cfg.width, cfg.num_heads
    eps = cfg.layer_norm_eps

    gh, gw = images.shape[2] // P, images.shape[3] // P
    x = images.astype(cfg.dtype).reshape(B, C, gh, P, gw, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, gh * gw, C * P * P)
    x = _lin(x, params["patch_embed"]["w"], params["patch_embed"]["b"])

    cls = jnp.broadcast_to(params["cls"], (B, 1, W))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(cfg.dtype)

    def layer_fn(h, lp):
        y = layer_norm(h, lp["norm1"]["scale"], lp["norm1"]["bias"], eps)
        # qkv bias = [q_bias, zeros, v_bias] (reference eva_vit.py:122-125)
        qkv_bias = jnp.concatenate(
            [lp["q_bias"], jnp.zeros_like(lp["q_bias"]), lp["v_bias"]], axis=-1
        )
        qkv = _lin(y, lp["qkv_w"], qkv_bias)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        S = y.shape[1]
        attn = mha_xla(
            q.reshape(B, S, H, W // H),
            k.reshape(B, S, H, W // H),
            v.reshape(B, S, H, W // H),
            causal=False,
        ).reshape(B, S, W)
        h = h + _lin(attn, lp["proj"]["w"], lp["proj"]["b"])
        y = layer_norm(h, lp["norm2"]["scale"], lp["norm2"]["bias"], eps)
        y = gelu_exact(_lin(y, lp["fc1"]["w"], lp["fc1"]["b"]))
        h = h + _lin(y, lp["fc2"]["w"], lp["fc2"]["b"])
        return h, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return x
