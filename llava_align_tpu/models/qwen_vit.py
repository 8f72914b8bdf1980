"""Qwen-VL visual encoder: OpenCLIP-style ViT + perceiver Resampler.

Capability parity: reference experiments/Qwen_VL/visual.py —
VisionTransformer (:332-414: bias-free conv patchify, 256-entry pos embed
bicubic-interpolated to the patch grid :23-39, ln_pre, 48 pre-LN GELU blocks
with packed in_proj attention :159-297), Resampler (:92-156: 256 learned
queries + fixed 2D sin-cos pos embeddings :42-89, cross-attention via
torch-style MultiheadAttention), ln_post + output projection (:389-412).

Positional-embedding interpolation to the target grid happens at weight-
conversion / init time (static shapes), not per forward.

Param tree (linear kernels [out, in] like models/qwen.py):
    conv          [width, 3*P*P]
    pos_embed     [N, width]         (already at target grid)
    ln_pre / ln_post {scale, bias}
    layers/ln_1 {s[L,W], b}, layers/in_proj {w [L,3W,W], b [L,3W]},
    layers/out_proj {w [L,W,W], b}, layers/ln_2, layers/c_fc {w [L,F,W], b},
    layers/c_proj {w [L,W,F], b}
    resampler/query [Q, E], resampler/pos_q [Q, E], resampler/pos_kv [N, E],
    resampler/kv_proj [E, W], resampler/ln_q {s,b}, resampler/ln_kv {s,b},
    resampler/in_proj {w [3E,E], b}, resampler/out_proj {w [E,E], b}
    proj          [E, E_out]
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.ops.attention import mha_xla
from llava_align_tpu.ops.layers import gelu_exact, layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class QwenVisionConfig:
    image_size: int = 448
    patch_size: int = 14
    width: int = 1664
    num_layers: int = 48
    num_heads: int = 16
    mlp_ratio: float = 4.9231
    n_queries: int = 256
    output_dim: int = 4096
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid**2

    @property
    def mlp_width(self) -> int:
        return int(self.width * self.mlp_ratio)

    @staticmethod
    def qwen_vl() -> "QwenVisionConfig":
        return QwenVisionConfig()

    @staticmethod
    def tiny() -> "QwenVisionConfig":
        return QwenVisionConfig(
            image_size=56, patch_size=14, width=32, num_layers=2, num_heads=2,
            mlp_ratio=2.0, n_queries=4, output_dim=48, dtype=jnp.float32,
        )


def sincos_2d_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """Fixed 2D sin-cos position embedding [grid^2, embed_dim]
    (reference visual.py:42-89; w-coordinate first in the meshgrid)."""

    def one_dim(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first
    emb_h = one_dim(embed_dim // 2, grid[0])
    emb_w = one_dim(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def interpolate_pos_embed(abs_pos: np.ndarray, tgt_len: int) -> np.ndarray:
    """Bicubic grid interpolation of [S*S, C] → [T*T, C] matching
    torch F.interpolate(mode='bicubic', align_corners=False)
    (reference visual.py:23-39). Uses torch at conversion time for exactness,
    falling back to jax.image.resize."""
    src = int(math.sqrt(abs_pos.shape[0]))
    tgt = int(math.sqrt(tgt_len))
    if src == tgt:
        return abs_pos
    try:
        import torch
        import torch.nn.functional as F

        t = torch.from_numpy(np.asarray(abs_pos, np.float32))
        t = t.reshape(1, src, src, -1).permute(0, 3, 1, 2)
        t = F.interpolate(t, size=(tgt, tgt), mode="bicubic", align_corners=False)
        return t.permute(0, 2, 3, 1).reshape(tgt * tgt, -1).numpy()
    except ImportError:
        x = jnp.asarray(abs_pos).reshape(src, src, -1)
        x = jax.image.resize(x, (tgt, tgt, x.shape[-1]), method="bicubic")
        return np.asarray(x.reshape(tgt * tgt, -1))


def init(rng: jax.Array, cfg: QwenVisionConfig) -> Params:
    ks = jax.random.split(rng, 12)
    W, F, L, E = cfg.width, cfg.mlp_width, cfg.num_layers, cfg.output_dim
    P, N, Q = cfg.patch_size, cfg.num_patches, cfg.n_queries

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / (fan_in**0.5)).astype(cfg.dtype)

    def ln(stacked=False):
        shape = (L, W) if stacked else (W,)
        return {"scale": jnp.ones(shape, cfg.dtype), "bias": jnp.zeros(shape, cfg.dtype)}

    def lnE():
        return {"scale": jnp.ones((E,), cfg.dtype), "bias": jnp.zeros((E,), cfg.dtype)}

    # pos embeds at target grids, as the converter would produce
    pos_vit = interpolate_pos_embed(
        np.asarray(jax.random.normal(ks[0], (256, W)), np.float32) * W**-0.5, N
    )
    q_grid = int(math.sqrt(Q))
    sincos = sincos_2d_pos_embed(E, q_grid)
    pos_kv = interpolate_pos_embed(sincos, N)

    return {
        "conv": w(ks[1], (W, 3 * P * P), 3 * P * P),
        "pos_embed": jnp.asarray(pos_vit, cfg.dtype),
        "ln_pre": ln(),
        "layers": {
            "ln_1": ln(True),
            "in_proj": {"w": w(ks[2], (L, 3 * W, W), W), "b": jnp.zeros((L, 3 * W), cfg.dtype)},
            "out_proj": {"w": w(ks[3], (L, W, W), W), "b": jnp.zeros((L, W), cfg.dtype)},
            "ln_2": ln(True),
            "c_fc": {"w": w(ks[4], (L, F, W), W), "b": jnp.zeros((L, F), cfg.dtype)},
            "c_proj": {"w": w(ks[5], (L, W, F), F), "b": jnp.zeros((L, W), cfg.dtype)},
        },
        "resampler": {
            "query": w(ks[6], (Q, E), E),
            "pos_q": jnp.asarray(sincos, cfg.dtype),
            "pos_kv": jnp.asarray(pos_kv, cfg.dtype),
            "kv_proj": w(ks[7], (E, W), W),
            "ln_q": lnE(),
            "ln_kv": lnE(),
            "in_proj": {"w": w(ks[8], (3 * E, E), E), "b": jnp.zeros((3 * E,), cfg.dtype)},
            "out_proj": {"w": w(ks[9], (E, E), E), "b": jnp.zeros((E,), cfg.dtype)},
        },
        "ln_post": lnE(),
        "proj": w(ks[10], (E, E), E),
    }


def _lin(h, w, b=None):
    out = jnp.einsum("...d,od->...o", h, w, preferred_element_type=h.dtype)
    return out if b is None else out + b


def _resampler(params: Params, cfg: QwenVisionConfig, x: jax.Array) -> jax.Array:
    """Cross-attend Q learned queries over the N patch features
    (reference visual.py:139-153; MultiheadAttention with packed in_proj)."""
    rp = params["resampler"]
    B = x.shape[0]
    E = cfg.output_dim
    H = E // 128  # reference: num_heads = output_dim // 128
    if H == 0:
        H = 1
    eps = cfg.layer_norm_eps

    kv = _lin(x, rp["kv_proj"])  # [B, N, E]
    kv = layer_norm(kv, rp["ln_kv"]["scale"], rp["ln_kv"]["bias"], eps)
    q = layer_norm(rp["query"], rp["ln_q"]["scale"], rp["ln_q"]["bias"], eps)  # [Q, E]

    q_in = q + rp["pos_q"].astype(q.dtype)              # queries + own sincos
    k_in = kv + rp["pos_kv"].astype(kv.dtype)           # keys + interpolated sincos
    v_in = kv                                           # values without pos

    wq, wk, wv = jnp.split(rp["in_proj"]["w"], 3, axis=0)
    bq, bk, bv = jnp.split(rp["in_proj"]["b"], 3, axis=0)
    Dh = E // H
    qh = (_lin(q_in, wq, bq)[None].repeat(B, 0)).reshape(B, -1, H, Dh)
    kh = _lin(k_in, wk, bk).reshape(B, -1, H, Dh)
    vh = _lin(v_in, wv, bv).reshape(B, -1, H, Dh)
    attn = mha_xla(qh, kh, vh, causal=False).reshape(B, -1, E)
    return _lin(attn, rp["out_proj"]["w"], rp["out_proj"]["b"])


def forward(params: Params, cfg: QwenVisionConfig, images: jax.Array) -> jax.Array:
    """images [B, 3, H, W] normalized → [B, n_queries, output_dim]."""
    B = images.shape[0]
    P, W, H = cfg.patch_size, cfg.width, cfg.num_heads
    eps = cfg.layer_norm_eps

    # patchify (conv stride == kernel → reshape + matmul)
    C = images.shape[1]
    gh = images.shape[2] // P
    gw = images.shape[3] // P
    x = images.astype(cfg.dtype).reshape(B, C, gh, P, gw, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, gh * gw, C * P * P)
    x = _lin(x, params["conv"])  # [B, N, W]

    x = x + params["pos_embed"].astype(x.dtype)
    x = layer_norm(x, params["ln_pre"]["scale"], params["ln_pre"]["bias"], eps)

    def layer_fn(h, lp):
        y = layer_norm(h, lp["ln_1"]["scale"], lp["ln_1"]["bias"], eps)
        qkv = _lin(y, lp["in_proj"]["w"], lp["in_proj"]["b"])
        S = y.shape[1]
        # VisualAttention packs in_proj PER HEAD: [np, 3*hn] with q/k/v
        # interleaved inside each head block (reference visual.py:196-204) —
        # not the torch-MHA [q;k;v] block layout.
        qkv = qkv.reshape(B, S, H, 3, W // H)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        attn = mha_xla(q, k, v, causal=False).reshape(B, S, W)
        h = h + _lin(attn, lp["out_proj"]["w"], lp["out_proj"]["b"])
        y = layer_norm(h, lp["ln_2"]["scale"], lp["ln_2"]["bias"], eps)
        y = gelu_exact(_lin(y, lp["c_fc"]["w"], lp["c_fc"]["b"]))
        h = h + _lin(y, lp["c_proj"]["w"], lp["c_proj"]["b"])
        return h, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])

    x = _resampler(params, cfg, x)  # [B, Q, E]
    x = layer_norm(x, params["ln_post"]["scale"], params["ln_post"]["bias"], eps)
    return jnp.einsum("...d,de->...e", x, params["proj"].astype(x.dtype))
