"""TimeSformer: divided space-time attention video transformer.

Capability parity: the reference's vendored LAVIS TimeSformer
(lavis/models/timesformer/vit.py — ALPRO's video encoder). Each block runs
(1) temporal attention over the frame axis per spatial location, projected
by `temporal_fc` (vit.py:210-223), (2) spatial attention per frame with the
cls token replicated per frame and frame-averaged on the way out
(vit.py:226-249), (3) an MLP over all tokens (vit.py:251-260). The
`forward_features` wrapper time-averages patch tokens to [B, 1+N, D]
(vit.py:596-612). The reference's own experiments never execute ALPRO
(SURVEY §2.4); provided for zoo completeness.

TPU-first: patches carried as [B, N, T, D] (the reference's `(h w t)`
flattening), both attentions as batched einsum-MHA reshapes — no python
loops over frames — and the block stack under lax.scan over stacked
[L, ...] params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from llava_align_tpu.ops.layers import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TimeSformerConfig:
    image_size: int = 224
    patch_size: int = 16
    num_frames: int = 8
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def ffn_dim(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @staticmethod
    def tiny() -> "TimeSformerConfig":
        return TimeSformerConfig(
            image_size=32, patch_size=16, num_frames=3, hidden_size=32,
            num_layers=2, num_heads=4,
        )


def init(rng: jax.Array, cfg: TimeSformerConfig) -> Params:
    ks = iter(jax.random.split(rng, 16))
    D, F, L, N, T = (cfg.hidden_size, cfg.ffn_dim, cfg.num_layers,
                     cfg.num_patches, cfg.num_frames)

    def w(shape, fan):
        return (jax.random.normal(next(ks), shape, jnp.float32) / fan**0.5).astype(cfg.dtype)

    def lin(o, i):
        return {"w": w((L, o, i), i), "b": jnp.zeros((L, o), cfg.dtype)}

    def ln():
        return {"scale": jnp.ones((L, D), cfg.dtype), "bias": jnp.zeros((L, D), cfg.dtype)}

    return {
        "cls": w((1, 1, D), D),
        "pos": w((1, N + 1, D), D),
        "time": w((1, T, D), D),
        "patch": {"w": w((D, 3, cfg.patch_size, cfg.patch_size), 3 * cfg.patch_size**2),
                  "b": jnp.zeros((D,), cfg.dtype)},
        "layers": {
            "t_ln": ln(), "t_qkv": lin(3 * D, D), "t_proj": lin(D, D),
            "t_fc": lin(D, D),
            "ln1": ln(), "qkv": lin(3 * D, D), "proj": lin(D, D),
            "ln2": ln(), "fc1": lin(F, D), "fc2": lin(D, F),
        },
        "final_ln": {"scale": jnp.ones((D,), cfg.dtype), "bias": jnp.zeros((D,), cfg.dtype)},
    }


def _lin(h, p):
    return jnp.einsum("...d,od->...o", h, p["w"], preferred_element_type=h.dtype) + p["b"]


def _self_attn(x, qkv_p, proj_p, H):
    """x [B, S, D] → MHA(x) [B, S, D]; fp32 softmax."""
    B, S, D = x.shape
    Dh = D // H
    q, k, v = jnp.split(_lin(x, qkv_p), 3, axis=-1)
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q.reshape(B, S, H, Dh), k.reshape(B, S, H, Dh),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / (Dh**0.5)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v.reshape(B, S, H, Dh),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(x.dtype).reshape(B, S, D)
    return _lin(o, proj_p)


def forward_features(
    params: Params, cfg: TimeSformerConfig,
    pixels: jax.Array,            # [B, 3, T, H, W]
    *,
    pool_frames: bool = True,
) -> jax.Array:
    """→ [B, 1+N, D] (frame-averaged, the ALPRO surface) or the full
    [B, 1+N*T, D] in the reference's (n t) layout when pool_frames=False."""
    B = pixels.shape[0]
    D, H, T, N = cfg.hidden_size, cfg.num_heads, cfg.num_frames, cfg.num_patches
    eps = cfg.layer_norm_eps

    frames = pixels.transpose(0, 2, 1, 3, 4).reshape(-1, *pixels.shape[-3:])  # [(B T),3,H,W]
    x = jax.lax.conv_general_dilated(
        frames.astype(cfg.dtype), params["patch"]["w"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    x = x.reshape(B * T, D, -1).transpose(0, 2, 1) + params["patch"]["b"]  # [(B T), N, D]
    x = x + params["pos"][:, 1:]
    # cls rows are identical across (b, t) at this point (vit.py:414-433):
    # cls param + its positional embedding, one per batch row
    cls = jnp.broadcast_to(params["cls"] + params["pos"][:, :1], (B, 1, D))
    # patches: [(B T), N, D] → [B, N, T, D], add time embedding over T
    xp = x.reshape(B, T, N, D).transpose(0, 2, 1, 3) + params["time"][0]

    def body(carry, lp):
        cls, xp = carry
        # --- temporal attention over T per (b, n) (vit.py:211-223)
        h = layer_norm(xp, lp["t_ln"]["scale"], lp["t_ln"]["bias"], eps)
        a = _self_attn(h.reshape(B * N, T, D), lp["t_qkv"], lp["t_proj"], H)
        res_t = _lin(a.reshape(B, N, T, D), lp["t_fc"])
        xt = xp + res_t
        # --- spatial attention per (b, t) with replicated cls (vit.py:226-246)
        cls_rep = jnp.broadcast_to(cls[:, None], (B, T, 1, D)).reshape(B * T, 1, D)
        xs = xt.transpose(0, 2, 1, 3).reshape(B * T, N, D)          # [(B T), N, D]
        xs = jnp.concatenate([cls_rep, xs], axis=1)                  # [(B T), 1+N, D]
        h = layer_norm(xs, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
        a = _self_attn(h, lp["qkv"], lp["proj"], H)
        cls_out = a[:, 0].reshape(B, T, D).mean(axis=1, keepdims=True)  # frame-avg
        res_s = a[:, 1:].reshape(B, T, N, D).transpose(0, 2, 1, 3)
        new_cls = cls + cls_out
        new_xp = xt + res_s
        # --- MLP over all tokens (vit.py:249-260)
        h = layer_norm(new_cls, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
        new_cls = new_cls + _lin(jax.nn.gelu(_lin(h, lp["fc1"]), approximate=False), lp["fc2"])
        h = layer_norm(new_xp, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
        new_xp = new_xp + _lin(jax.nn.gelu(_lin(h, lp["fc1"]), approximate=False), lp["fc2"])
        return (new_cls, new_xp), None

    (cls, xp), _ = jax.lax.scan(body, (cls, xp), params["layers"])

    # reference order: final norm first (vit.py:459), then the TimeSformer
    # wrapper time-averages patch tokens (vit.py:596-612)
    fl = params["final_ln"]
    cls = layer_norm(cls, fl["scale"], fl["bias"], eps)
    xp = layer_norm(xp, fl["scale"], fl["bias"], eps)
    if pool_frames:
        return jnp.concatenate([cls, xp.mean(axis=2)], axis=1)       # [B, 1+N, D]
    full = xp.reshape(B, N * T, D)                                   # (n t) layout
    return jnp.concatenate([cls, full], axis=1)                      # [B, 1+N*T, D]
