"""CLIP ViT vision tower in functional JAX.

Capability parity: HF CLIPVisionModel as wrapped by the reference
(experiments/llava/model/multimodal_encoder/clip_encoder.py). Feature
selection (`select_layer`, 'patch'/'cls_patch') matches clip_encoder.py:29-37:
hidden_states[k] is the residual stream AFTER k encoder layers, before the
final post-layernorm — so select_layer=-2 runs num_layers-1 layers.

TPU-first choices: the patchify conv (stride == kernel) is a reshape +
one [B*N, P*P*3] x [P*P*3, D] matmul (pure MXU work, no conv windows);
layers are stacked and scanned.

Param tree (linear kernels [in, out]):
    cls            [D]
    patch_embed    [P*P*3, D]
    pos_embed      [1+N, D]
    pre_ln         {scale[D], bias[D]}
    layers/ln1     {scale[L,D], bias[L,D]}
    layers/{q,k,v,o}        kernel [L,D,D], bias [L,D]
    layers/ln2     {scale[L,D], bias[L,D]}
    layers/fc1     kernel [L,D,F], bias [L,F]
    layers/fc2     kernel [L,F,D], bias [L,D]
    post_ln        {scale[D], bias[D]}   (kept for checkpoint parity; unused
                                          when select_layer < 0)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from llava_align_tpu.config import ClipVisionConfig
from llava_align_tpu.ops.attention import mha_xla
from llava_align_tpu.ops.layers import layer_norm, quick_gelu

Params = Dict[str, Any]


def init(rng: jax.Array, cfg: ClipVisionConfig) -> Params:
    ks = jax.random.split(rng, 10)
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    P = cfg.patch_size
    N = cfg.num_patches

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / (fan_in**0.5)).astype(cfg.dtype)

    def ln(n=None):
        shape = (L, D) if n == "stacked" else (D,)
        return {"scale": jnp.ones(shape, cfg.dtype), "bias": jnp.zeros(shape, cfg.dtype)}

    return {
        "cls": w(ks[0], (D,), D),
        "patch_embed": w(ks[1], (P * P * 3, D), P * P * 3),
        "pos_embed": w(ks[2], (1 + N, D), D),
        "pre_ln": ln(),
        "layers": {
            "ln1": ln("stacked"),
            "q": {"kernel": w(ks[3], (L, D, D), D), "bias": jnp.zeros((L, D), cfg.dtype)},
            "k": {"kernel": w(ks[4], (L, D, D), D), "bias": jnp.zeros((L, D), cfg.dtype)},
            "v": {"kernel": w(ks[5], (L, D, D), D), "bias": jnp.zeros((L, D), cfg.dtype)},
            "o": {"kernel": w(ks[6], (L, D, D), D), "bias": jnp.zeros((L, D), cfg.dtype)},
            "ln2": ln("stacked"),
            "fc1": {"kernel": w(ks[7], (L, D, F), D), "bias": jnp.zeros((L, F), cfg.dtype)},
            "fc2": {"kernel": w(ks[8], (L, F, D), F), "bias": jnp.zeros((L, D), cfg.dtype)},
        },
        "post_ln": ln(),
    }


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """[B, 3, H, W] → [B, N, P*P*3] with channel-major patch layout matching
    a torch Conv2d(3, D, P, stride=P) flattened kernel."""
    B, C, H, W = images.shape
    P = patch_size
    gh, gw = H // P, W // P
    x = images.reshape(B, C, gh, P, gw, P)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, C, P, P]
    return x.reshape(B, gh * gw, C * P * P)


def forward_features(
    params: Params, cfg: ClipVisionConfig, images: jax.Array
) -> jax.Array:
    """images [B, 3, H, W] normalized → selected features.

    'patch'    → [B, N, D]      (reference clip_encoder.py:31-32)
    'cls_patch'→ [B, 1+N, D]
    """
    B = images.shape[0]
    D, L = cfg.hidden_size, cfg.num_layers
    H = cfg.num_heads

    patches = patchify(images.astype(cfg.dtype), cfg.patch_size)
    x = jnp.dot(patches, params["patch_embed"], preferred_element_type=jnp.float32).astype(cfg.dtype)
    cls = jnp.broadcast_to(params["cls"], (B, 1, D))
    x = jnp.concatenate([cls, x], axis=1)  # [B, 1+N, D]
    x = x + params["pos_embed"]
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"], cfg.layer_norm_eps)

    sl = cfg.select_layer
    run_layers = L + 1 + sl if sl < 0 else sl
    assert 0 < run_layers <= L, (sl, L)

    def layer_fn(h, lp):
        y = layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps)
        S = y.shape[1]
        q = (y @ lp["q"]["kernel"] + lp["q"]["bias"]).reshape(B, S, H, D // H)
        k = (y @ lp["k"]["kernel"] + lp["k"]["bias"]).reshape(B, S, H, D // H)
        v = (y @ lp["v"]["kernel"] + lp["v"]["bias"]).reshape(B, S, H, D // H)
        attn = mha_xla(q, k, v, causal=False).reshape(B, S, D)
        h = h + attn @ lp["o"]["kernel"] + lp["o"]["bias"]
        y = layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
        y = quick_gelu(y @ lp["fc1"]["kernel"] + lp["fc1"]["bias"])
        h = h + y @ lp["fc2"]["kernel"] + lp["fc2"]["bias"]
        return h, None

    sliced = jax.tree_util.tree_map(lambda a: a[:run_layers], params["layers"])
    x, _ = jax.lax.scan(layer_fn, x, sliced)

    if cfg.select_feature == "patch":
        return x[:, 1:]
    if cfg.select_feature == "cls_patch":
        return x
    raise ValueError(f"Unexpected select feature: {cfg.select_feature}")
