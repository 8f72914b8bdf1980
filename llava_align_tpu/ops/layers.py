"""Elementwise / norm / position-embedding primitives.

All functions are jit-friendly pure functions. Norms and softmax accumulate in
float32 regardless of activation dtype (bf16 on TPU) — the parity-critical
numeric policy (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    """LLaMA RMSNorm: x * rsqrt(mean(x^2) + eps) * scale, fp32 accumulation."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def gelu_exact(x: jax.Array) -> jax.Array:
    """erf-based GELU, matching torch.nn.GELU() default (the projector's
    activation, reference multimodal_projector/builder.py:44)."""
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Rotary position embeddings (HF LLaMA "rotate_half" convention, so converted
# HF weights produce identical activations).
# ---------------------------------------------------------------------------


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float
) -> tuple[jax.Array, jax.Array]:
    """positions [..., S] int32 → cos, sin each [..., S, head_dim] float32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., S, Dh/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, S, H, Dh]; cos/sin [B, S, Dh] → same shape/dtype as x."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-x32[..., half:], x32[..., :half]], axis=-1)
    cos_b = cos[..., None, :]  # broadcast over heads
    sin_b = sin[..., None, :]
    return (x32 * cos_b + rotated * sin_b).astype(dtype)


def linear_bias(x: jax.Array, p) -> jax.Array:
    """x @ W.T + b for torch-layout params {"w": [out, in], "b": [out]} —
    the shared Linear used across the LAVIS zoo modules."""
    return jnp.einsum("...d,od->...o", x, p["w"]) + p["b"]


def l2_normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


def sample_hard_negative_indices(rng: jax.Array, weights: jax.Array) -> jax.Array:
    """Per-row categorical draw over (already positive-masked) mining
    weights — the in-batch hard-negative selection shared by the
    ALBEF/ALPRO/BLIP retrieval train steps (torch.multinomial equivalent)."""
    return jax.random.categorical(rng, jnp.log(weights + 1e-20), axis=1)
