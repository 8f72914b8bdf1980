"""Forward-diffusion image noising for Visual Contrastive Decoding (VCD).

Parity: reference vcd_utils/vcd_add_noise.py:3-28. The schedule is a sigmoid
beta ramp over 1000 steps,

    betas      = sigmoid(linspace(-6, 6, 1000)) * (0.5e-2 - 1e-5) + 1e-5
    alpha_bar  = cumprod(1 - betas)
    q(x_t|x_0) = sqrt(alpha_bar_t) * x_0 + sqrt(1 - alpha_bar_t) * eps

TPU-first: the schedule is a compile-time constant folded into the jitted
closed-form sampler, so noising an image is a single fused elementwise kernel
(one multiply-add over the image) instead of the reference's per-call schedule
recomputation on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NUM_DIFFUSION_STEPS = 1000


@functools.lru_cache(maxsize=1)
def diffusion_schedule() -> tuple[np.ndarray, np.ndarray]:
    """Returns (sqrt(alpha_bar), sqrt(1 - alpha_bar)), each [1000] float32.

    Computed in float64 then cast, matching torch's float32 evaluation to
    well below float32 resolution.
    """
    betas = 1.0 / (1.0 + np.exp(-np.linspace(-6.0, 6.0, NUM_DIFFUSION_STEPS)))
    betas = betas * (0.5e-2 - 1e-5) + 1e-5
    alpha_bar = np.cumprod(1.0 - betas)
    return (
        np.sqrt(alpha_bar).astype(np.float32),
        np.sqrt(1.0 - alpha_bar).astype(np.float32),
    )


@jax.jit
def add_diffusion_noise(
    image: jax.Array, rng: jax.Array, noise_step: jax.Array | int
) -> jax.Array:
    """q(x_t | x_0) with t = noise_step in [0, 999].

    `noise_step` may be a traced scalar — the schedule lookup is a gather, so
    sweeping noise steps does not retrigger compilation.
    """
    sqrt_ab, sqrt_1m_ab = (jnp.asarray(a) for a in diffusion_schedule())
    t = jnp.asarray(noise_step, dtype=jnp.int32)
    eps = jax.random.normal(rng, image.shape, dtype=jnp.float32)
    out = sqrt_ab[t] * image.astype(jnp.float32) + sqrt_1m_ab[t] * eps
    return out.astype(image.dtype)
