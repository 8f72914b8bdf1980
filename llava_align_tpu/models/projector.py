"""Vision→language projector.

Parity: reference experiments/llava/model/multimodal_projector/builder.py:33-51
('linear' | 'mlp{N}x_gelu' | 'identity'; llava-v1.5 ships mlp2x_gelu).
GELU is the exact erf form (torch nn.GELU default).

Param tree: {"layers": [{"kernel": [in,out], "bias": [out]}, ...]} — empty list
for 'identity'.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from llava_align_tpu.ops.layers import gelu_exact

Params = Dict[str, Any]


def num_layers(projector_type: str) -> int:
    if projector_type == "identity":
        return 0
    if projector_type == "linear":
        return 1
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        return int(m.group(1))
    raise ValueError(f"Unknown projector type: {projector_type}")


def init(
    rng: jax.Array, projector_type: str, mm_hidden: int, hidden: int, dtype=jnp.bfloat16
) -> Params:
    n = num_layers(projector_type)
    layers: List[Dict[str, jax.Array]] = []
    keys = jax.random.split(rng, max(n, 1))
    for i in range(n):
        fan_in = mm_hidden if i == 0 else hidden
        kernel = (jax.random.normal(keys[i], (fan_in, hidden), jnp.float32) / fan_in**0.5).astype(dtype)
        layers.append({"kernel": kernel, "bias": jnp.zeros((hidden,), dtype)})
    return {"layers": layers}


def forward(params: Params, x: jax.Array) -> jax.Array:
    layers = params["layers"]
    for i, lp in enumerate(layers):
        if i > 0:
            x = gelu_exact(x)
        x = x @ lp["kernel"] + lp["bias"]
    return x
