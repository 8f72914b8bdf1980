"""Device-mesh construction.

The reference parallelizes by launching one process per GPU with
CUDA_VISIBLE_DEVICES and --num-chunks dataset splits (eval/sampling/run.sh:17-25)
and by HF device_map="auto" layer placement (builder.py:27). The TPU-native
equivalent is a single SPMD program over a ('data', 'model') mesh: tensor
parallelism shards weights over 'model' (ICI all-reduce), data parallelism
shards batches over 'data'; GSPMD inserts all collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    model: Optional[int] = None,
    data: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes ('data', 'model'). Defaults to all devices on 'model'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model is None:
        model = n // data
    if data * model != n:
        raise ValueError(f"data({data}) * model({model}) != n_devices({n})")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(model=1, data=1, devices=jax.devices()[:1])
