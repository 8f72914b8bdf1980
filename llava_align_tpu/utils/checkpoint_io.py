"""Orbax save/load for converted model params.

HF→JAX conversion (utils/hf_convert.py) is a host-side pass over safetensors;
saving the converted pytree once lets serving jobs restore directly to device
(sharded restore works by passing target shardings). SURVEY §5: "orbax for any
trainer state" — this covers the model side.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple


def save_params(path: str, params: Dict[str, Any], meta: Optional[dict] = None) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    ocp.PyTreeCheckpointer().save(path, params, force=True)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
    return path


def load_params(
    path: str, target: Optional[Dict[str, Any]] = None
) -> Tuple[Dict[str, Any], Optional[dict]]:
    """target: optional pytree of jax.ShapeDtypeStruct / arrays with shardings
    to restore into (device placement happens during restore)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    ckptr = ocp.PyTreeCheckpointer()
    params = ckptr.restore(path, item=target) if target is not None else ckptr.restore(path)
    meta = None
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return params, meta
