"""Parameter / cache sharding rules (Megatron-style tensor parallelism).

Column-parallel (shard output features) for q/k/v/gate/up/fc1, row-parallel
(shard input features) for o/down/fc2 — so each transformer block needs exactly
one all-reduce per sublayer, riding ICI. Norms, biases and small tensors are
replicated. The 13B model does not fit one v5e core in bf16; this sharding is
what replaces the reference's device_map="auto" pipeline approximation
(reference builder.py:27, llava_llama.py:114-115).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llava_align_tpu.config import LlamaConfig, LlavaConfig


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def llama_param_shardings(cfg: LlamaConfig, mesh: Mesh) -> Dict[str, Any]:
    rep = _ns(mesh)
    # weights are [L, out, in] (torch convention; see models/llama.py):
    # column-parallel = shard dim 1 (out), row-parallel = shard dim 2 (in)
    return {
        "embed": _ns(mesh, None, "model"),
        "layers": {
            "attn_norm": rep,
            "q": _ns(mesh, None, "model", None),
            "k": _ns(mesh, None, "model", None),
            "v": _ns(mesh, None, "model", None),
            "o": _ns(mesh, None, None, "model"),
            "mlp_norm": rep,
            "gate": _ns(mesh, None, "model", None),
            "up": _ns(mesh, None, "model", None),
            "down": _ns(mesh, None, None, "model"),
        },
        "final_norm": rep,
        "lm_head": _ns(mesh, "model", None),
    }


def clip_param_shardings(mesh: Mesh) -> Dict[str, Any]:
    rep = _ns(mesh)

    def lin(col: bool):
        return {
            "kernel": _ns(mesh, None, None, "model") if col else _ns(mesh, None, "model", None),
            "bias": rep,
        }

    ln = {"scale": rep, "bias": rep}
    return {
        "cls": rep,
        "patch_embed": rep,
        "pos_embed": rep,
        "pre_ln": dict(ln),
        "layers": {
            "ln1": dict(ln),
            "q": lin(True),
            "k": lin(True),
            "v": lin(True),
            "o": lin(False),
            "ln2": dict(ln),
            "fc1": lin(True),
            "fc2": lin(False),
        },
        "post_ln": dict(ln),
    }


def projector_shardings(params_projector: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    rep = _ns(mesh)
    return {"layers": [{"kernel": rep, "bias": rep} for _ in params_projector["layers"]]}


def llava_param_shardings(
    cfg: LlavaConfig, mesh: Mesh, params: Dict[str, Any]
) -> Dict[str, Any]:
    return {
        "llama": llama_param_shardings(cfg.text, mesh),
        "vision": clip_param_shardings(mesh),
        "projector": projector_shardings(params["projector"], mesh),
    }


def qwen_param_shardings(mesh: Mesh) -> Dict[str, Any]:
    """models/qwen params ([L, out, in] torch layout). The packed c_attn
    output dim is [q|k|v] blocks of equal size, each divisible by the mesh —
    sharding dim 1 keeps whole heads per shard within each block."""
    rep = _ns(mesh)
    return {
        "wte": _ns(mesh, None, "model"),
        "layers": {
            "ln_1": rep,
            "c_attn_w": _ns(mesh, None, "model", None),
            "c_attn_b": _ns(mesh, None, "model"),
            "attn_proj": _ns(mesh, None, None, "model"),
            "ln_2": rep,
            "w1": _ns(mesh, None, "model", None),
            "w2": _ns(mesh, None, "model", None),
            "mlp_proj": _ns(mesh, None, None, "model"),
        },
        "ln_f": rep,
        "lm_head": _ns(mesh, "model", None),
    }


def mpt_param_shardings(mesh: Mesh) -> Dict[str, Any]:
    """models/mpt params. NOTE: the packed wqkv output dim is [D | KV | KV];
    with multiquery (KV = head_dim) the kv blocks are not shardable, so wqkv
    is sharded on the INPUT dim (row-parallel) instead — one extra all-reduce
    per attention, correct for both MHA and MQA."""
    rep = _ns(mesh)
    return {
        "wte": _ns(mesh, "model", None),
        "layers": {
            "norm_1": rep,
            "wqkv": _ns(mesh, None, None, "model"),
            "out_proj": _ns(mesh, None, None, "model"),
            "norm_2": rep,
            "up_proj": _ns(mesh, None, "model", None),
            "down_proj": _ns(mesh, None, None, "model"),
        },
        "norm_f": rep,
    }


def opt_param_shardings(mesh: Mesh) -> Dict[str, Any]:
    rep = _ns(mesh)

    def dense(col: bool):
        return {
            "w": _ns(mesh, None, "model", None) if col else _ns(mesh, None, None, "model"),
            "b": rep,
        }

    ln = {"scale": rep, "bias": rep}
    return {
        "embed_tokens": _ns(mesh, "model", None),
        "embed_positions": rep,
        "layers": {
            "attn_ln": dict(ln),
            "q": dense(True),
            "k": dense(True),
            "v": dense(True),
            "out": dense(False),
            "ffn_ln": dict(ln),
            "fc1": dense(True),
            "fc2": dense(False),
        },
        "final_ln": dict(ln),
    }


def cache_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    """KV cache [L, B, Smax, K, Dh]: shard kv heads over 'model'."""
    s = _ns(mesh, None, None, None, "model", None)
    return {"k": s, "v": s}


def complete_shardings(
    params: Dict[str, Any], partial: Any, mesh: Mesh
) -> Dict[str, Any]:
    """Fill a partial sharding tree out to the full params structure.

    Walks `params`; wherever `partial` provides a NamedSharding for the same
    path it is used, everything else is replicated. Handles the stacked-layer
    convention (a dict of [L, ...] leaves sharing one spec subtree) and
    int8-quantized leaves (a {'q','s'} dict standing where a dense weight spec
    was written — the spec applies to 'q'; 's' drops the contracted dim).
    """
    rep = _ns(mesh)

    def walk(p, s):
        if isinstance(p, dict):
            if set(p) == {"q", "s"} and isinstance(s, NamedSharding):
                q_spec = s.spec
                s_spec = P(*q_spec[:-1]) if len(q_spec) else P()
                return {"q": _ns(mesh, *q_spec), "s": _ns(mesh, *s_spec)}
            sub = s if isinstance(s, dict) else {}
            return {k: walk(v, sub.get(k)) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            sub = s if isinstance(s, (list, tuple)) else [None] * len(p)
            return type(p)(walk(v, sv) for v, sv in zip(p, sub))
        return s if isinstance(s, NamedSharding) else rep

    return walk(params, partial or {})


def shard_params(params: Dict[str, Any], shardings: Dict[str, Any]) -> Dict[str, Any]:
    return jax.device_put(params, shardings)
