"""Synthetic (random-weight) model builders at real shapes.

Used by bench.py and the runners' `random:{7b,13b}` model paths: quantized
trees build GROUP BY GROUP with explicit frees so the peak HBM is
quantized-total + one bf16 group — a whole-tree bf16 init of 13B exceeds a
16GB chip, and quantizing beside a live bf16 7B tree does too. Real
checkpoints quantize host-side per tensor (utils/hf_convert.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def build_random_llava_params(cfg, seed=0, quant: str = "none"):
    from llava_align_tpu.models import llava

    if quant not in ("int8", "int4"):
        return jax.block_until_ready(
            jax.jit(lambda k: llava.init(k, cfg))(jax.random.PRNGKey(seed))
        )

    # int8/int4: quantize the llama linears GROUP BY GROUP with explicit
    # frees so the peak is quantized-total + one bf16 group (a whole-tree
    # bf16 init of 13B would itself exceed HBM). Real checkpoints quantize
    # host-side per tensor. qkv and gate|up fuse into single stacks (one
    # kernel launch per sublayer at decode). int4 keeps the lm_head int8
    # (quantize_llama_params semantics).
    from llava_align_tpu.models import llama
    from llava_align_tpu.ops.quant import (
        int4_auto_group, quantize_weight, quantize_weight_int4,
    )

    if quant == "int4":
        g = int4_auto_group(
            (cfg.text.hidden_size, cfg.text.intermediate_size, cfg.text.q_dim)
        )
        qw = functools.partial(quantize_weight_int4, group=g)
    else:
        qw = quantize_weight

    params = jax.block_until_ready(
        jax.jit(lambda k: llava.init(k, cfg))(jax.random.PRNGKey(seed))
    ) if cfg.text.num_layers <= 32 else None

    if params is not None:
        L = cfg.text.num_layers

        def q_chunked(fn, *ws):
            # int4's grouped-absmax/pack pipeline materializes f32
            # intermediates the size of the stack — on top of the live bf16
            # tree that OOMs 16GB at 7B. Quantize a few layers at a time.
            step = L if quant == "int8" else max(1, min(4, L))
            outs = [
                jax.block_until_ready(fn(*[w[i : i + step] for w in ws]))
                for i in range(0, L, step)
            ]
            if len(outs) == 1:
                return outs[0]
            merged = {
                k: jax.block_until_ready(
                    jnp.concatenate([o[k] for o in outs], axis=0)
                )
                for k in outs[0]
            }
            for o in outs:
                for v in o.values():
                    v.delete()
            return merged

        qlayers = dict(params["llama"]["layers"])
        qfuse = jax.jit(
            lambda *ws: qw(jnp.concatenate(ws, axis=1))
        )
        for fused, names in (("qkv", ("q", "k", "v")), ("gateup", ("gate", "up"))):
            ws = [qlayers.pop(n) for n in names]
            qlayers[fused] = q_chunked(qfuse, *ws)
            for w in ws:
                w.delete()
        qw_jit = jax.jit(qw)
        for name in ("o", "down"):
            w = qlayers[name]
            qlayers[name] = q_chunked(qw_jit, w)
            w.delete()
        params["llama"]["layers"] = qlayers
        lm = params["llama"]["lm_head"]
        params["llama"]["lm_head"] = jax.block_until_ready(jax.jit(quantize_weight)(lm))
        lm.delete()
        return params

    # 13B+: even the bf16 init does not fit; generate each quantized leaf
    # directly (random int8/int4 + unit-ish scales — shapes are what the
    # bench measures) and the rest of the tree normally.
    tcfg = cfg.text
    key = jax.random.PRNGKey(seed)

    from llava_align_tpu.ops.quant import INT4_GROUP

    def rand_q(k, shape, bits=8):
        def gen(kk):
            if bits == 4:
                L_, O_, D_ = shape
                q4 = jax.random.randint(kk, (L_, D_ // 2, O_), -128, 128, jnp.int8)
                gs = jnp.full((L_, D_ // INT4_GROUP, O_), 0.01, jnp.float32) / (D_ ** 0.5)
                return {"q4": q4, "gs": gs}
            q = jax.random.randint(kk, shape, -127, 128, jnp.int8)
            s = jnp.full(shape[:-1], 0.01, jnp.float32) / (shape[-1] ** 0.5)
            return {"q": q, "s": s}

        return jax.jit(gen)(k)

    L, D, F, V, QD, KD = (
        tcfg.num_layers, tcfg.hidden_size, tcfg.intermediate_size,
        tcfg.vocab_size, tcfg.q_dim, tcfg.kv_dim,
    )
    shapes = {
        "qkv": (L, QD + 2 * KD, D), "o": (L, D, QD),
        "gateup": (L, 2 * F, D), "down": (L, D, F),
    }
    keys = jax.random.split(key, len(shapes) + 4)
    bits = 4 if quant == "int4" else 8
    layers = {
        name: jax.block_until_ready(rand_q(keys[i], shape, bits))
        for i, (name, shape) in enumerate(shapes.items())
    }
    layers["attn_norm"] = jnp.ones((L, D), tcfg.dtype)
    layers["mlp_norm"] = jnp.ones((L, D), tcfg.dtype)
    n = len(shapes)
    llama_params = {
        "embed": (jax.random.normal(keys[n], (V, D), jnp.float32) * 0.02).astype(tcfg.dtype),
        "layers": layers,
        "final_norm": jnp.ones((D,), tcfg.dtype),
        "lm_head": jax.block_until_ready(rand_q(keys[n + 1], (V, D))),
    }
    from llava_align_tpu.models import clip_vit, projector

    return {
        "llama": llama_params,
        "vision": jax.jit(lambda k: clip_vit.init(k, cfg.vision))(keys[n + 2]),
        "projector": jax.jit(
            lambda k: projector.init(
                k, cfg.mm_projector_type, cfg.vision.hidden_size,
                cfg.text.hidden_size, cfg.text.dtype,
            )
        )(keys[n + 3]),
    }


def build_random_qwen_vl_params(cfg, seed: int = 0, quant: str = "none"):
    """Random Qwen-VL tree at real shapes (bench.py qwen side measurement +
    scripts/bench_qwen_grouped.py). quant='int8' generates the quantized
    decoder leaves DIRECTLY — a bf16 Qwen-7B tree beside its int8 copy
    exceeds the 16GB chip (same discipline as the 13B llava branch above);
    the visual tower stays bf16 like the serving path."""
    from llava_align_tpu.models import qwen_vit
    from llava_align_tpu.models import qwen_vl as qwen_vl_model

    if quant == "none":
        return jax.block_until_ready(
            jax.jit(lambda k: qwen_vl_model.init(k, cfg))(jax.random.PRNGKey(seed))
        )
    if quant != "int8":
        raise ValueError(f"qwen random builder supports none/int8, got {quant!r}")

    t = cfg.text
    key = jax.random.PRNGKey(seed)

    def rand_q(k, shape):
        def gen(kk):
            q = jax.random.randint(kk, shape, -127, 128, jnp.int8)
            s = jnp.full(shape[:-1], 0.01, jnp.float32) / (shape[-1] ** 0.5)
            return {"q": q, "s": s}

        return jax.block_until_ready(jax.jit(gen)(k))

    L, D, V, QD, F2 = t.num_layers, t.hidden_size, t.vocab_size, t.q_dim, t.ff_dim
    shapes = {
        "c_attn_w": (L, 3 * QD, D), "attn_proj": (L, D, QD),
        "w12": (L, 2 * F2, D), "mlp_proj": (L, D, F2),
    }
    ks = jax.random.split(key, len(shapes) + 3)
    layers = {n: rand_q(ks[i], sh) for i, (n, sh) in enumerate(shapes.items())}
    layers["ln_1"] = jnp.ones((L, D), t.dtype)
    layers["ln_2"] = jnp.ones((L, D), t.dtype)
    layers["c_attn_b"] = jnp.zeros((L, 3 * QD), t.dtype)
    n = len(shapes)
    qwen_params = {
        "wte": jax.block_until_ready(
            jax.jit(
                lambda k: (jax.random.normal(k, (V, D), jnp.float32) * 0.02).astype(t.dtype)
            )(ks[n])
        ),
        "layers": layers,
        "ln_f": jnp.ones((D,), t.dtype),
        "lm_head": rand_q(ks[n + 1], (V, D)),
    }
    # eager: qwen_vit.init builds numpy sincos tables (not jit-traceable)
    visual = jax.block_until_ready(qwen_vit.init(ks[n + 2], cfg.vision))
    return {"qwen": qwen_params, "visual": visual}
