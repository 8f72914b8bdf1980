"""HF checkpoint → JAX pytree weight conversion.

Replaces the reference's `load_pretrained_model`
(experiments/llava/model/builder.py:26-148) for the TPU stack: instead of
instantiating torch modules, safetensors/torch state dicts are mapped directly
into this framework's stacked-layer param trees. Never ports module code.

Supported sources:
  * liuhaotian/llava-v1.5-* style checkpoints (keys: model.layers.*,
    model.vision_tower.vision_tower.vision_model.*, model.mm_projector.*)
  * plain HF LlamaForCausalLM / CLIPVisionModel state dicts (for parity tests
    against tiny random torch models).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from llava_align_tpu.config import ClipVisionConfig, LlamaConfig, LlavaConfig

Array = np.ndarray
StateDict = Mapping[str, Array]


def _np(x) -> Array:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (possibly bf16/fp16) without importing torch at module scope
    return x.float().cpu().numpy()


def _to(dtype):
    def f(x: Array):
        return jnp.asarray(x, dtype=dtype)

    return f


def _stack(sd: StateDict, template: str, num_layers: int, transform: Callable[[Array], Array]):
    return np.stack([transform(_np(sd[template.format(i=i)])) for i in range(num_layers)])


def convert_llama(sd: StateDict, cfg: LlamaConfig, prefix: str = "") -> Dict[str, Any]:
    """HF LlamaForCausalLM state dict → llama.init-shaped params."""
    p = prefix
    t = _to(cfg.dtype)
    # torch Linear stores [out, in] — kept as-is (llama.py stores [L, out, in];
    # the [in, out] layout made XLA hoist GB-scale layout copies on TPU).

    def lt(template):
        return t(_stack(sd, p + template, cfg.num_layers, lambda w: w))

    def ln(template):
        return t(_stack(sd, p + template, cfg.num_layers, lambda w: w))

    embed = _np(sd[p + "model.embed_tokens.weight"])
    if p + "lm_head.weight" in sd:
        lm_head = _np(sd[p + "lm_head.weight"])
    else:  # tied embeddings
        lm_head = embed
    return {
        "embed": t(embed),
        "layers": {
            "attn_norm": ln("model.layers.{i}.input_layernorm.weight"),
            "q": lt("model.layers.{i}.self_attn.q_proj.weight"),
            "k": lt("model.layers.{i}.self_attn.k_proj.weight"),
            "v": lt("model.layers.{i}.self_attn.v_proj.weight"),
            "o": lt("model.layers.{i}.self_attn.o_proj.weight"),
            "mlp_norm": ln("model.layers.{i}.post_attention_layernorm.weight"),
            "gate": lt("model.layers.{i}.mlp.gate_proj.weight"),
            "up": lt("model.layers.{i}.mlp.up_proj.weight"),
            "down": lt("model.layers.{i}.mlp.down_proj.weight"),
        },
        "final_norm": t(_np(sd[p + "model.norm.weight"])),
        "lm_head": t(lm_head),
    }


def convert_clip(
    sd: StateDict, cfg: ClipVisionConfig, prefix: str = "vision_model."
) -> Dict[str, Any]:
    """HF CLIPVisionModel state dict → clip_vit.init-shaped params."""
    p = prefix
    t = _to(cfg.dtype)
    L = cfg.num_layers
    T = lambda w: w.T

    def attn(name):
        return {
            "kernel": t(_stack(sd, p + "encoder.layers.{i}.self_attn." + name + ".weight", L, T)),
            "bias": t(_stack(sd, p + "encoder.layers.{i}.self_attn." + name + ".bias", L, lambda w: w)),
        }

    def lnorm(name):
        return {
            "scale": t(_stack(sd, p + "encoder.layers.{i}." + name + ".weight", L, lambda w: w)),
            "bias": t(_stack(sd, p + "encoder.layers.{i}." + name + ".bias", L, lambda w: w)),
        }

    def mlp(name):
        return {
            "kernel": t(_stack(sd, p + "encoder.layers.{i}.mlp." + name + ".weight", L, T)),
            "bias": t(_stack(sd, p + "encoder.layers.{i}.mlp." + name + ".bias", L, lambda w: w)),
        }

    # conv kernel [D, 3, P, P] → [3*P*P, D] in (C, kh, kw)-major order,
    # matching models/clip_vit.patchify's flattening.
    conv = _np(sd[p + "embeddings.patch_embedding.weight"])
    D = conv.shape[0]
    patch_embed = conv.reshape(D, -1).T

    return {
        "cls": t(_np(sd[p + "embeddings.class_embedding"]).reshape(-1)),
        "patch_embed": t(patch_embed),
        "pos_embed": t(_np(sd[p + "embeddings.position_embedding.weight"])),
        "pre_ln": {
            "scale": t(_np(sd[p + "pre_layrnorm.weight"])),
            "bias": t(_np(sd[p + "pre_layrnorm.bias"])),
        },
        "layers": {
            "ln1": lnorm("layer_norm1"),
            "q": attn("q_proj"),
            "k": attn("k_proj"),
            "v": attn("v_proj"),
            "o": attn("out_proj"),
            "ln2": lnorm("layer_norm2"),
            "fc1": mlp("fc1"),
            "fc2": mlp("fc2"),
        },
        "post_ln": {
            "scale": t(_np(sd[p + "post_layernorm.weight"])),
            "bias": t(_np(sd[p + "post_layernorm.bias"])),
        },
    }


def convert_projector(
    sd: StateDict, projector_type: str, dtype, prefix: str = "model.mm_projector."
) -> Dict[str, Any]:
    """mm_projector.{0,2,4...}.{weight,bias} (Sequential indices skip GELUs)."""
    from llava_align_tpu.models.projector import num_layers

    t = _to(dtype)
    n = num_layers(projector_type)
    layers = []
    for i in range(n):
        idx = 2 * i  # GELU between linears occupies odd indices
        key_w = f"{prefix}{idx}.weight" if n > 1 else f"{prefix}{idx}.weight"
        if key_w not in sd and n == 1:
            key_w = prefix.rstrip(".") + ".weight"  # bare Linear
        key_b = key_w.replace("weight", "bias")
        layers.append({"kernel": t(_np(sd[key_w]).T), "bias": t(_np(sd[key_b]))})
    return {"layers": layers}


# ---------------------------------------------------------------------------
# T5 / Flan-T5
# ---------------------------------------------------------------------------


def convert_t5(sd: StateDict, cfg, prefix: str = "") -> Dict[str, Any]:
    """HF/lavis T5ForConditionalGeneration state dict → models/t5 params."""
    p = prefix
    t = _to(cfg.dtype)

    def dense(key):
        return t(_np(sd[p + key + ".weight"]))

    def ffn(base):
        if cfg.gated_act:
            return {
                "wi_0": dense(base + ".DenseReluDense.wi_0"),
                "wi_1": dense(base + ".DenseReluDense.wi_1"),
                "wo": dense(base + ".DenseReluDense.wo"),
            }
        return {"wi": dense(base + ".DenseReluDense.wi"), "wo": dense(base + ".DenseReluDense.wo")}

    def attn(base):
        return {
            "q": dense(base + ".q"), "k": dense(base + ".k"),
            "v": dense(base + ".v"), "o": dense(base + ".o"),
        }

    def enc_layer(i):
        b = f"encoder.block.{i}"
        return {
            "ln1": dense(b + ".layer.0.layer_norm"),
            "attn": attn(b + ".layer.0.SelfAttention"),
            "ln2": dense(b + ".layer.1.layer_norm"),
            "ffn": ffn(b + ".layer.1"),
        }

    def dec_layer(i):
        b = f"decoder.block.{i}"
        return {
            "ln1": dense(b + ".layer.0.layer_norm"),
            "attn": attn(b + ".layer.0.SelfAttention"),
            "ln_x": dense(b + ".layer.1.layer_norm"),
            "xattn": attn(b + ".layer.1.EncDecAttention"),
            "ln2": dense(b + ".layer.2.layer_norm"),
            "ffn": ffn(b + ".layer.2"),
        }

    shared = t(_np(sd[p + "shared.weight"]))
    return {
        "shared": shared,
        "encoder": {
            "rel_bias": dense("encoder.block.0.layer.0.SelfAttention.relative_attention_bias"),
            "layers": [enc_layer(i) for i in range(cfg.num_layers)],
            "final_ln": dense("encoder.final_layer_norm"),
        },
        "decoder": {
            "rel_bias": dense("decoder.block.0.layer.0.SelfAttention.relative_attention_bias"),
            "layers": [dec_layer(i) for i in range(cfg.num_decoder_layers)],
            "final_ln": dense("decoder.final_layer_norm"),
        },
        "lm_head": (
            t(_np(sd[p + "lm_head.weight"])) if p + "lm_head.weight" in sd else None
        ),
    }


# ---------------------------------------------------------------------------
# OPT
# ---------------------------------------------------------------------------


def convert_opt(sd: StateDict, cfg, prefix: str = "") -> Dict[str, Any]:
    """HF/lavis OPT state dict (model.decoder.*) → models/opt params."""
    p = prefix + "model.decoder."
    t = _to(cfg.dtype)
    L = cfg.num_layers

    def st(template):
        return t(_stack(sd, p + template, L, lambda w: w))

    def dense(name):
        return {"w": st(f"layers.{{i}}.{name}.weight"), "b": st(f"layers.{{i}}.{name}.bias")}

    def lnorm(name):
        return {"scale": st(f"layers.{{i}}.{name}.weight"), "bias": st(f"layers.{{i}}.{name}.bias")}

    return {
        "embed_tokens": t(_np(sd[p + "embed_tokens.weight"])),
        "embed_positions": t(_np(sd[p + "embed_positions.weight"])),
        "layers": {
            "attn_ln": lnorm("self_attn_layer_norm"),
            "q": dense("self_attn.q_proj"),
            "k": dense("self_attn.k_proj"),
            "v": dense("self_attn.v_proj"),
            "out": dense("self_attn.out_proj"),
            "ffn_ln": lnorm("final_layer_norm"),
            "fc1": dense("fc1"),
            "fc2": dense("fc2"),
        },
        "final_ln": {
            "scale": t(_np(sd[p + "final_layer_norm.weight"])),
            "bias": t(_np(sd[p + "final_layer_norm.bias"])),
        },
    }


# ---------------------------------------------------------------------------
# MPT
# ---------------------------------------------------------------------------


def convert_mpt(sd: StateDict, cfg, prefix: str = "") -> Dict[str, Any]:
    """MPT state dict (transformer.blocks.{i}.*) → models/mpt params.
    Norm biases default to zeros when absent (no_bias checkpoints)."""
    p = prefix
    t = _to(cfg.dtype)
    L, D = cfg.n_layers, cfg.d_model

    def st(template):
        return t(_stack(sd, p + template, L, lambda w: w))

    def st_or_zero(template, shape):
        if p + template.format(i=0) in sd:
            return st(template)
        return jnp.zeros(shape, cfg.dtype)

    return {
        "wte": t(_np(sd[p + "transformer.wte.weight"])),
        "layers": {
            "norm_1": {
                "scale": st("transformer.blocks.{i}.norm_1.weight"),
                "bias": st_or_zero("transformer.blocks.{i}.norm_1.bias", (L, D)),
            },
            "wqkv": st("transformer.blocks.{i}.attn.Wqkv.weight"),
            "out_proj": st("transformer.blocks.{i}.attn.out_proj.weight"),
            "norm_2": {
                "scale": st("transformer.blocks.{i}.norm_2.weight"),
                "bias": st_or_zero("transformer.blocks.{i}.norm_2.bias", (L, D)),
            },
            "up_proj": st("transformer.blocks.{i}.ffn.up_proj.weight"),
            "down_proj": st("transformer.blocks.{i}.ffn.down_proj.weight"),
            **(
                {
                    "q_ln": {
                        "scale": st("transformer.blocks.{i}.attn.q_ln.weight"),
                        "bias": st_or_zero(
                            "transformer.blocks.{i}.attn.q_ln.bias", (L, D)
                        ),
                    },
                    "k_ln": {
                        "scale": st("transformer.blocks.{i}.attn.k_ln.weight"),
                        "bias": st_or_zero(
                            "transformer.blocks.{i}.attn.k_ln.bias",
                            (L, cfg.kv_heads * cfg.head_dim),
                        ),
                    },
                }
                if p + "transformer.blocks.0.attn.q_ln.weight" in sd
                else {}
            ),
        },
        "norm_f": {
            "scale": t(_np(sd[p + "transformer.norm_f.weight"])),
            "bias": (
                t(_np(sd[p + "transformer.norm_f.bias"]))
                if p + "transformer.norm_f.bias" in sd
                else jnp.zeros((D,), cfg.dtype)
            ),
        },
    }


# ---------------------------------------------------------------------------
# Qwen-VL
# ---------------------------------------------------------------------------


def convert_qwen(sd: StateDict, cfg, prefix: str = "") -> Dict[str, Any]:
    """Qwen decoder state dict (transformer.h.{i}.* keys) → models/qwen
    params. All linears stay in torch [out, in] layout."""
    p = prefix
    t = _to(cfg.dtype)
    L = cfg.num_layers

    def st(template):
        return t(_stack(sd, p + template, L, lambda w: w))

    return {
        "wte": t(_np(sd[p + "transformer.wte.weight"])),
        "layers": {
            "ln_1": st("transformer.h.{i}.ln_1.weight"),
            "c_attn_w": st("transformer.h.{i}.attn.c_attn.weight"),
            "c_attn_b": st("transformer.h.{i}.attn.c_attn.bias"),
            "attn_proj": st("transformer.h.{i}.attn.c_proj.weight"),
            "ln_2": st("transformer.h.{i}.ln_2.weight"),
            "w1": st("transformer.h.{i}.mlp.w1.weight"),
            "w2": st("transformer.h.{i}.mlp.w2.weight"),
            "mlp_proj": st("transformer.h.{i}.mlp.c_proj.weight"),
        },
        "ln_f": t(_np(sd[p + "transformer.ln_f.weight"])),
        "lm_head": t(_np(sd[p + "lm_head.weight"])),
    }


def convert_qwen_visual(
    sd: StateDict, cfg, prefix: str = "transformer.visual."
) -> Dict[str, Any]:
    """Qwen-VL ViT + Resampler state dict → models/qwen_vit params. Position
    embeddings are bicubic-interpolated to the patch grid at conversion time
    (reference interpolates per forward, visual.py:23-39,141,402)."""
    from llava_align_tpu.models.qwen_vit import interpolate_pos_embed

    p = prefix
    t = _to(cfg.dtype)
    L, N = cfg.num_layers, cfg.num_patches

    def st(template):
        return t(_stack(sd, p + template, L, lambda w: w))

    conv = _np(sd[p + "conv1.weight"])  # [W, 3, P, P], bias-free
    pos = interpolate_pos_embed(_np(sd[p + "positional_embedding"]), N)
    pos_q = _np(sd[p + "attn_pool.pos_embed"])
    pos_kv = interpolate_pos_embed(pos_q, N)

    def ln(key, stacked_template=None):
        if stacked_template:
            return {"scale": st(stacked_template + ".weight"), "bias": st(stacked_template + ".bias")}
        return {"scale": t(_np(sd[p + key + ".weight"])), "bias": t(_np(sd[p + key + ".bias"]))}

    return {
        "conv": t(conv.reshape(conv.shape[0], -1)),
        "pos_embed": t(pos),
        "ln_pre": ln("ln_pre"),
        "layers": {
            "ln_1": ln(None, "transformer.resblocks.{i}.ln_1"),
            "in_proj": {
                "w": st("transformer.resblocks.{i}.attn.in_proj.weight"),
                "b": st("transformer.resblocks.{i}.attn.in_proj.bias"),
            },
            "out_proj": {
                "w": st("transformer.resblocks.{i}.attn.out_proj.weight"),
                "b": st("transformer.resblocks.{i}.attn.out_proj.bias"),
            },
            "ln_2": ln(None, "transformer.resblocks.{i}.ln_2"),
            "c_fc": {
                "w": st("transformer.resblocks.{i}.mlp.c_fc.weight"),
                "b": st("transformer.resblocks.{i}.mlp.c_fc.bias"),
            },
            "c_proj": {
                "w": st("transformer.resblocks.{i}.mlp.c_proj.weight"),
                "b": st("transformer.resblocks.{i}.mlp.c_proj.bias"),
            },
        },
        "resampler": {
            "query": t(_np(sd[p + "attn_pool.query"])),
            "pos_q": t(pos_q),
            "pos_kv": t(pos_kv),
            "kv_proj": t(_np(sd[p + "attn_pool.kv_proj.weight"])),
            "ln_q": ln("attn_pool.ln_q"),
            "ln_kv": ln("attn_pool.ln_kv"),
            "in_proj": {
                "w": t(_np(sd[p + "attn_pool.attn.in_proj_weight"])),
                "b": t(_np(sd[p + "attn_pool.attn.in_proj_bias"])),
            },
            "out_proj": {
                "w": t(_np(sd[p + "attn_pool.attn.out_proj.weight"])),
                "b": t(_np(sd[p + "attn_pool.attn.out_proj.bias"])),
            },
        },
        "ln_post": ln("ln_post"),
        "proj": t(_np(sd[p + "proj"])),
    }


def load_qwen_vl_checkpoint(model_path: str, dtype=jnp.bfloat16):
    """Qwen-VL checkpoint dir → (params, QwenVLConfig)."""
    from llava_align_tpu.models.qwen import QwenConfig
    from llava_align_tpu.models.qwen_vit import QwenVisionConfig
    from llava_align_tpu.models.qwen_vl import QwenVLConfig

    with open(os.path.join(model_path, "config.json")) as f:
        hf = json.load(f)
    vis = hf.get("visual", {})
    text = QwenConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        head_dim=hf.get("kv_channels", hf["hidden_size"] // hf["num_attention_heads"]),
        intermediate_size=hf["intermediate_size"],
        layer_norm_eps=hf.get("layer_norm_epsilon", 1e-6),
        rotary_emb_base=hf.get("rotary_emb_base", 10000),
        seq_length=hf.get("seq_length", 2048),
        use_dynamic_ntk=hf.get("use_dynamic_ntk", True),
        use_logn_attn=hf.get("use_logn_attn", True),
        dtype=dtype,
    )
    vision = QwenVisionConfig(
        image_size=vis.get("image_size", 448),
        patch_size=vis.get("patch_size", 14),
        width=vis.get("width", 1664),
        num_layers=vis.get("layers", 48),
        num_heads=vis.get("heads", 16),
        mlp_ratio=vis.get("mlp_ratio", 4.9231),
        n_queries=vis.get("n_queries", 256),
        output_dim=vis.get("output_dim", 4096),
        dtype=dtype,
    )
    cfg = QwenVLConfig(
        text=text, vision=vision,
        image_start_id=vis.get("image_start_id", 151857),
    )
    sd = load_state_dict(model_path)
    params = {
        "qwen": convert_qwen(sd, text),
        "visual": convert_qwen_visual(sd, vision),
    }
    return params, cfg


# ---------------------------------------------------------------------------
# InstructBLIP (EVA-ViT + Q-Former + Vicuna)
# ---------------------------------------------------------------------------


def convert_eva_vit(sd: StateDict, cfg, prefix: str = "visual_encoder.") -> Dict[str, Any]:
    """lavis eva_vit state dict → models/eva_vit params."""
    p = prefix
    t = _to(cfg.dtype)
    L = cfg.num_layers

    def st(template):
        return t(_stack(sd, p + template, L, lambda w: w))

    conv = _np(sd[p + "patch_embed.proj.weight"])
    return {
        "patch_embed": {
            "w": t(conv.reshape(conv.shape[0], -1)),
            "b": t(_np(sd[p + "patch_embed.proj.bias"])),
        },
        "cls": t(_np(sd[p + "cls_token"]).reshape(-1)),
        "pos_embed": t(_np(sd[p + "pos_embed"]).reshape(-1, cfg.width)),
        "layers": {
            "norm1": {"scale": st("blocks.{i}.norm1.weight"), "bias": st("blocks.{i}.norm1.bias")},
            "qkv_w": st("blocks.{i}.attn.qkv.weight"),
            "q_bias": st("blocks.{i}.attn.q_bias"),
            "v_bias": st("blocks.{i}.attn.v_bias"),
            "proj": {"w": st("blocks.{i}.attn.proj.weight"), "b": st("blocks.{i}.attn.proj.bias")},
            "norm2": {"scale": st("blocks.{i}.norm2.weight"), "bias": st("blocks.{i}.norm2.bias")},
            "fc1": {"w": st("blocks.{i}.mlp.fc1.weight"), "b": st("blocks.{i}.mlp.fc1.bias")},
            "fc2": {"w": st("blocks.{i}.mlp.fc2.weight"), "b": st("blocks.{i}.mlp.fc2.bias")},
        },
    }


def convert_qformer(
    sd: StateDict, cfg, prefix: str = "Qformer.bert.",
    head_prefix: Optional[str] = None,
) -> Dict[str, Any]:
    """lavis Qformer BertModel state dict → models/qformer params.

    head_prefix: where the BertOnlyMLMHead lives when converting a
    BertLMHeadModel (stage-1 BLIP-2, reference Qformer.py:624-651), e.g.
    "Qformer.cls." for a LAVIS checkpoint or "cls." for a raw
    BertLMHeadModel state dict. When given, the returned params carry a
    "head" subtree consumed by qformer.lm_logits.

    Blip2-OPT / Blip2-T5 checkpoints PRUNE the text branches before saving
    (blip2_opt.py:78-84: cls, word/position embeddings, and each layer's
    text feed-forward are set to None) — those keys are absent from the
    state dict. Missing text parts convert to zeros: the query-only paths
    never touch them."""
    from llava_align_tpu.models.qformer import has_cross_attention

    p = prefix
    t = _to(cfg.dtype)
    D, F_ = cfg.hidden_size, cfg.intermediate_size

    def dense(key, fallback_shape=None):
        wk = p + key + ".weight"
        if fallback_shape is not None and wk not in sd:
            return {
                "w": jnp.zeros(fallback_shape, cfg.dtype),
                "b": jnp.zeros((fallback_shape[0],), cfg.dtype),
            }
        return {"w": t(_np(sd[wk])), "b": t(_np(sd[p + key + ".bias"]))}

    def lnorm(key, width=None):
        wk = p + key + ".weight"
        if width is not None and wk not in sd:
            return {
                "scale": jnp.ones((width,), cfg.dtype),
                "bias": jnp.zeros((width,), cfg.dtype),
            }
        return {"scale": t(_np(sd[wk])), "bias": t(_np(sd[p + key + ".bias"]))}

    def attn(base):
        return {
            "query": dense(base + ".self.query"),
            "key": dense(base + ".self.key"),
            "value": dense(base + ".self.value"),
            "out": dense(base + ".output.dense"),
            "ln": lnorm(base + ".output.LayerNorm"),
        }

    layers = []
    for i in range(cfg.num_layers):
        b = f"encoder.layer.{i}"
        lp = {
            "self_attn": attn(b + ".attention"),
            "intermediate": dense(b + ".intermediate.dense", (F_, D)),
            "output": dense(b + ".output.dense", (D, F_)),
            "output_ln": lnorm(b + ".output.LayerNorm", D),
            "intermediate_query": dense(b + ".intermediate_query.dense"),
            "output_query": dense(b + ".output_query.dense"),
            "output_query_ln": lnorm(b + ".output_query.LayerNorm"),
        }
        if has_cross_attention(cfg, i):
            lp["cross_attn"] = attn(b + ".crossattention")
        layers.append(lp)

    wkey = p + "embeddings.word_embeddings.weight"
    out: Dict[str, Any] = {
        "embeddings": {
            "word": t(_np(sd[wkey])) if wkey in sd
            else jnp.zeros((cfg.vocab_size, D), cfg.dtype),
            "position": t(_np(sd[p + "embeddings.position_embeddings.weight"]))
            if p + "embeddings.position_embeddings.weight" in sd
            else jnp.zeros((cfg.max_position_embeddings, D), cfg.dtype),
            "ln": lnorm("embeddings.LayerNorm"),
        },
        "layers": layers,
    }
    if head_prefix is not None:
        h = head_prefix + "predictions."
        out["head"] = {
            "transform": {
                "w": t(_np(sd[h + "transform.dense.weight"])),
                "b": t(_np(sd[h + "transform.dense.bias"])),
            },
            "ln": {
                "scale": t(_np(sd[h + "transform.LayerNorm.weight"])),
                "bias": t(_np(sd[h + "transform.LayerNorm.bias"])),
            },
            "decoder": t(_np(sd[h + "decoder.weight"])),
            "bias": t(_np(sd[h + "bias"])),
        }
    return out


def convert_instructblip(sd: StateDict, cfg) -> Dict[str, Any]:
    """Full blip2_vicuna_instruct state dict → models/instructblip params."""
    t_vis = _to(cfg.vision.dtype)
    t_txt = _to(cfg.text.dtype)
    return {
        "visual": convert_eva_vit(sd, cfg.vision),
        "ln_vision": {
            "scale": t_vis(_np(sd["ln_vision.weight"])),
            "bias": t_vis(_np(sd["ln_vision.bias"])),
        },
        "query_tokens": _to(cfg.qformer.dtype)(
            _np(sd["query_tokens"]).reshape(cfg.num_query_tokens, -1)
        ),
        "qformer": convert_qformer(sd, cfg.qformer),
        "llm_proj": {
            "w": t_txt(_np(sd["llm_proj.weight"])),
            "b": t_txt(_np(sd["llm_proj.bias"])),
        },
        "llama": convert_llama(sd, cfg.text, prefix="llm_model."),
    }


def _blip2_common(sd: StateDict, cfg, **qf_kw) -> Dict[str, Any]:
    t_vis = _to(cfg.vision.dtype)
    return {
        "visual": convert_eva_vit(sd, cfg.vision),
        "ln_vision": {
            "scale": t_vis(_np(sd["ln_vision.weight"])),
            "bias": t_vis(_np(sd["ln_vision.bias"])),
        },
        "query_tokens": _to(cfg.qformer.dtype)(
            _np(sd["query_tokens"]).reshape(cfg.num_query_tokens, -1)
        ),
        "qformer": convert_qformer(sd, cfg.qformer, **qf_kw),
    }


def convert_blip2_stage1(sd: StateDict, cfg) -> Dict[str, Any]:
    """LAVIS blip2 / blip2_feature_extractor / blip2_image_text_matching
    checkpoint → models/blip2 stage-1 params (reference blip2_qformer.py
    module layout: Qformer.bert + Qformer.cls + vision/text_proj + itm_head
    + temp)."""
    t = _to(cfg.qformer.dtype)

    def lin(name):
        return {"w": t(_np(sd[name + ".weight"])), "b": t(_np(sd[name + ".bias"]))}

    out = _blip2_common(sd, cfg, head_prefix="Qformer.cls.")
    out.update(
        vision_proj=lin("vision_proj"),
        text_proj=lin("text_proj"),
        itm_head=lin("itm_head"),
        temp=jnp.asarray(float(_np(sd["temp"])), jnp.float32),
    )
    return out


def convert_blip2_opt(sd: StateDict, cfg) -> Dict[str, Any]:
    """LAVIS blip2_opt checkpoint → models/blip2 Blip2OptConfig params
    (blip2_opt.py: pruned-text Qformer + opt_proj + opt_model)."""
    t = _to(cfg.text.dtype)
    out = _blip2_common(sd, cfg)
    out["proj"] = {
        "w": t(_np(sd["opt_proj.weight"])), "b": t(_np(sd["opt_proj.bias"]))
    }
    out["lm"] = convert_opt(sd, cfg.text, prefix="opt_model.")
    return out


def convert_blip2_t5(sd: StateDict, cfg) -> Dict[str, Any]:
    """LAVIS blip2_t5 / blip2_t5_instruct checkpoint → Blip2T5Config params
    (blip2_t5.py / blip2_t5_instruct.py: t5_proj + t5_model; the instruct
    variant keeps the Q-Former text branches)."""
    t = _to(cfg.text.dtype)
    out = _blip2_common(sd, cfg)
    out["proj"] = {
        "w": t(_np(sd["t5_proj.weight"])), "b": t(_np(sd["t5_proj.bias"]))
    }
    out["lm"] = convert_t5(sd, cfg.text, prefix="t5_model.")
    return out


# ---------------------------------------------------------------------------
# Full-checkpoint loading
# ---------------------------------------------------------------------------


def load_state_dict(model_path: str) -> Dict[str, Array]:
    """Load all weights under a checkpoint dir (safetensors preferred)."""
    sd: Dict[str, Array] = {}
    st_files = sorted(
        f for f in os.listdir(model_path) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(os.path.join(model_path, f), framework="np") as h:
                for k in h.keys():
                    sd[k] = h.get_tensor(k)
        return sd
    bin_files = sorted(
        f
        for f in os.listdir(model_path)
        if f.startswith("pytorch_model") and f.endswith(".bin")
    )
    if not bin_files:
        raise FileNotFoundError(f"no weights found under {model_path}")
    import torch

    for f in bin_files:
        chunk = torch.load(os.path.join(model_path, f), map_location="cpu", weights_only=True)
        for k, v in chunk.items():
            sd[k] = _np(v)
    return sd


def config_from_hf(hf_cfg: dict, dtype=jnp.bfloat16) -> LlavaConfig:
    """Build LlavaConfig from a llava-v1.5 HF config.json dict."""
    text = LlamaConfig(
        vocab_size=hf_cfg["vocab_size"],
        hidden_size=hf_cfg["hidden_size"],
        intermediate_size=hf_cfg["intermediate_size"],
        num_layers=hf_cfg["num_hidden_layers"],
        num_heads=hf_cfg["num_attention_heads"],
        num_kv_heads=hf_cfg.get("num_key_value_heads", hf_cfg["num_attention_heads"]),
        head_dim=hf_cfg["hidden_size"] // hf_cfg["num_attention_heads"],
        rope_theta=hf_cfg.get("rope_theta", 10000.0),
        rms_norm_eps=hf_cfg.get("rms_norm_eps", 1e-5),
        max_position_embeddings=hf_cfg.get("max_position_embeddings", 4096),
        dtype=dtype,
    )
    vision = ClipVisionConfig(
        select_layer=hf_cfg.get("mm_vision_select_layer", -2),
        select_feature=hf_cfg.get("mm_vision_select_feature", "patch"),
        dtype=dtype,
    )
    return LlavaConfig(
        text=text,
        vision=vision,
        mm_projector_type=hf_cfg.get("mm_projector_type", "linear"),
        image_aspect_ratio=hf_cfg.get("image_aspect_ratio", "pad"),
        image_grid_pinpoints=hf_cfg.get("image_grid_pinpoints"),
        mm_use_im_start_end=hf_cfg.get("mm_use_im_start_end", False),
        mm_use_im_patch_token=hf_cfg.get("mm_use_im_patch_token", False),
    )


def blip_config_from_json(d: dict):
    """BlipConfig from a component config.json ({vision: {...}, text: {...},
    embed_dim}); missing keys default to BLIP-base (the LAVIS med_config.json
    + vit defaults the reference assembles from yaml)."""
    import dataclasses as _dc

    from llava_align_tpu.models.blip import BlipConfig, BlipVitConfig, MedConfig

    vision = BlipVitConfig(**d.get("vision", {}))
    text_kw = dict(d.get("text", {}))
    text_kw.setdefault("use_type_embeddings", False)  # BLIP family
    return BlipConfig(
        vision=vision, text=MedConfig(**text_kw),
        embed_dim=d.get("embed_dim", 256),
    )


def t5_config_from_json(d: dict):
    """T5Config from an HF T5 config.json (the format UnifiedQAv2 ships)."""
    from llava_align_tpu.models.t5 import T5Config

    proj = d.get("feed_forward_proj", "relu")
    return T5Config(
        vocab_size=d.get("vocab_size", 32128),
        d_model=d.get("d_model", 2048),
        d_kv=d.get("d_kv", 64),
        num_heads=d.get("num_heads", 32),
        d_ff=d.get("d_ff", 5120),
        num_layers=d.get("num_layers", 24),
        num_decoder_layers=d.get("num_decoder_layers", d.get("num_layers", 24)),
        relative_attention_num_buckets=d.get("relative_attention_num_buckets", 32),
        relative_attention_max_distance=d.get("relative_attention_max_distance", 128),
        gated_act=d.get("is_gated_act", proj.startswith("gated")),
        tie_word_embeddings=d.get("tie_word_embeddings", True),
    )


def _load_component_sd(path: str) -> Tuple[Dict[str, Array], dict]:
    """(state_dict, config.json dict) for one composite component: a dir of
    safetensors/bin + config.json, a single .safetensors file, or a LAVIS
    .pth file (unwrapping its 'model' envelope)."""
    if os.path.isdir(path):
        sd = load_state_dict(path)
        cfg_path = os.path.join(path, "config.json")
        cfg = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}
        return sd, cfg
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        sd = {}
        with safe_open(path, framework="np") as h:
            for k in h.keys():
                sd[k] = h.get_tensor(k)
        return sd, {}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return {k: _np(v) for k, v in obj.items()}, {}


def load_blip_t5_composite(
    model_path: str, *, qa_key: str = "qa", paths: Optional[Dict[str, str]] = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Assemble the PnP-VQA / Img2Prompt composite (reference
    lavis/models/pnp_vqa_models/pnp_vqa.py from_config :321-338, which builds
    BLIP-ITM + BLIP-caption + UnifiedQAv2-T5 from three checkpoint configs):
    `model_path` is a directory with `itm/`, `cap/`, and `<qa_key>/`
    components (each a checkpoint dir/file per _load_component_sd), or pass
    explicit per-component `paths`. Returns (params, cfgs) with
    params/cfgs keyed {itm, cap, <qa_key>}."""
    comp_paths = dict(paths or {})
    for name in ("itm", "cap", qa_key):
        if name not in comp_paths:
            cand = os.path.join(model_path, name)
            if not os.path.exists(cand):
                raise FileNotFoundError(
                    f"composite checkpoint missing component {name!r} "
                    f"(expected {cand} or an explicit path)"
                )
            comp_paths[name] = cand

    params: Dict[str, Any] = {}
    cfgs: Dict[str, Any] = {}
    for name in ("itm", "cap"):
        sd, cfg_json = _load_component_sd(comp_paths[name])
        cfg = blip_config_from_json(cfg_json)
        params[name] = convert_blip(sd, cfg)
        cfgs[name] = cfg
    sd, cfg_json = _load_component_sd(comp_paths[qa_key])
    t5_cfg = t5_config_from_json(cfg_json)
    params[qa_key] = convert_t5(sd, t5_cfg)
    cfgs[qa_key] = t5_cfg
    return params, cfgs


def load_llava_checkpoint(
    model_path: str, dtype=jnp.bfloat16
) -> Tuple[Dict[str, Any], LlavaConfig]:
    """liuhaotian/llava-v1.5-* checkpoint dir → (params, cfg)."""
    with open(os.path.join(model_path, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg, dtype)
    sd = load_state_dict(model_path)
    params = {
        "llama": convert_llama(sd, cfg.text),
        "vision": convert_clip(
            sd, cfg.vision, prefix="model.vision_tower.vision_tower.vision_model."
        ),
        "projector": convert_projector(sd, cfg.mm_projector_type, dtype),
    }
    return params, cfg


# ---------------------------------------------------------------------------
# BLIP base (LAVIS checkpoint naming: visual_encoder.* timm ViT with fused
# qkv; text_decoder/text_encoder.* MED BERT; vision_proj/text_proj/itm_head)
# ---------------------------------------------------------------------------


def convert_blip_vit(sd: StateDict, cfg, prefix: str = "visual_encoder.") -> Dict[str, Any]:
    t = _to(cfg.dtype)
    L, D = cfg.num_layers, cfg.hidden_size

    def st(template):
        return t(_stack(sd, prefix + template, L, lambda w: w))

    qkv_w = _stack(sd, prefix + "blocks.{i}.attn.qkv.weight", L, lambda w: w)  # [L,3D,D]
    qkv_b = (
        _stack(sd, prefix + "blocks.{i}.attn.qkv.bias", L, lambda w: w)
        if prefix + "blocks.0.attn.qkv.bias" in sd
        else np.zeros((L, 3 * D), np.float32)
    )

    def lin(w, b):
        return {"w": t(w), "b": t(b)}

    return {
        "cls": t(_np(sd[prefix + "cls_token"])),
        "pos": t(_np(sd[prefix + "pos_embed"])),
        "patch": {
            "w": t(_np(sd[prefix + "patch_embed.proj.weight"])),
            "b": t(_np(sd[prefix + "patch_embed.proj.bias"])),
        },
        "layers": {
            "ln1": {"scale": st("blocks.{i}.norm1.weight"), "bias": st("blocks.{i}.norm1.bias")},
            "q": lin(qkv_w[:, :D], qkv_b[:, :D]),
            "k": lin(qkv_w[:, D : 2 * D], qkv_b[:, D : 2 * D]),
            "v": lin(qkv_w[:, 2 * D :], qkv_b[:, 2 * D :]),
            "o": {"w": st("blocks.{i}.attn.proj.weight"), "b": st("blocks.{i}.attn.proj.bias")},
            "ln2": {"scale": st("blocks.{i}.norm2.weight"), "bias": st("blocks.{i}.norm2.bias")},
            "fc1": {"w": st("blocks.{i}.mlp.fc1.weight"), "b": st("blocks.{i}.mlp.fc1.bias")},
            "fc2": {"w": st("blocks.{i}.mlp.fc2.weight"), "b": st("blocks.{i}.mlp.fc2.bias")},
        },
        "final_ln": {
            "scale": t(_np(sd[prefix + "norm.weight"])),
            "bias": t(_np(sd[prefix + "norm.bias"])),
        },
    }


def convert_med(
    sd: StateDict, cfg, prefix: str = "text_decoder.bert.",
    head_prefix: str = "text_decoder.cls.",
) -> Dict[str, Any]:
    """HF-Bert-style MED state dict (also matches HF BertLMHeadModel with
    prefix='bert.', head_prefix='cls.') → models/blip med params."""
    t = _to(cfg.dtype)
    L = cfg.num_layers

    def st(template):
        return t(_stack(sd, prefix + template, L, lambda w: w))

    def lin(base):
        return {"w": st(base + ".weight"), "b": st(base + ".bias")}

    def lnorm(base):
        return {"scale": st(base + ".weight"), "bias": st(base + ".bias")}

    has_cross = prefix + "encoder.layer.0.crossattention.self.query.weight" in sd
    layers = {
        "sq": lin("encoder.layer.{i}.attention.self.query"),
        "sk": lin("encoder.layer.{i}.attention.self.key"),
        "sv": lin("encoder.layer.{i}.attention.self.value"),
        "so": lin("encoder.layer.{i}.attention.output.dense"),
        "s_ln": lnorm("encoder.layer.{i}.attention.output.LayerNorm"),
        "fc1": lin("encoder.layer.{i}.intermediate.dense"),
        "fc2": lin("encoder.layer.{i}.output.dense"),
        "f_ln": lnorm("encoder.layer.{i}.output.LayerNorm"),
    }
    if has_cross:
        layers.update(
            cq=lin("encoder.layer.{i}.crossattention.self.query"),
            ck=lin("encoder.layer.{i}.crossattention.self.key"),
            cv=lin("encoder.layer.{i}.crossattention.self.value"),
            co=lin("encoder.layer.{i}.crossattention.output.dense"),
            c_ln=lnorm("encoder.layer.{i}.crossattention.output.LayerNorm"),
        )
    else:
        D = cfg.hidden_size
        zl = {"w": jnp.zeros((L, D, D), cfg.dtype), "b": jnp.zeros((L, D), cfg.dtype)}
        layers.update(
            cq=dict(zl), ck=dict(zl), cv=dict(zl), co=dict(zl),
            c_ln={"scale": jnp.ones((L, D), cfg.dtype), "bias": jnp.zeros((L, D), cfg.dtype)},
        )

    head = {
        "transform": {
            "w": t(_np(sd[head_prefix + "predictions.transform.dense.weight"])),
            "b": t(_np(sd[head_prefix + "predictions.transform.dense.bias"])),
        },
        "ln": {
            "scale": t(_np(sd[head_prefix + "predictions.transform.LayerNorm.weight"])),
            "bias": t(_np(sd[head_prefix + "predictions.transform.LayerNorm.bias"])),
        },
        "decoder": t(_np(sd[head_prefix + "predictions.decoder.weight"])),
        "bias": t(_np(sd[head_prefix + "predictions.bias"])),
    } if head_prefix + "predictions.transform.dense.weight" in sd else {
        "transform": {"w": jnp.eye(cfg.hidden_size, dtype=cfg.dtype),
                      "b": jnp.zeros((cfg.hidden_size,), cfg.dtype)},
        "ln": {"scale": jnp.ones((cfg.hidden_size,), cfg.dtype),
               "bias": jnp.zeros((cfg.hidden_size,), cfg.dtype)},
        "decoder": jnp.zeros((cfg.vocab_size, cfg.hidden_size), cfg.dtype),
        "bias": jnp.zeros((cfg.vocab_size,), cfg.dtype),
    }

    return {
        "embeddings": {
            "word": t(_np(sd[prefix + "embeddings.word_embeddings.weight"])),
            "pos": t(_np(sd[prefix + "embeddings.position_embeddings.weight"])),
            # ALBEF med config has add_type_embeddings=false — zero-fill (inert)
            "type": t(_np(sd[prefix + "embeddings.token_type_embeddings.weight"]))
            if prefix + "embeddings.token_type_embeddings.weight" in sd
            else jnp.zeros((2, cfg.hidden_size), cfg.dtype),
            "ln": {
                "scale": t(_np(sd[prefix + "embeddings.LayerNorm.weight"])),
                "bias": t(_np(sd[prefix + "embeddings.LayerNorm.bias"])),
            },
        },
        "layers": layers,
        "head": head,
    }


def convert_blip(sd: StateDict, cfg) -> Dict[str, Any]:
    """LAVIS BLIP checkpoint (blip_caption / blip_itm / feature extractor) →
    models/blip params. Caption checkpoints carry text_decoder.*; ITM /
    retrieval carry text_encoder.* + projections."""
    text_prefix = (
        "text_decoder.bert." if "text_decoder.bert.embeddings.word_embeddings.weight" in sd
        else "text_encoder.bert." if "text_encoder.bert.embeddings.word_embeddings.weight" in sd
        else "text_encoder."
    )
    head_prefix = "text_decoder.cls." if text_prefix.startswith("text_decoder") else "__none__."
    t = _to(cfg.text.dtype)
    params = {
        "visual": convert_blip_vit(sd, cfg.vision),
        "text": convert_med(sd, cfg.text, prefix=text_prefix, head_prefix=head_prefix),
        "vision_proj": {
            "w": t(_np(sd["vision_proj.weight"])),
            "b": t(_np(sd["vision_proj.bias"])) if "vision_proj.bias" in sd
            else jnp.zeros((cfg.embed_dim,), cfg.text.dtype),
        } if "vision_proj.weight" in sd else {
            "w": jnp.zeros((cfg.embed_dim, cfg.vision.hidden_size), cfg.text.dtype),
            "b": jnp.zeros((cfg.embed_dim,), cfg.text.dtype),
        },
        "text_proj": {
            "w": t(_np(sd["text_proj.weight"])),
            "b": t(_np(sd["text_proj.bias"])) if "text_proj.bias" in sd
            else jnp.zeros((cfg.embed_dim,), cfg.text.dtype),
        } if "text_proj.weight" in sd else {
            "w": jnp.zeros((cfg.embed_dim, cfg.text.hidden_size), cfg.text.dtype),
            "b": jnp.zeros((cfg.embed_dim,), cfg.text.dtype),
        },
        "itm_head": {
            "w": t(_np(sd["itm_head.weight"])),
            "b": t(_np(sd["itm_head.bias"])),
        } if "itm_head.weight" in sd else {
            "w": jnp.zeros((2, cfg.text.hidden_size), cfg.text.dtype),
            "b": jnp.zeros((2,), cfg.text.dtype),
        },
    }
    return params


def _pick_bert_prefix(sd: StateDict, base: str):
    for p in (base + ".bert.", base + "."):
        if p + "embeddings.word_embeddings.weight" in sd:
            return p
    return None


def _zero_fill_cross(sd: StateDict, prefix: str, med_cfg) -> Dict[str, Any]:
    """Synthesize zero crossattention.* keys for layers that lack them (the
    pre-fusion ALBEF layers / every ALPRO layer) so convert_med's stacked
    layout converts; the zero weights are inert under the mode gating."""
    D = med_cfg.hidden_size
    out = dict(sd)
    tmpl = prefix + "encoder.layer.{i}.crossattention."
    for i in range(med_cfg.num_layers):
        base = tmpl.format(i=i)
        if base + "self.query.weight" not in out:
            for name in ("self.query", "self.key", "self.value", "output.dense"):
                out[base + name + ".weight"] = np.zeros((D, D), np.float32)
                out[base + name + ".bias"] = np.zeros((D,), np.float32)
            out[base + "output.LayerNorm.weight"] = np.ones((D,), np.float32)
            out[base + "output.LayerNorm.bias"] = np.zeros((D,), np.float32)
    # convert_med detects cross from layer 0 — forced by construction
    assert tmpl.format(i=0) + "self.query.weight" in out
    return out


def convert_albef(sd: StateDict, cfg, variant: str = "retrieval") -> Dict[str, Any]:
    """LAVIS ALBEF checkpoint → models/albef params.

    Handles the reference's key layout (albef_vqa.py:408-431 load munging):
    `visual_encoder.*` timm ViT, `text_encoder[.bert].*` fusion BERT where
    only layers >= fusion_layer carry crossattention.* (med.py:400-418 —
    zero-filled here for the pre-fusion layers, inert under the mode gating),
    optional `text_decoder[.bert].*` (+cls head), projections, itm_head,
    `cls_head.{0,2}` Sequential(Linear, ReLU, Linear), and the `temp`
    scalar. Momentum (`*_m`) copies are dropped — the functional train step
    carries them separately."""
    t = _to(cfg.text.dtype)

    text_prefix = _pick_bert_prefix(sd, "text_encoder")
    if text_prefix is None:
        raise KeyError("no text_encoder.* keys in ALBEF state dict")
    sd_text = _zero_fill_cross(sd, text_prefix, cfg.text)
    # pretrain checkpoints are BertForMaskedLM: the MLM head lives at
    # text_encoder.cls.* regardless of whether bert. is nested
    head_prefix = "text_encoder.cls." if variant == "pretrain" else "__none__."
    params: Dict[str, Any] = {
        "visual": convert_blip_vit(sd, cfg.vision, prefix="visual_encoder."),
        "text": convert_med(sd_text, cfg.text, prefix=text_prefix, head_prefix=head_prefix),
    }

    def linear(name, o, i):
        if name + ".weight" in sd:
            return {"w": t(_np(sd[name + ".weight"])), "b": t(_np(sd[name + ".bias"]))}
        return {"w": jnp.zeros((o, i), cfg.text.dtype), "b": jnp.zeros((o,), cfg.text.dtype)}

    E, D = cfg.embed_dim, cfg.text.hidden_size
    if variant in ("retrieval", "feature", "pretrain"):
        params["vision_proj"] = linear("vision_proj", E, cfg.vision.hidden_size)
        params["text_proj"] = linear("text_proj", E, D)
    if variant in ("retrieval", "pretrain"):
        params["itm_head"] = linear("itm_head", 2, D)
        params["temp"] = (
            jnp.asarray(_np(sd["temp"]).reshape(()), jnp.float32)
            if "temp" in sd else jnp.asarray(0.07, jnp.float32)
        )
    if variant == "vqa":
        dec_prefix = _pick_bert_prefix(sd, "text_decoder")
        if dec_prefix is None:
            raise KeyError("vqa variant needs text_decoder.* keys")
        params["decoder"] = convert_med(
            _zero_fill_cross(sd, dec_prefix, cfg.decoder), cfg.decoder,
            prefix=dec_prefix, head_prefix="text_decoder.cls.",
        )
    if variant in ("classification", "nlvr"):
        params["cls_head"] = {
            "fc1": linear("cls_head.0", D, D),
            "fc2": linear("cls_head.2", cfg.num_classes, D),
        }
    return params


def convert_gpt2(sd: StateDict, cfg, prefix: str = "transformer.") -> Dict[str, Any]:
    """HF GPT2LMHeadModel state dict → models/gpt2 params. HF GPT-2 Conv1D
    weights are [in, out] — transposed here to the repo's [out, in]."""
    t = _to(cfg.dtype)
    L = cfg.num_layers

    def conv1d(template):
        return {
            "w": t(_stack(sd, prefix + template + ".weight", L, lambda w: w.T)),
            "b": t(_stack(sd, prefix + template + ".bias", L, lambda w: w)),
        }

    def lnorm(template):
        return {
            "scale": t(_stack(sd, prefix + template + ".weight", L, lambda w: w)),
            "bias": t(_stack(sd, prefix + template + ".bias", L, lambda w: w)),
        }

    return {
        "wte": t(_np(sd[prefix + "wte.weight"])),
        "wpe": t(_np(sd[prefix + "wpe.weight"])),
        "layers": {
            "ln1": lnorm("h.{i}.ln_1"),
            "qkv": conv1d("h.{i}.attn.c_attn"),
            "o": conv1d("h.{i}.attn.c_proj"),
            "ln2": lnorm("h.{i}.ln_2"),
            "fc1": conv1d("h.{i}.mlp.c_fc"),
            "fc2": conv1d("h.{i}.mlp.c_proj"),
        },
        "ln_f": {
            "scale": t(_np(sd[prefix + "ln_f.weight"])),
            "bias": t(_np(sd[prefix + "ln_f.bias"])),
        },
    }


def convert_gpt_dialogue(sd: StateDict, cfg) -> Dict[str, Any]:
    """LAVIS GPTDialogue checkpoint (gpt_dialogue.py: GPT2LMHeadModel +
    video_ff/video_ff_out Linears) → models/gpt2 dialogue params."""
    t = _to(cfg.gpt.dtype)
    return {
        "gpt": convert_gpt2(sd, cfg.gpt),
        "video_ff": {"w": t(_np(sd["video_ff.weight"])), "b": t(_np(sd["video_ff.bias"]))},
        "video_ff_out": {
            "w": t(_np(sd["video_ff_out.weight"])),
            "b": t(_np(sd["video_ff_out.bias"])),
        },
    }


def convert_timesformer(sd: StateDict, cfg, prefix: str = "visual_encoder.model.") -> Dict[str, Any]:
    """LAVIS TimeSformer state dict (timesformer/vit.py VisionTransformer)
    → models/timesformer params."""
    t = _to(cfg.dtype)
    L = cfg.num_layers

    def lin(template):
        return {
            "w": t(_stack(sd, prefix + template + ".weight", L, lambda w: w)),
            "b": t(_stack(sd, prefix + template + ".bias", L, lambda w: w)),
        }

    def lnorm(template):
        return {
            "scale": t(_stack(sd, prefix + template + ".weight", L, lambda w: w)),
            "bias": t(_stack(sd, prefix + template + ".bias", L, lambda w: w)),
        }

    return {
        "cls": t(_np(sd[prefix + "cls_token"])),
        "pos": t(_np(sd[prefix + "pos_embed"])),
        "time": t(_np(sd[prefix + "time_embed"])),
        "patch": {
            "w": t(_np(sd[prefix + "patch_embed.proj.weight"])),
            "b": t(_np(sd[prefix + "patch_embed.proj.bias"])),
        },
        "layers": {
            "t_ln": lnorm("blocks.{i}.temporal_norm1"),
            "t_qkv": lin("blocks.{i}.temporal_attn.qkv"),
            "t_proj": lin("blocks.{i}.temporal_attn.proj"),
            "t_fc": lin("blocks.{i}.temporal_fc"),
            "ln1": lnorm("blocks.{i}.norm1"),
            "qkv": lin("blocks.{i}.attn.qkv"),
            "proj": lin("blocks.{i}.attn.proj"),
            "ln2": lnorm("blocks.{i}.norm2"),
            "fc1": lin("blocks.{i}.mlp.fc1"),
            "fc2": lin("blocks.{i}.mlp.fc2"),
        },
        "final_ln": {
            "scale": t(_np(sd[prefix + "norm.weight"])),
            "bias": t(_np(sd[prefix + "norm.bias"])),
        },
    }


def convert_alpro(sd: StateDict, cfg, variant: str = "retrieval") -> Dict[str, Any]:
    """LAVIS ALPRO checkpoint → models/alpro params. The ALPRO BERT has no
    cross-attention at all (bert_config_alpro.json add_cross_attention=false)
    — cross slots are zero-filled and never executed (fusion is
    self-attention over the concatenated sequence)."""
    t = _to(cfg.text.dtype)

    text_prefix = _pick_bert_prefix(sd, "text_encoder")
    if text_prefix is None:
        raise KeyError("no text_encoder.* keys in ALPRO state dict")
    sd_text = _zero_fill_cross(sd, text_prefix, cfg.text)
    D = cfg.text.hidden_size

    params: Dict[str, Any] = {
        "visual": convert_timesformer(sd, cfg.video),
        "text": convert_med(sd_text, cfg.text, prefix=text_prefix, head_prefix="__none__."),
    }

    def linear(name, o, i):
        if name + ".weight" in sd:
            return {"w": t(_np(sd[name + ".weight"])), "b": t(_np(sd[name + ".bias"]))}
        return {"w": jnp.zeros((o, i), cfg.text.dtype), "b": jnp.zeros((o,), cfg.text.dtype)}

    E = cfg.embed_dim
    if variant == "retrieval":
        params["vision_proj"] = linear("vision_proj", E, cfg.video.hidden_size)
        params["text_proj"] = linear("text_proj", E, D)
        params["itm_head"] = linear("itm_head", 2, D)
        params["temp"] = (
            jnp.asarray(_np(sd["temp"]).reshape(()), jnp.float32)
            if "temp" in sd else jnp.asarray(0.07, jnp.float32)
        )
    if variant == "qa":
        params["classifier"] = {
            "fc1": linear("classifier.0", 2 * D, D),
            "fc2": linear("classifier.2", cfg.num_classes, 2 * D),
        }
    return params


def convert_clip_full(sd: StateDict, cfg) -> Dict[str, Any]:
    """HF CLIPModel state dict → models/clip params (vision via the existing
    CLIPVisionModel converter + projections, text tower, logit scale)."""
    t = _to(cfg.text.dtype)
    L = cfg.text.num_layers
    p = "text_model."

    def st(template):
        return _stack(sd, p + template, L, lambda w: w)

    qkv_w = np.concatenate(
        [st("encoder.layers.{i}.self_attn.q_proj.weight"),
         st("encoder.layers.{i}.self_attn.k_proj.weight"),
         st("encoder.layers.{i}.self_attn.v_proj.weight")], axis=1,
    )
    qkv_b = np.concatenate(
        [st("encoder.layers.{i}.self_attn.q_proj.bias"),
         st("encoder.layers.{i}.self_attn.k_proj.bias"),
         st("encoder.layers.{i}.self_attn.v_proj.bias")], axis=1,
    )

    def lin(template):
        return {"w": t(st(template + ".weight")), "b": t(st(template + ".bias"))}

    def lnorm(template):
        return {"scale": t(st(template + ".weight")), "bias": t(st(template + ".bias"))}

    return {
        "visual": convert_clip(sd, cfg.vision, prefix="vision_model."),
        "visual_proj": t(_np(sd["visual_projection.weight"]).T),
        "token_embedding": t(_np(sd[p + "embeddings.token_embedding.weight"])),
        "positional_embedding": t(_np(sd[p + "embeddings.position_embedding.weight"])),
        "text_layers": {
            "ln1": lnorm("encoder.layers.{i}.layer_norm1"),
            "qkv": {"w": t(qkv_w), "b": t(qkv_b)},
            "o": lin("encoder.layers.{i}.self_attn.out_proj"),
            "ln2": lnorm("encoder.layers.{i}.layer_norm2"),
            "fc1": lin("encoder.layers.{i}.mlp.fc1"),
            "fc2": lin("encoder.layers.{i}.mlp.fc2"),
        },
        "ln_final": {
            "scale": t(_np(sd[p + "final_layer_norm.weight"])),
            "bias": t(_np(sd[p + "final_layer_norm.bias"])),
        },
        "text_proj": t(_np(sd["text_projection.weight"]).T),
        "logit_scale": jnp.asarray(_np(sd["logit_scale"]).reshape(()), jnp.float32),
    }


def convert_clip_openai(sd: StateDict, cfg) -> Dict[str, Any]:
    """open_clip / LAVIS clip checkpoint naming (visual.*,
    transformer.resblocks.*) → models/clip params — the layout of the
    reference's pretrained CLIP weights (clip_models/pretrained.py)."""
    t = _to(cfg.text.dtype)
    v = cfg.vision
    Lv, Dv = v.num_layers, v.hidden_size
    Lt, Dt = cfg.text.num_layers, cfg.text.width

    def vst(template):
        return _stack(sd, "visual.transformer.resblocks." + template, Lv, lambda w: w)

    def tst(template):
        return _stack(sd, "transformer.resblocks." + template, Lt, lambda w: w)

    conv = _np(sd["visual.conv1.weight"])
    in_proj_w = vst("{i}.attn.in_proj_weight")      # [L, 3D, D]
    in_proj_b = vst("{i}.attn.in_proj_bias")

    def v_attn(sl):
        return {
            "kernel": t(np.swapaxes(in_proj_w[:, sl], 1, 2)),
            "bias": t(in_proj_b[:, sl]),
        }

    visual = {
        "cls": t(_np(sd["visual.class_embedding"]).reshape(-1)),
        "patch_embed": t(conv.reshape(conv.shape[0], -1).T),
        "pos_embed": t(_np(sd["visual.positional_embedding"])),
        "pre_ln": {
            "scale": t(_np(sd["visual.ln_pre.weight"])),
            "bias": t(_np(sd["visual.ln_pre.bias"])),
        },
        "layers": {
            "ln1": {"scale": t(vst("{i}.ln_1.weight")), "bias": t(vst("{i}.ln_1.bias"))},
            "q": v_attn(slice(0, Dv)),
            "k": v_attn(slice(Dv, 2 * Dv)),
            "v": v_attn(slice(2 * Dv, 3 * Dv)),
            "o": {
                "kernel": t(np.swapaxes(vst("{i}.attn.out_proj.weight"), 1, 2)),
                "bias": t(vst("{i}.attn.out_proj.bias")),
            },
            "ln2": {"scale": t(vst("{i}.ln_2.weight")), "bias": t(vst("{i}.ln_2.bias"))},
            "fc1": {
                "kernel": t(np.swapaxes(vst("{i}.mlp.c_fc.weight"), 1, 2)),
                "bias": t(vst("{i}.mlp.c_fc.bias")),
            },
            "fc2": {
                "kernel": t(np.swapaxes(vst("{i}.mlp.c_proj.weight"), 1, 2)),
                "bias": t(vst("{i}.mlp.c_proj.bias")),
            },
        },
        "post_ln": {
            "scale": t(_np(sd["visual.ln_post.weight"])),
            "bias": t(_np(sd["visual.ln_post.bias"])),
        },
    }
    return {
        "visual": visual,
        "visual_proj": t(_np(sd["visual.proj"])),            # already [D, E]
        "token_embedding": t(_np(sd["token_embedding.weight"])),
        "positional_embedding": t(_np(sd["positional_embedding"])),
        "text_layers": {
            "ln1": {"scale": t(tst("{i}.ln_1.weight")), "bias": t(tst("{i}.ln_1.bias"))},
            "qkv": {"w": t(tst("{i}.attn.in_proj_weight")), "b": t(tst("{i}.attn.in_proj_bias"))},
            "o": {"w": t(tst("{i}.attn.out_proj.weight")), "b": t(tst("{i}.attn.out_proj.bias"))},
            "ln2": {"scale": t(tst("{i}.ln_2.weight")), "bias": t(tst("{i}.ln_2.bias"))},
            "fc1": {"w": t(tst("{i}.mlp.c_fc.weight")), "b": t(tst("{i}.mlp.c_fc.bias"))},
            "fc2": {"w": t(tst("{i}.mlp.c_proj.weight")), "b": t(tst("{i}.mlp.c_proj.bias"))},
        },
        "ln_final": {
            "scale": t(_np(sd["ln_final.weight"])),
            "bias": t(_np(sd["ln_final.bias"])),
        },
        "text_proj": t(_np(sd["text_projection"])),          # already [D, E]
        "logit_scale": jnp.asarray(_np(sd["logit_scale"]).reshape(()), jnp.float32),
    }


def convert_blip_nlvr(sd: StateDict, cfg) -> Dict[str, Any]:
    """LAVIS BLIP-NLVR checkpoint (blip_nlvr.py + nlvr_encoder.py twin
    cross-attention: crossattention.self0/self1 + output.dense0/dense1 +
    output.merge_layer for layers >= 6) → models/blip_variants NLVR params.
    `cfg` is an NlvrConfig."""
    t = _to(cfg.base.text.dtype)
    tc = cfg.base.text
    L, D = tc.num_layers, tc.hidden_size

    prefix = _pick_bert_prefix(sd, "text_encoder")
    if prefix is None:
        raise KeyError("no text_encoder.* keys in NLVR state dict")
    base = convert_med(sd, tc, prefix=prefix, head_prefix="__none__.")

    def st(template):
        return t(_stack(sd, prefix + template, L, lambda w: w))

    def lin(base_name):
        return {"w": st(base_name + ".weight"), "b": st(base_name + ".bias")}

    layers = dict(base["layers"])
    for tw in ("0", "1"):
        layers[f"c{tw}q"] = lin(f"encoder.layer.{{i}}.crossattention.self{tw}.query")
        layers[f"c{tw}k"] = lin(f"encoder.layer.{{i}}.crossattention.self{tw}.key")
        layers[f"c{tw}v"] = lin(f"encoder.layer.{{i}}.crossattention.self{tw}.value")
        layers[f"d{tw}"] = lin(f"encoder.layer.{{i}}.crossattention.output.dense{tw}")
    layers["c_ln"] = {
        "scale": st("encoder.layer.{i}.crossattention.output.LayerNorm.weight"),
        "bias": st("encoder.layer.{i}.crossattention.output.LayerNorm.bias"),
    }
    # merge_layer exists only for layers >= merge_from — zero-fill the rest
    mw = np.zeros((L, D, 2 * D), np.float32)
    mb = np.zeros((L, D), np.float32)
    for i in range(L):
        key = prefix + f"encoder.layer.{i}.crossattention.output.merge_layer.weight"
        if key in sd:
            mw[i] = _np(sd[key])
            mb[i] = _np(sd[key.replace("weight", "bias")])
    layers["merge"] = {"w": t(mw), "b": t(mb)}
    for k in ("cq", "ck", "cv", "co"):
        layers.pop(k, None)
    base["layers"] = layers

    def head_lin(name, o, i):
        if name + ".weight" in sd:
            return {"w": t(_np(sd[name + ".weight"])), "b": t(_np(sd[name + ".bias"]))}
        return {"w": jnp.zeros((o, i), tc.dtype), "b": jnp.zeros((o,), tc.dtype)}

    return {
        "visual": convert_blip_vit(sd, cfg.base.vision, prefix="visual_encoder."),
        "text": base,
        "cls_head": {
            "fc1": head_lin("cls_head.0", D, D),
            "fc2": head_lin("cls_head.2", cfg.num_classes, D),
        },
    }


def convert_blip_variant(
    sd: StateDict, cfg, variant: str, num_classes: int = 2
) -> Dict[str, Any]:
    """LAVIS BLIP variant checkpoints → models/blip_variants params.

    vqa: text_encoder (question encoder) + text_decoder (+cls head) as
    separate med trees (blip_vqa.py:43-50 — convert_blip alone would load
    the decoder into the encoder slot); classification: + cls_head.{0,2};
    retrieval: convert_blip + temp scalar; pretrain: retrieval + decoder."""
    tc = cfg.text
    t = _to(tc.dtype)

    def linear(name, o, i):
        if name + ".weight" in sd:
            return {"w": t(_np(sd[name + ".weight"])), "b": t(_np(sd[name + ".bias"]))}
        return {"w": jnp.zeros((o, i), tc.dtype), "b": jnp.zeros((o,), tc.dtype)}

    enc_prefix = _pick_bert_prefix(sd, "text_encoder")
    if enc_prefix is None:
        raise KeyError(f"{variant} checkpoint lacks text_encoder.* keys")
    # NOTE: always take the "text" tree from text_encoder.* explicitly —
    # convert_blip's prefix preference would load text_decoder.* into the
    # encoder slot for checkpoints that carry both (vqa, pretrain)
    params: Dict[str, Any] = {
        "visual": convert_blip_vit(sd, cfg.vision, prefix="visual_encoder."),
        "text": convert_med(sd, tc, prefix=enc_prefix, head_prefix="__none__."),
    }
    if variant in ("retrieval", "pretrain"):
        E = cfg.embed_dim
        params["vision_proj"] = linear("vision_proj", E, cfg.vision.hidden_size)
        params["text_proj"] = linear("text_proj", E, tc.hidden_size)
        params["itm_head"] = linear("itm_head", 2, tc.hidden_size)
        params["temp"] = (
            jnp.asarray(_np(sd["temp"]).reshape(()), jnp.float32)
            if "temp" in sd else jnp.asarray(0.07, jnp.float32)
        )
        if variant == "pretrain":
            dec_prefix = _pick_bert_prefix(sd, "text_decoder")
            if dec_prefix is None:
                raise KeyError("pretrain checkpoint lacks text_decoder.* keys")
            params["decoder"] = convert_med(
                sd, tc, prefix=dec_prefix, head_prefix="text_decoder.cls."
            )
        return params

    if variant == "vqa":
        dec_prefix = _pick_bert_prefix(sd, "text_decoder")
        if dec_prefix is None:
            raise KeyError("vqa checkpoint lacks text_decoder.* keys")
        params["decoder"] = convert_med(
            sd, tc, prefix=dec_prefix, head_prefix="text_decoder.cls."
        )
    elif variant == "classification":
        D = tc.hidden_size
        params["cls_head"] = {
            "fc1": linear("cls_head.0", D, D),
            "fc2": linear("cls_head.2", num_classes, D),
        }
    else:
        raise ValueError(f"unknown blip variant {variant!r}")
    return params
