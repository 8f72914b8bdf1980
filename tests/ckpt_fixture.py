"""Shared synthetic llava-v1.5 checkpoint-dir builder.

Writes a reduced-width checkpoint directory carrying the REAL HF key names
(model.layers.*.self_attn.q_proj.weight, model.vision_tower.vision_tower.
vision_model.*, model.mm_projector.*) + the real llava-v1.5-7b config.json
schema, so loader/parity tests exercise the exact on-disk format of
liuhaotian/llava-v1.5-* without 13GB of weights. Used by
tests/test_real_config_schema.py (loader wiring) and
tests/test_parity_check_cli.py (the scripts/parity_real.sh flow end-to-end).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os

import numpy as np

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "hf_configs")

# reduced dims (language / vision)
D, F, V, L = 64, 128, 128, 2
VD, VF = 32, 64


def build_tiny_llava_checkpoint(
    dirpath, *, vision_layers: int = 24, image_size: int = 336,
    with_tokenizer: bool = False, seed: int = 0,
):
    """config.json + model.safetensors (+ optional Bert wordpiece tokenizer)
    at reduced width under `dirpath`. Returns the vision layer count used."""
    from safetensors import numpy as st

    with open(os.path.join(FIX, "llava-v1.5-7b.json")) as f:
        hf_cfg = json.load(f)
    hf_cfg.update(
        hidden_size=D, intermediate_size=F, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=4, vocab_size=V,
        mm_hidden_size=VD,
    )
    os.makedirs(str(dirpath), exist_ok=True)
    with open(os.path.join(str(dirpath), "config.json"), "w") as f:
        json.dump(hf_cfg, f)

    VL = vision_layers
    n_pos = 1 + (image_size // 14) ** 2
    rng = np.random.default_rng(seed)

    def t(*shape):
        return rng.normal(size=shape).astype(np.float16)

    sd = {"model.embed_tokens.weight": t(V, D), "model.norm.weight": t(D),
          "lm_head.weight": t(V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = t(D)
        sd[p + "self_attn.q_proj.weight"] = t(D, D)
        sd[p + "self_attn.k_proj.weight"] = t(D, D)
        sd[p + "self_attn.v_proj.weight"] = t(D, D)
        sd[p + "self_attn.o_proj.weight"] = t(D, D)
        sd[p + "post_attention_layernorm.weight"] = t(D)
        sd[p + "mlp.gate_proj.weight"] = t(F, D)
        sd[p + "mlp.up_proj.weight"] = t(F, D)
        sd[p + "mlp.down_proj.weight"] = t(D, F)
    vp = "model.vision_tower.vision_tower.vision_model."
    sd[vp + "embeddings.class_embedding"] = t(VD)
    sd[vp + "embeddings.patch_embedding.weight"] = t(VD, 3, 14, 14)
    sd[vp + "embeddings.position_embedding.weight"] = t(n_pos, VD)
    sd[vp + "pre_layrnorm.weight"] = t(VD)
    sd[vp + "pre_layrnorm.bias"] = t(VD)
    sd[vp + "post_layernorm.weight"] = t(VD)
    sd[vp + "post_layernorm.bias"] = t(VD)
    for i in range(VL):
        p = vp + f"encoder.layers.{i}."
        for nm, shape in [
            ("layer_norm1.weight", (VD,)), ("layer_norm1.bias", (VD,)),
            ("self_attn.q_proj.weight", (VD, VD)), ("self_attn.q_proj.bias", (VD,)),
            ("self_attn.k_proj.weight", (VD, VD)), ("self_attn.k_proj.bias", (VD,)),
            ("self_attn.v_proj.weight", (VD, VD)), ("self_attn.v_proj.bias", (VD,)),
            ("self_attn.out_proj.weight", (VD, VD)), ("self_attn.out_proj.bias", (VD,)),
            ("layer_norm2.weight", (VD,)), ("layer_norm2.bias", (VD,)),
            ("mlp.fc1.weight", (VF, VD)), ("mlp.fc1.bias", (VF,)),
            ("mlp.fc2.weight", (VD, VF)), ("mlp.fc2.bias", (VD,)),
        ]:
            sd[p + nm] = t(*shape)
    sd["model.mm_projector.0.weight"] = t(D, VD)
    sd["model.mm_projector.0.bias"] = t(D)
    sd["model.mm_projector.2.weight"] = t(D, D)
    sd["model.mm_projector.2.bias"] = t(D)
    st.save_file(dict(sd), os.path.join(str(dirpath), "model.safetensors"))

    if with_tokenizer:
        words = ["is", "there", "a", "dog", "in", "the", "image", "please",
                 "answer", "this", "question", "with", "one", "word", "user",
                 "assistant", ":", ".", "?", "'", "s"]
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
        assert len(vocab) < V
        with open(os.path.join(str(dirpath), "vocab.txt"), "w") as f:
            f.write("\n".join(vocab) + "\n")
        with open(os.path.join(str(dirpath), "tokenizer_config.json"), "w") as f:
            json.dump({"tokenizer_class": "BertTokenizer", "do_lower_case": True}, f)
    return VL


@contextlib.contextmanager
def small_vision_config(vision_layers: int = 24, image_size: int = 336):
    """Monkeypatch hf_convert.config_from_hf for the reduced-width fixture —
    the real ClipVisionConfig is pinned at ViT-L/336 dims."""
    import jax.numpy as jnp

    from llava_align_tpu.config import ClipVisionConfig
    from llava_align_tpu.utils import hf_convert

    orig = hf_convert.config_from_hf

    def small_cfg(hf, dtype=jnp.bfloat16):
        cfg = orig(hf, dtype)
        vision = ClipVisionConfig(
            image_size=image_size, patch_size=14, hidden_size=VD,
            intermediate_size=VF, num_layers=vision_layers, num_heads=4,
            select_layer=cfg.vision.select_layer,
            select_feature=cfg.vision.select_feature, dtype=dtype,
        )
        return dataclasses.replace(cfg, vision=vision)

    hf_convert.config_from_hf = small_cfg
    try:
        yield
    finally:
        hf_convert.config_from_hf = orig


# ---------------------------------------------------------------------------
# PnP-VQA / Img2Prompt composite fixture: three tiny component checkpoints
# (BLIP-ITM, BLIP-caption, UnifiedQAv2-style T5) with the REAL LAVIS/HF key
# names the converters consume, under <dir>/{itm,cap,<qa_key>}.
# ---------------------------------------------------------------------------

BLIP_TINY_JSON = {
    "vision": {"image_size": 32, "patch_size": 16, "hidden_size": 32,
               "num_layers": 2, "num_heads": 4},
    "text": {"vocab_size": 64, "hidden_size": 32, "num_layers": 2,
             "num_heads": 4, "intermediate_size": 64,
             "max_position_embeddings": 64},
    "embed_dim": 16,
}

T5_TINY_JSON = {
    "vocab_size": 64, "d_model": 32, "d_kv": 8, "num_heads": 4, "d_ff": 64,
    "num_layers": 2, "num_decoder_layers": 2, "is_gated_act": True,
    "tie_word_embeddings": False,
}


def _tiny_blip_sd(rng, *, decoder: bool):
    """LAVIS BLIP checkpoint keys: visual_encoder.* (timm ViT, fused qkv) +
    text_{en,de}coder MED BERT (cross-attention in every layer); the caption
    flavor adds the text_decoder.cls.* head, the ITM flavor the projections."""
    v = BLIP_TINY_JSON["vision"]
    m = BLIP_TINY_JSON["text"]
    D, F = v["hidden_size"], int(v["hidden_size"] * 4.0)
    MD, MF, V_ = m["hidden_size"], m["intermediate_size"], m["vocab_size"]
    n_pos = 1 + (v["image_size"] // v["patch_size"]) ** 2

    def t(*shape):
        return (rng.normal(size=shape) * 0.05).astype(np.float32)

    sd = {
        "visual_encoder.cls_token": t(1, 1, D),
        "visual_encoder.pos_embed": t(1, n_pos, D),
        "visual_encoder.patch_embed.proj.weight": t(D, 3, v["patch_size"], v["patch_size"]),
        "visual_encoder.patch_embed.proj.bias": t(D),
        "visual_encoder.norm.weight": t(D),
        "visual_encoder.norm.bias": t(D),
    }
    for i in range(v["num_layers"]):
        p = f"visual_encoder.blocks.{i}."
        sd[p + "attn.qkv.weight"] = t(3 * D, D)
        sd[p + "attn.qkv.bias"] = t(3 * D)
        sd[p + "attn.proj.weight"] = t(D, D)
        sd[p + "attn.proj.bias"] = t(D)
        for ln in ("norm1", "norm2"):
            sd[p + ln + ".weight"] = t(D)
            sd[p + ln + ".bias"] = t(D)
        sd[p + "mlp.fc1.weight"] = t(F, D)
        sd[p + "mlp.fc1.bias"] = t(F)
        sd[p + "mlp.fc2.weight"] = t(D, F)
        sd[p + "mlp.fc2.bias"] = t(D)

    tp = "text_decoder.bert." if decoder else "text_encoder."
    sd[tp + "embeddings.word_embeddings.weight"] = t(V_, MD)
    sd[tp + "embeddings.position_embeddings.weight"] = t(
        m["max_position_embeddings"], MD
    )
    sd[tp + "embeddings.LayerNorm.weight"] = t(MD)
    sd[tp + "embeddings.LayerNorm.bias"] = t(MD)
    for i in range(m["num_layers"]):
        p = tp + f"encoder.layer.{i}."
        for blk in ("attention", "crossattention"):
            for qkv in ("query", "key", "value"):
                sd[p + f"{blk}.self.{qkv}.weight"] = t(MD, MD)
                sd[p + f"{blk}.self.{qkv}.bias"] = t(MD)
            sd[p + f"{blk}.output.dense.weight"] = t(MD, MD)
            sd[p + f"{blk}.output.dense.bias"] = t(MD)
            sd[p + f"{blk}.output.LayerNorm.weight"] = t(MD)
            sd[p + f"{blk}.output.LayerNorm.bias"] = t(MD)
        sd[p + "intermediate.dense.weight"] = t(MF, MD)
        sd[p + "intermediate.dense.bias"] = t(MF)
        sd[p + "output.dense.weight"] = t(MD, MF)
        sd[p + "output.dense.bias"] = t(MD)
        sd[p + "output.LayerNorm.weight"] = t(MD)
        sd[p + "output.LayerNorm.bias"] = t(MD)
    if decoder:
        hp = "text_decoder.cls.predictions."
        sd[hp + "transform.dense.weight"] = t(MD, MD)
        sd[hp + "transform.dense.bias"] = t(MD)
        sd[hp + "transform.LayerNorm.weight"] = t(MD)
        sd[hp + "transform.LayerNorm.bias"] = t(MD)
        sd[hp + "decoder.weight"] = t(V_, MD)
        sd[hp + "bias"] = t(V_)
    else:
        E = BLIP_TINY_JSON["embed_dim"]
        sd["vision_proj.weight"] = t(E, D)
        sd["vision_proj.bias"] = t(E)
        sd["text_proj.weight"] = t(E, MD)
        sd["text_proj.bias"] = t(E)
        sd["itm_head.weight"] = t(2, MD)
        sd["itm_head.bias"] = t(2)
    return sd


def _tiny_t5_sd(rng):
    """HF T5 v1.1 (gated, untied) keys at the T5_TINY_JSON dims."""
    c = T5_TINY_JSON
    D, V_ = c["d_model"], c["vocab_size"]
    inner = c["num_heads"] * c["d_kv"]

    def t(*shape):
        return (rng.normal(size=shape) * 0.05).astype(np.float32)

    sd = {"shared.weight": t(V_, D), "lm_head.weight": t(V_, D),
          "encoder.final_layer_norm.weight": t(D),
          "decoder.final_layer_norm.weight": t(D)}
    for side, n_layers in (("encoder", c["num_layers"]),
                           ("decoder", c["num_decoder_layers"])):
        sd[f"{side}.block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = t(
            32, c["num_heads"]
        )
        for i in range(n_layers):
            b = f"{side}.block.{i}."
            attns = [("layer.0.SelfAttention", "layer.0.layer_norm")]
            ffn_layer = "layer.1"
            if side == "decoder":
                attns.append(("layer.1.EncDecAttention", "layer.1.layer_norm"))
                ffn_layer = "layer.2"
            for attn, ln in attns:
                for proj in ("q", "k", "v"):
                    sd[b + f"{attn}.{proj}.weight"] = t(inner, D)
                sd[b + f"{attn}.o.weight"] = t(D, inner)
                sd[b + ln + ".weight"] = t(D)
            sd[b + ffn_layer + ".DenseReluDense.wi_0.weight"] = t(c["d_ff"], D)
            sd[b + ffn_layer + ".DenseReluDense.wi_1.weight"] = t(c["d_ff"], D)
            sd[b + ffn_layer + ".DenseReluDense.wo.weight"] = t(D, c["d_ff"])
            sd[b + ffn_layer + ".layer_norm.weight"] = t(D)
    return sd


def build_tiny_blip_t5_composite(dirpath, *, qa_key: str = "qa", seed: int = 0):
    """<dirpath>/{itm,cap,<qa_key>}/ each holding model.safetensors +
    config.json — the on-disk layout load_blip_t5_composite consumes."""
    from safetensors import numpy as st

    rng = np.random.default_rng(seed)
    comps = {
        "itm": (_tiny_blip_sd(rng, decoder=False), BLIP_TINY_JSON),
        "cap": (_tiny_blip_sd(rng, decoder=True), BLIP_TINY_JSON),
        qa_key: (_tiny_t5_sd(rng), T5_TINY_JSON),
    }
    for name, (sd, cfg_json) in comps.items():
        d = os.path.join(str(dirpath), name)
        os.makedirs(d, exist_ok=True)
        st.save_file(sd, os.path.join(d, "model.safetensors"))
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(cfg_json, f)
    return str(dirpath)
