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
