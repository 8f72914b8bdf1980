"""Converter schema tests against the real HF config.json contents
(VERDICT next-step 7): real weights are unavailable in this environment
(zero egress), so these pin (a) the config.json → config-dataclass wiring for
the actual released checkpoints, and (b) the full checkpoint-directory load
path (config.json + safetensors with HF key names) end-to-end at reduced
width. scripts/parity_real.sh is the documented one-command real-weight flow
for an environment that has the checkpoints.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "hf_configs")


def _load(name):
    with open(os.path.join(FIX, name)) as f:
        return json.load(f)


def test_llava_7b_config_wiring():
    from llava_align_tpu.utils.hf_convert import config_from_hf

    cfg = config_from_hf(_load("llava-v1.5-7b.json"))
    assert cfg.text.hidden_size == 4096
    assert cfg.text.intermediate_size == 11008
    assert cfg.text.num_layers == 32
    assert cfg.text.num_heads == cfg.text.num_kv_heads == 32
    assert cfg.text.head_dim == 128
    assert cfg.text.vocab_size == 32000
    assert cfg.text.rms_norm_eps == 1e-5
    assert cfg.mm_projector_type == "mlp2x_gelu"
    assert cfg.image_aspect_ratio == "pad"
    assert cfg.vision.select_layer == -2
    assert cfg.vision.select_feature == "patch"
    # CLIP-ViT-L/336: 24 layers, 1024 wide, 576 patch tokens
    assert cfg.vision.image_size == 336 and cfg.vision.patch_size == 14
    assert cfg.num_image_tokens == 576
    # matches the baked-in preset
    from llava_align_tpu.config import LlavaConfig

    preset = LlavaConfig.llava_v15_7b()
    assert preset.text == cfg.text
    assert preset.mm_projector_type == cfg.mm_projector_type


def test_llava_13b_config_wiring():
    from llava_align_tpu.config import LlavaConfig
    from llava_align_tpu.utils.hf_convert import config_from_hf

    cfg = config_from_hf(_load("llava-v1.5-13b.json"))
    assert cfg.text.hidden_size == 5120
    assert cfg.text.intermediate_size == 13824
    assert cfg.text.num_layers == 40
    assert cfg.text.num_heads == 40 and cfg.text.head_dim == 128
    assert LlavaConfig.llava_v15_13b().text == cfg.text


def test_qwen_vl_config_wiring(tmp_path):
    """load_qwen_vl_checkpoint's config parsing on the real Qwen-VL
    config.json (weights absent → only the cfg half is exercised)."""
    from llava_align_tpu.models.qwen import QwenConfig
    from llava_align_tpu.models.qwen_vit import QwenVisionConfig

    hf = _load("qwen-vl.json")
    # mirror load_qwen_vl_checkpoint's parsing exactly (hf_convert.py:436)
    vis = hf.get("visual", {})
    text = QwenConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"], num_heads=hf["num_attention_heads"],
        head_dim=hf.get("kv_channels"), intermediate_size=hf["intermediate_size"],
        layer_norm_eps=hf.get("layer_norm_epsilon", 1e-6),
        rotary_emb_base=hf.get("rotary_emb_base", 10000),
        seq_length=hf.get("seq_length", 2048),
        use_dynamic_ntk=hf.get("use_dynamic_ntk", True),
        use_logn_attn=hf.get("use_logn_attn", True),
    )
    assert text.hidden_size == 4096 and text.num_layers == 32
    assert text.head_dim == 128 and text.intermediate_size == 22016
    assert text.vocab_size == 151936 and text.seq_length == 2048
    assert text.use_dynamic_ntk and text.use_logn_attn
    vision = QwenVisionConfig(
        image_size=vis["image_size"], patch_size=vis["patch_size"],
        width=vis["width"], num_layers=vis["layers"], num_heads=vis["heads"],
        mlp_ratio=vis["mlp_ratio"], output_dim=vis["output_dim"],
    )
    assert vision.n_queries == 256
    assert vis["image_start_id"] == 151857


def test_llava_checkpoint_dir_load_end_to_end(tmp_path):
    """Full load_llava_checkpoint path: config.json + safetensors carrying
    the REAL HF key names (model.layers.*.self_attn.q_proj.weight,
    model.vision_tower.vision_tower.vision_model.*, model.mm_projector.*) at
    reduced width — catches key-template or shape-wiring drift without 13GB
    of weights."""
    st = pytest.importorskip("safetensors.numpy")
    from llava_align_tpu.utils.hf_convert import load_llava_checkpoint

    hf_cfg = _load("llava-v1.5-7b.json")
    # shrink width, keep every schema knob and name
    hf_cfg.update(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, vocab_size=128,
        mm_hidden_size=32,
    )
    with open(tmp_path / "config.json", "w") as f:
        json.dump(hf_cfg, f)

    D, F, V, L, Dh = 64, 128, 128, 2, 16
    VD, VF, VL = 32, 64, 24  # vision dims (ClipVisionConfig defaults scaled)
    rng = np.random.default_rng(0)

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
    sd[vp + "embeddings.position_embedding.weight"] = t(577, VD)
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
    st.save_file({k: v for k, v in sd.items()}, str(tmp_path / "model.safetensors"))

    import dataclasses

    from llava_align_tpu.config import ClipVisionConfig
    from llava_align_tpu.utils import hf_convert

    # the real ClipVisionConfig is fixed at ViT-L dims; patch config_from_hf's
    # vision side for the reduced-width fixture
    orig = hf_convert.config_from_hf

    def small_cfg(hf, dtype=jnp.bfloat16):
        cfg = orig(hf, dtype)
        vision = ClipVisionConfig(
            image_size=336, patch_size=14, hidden_size=VD, intermediate_size=VF,
            num_layers=VL, num_heads=4, select_layer=cfg.vision.select_layer,
            select_feature=cfg.vision.select_feature, dtype=dtype,
        )
        return dataclasses.replace(cfg, vision=vision)

    hf_convert.config_from_hf, restore = small_cfg, orig
    try:
        params, cfg = load_llava_checkpoint(str(tmp_path))
    finally:
        hf_convert.config_from_hf = restore

    assert params["llama"]["embed"].shape == (V, D)
    assert params["llama"]["layers"]["q"].shape == (L, D, D)
    assert params["llama"]["layers"]["down"].shape == (L, D, F)
    assert params["projector"]["layers"][0]["kernel"].shape == (VD, D)
    assert params["vision"]["layers"]["fc1"]["kernel"].shape == (VL, VD, VF)
    assert cfg.text.num_layers == L
