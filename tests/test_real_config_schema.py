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

import pytest

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
    of weights. The builder lives in tests/ckpt_fixture.py (shared with the
    parity_check CLI test)."""
    pytest.importorskip("safetensors.numpy")
    from ckpt_fixture import D, F, V, L, VD, VF
    from ckpt_fixture import build_tiny_llava_checkpoint, small_vision_config

    from llava_align_tpu.utils.hf_convert import load_llava_checkpoint

    VL = build_tiny_llava_checkpoint(tmp_path, vision_layers=24, image_size=336)
    with small_vision_config(vision_layers=VL, image_size=336):
        params, cfg = load_llava_checkpoint(str(tmp_path))

    assert params["llama"]["embed"].shape == (V, D)
    assert params["llama"]["layers"]["q"].shape == (L, D, D)
    assert params["llama"]["layers"]["down"].shape == (L, D, F)
    assert params["projector"]["layers"][0]["kernel"].shape == (VD, D)
    assert params["vision"]["layers"]["fc1"]["kernel"].shape == (VL, VD, VF)
    assert cfg.text.num_layers == L
