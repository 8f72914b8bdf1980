"""CLIP vision tower parity vs HF torch (tiny random CLIPVisionModel),
including the select_layer=-2 / 'patch' feature tap
(reference clip_encoder.py:29-37)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from llava_align_tpu.config import ClipVisionConfig
from llava_align_tpu.models import clip_vit
from llava_align_tpu.utils.hf_convert import convert_clip

CFG = ClipVisionConfig(
    image_size=28,
    patch_size=14,
    hidden_size=32,
    intermediate_size=64,
    num_layers=3,
    num_heads=2,
    select_layer=-2,
    select_feature="patch",
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def models():
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModel

    torch.manual_seed(0)
    hf = CLIPVisionModel(
        HFCfg(
            image_size=CFG.image_size,
            patch_size=CFG.patch_size,
            hidden_size=CFG.hidden_size,
            intermediate_size=CFG.intermediate_size,
            num_hidden_layers=CFG.num_layers,
            num_attention_heads=CFG.num_heads,
            hidden_act="quick_gelu",
            attn_implementation="eager",
        )
    ).eval()
    params = convert_clip({k: v for k, v in hf.state_dict().items()}, CFG)
    return hf, params


def _hf_selected(hf, pixels, select_layer, select_feature):
    with torch.no_grad():
        out = hf(torch.tensor(pixels), output_hidden_states=True)
    feats = out.hidden_states[select_layer]
    if select_feature == "patch":
        feats = feats[:, 1:]
    return feats.numpy()


def test_feature_parity_select_minus2(models):
    hf, params = models
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, CFG.image_size, CFG.image_size)).astype(np.float32)
    ours = np.asarray(clip_vit.forward_features(params, CFG, jnp.asarray(pixels)))
    theirs = _hf_selected(hf, pixels, -2, "patch")
    assert ours.shape == theirs.shape == (2, CFG.num_patches, CFG.hidden_size)
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_feature_parity_cls_patch_last_layer(models):
    hf, params = models
    import dataclasses

    cfg = dataclasses.replace(CFG, select_layer=-1, select_feature="cls_patch")
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, CFG.image_size, CFG.image_size)).astype(np.float32)
    ours = np.asarray(clip_vit.forward_features(params, cfg, jnp.asarray(pixels)))
    theirs = _hf_selected(hf, pixels, -1, "cls_patch")
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_num_patches():
    assert CFG.num_patches == 4
    assert ClipVisionConfig.clip_vit_l_336().num_patches == 576
