"""Qwen-VL numerical parity vs the reference torch implementation
(/root/reference/experiments/Qwen_VL, used read-only as a test oracle with a
stubbed torchvision), plus cache self-consistency.

The tiny config sets seq_length=16 so both dynamic-NTK rope scaling and log-n
attention scaling are ACTIVE in the parity comparison.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.models import llava as llava_model
from llava_align_tpu.models import qwen, qwen_vit, qwen_vl
from llava_align_tpu.models.qwen import QwenConfig
from llava_align_tpu.models.qwen_vit import QwenVisionConfig
from llava_align_tpu.models.qwen_vl import QwenVLConfig
from llava_align_tpu.utils.hf_convert import convert_qwen, convert_qwen_visual

IMG_START = 500

TEXT_CFG = QwenConfig(
    vocab_size=512,
    hidden_size=128,
    num_layers=2,
    num_heads=4,
    head_dim=32,
    intermediate_size=256,
    seq_length=16,  # << prompt length → NTK + log-n active
    dtype=jnp.float32,
)
VIS_CFG = QwenVisionConfig(
    image_size=28, patch_size=14, width=32, num_layers=2, num_heads=2,
    mlp_ratio=2.0, n_queries=4, output_dim=128, dtype=jnp.float32,
)
CFG = QwenVLConfig(text=TEXT_CFG, vision=VIS_CFG, image_start_id=IMG_START)


def _stub_torchvision():
    # ADDITIVE (stub_utils): another oracle file may have registered a
    # torchvision stub already — extend it with the attributes Qwen_VL's
    # visual.py imports instead of early-returning (an early return left
    # transforms without InterpolationMode when test_processors_tail's
    # stub, which only puts it in transforms.functional, ran first).
    from stub_utils import stub_module

    class _Noop:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    tv = stub_module("torchvision")
    transforms = stub_module(
        "torchvision.transforms",
        Compose=Compose,
        Resize=_Noop,
        ToTensor=_Noop,
        Normalize=_Noop,
        InterpolationMode=types.SimpleNamespace(BICUBIC="bicubic"),
    )
    if not hasattr(tv, "transforms"):
        tv.transforms = transforms


@pytest.fixture(scope="module")
def ref_model():
    _stub_torchvision()
    sys.path.insert(0, "/root/reference/experiments")
    from Qwen_VL.configuration_qwen import QWenConfig as RefCfg
    from Qwen_VL.modeling_qwen import QWenLMHeadModel

    torch.manual_seed(0)
    cfg = RefCfg(
        vocab_size=TEXT_CFG.vocab_size,
        hidden_size=TEXT_CFG.hidden_size,
        num_hidden_layers=TEXT_CFG.num_layers,
        num_attention_heads=TEXT_CFG.num_heads,
        kv_channels=TEXT_CFG.head_dim,
        intermediate_size=TEXT_CFG.intermediate_size,
        seq_length=TEXT_CFG.seq_length,
        use_dynamic_ntk=True,
        use_logn_attn=True,
        use_flash_attn=False,
        fp32=True,
        visual=dict(
            image_size=VIS_CFG.image_size,
            patch_size=VIS_CFG.patch_size,
            width=VIS_CFG.width,
            layers=VIS_CFG.num_layers,
            heads=VIS_CFG.num_heads,
            mlp_ratio=VIS_CFG.mlp_ratio,
            n_queries=VIS_CFG.n_queries,
            output_dim=VIS_CFG.output_dim,
            image_start_id=IMG_START,
        ),
    )
    model = QWenLMHeadModel(cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def jax_params(ref_model):
    sd = {k: v.detach() for k, v in ref_model.state_dict().items()}
    return {
        "qwen": convert_qwen(sd, TEXT_CFG),
        "visual": convert_qwen_visual(sd, VIS_CFG),
    }


def _our_logits(params, ids_with_span, images_np):
    sent_ids, n_img = qwen_vl.sentinelize_span(ids_with_span, CFG)
    S = len(ids_with_span)
    plan = llava_model.plan_splice(sent_ids, VIS_CFG.n_queries if n_img else 0, S)
    assert plan.length == S
    if n_img:
        feats = qwen_vl.encode_images(params, CFG, jnp.asarray(images_np))
    else:
        feats = jnp.zeros((1, 1, TEXT_CFG.hidden_size), jnp.float32)
    text_emb = qwen.embed_tokens(params["qwen"], jnp.asarray(plan.tokens)[None])
    g_text = jnp.take_along_axis(text_emb, jnp.asarray(plan.tok_gather)[None, :, None], axis=1)
    g_img = jnp.take_along_axis(feats, jnp.asarray(plan.img_gather)[None, :, None], axis=1)
    embeds = jnp.where(jnp.asarray(plan.is_image)[None, :, None], g_img, g_text)
    positions = jnp.arange(S, dtype=jnp.int32)[None]
    hidden, _ = qwen.forward(
        params["qwen"], TEXT_CFG, embeds, positions,
        ntk_alpha=qwen.ntk_alpha_for_len(TEXT_CFG, S), attn_impl="xla",
    )
    return np.asarray(qwen.logits_from_hidden(params["qwen"], hidden))[0]


def _span_ids():
    rng = np.random.default_rng(0)
    pre = rng.integers(10, 400, 5).tolist()
    post = rng.integers(10, 400, 12).tolist()
    span = qwen_vl.make_image_span_ids(CFG)
    return pre + span + post  # length 5 + 6 + 12 = 23 > seq_length=16


def test_text_only_logits_match_reference(ref_model, jax_params):
    rng = np.random.default_rng(1)
    ids = rng.integers(10, 400, (1, 23))
    with torch.no_grad():
        ref = ref_model(input_ids=torch.tensor(ids)).logits.numpy()[0]
    embeds = qwen.embed_tokens(jax_params["qwen"], jnp.asarray(ids))
    positions = jnp.arange(ids.shape[1], dtype=jnp.int32)[None]
    hidden, _ = qwen.forward(
        jax_params["qwen"], TEXT_CFG, embeds, positions,
        ntk_alpha=qwen.ntk_alpha_for_len(TEXT_CFG, ids.shape[1]), attn_impl="xla",
    )
    ours = np.asarray(qwen.logits_from_hidden(jax_params["qwen"], hidden))[0]
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_multimodal_logits_match_reference(ref_model, jax_params):
    ids = _span_ids()
    rng = np.random.default_rng(2)
    images = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = ref_model(
            input_ids=torch.tensor([ids]), images=torch.tensor(images)
        ).logits.numpy()[0]
    ours = _our_logits(jax_params, ids, images)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_visual_encoder_matches_reference(ref_model, jax_params):
    rng = np.random.default_rng(3)
    images = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = ref_model.transformer.visual(torch.tensor(images)).numpy()
    ours = np.asarray(qwen_vit.forward(jax_params["visual"], VIS_CFG, jnp.asarray(images)))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_incremental_decode_consistent(jax_params):
    rng = np.random.default_rng(4)
    ids = rng.integers(10, 400, (1, 12))
    embeds = qwen.embed_tokens(jax_params["qwen"], jnp.asarray(ids))
    positions = jnp.arange(12, dtype=jnp.int32)[None]
    full_hidden, _ = qwen.forward(
        jax_params["qwen"], TEXT_CFG, embeds, positions, attn_impl="xla"
    )
    full = np.asarray(qwen.logits_from_hidden(jax_params["qwen"], full_hidden))[0]

    cache = qwen.init_cache(TEXT_CFG, 1, 32)
    h, cache = qwen.forward(
        jax_params["qwen"], TEXT_CFG, embeds[:, :8], positions[:, :8],
        cache, jnp.zeros((1,), jnp.int32), attn_impl="xla",
    )
    outs = [np.asarray(qwen.logits_from_hidden(jax_params["qwen"], h[:, -1]))[0]]
    for t in range(8, 12):
        h, cache = qwen.forward(
            jax_params["qwen"], TEXT_CFG, embeds[:, t : t + 1],
            jnp.full((1, 1), t, jnp.int32), cache, jnp.full((1,), t, jnp.int32),
            attn_impl="xla",
        )
        outs.append(np.asarray(qwen.logits_from_hidden(jax_params["qwen"], h[:, 0]))[0])
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o, full[7 + i], atol=2e-4, rtol=1e-3)


def test_sentinelize_span():
    ids = [1, 2, IMG_START, 9, 9, 9, 9, IMG_START + 1, 3]
    out, n = qwen_vl.sentinelize_span(ids, CFG)
    assert n == 1
    assert out == [1, 2, IMG_START, IMAGE_TOKEN_INDEX, IMG_START + 1, 3]
