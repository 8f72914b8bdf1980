"""uint8 image transfer ≡ host-normalized float transfer (the engine
normalizes uint8 pixels in-jit via ops.image.normalize_device — 4x less
host→device traffic on the serving path, identical math)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_align_tpu.config import GenerationConfig, LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import llava
from llava_align_tpu.ops.image import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    clip_preprocess_pil,
    clip_resize_pil_uint8,
    normalize_device,
)

CFG = LlavaConfig.tiny(vocab_size=97)
EOS = 2


def _norm(u8):
    x = u8.astype(np.float32) / 255.0
    m = np.asarray(OPENAI_CLIP_MEAN, np.float32).reshape(3, 1, 1)
    s = np.asarray(OPENAI_CLIP_STD, np.float32).reshape(3, 1, 1)
    return (x - m) / s


def test_normalize_device_matches_host():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 3, 8, 8), dtype=np.uint8)
    dev = np.asarray(normalize_device(jnp.asarray(u8), jnp.float32))
    np.testing.assert_allclose(dev, _norm(u8), atol=1e-6)
    # float passthrough: already-normalized inputs unchanged
    f = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(normalize_device(jnp.asarray(f), jnp.float32)), f
    )


def test_resize_uint8_pipeline_matches_float_pipeline():
    from PIL import Image

    rng = np.random.default_rng(1)
    pil = Image.fromarray(rng.integers(0, 256, (50, 70, 3), dtype=np.uint8))
    for aspect in (None, "pad"):
        want = clip_preprocess_pil(pil, 28, aspect)
        u8 = clip_resize_pil_uint8(pil, 28, aspect)
        got = np.asarray(normalize_device(jnp.asarray(u8), jnp.float32))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_engine_uint8_equals_float(rng_seed=0):
    params = llava.init(jax.random.PRNGKey(0), CFG)
    H = CFG.vision.image_size
    rng = np.random.default_rng(rng_seed)
    u8 = rng.integers(0, 256, (3, H, H), dtype=np.uint8)
    fl = _norm(u8)
    ids = [1, 40, 50, IMAGE_TOKEN_INDEX, 60, 70]
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS,
        use_dd=True, use_dd_unk=True,
    )
    eng = DecodeEngine(params, CFG, gen, attn_impl="xla", bucket=8)
    a = eng.generate(ids, u8)
    b = eng.generate(ids, fl)
    assert a.token_ids == b.token_ids
    np.testing.assert_allclose(
        a.first_scores_top_probs, b.first_scores_top_probs, atol=1e-5
    )
    # batched path
    ba = eng.generate_batch([(ids, u8), (ids, u8)])
    bb = eng.generate_batch([(ids, fl), (ids, fl)])
    assert ba[0].token_ids == bb[0].token_ids


def test_mixed_dtype_batch_normalizes_uint8_entries():
    """A batch mixing uint8 and float images must normalize the uint8 ones
    host-side (all-or-nothing uint8 shipping would otherwise feed raw 0-255
    pixels to the ViT)."""
    params = llava.init(jax.random.PRNGKey(0), CFG)
    H = CFG.vision.image_size
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (3, H, H), dtype=np.uint8)
    fl_other = rng.normal(size=(3, H, H)).astype(np.float32)
    ids = [1, 40, 50, IMAGE_TOKEN_INDEX, 60, 70]
    gen = GenerationConfig(max_new_tokens=3, do_sample=False, eos_token_id=EOS)
    eng = DecodeEngine(params, CFG, gen, attn_impl="xla", bucket=8)

    ref = eng.generate_batch([(ids, _norm(u8)), (ids, fl_other)])
    mixed = eng.generate_batch([(ids, u8), (ids, fl_other)])
    for m, r in zip(mixed, ref):
        assert m.token_ids == r.token_ids


def test_cd_batch_with_missing_image_matches_single():
    """use_cd + an imageless question: the batch placeholder must match the
    single-question float-zero placeholder (normalized-space zeros)."""
    params = llava.init(jax.random.PRNGKey(0), CFG)
    H = CFG.vision.image_size
    rng = np.random.default_rng(4)
    u8 = rng.integers(0, 256, (3, H, H), dtype=np.uint8)
    ids_img = [1, 40, 50, IMAGE_TOKEN_INDEX, 60, 70]
    ids_txt = [1, 7, 9, 11]
    gen = GenerationConfig(
        max_new_tokens=3, do_sample=False, eos_token_id=EOS,
        use_cd=True, noise_step=17,
    )
    eng = DecodeEngine(params, CFG, gen, attn_impl="xla", bucket=8)
    outs = eng.generate_batch([(ids_img, u8), (ids_txt, None)])
    single_txt = eng.generate(ids_txt, None)
    assert outs[1].token_ids == single_txt.token_ids
