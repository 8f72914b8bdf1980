"""CLIP preprocessing parity vs HF CLIPImageProcessor (the processor the
reference loads via the vision tower, clip_encoder.py:23)."""

import numpy as np
import pytest
from PIL import Image

from llava_align_tpu.ops.image import (
    OPENAI_CLIP_MEAN,
    clip_preprocess_jax,
    clip_preprocess_pil,
    expand2square,
)


def _rand_img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


def _hf_processor(size=336):
    from transformers import CLIPImageProcessor

    return CLIPImageProcessor(
        do_resize=True,
        size={"shortest_edge": size},
        do_center_crop=True,
        crop_size={"height": size, "width": size},
        do_rescale=True,
        do_normalize=True,
        do_convert_rgb=True,
    )


@pytest.mark.parametrize("w,h", [(640, 480), (480, 640), (336, 336), (100, 350), (500, 333), (333, 500)])
def test_pil_path_matches_hf(w, h):
    img = _rand_img(w, h)
    ours = clip_preprocess_pil(img, image_size=336)
    theirs = _hf_processor(336).preprocess(img, return_tensors="np")["pixel_values"][0]
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_pad_mode_matches_hf_expand2square():
    img = _rand_img(500, 300, seed=3)
    bg = tuple(int(x * 255) for x in OPENAI_CLIP_MEAN)
    ours = clip_preprocess_pil(img, image_size=336, image_aspect_ratio="pad")
    theirs = _hf_processor(336).preprocess(expand2square(img, bg), return_tensors="np")[
        "pixel_values"
    ][0]
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_expand2square_geometry():
    img = _rand_img(100, 40)
    sq = expand2square(img, (1, 2, 3))
    assert sq.size == (100, 100)
    arr = np.asarray(sq)
    # original pasted at vertical center
    np.testing.assert_array_equal(arr[30:70, :, :], np.asarray(img))
    assert (arr[0] == np.array([1, 2, 3])).all()


def test_jax_path_close_to_pil_path():
    img = _rand_img(448, 336, seed=7)
    pil_out = clip_preprocess_pil(img, 336, image_aspect_ratio="pad")
    jax_out = np.asarray(clip_preprocess_jax(np.asarray(img), 336, pad_to_square=True))
    assert jax_out.shape == (3, 336, 336)
    # different resamplers: require close agreement, not bit equality
    diff = np.abs(pil_out - jax_out)
    assert np.mean(diff) < 0.08, np.mean(diff)


def test_jax_path_square_input_identityish():
    # square input, already target size: resize is identity, only normalize
    img = _rand_img(336, 336, seed=9)
    out = np.asarray(clip_preprocess_jax(np.asarray(img), 336, pad_to_square=True))
    ref = clip_preprocess_pil(img, 336)
    np.testing.assert_allclose(out, ref, atol=2e-2)
