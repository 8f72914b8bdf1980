"""LoRA merge / delta weights / anyres preprocessing tests."""

import numpy as np
from PIL import Image

from llava_align_tpu.ops.anyres import (
    divide_to_patches,
    get_anyres_image_grid_shape,
    process_anyres_image,
    resize_and_pad_image,
    select_best_resolution,
)
from llava_align_tpu.utils.checkpoint_tools import (
    apply_delta,
    apply_projector_only,
    make_delta,
    merge_lora,
)


def test_lora_merge_math():
    rng = np.random.default_rng(0)
    W = rng.normal(size=(8, 6)).astype(np.float32)
    A = rng.normal(size=(2, 6)).astype(np.float32)  # [r, in]
    B = rng.normal(size=(8, 2)).astype(np.float32)  # [out, r]
    base = {"model.layers.0.self_attn.q_proj.weight": W}
    lora = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": A,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": B,
    }
    merged = merge_lora(base, lora, lora_alpha=16.0)
    np.testing.assert_allclose(
        merged["model.layers.0.self_attn.q_proj.weight"], W + (16.0 / 2) * (B @ A), rtol=1e-6
    )


def test_lora_merge_extra_tensors_pass_through():
    base = {"a.weight": np.zeros((2, 2), np.float32)}
    lora = {"base_model.model.mm_projector.0.weight": np.ones((3, 3), np.float32)}
    merged = merge_lora(base, lora)
    assert "mm_projector.0.weight" in merged


def test_delta_roundtrip():
    rng = np.random.default_rng(1)
    base = {"w": rng.normal(size=(4, 4)).astype(np.float32)}
    target = {
        "w": rng.normal(size=(4, 4)).astype(np.float32),
        "resized": rng.normal(size=(6, 4)).astype(np.float32),  # not in base
    }
    delta = make_delta(base, target)
    restored = apply_delta(base, delta)
    np.testing.assert_allclose(restored["w"], target["w"], atol=1e-6)
    np.testing.assert_allclose(restored["resized"], target["resized"])


def test_projector_overlay():
    base = {"w": np.zeros((2,), np.float32)}
    proj = {"model.mm_projector.0.weight": np.ones((3,), np.float32)}
    out = apply_projector_only(base, proj)
    assert out["model.mm_projector.0.weight"].sum() == 3


def _ref_select_best_resolution(original_size, possible_resolutions):
    """Direct transcription of reference mm_utils.py:12-39 as oracle."""
    original_width, original_height = original_size
    best_fit = None
    max_effective_resolution = 0
    min_wasted_resolution = float("inf")
    for width, height in possible_resolutions:
        scale = min(width / original_width, height / original_height)
        dw, dh = int(original_width * scale), int(original_height * scale)
        effective = min(dw * dh, original_width * original_height)
        wasted = (width * height) - effective
        if effective > max_effective_resolution or (
            effective == max_effective_resolution and wasted < min_wasted_resolution
        ):
            max_effective_resolution = effective
            min_wasted_resolution = wasted
            best_fit = (width, height)
    return best_fit


def test_select_best_resolution_matches_reference():
    rng = np.random.default_rng(5)
    grids = [(672, 672), (1344, 336), (336, 1344), (336, 672), (672, 336)]
    for _ in range(30):
        size = (int(rng.integers(50, 2000)), int(rng.integers(50, 2000)))
        assert select_best_resolution(size, grids) == _ref_select_best_resolution(size, grids)


def test_resize_pad_and_patches():
    img = Image.fromarray(np.full((100, 200, 3), 128, np.uint8))
    padded = resize_and_pad_image(img, (672, 336))
    assert padded.size == (672, 336)
    patches = divide_to_patches(padded, 336)
    assert len(patches) == 2
    assert all(p.size == (336, 336) for p in patches)


def test_anyres_stack_shape():
    img = Image.fromarray(
        np.random.default_rng(2).integers(0, 255, (300, 500, 3), dtype=np.uint8)
    )
    pinpoints = [(672, 336), (336, 672), (672, 672)]
    assert get_anyres_image_grid_shape(img.size, pinpoints, 336) == (2, 1)
    out = process_anyres_image(img, pinpoints, base_size=336, crop_size=336)
    assert out.shape == (3, 3, 336, 336)  # base + 2 grid patches


def test_orbax_params_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from llava_align_tpu.models import llava
    from llava_align_tpu.config import LlavaConfig
    from llava_align_tpu.utils.checkpoint_io import load_params, save_params

    cfg = LlavaConfig.tiny(vocab_size=64)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    p = save_params(str(tmp_path / "ckpt"), params, meta={"model": "tiny"})
    restored, meta = load_params(p)
    assert meta == {"model": "tiny"}
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resize_token_embeddings():
    import jax
    import jax.numpy as jnp

    from llava_align_tpu.config import LlamaConfig
    from llava_align_tpu.models import llama
    from llava_align_tpu.utils.checkpoint_tools import resize_token_embeddings

    cfg = LlamaConfig.tiny(vocab_size=32)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    new = resize_token_embeddings(params, 35)
    assert new["embed"].shape == (35, cfg.hidden_size)
    assert new["lm_head"].shape == (35, cfg.hidden_size)
    mean = np.asarray(jnp.mean(params["embed"].astype(jnp.float32), axis=0))
    np.testing.assert_allclose(np.asarray(new["embed"][33], np.float32), mean, atol=1e-5)
    # existing rows untouched
    np.testing.assert_array_equal(np.asarray(new["embed"][:32]), np.asarray(params["embed"]))
