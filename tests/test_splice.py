"""Multimodal splice plan semantics (reference llava_arch.py:87-204)."""

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.config import LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.models import llama, llava


def test_plan_expands_sentinel():
    ids = [1, 5, IMAGE_TOKEN_INDEX, 7, 8]
    plan = llava.plan_splice(ids, num_image_tokens=3, pad_to=10)
    assert plan.length == 4 + 3
    assert plan.is_image.tolist() == [False, False, True, True, True, False, False, False, False, False]
    assert plan.tokens.tolist() == [1, 5, 7, 8]
    assert plan.tok_gather[:2].tolist() == [0, 1]
    assert plan.img_gather[2:5].tolist() == [0, 1, 2]
    assert plan.tok_gather[5:7].tolist() == [2, 3]


def test_plan_multiple_images_consume_features_in_order():
    ids = [1, IMAGE_TOKEN_INDEX, 2, IMAGE_TOKEN_INDEX]
    plan = llava.plan_splice(ids, num_image_tokens=2, pad_to=8)
    assert plan.length == 6
    assert plan.img_gather[1:3].tolist() == [0, 1]
    assert plan.img_gather[4:6].tolist() == [2, 3]


def test_text_only_plan():
    plan = llava.text_only_plan([1, 2, 3], pad_to=5)
    assert plan.length == 3
    assert not plan.is_image.any()


def test_splice_embeds_places_features():
    cfg = LlavaConfig.tiny(vocab_size=64)
    rng = jax.random.PRNGKey(0)
    params = llava.init(rng, cfg)
    D = cfg.text.hidden_size
    N = cfg.num_image_tokens

    ids = [1, 9, IMAGE_TOKEN_INDEX, 4]
    plan = llava.plan_splice(ids, N, pad_to=12)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, N, D), jnp.float32)
    out = llava.splice_embeds(
        params,
        cfg,
        jnp.asarray(plan.tokens)[None],
        jnp.asarray(plan.tok_gather)[None],
        jnp.asarray(plan.img_gather)[None],
        jnp.asarray(plan.is_image)[None],
        feats,
    )
    emb = np.asarray(llama.embed_tokens(params["llama"], jnp.asarray([1, 9, 4])))
    out = np.asarray(out[0])
    np.testing.assert_allclose(out[0], emb[0], atol=1e-6)
    np.testing.assert_allclose(out[1], emb[1], atol=1e-6)
    np.testing.assert_allclose(out[2 : 2 + N], np.asarray(feats[0]), atol=1e-6)
    np.testing.assert_allclose(out[2 + N], emb[2], atol=1e-6)


def test_forward_multimodal_runs():
    cfg = LlavaConfig.tiny(vocab_size=64)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    H = cfg.vision.image_size
    images = jax.random.normal(jax.random.PRNGKey(2), (1, 3, H, H), jnp.float32)
    ids = [1, 9, IMAGE_TOKEN_INDEX, 4, 5]
    logits, length = llava.forward_multimodal(params, cfg, ids, images, pad_to=16, attn_impl="xla")
    assert logits.shape == (16, cfg.text.vocab_size)
    assert length == 4 + cfg.num_image_tokens
    assert np.isfinite(np.asarray(logits[: length])).all()

    # an unbatched [3, H, W] image counts as one image AND gets its batch
    # axis added (it used to pass the sentinel-count check and then crash
    # inside patchify's reshape)
    logits3, length3 = llava.forward_multimodal(
        params, cfg, ids, images[0], pad_to=16, attn_impl="xla"
    )
    assert length3 == length
    np.testing.assert_allclose(np.asarray(logits3), np.asarray(logits), atol=1e-6)

    # image-count mismatch still fails loudly (reference llava_arch.py:142)
    import pytest

    two = jnp.concatenate([images, images], axis=0)
    with pytest.raises(ValueError, match="does not match"):
        llava.forward_multimodal(params, cfg, ids, two, pad_to=16, attn_impl="xla")
