"""Batched multi-question generation must reproduce per-question single
generation exactly (greedy), with independent stopping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llava_align_tpu.config import GenerationConfig, LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import llava

CFG = LlavaConfig.tiny(vocab_size=97)
EOS = 2


@pytest.fixture(scope="module")
def setup():
    params = llava.init(jax.random.PRNGKey(0), CFG)
    H = CFG.vision.image_size
    imgs = [
        np.asarray(jax.random.normal(jax.random.PRNGKey(i), (3, H, H), jnp.float32))
        for i in range(3)
    ]
    idss = [
        [1, 40, 50, IMAGE_TOKEN_INDEX, 60, 70, 80],
        [1, 41, IMAGE_TOKEN_INDEX, 61],
        [1, 42, 52, 62, IMAGE_TOKEN_INDEX, 72, 82, 92, 30],
    ]
    return params, imgs, idss


def _engines(params, gen):
    return DecodeEngine(params, CFG, gen, attn_impl="xla", bucket=8)


def test_batch_matches_single_greedy_plain(setup):
    params, imgs, idss = setup
    gen = GenerationConfig(max_new_tokens=5, do_sample=False, eos_token_id=EOS)
    eng = _engines(params, gen)
    singles = [eng.generate(ids, img).token_ids for ids, img in zip(idss, imgs)]
    batched = eng.generate_batch(list(zip(idss, imgs)))
    for s, b in zip(singles, batched):
        assert b.token_ids == s


def test_batch_matches_single_greedy_dual_dd(setup):
    params, imgs, idss = setup
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS,
        use_dd=True, use_dd_unk=True, cd_alpha=1.0, cd_beta=0.1,
    )
    eng = _engines(params, gen)
    singles = [eng.generate(ids, img).token_ids for ids, img in zip(idss, imgs)]
    batched = eng.generate_batch(list(zip(idss, imgs)))
    for s, b in zip(singles, batched):
        assert b.token_ids == s


def test_batch_first_scores_match_single(setup):
    params, imgs, idss = setup
    gen = GenerationConfig(max_new_tokens=3, do_sample=False, eos_token_id=EOS,
                           use_dd_unk=True)
    eng = _engines(params, gen)
    single = eng.generate(idss[0], imgs[0])
    batched = eng.generate_batch([(idss[0], imgs[0]), (idss[1], imgs[1])])
    np.testing.assert_allclose(
        batched[0].first_scores_top_probs, single.first_scores_top_probs, atol=1e-5
    )
    np.testing.assert_array_equal(
        batched[0].first_scores_top_ids, single.first_scores_top_ids
    )


def test_batch_stop_keyword_independent(setup):
    params, imgs, idss = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=False, eos_token_id=10**6)
    eng = _engines(params, gen)
    base0 = eng.generate(idss[0], imgs[0]).token_ids
    base1 = eng.generate(idss[1], imgs[1]).token_ids
    # stop question 0 after its 2nd token; question 1 runs to length 6
    kw = [base0[1]]
    eng2 = DecodeEngine(
        params, CFG, gen, attn_impl="xla", bucket=8, stop_keyword_ids=[kw]
    )
    outs = eng2.generate_batch([(idss[0], imgs[0]), (idss[1], imgs[1])])
    assert outs[0].token_ids == base0[:2]
    if kw[0] not in base1:
        assert outs[1].token_ids == base1
