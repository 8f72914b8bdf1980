"""submit/collect halves of the engine API: pipelined calls must be
bit-identical to their blocking forms, in any interleaving, and empty
submissions must stay a no-op (runners keep one call in flight)."""

import jax
import numpy as np
import pytest

from llava_align_tpu.config import GenerationConfig, LlavaConfig
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import llava


@pytest.fixture(scope="module")
def tiny():
    cfg = LlavaConfig.tiny(vocab_size=256)
    params = jax.jit(lambda k: llava.init(k, cfg))(jax.random.PRNGKey(0))
    return cfg, params


def _engine(cfg, params, **kw):
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=True, temperature=1.0,
        use_dd=True, use_dd_unk=True, cd_alpha=1.0, cd_beta=0.1,
        eos_token_id=10**9, **kw,
    )
    return DecodeEngine(params, cfg, gen)


def _group(cfg, seed):
    from llava_align_tpu.constants import IMAGE_TOKEN_INDEX

    rng = np.random.default_rng(seed)
    prefix = [1, IMAGE_TOKEN_INDEX] + [int(t) for t in rng.integers(5, 200, 6)]
    suffixes = [[int(t) for t in rng.integers(5, 200, 4)] for _ in range(3)]
    H = cfg.vision.image_size
    image = rng.integers(0, 256, (3, H, H)).astype(np.uint8)
    return prefix, suffixes, image


def test_empty_groups_noop(tiny):
    cfg, params = tiny
    eng = _engine(cfg, params)
    assert eng.generate_batch_groups([]) == []
    assert eng.collect_batch_groups(eng.submit_batch_groups([])) == []


def test_interleaved_handles_match_sequential(tiny):
    cfg, params = tiny
    eng = _engine(cfg, params)
    g1, g2 = _group(cfg, 1), _group(cfg, 2)
    r1, r2 = jax.random.PRNGKey(11), jax.random.PRNGKey(22)

    seq1 = eng.generate_batch_groups([g1], rng=r1)
    seq2 = eng.generate_batch_groups([g2], rng=r2)

    # two calls in flight at once, collected out of submission order
    h1 = eng.submit_batch_groups([g1], rng=r1)
    h2 = eng.submit_batch_groups([g2], rng=r2)
    p2 = eng.collect_batch_groups(h2)
    p1 = eng.collect_batch_groups(h1)

    for a, b in zip(seq1 + seq2, p1 + p2):
        assert a.token_ids == b.token_ids
        np.testing.assert_array_equal(
            a.first_scores_top_ids, b.first_scores_top_ids
        )


def test_submit_collect_generate_matches_generate(tiny):
    cfg, params = tiny
    eng = _engine(cfg, params)
    prefix, suffixes, image = _group(cfg, 3)
    ids = prefix + suffixes[0]
    rng = jax.random.PRNGKey(7)
    a = eng.generate(ids, image, rng=rng)
    b = eng.collect_generate(eng.submit_generate(ids, image, rng=rng))
    assert a.token_ids == b.token_ids
    assert a.prompt_length == b.prompt_length
    np.testing.assert_allclose(
        a.first_scores_top_probs, b.first_scores_top_probs
    )
