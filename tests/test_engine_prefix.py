"""Shared-prefix batched generation ≡ per-question batched generation.

POPE ships exactly 6 questions per image; generate_batch_prefix prefills the
shared [system + image] prefix once into a read-only KV segment and runs each
question's suffix against [shared | local] joint-softmax attention
(ops/attention.chunk_attention_shared / decode_attention_shared). The oracle:
token streams and first-step fused distributions must match generate_batch on
the identical full prompts (the reference semantics, vcd_sample.py:109-185,
are already pinned to generate_batch by tests/test_engine_batch.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llava_align_tpu.config import GenerationConfig, LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import llava

EOS = 2


@pytest.fixture(scope="module")
def setup():
    cfg = LlavaConfig.tiny(vocab_size=211)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    H = cfg.vision.image_size
    image = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, H, H), jnp.float32)
    )
    # shared [bos, sys..., <image>, sys...] prefix + per-question suffixes
    prefix = [1, 17, 23, IMAGE_TOKEN_INDEX, 31, 37]
    suffixes = [
        [41, 43, 53],
        [41, 47, 53, 59],
        [61, 67],
        [41, 43, 71],
        [73, 79, 83, 89, 97],
        [101],
    ]
    return cfg, params, image, prefix, suffixes


def _gen(dual: bool, do_sample: bool = False, max_new: int = 5) -> GenerationConfig:
    return GenerationConfig(
        max_new_tokens=max_new, do_sample=do_sample, eos_token_id=EOS,
        use_dd=dual, use_dd_unk=dual, cd_alpha=1.0, cd_beta=0.1,
    )


def _check_match(outs, refs, prob_atol=1e-5):
    assert len(outs) == len(refs)
    for o, r in zip(outs, refs):
        assert o.token_ids == r.token_ids
        assert o.prompt_length == r.prompt_length
        np.testing.assert_allclose(
            o.first_scores_top_probs, r.first_scores_top_probs, atol=prob_atol
        )


def test_prefix_matches_batch_dual_branch(setup):
    cfg, params, image, prefix, suffixes = setup
    eng = DecodeEngine(params, cfg, _gen(True), attn_impl="xla", bucket=8)
    full = [(prefix + s, image) for s in suffixes]
    refs = eng.generate_batch(full)
    outs = eng.generate_batch_prefix(prefix, suffixes, image)
    _check_match(outs, refs)


def test_prefix_matches_batch_single_branch(setup):
    cfg, params, image, prefix, suffixes = setup
    eng = DecodeEngine(params, cfg, _gen(False), attn_impl="xla", bucket=8)
    full = [(prefix + s, image) for s in suffixes]
    refs = eng.generate_batch(full)
    outs = eng.generate_batch_prefix(prefix, suffixes, image)
    _check_match(outs, refs)


def test_prefix_stochastic_sampling_runs(setup):
    """Sampling draws per-question tokens from the same fused distribution
    machinery; RNG streams differ from generate_batch (different jit graph),
    so assert structure not tokens."""
    cfg, params, image, prefix, suffixes = setup
    eng = DecodeEngine(params, cfg, _gen(True, do_sample=True), attn_impl="xla", bucket=8)
    outs = eng.generate_batch_prefix(
        prefix, suffixes, image, rng=jax.random.PRNGKey(5)
    )
    assert len(outs) == len(suffixes)
    assert all(0 < o.num_generated <= 5 for o in outs)


def test_prefix_rejects_imageless_cd_and_sentinel_suffix(setup):
    cfg, params, image, prefix, suffixes = setup
    gen = GenerationConfig(
        max_new_tokens=2, do_sample=False, eos_token_id=EOS, use_cd=True,
    )
    eng = DecodeEngine(params, cfg, gen, attn_impl="xla", bucket=8)
    with pytest.raises(ValueError, match="use_cd"):
        eng.generate_batch_prefix(prefix, suffixes, None)
    eng2 = DecodeEngine(params, cfg, _gen(True), attn_impl="xla", bucket=8)
    with pytest.raises(ValueError, match="sentinel"):
        eng2.generate_batch_prefix(prefix, [[IMAGE_TOKEN_INDEX, 5]], image)


def test_vcd_prefix_matches_batch_with_identity_noise(setup, monkeypatch):
    """use_cd: the cd branch gets its own shared prefix segment. The grouped
    path draws ONE noised copy per group (shared sample — deliberate
    divergence from per-question draws, same distribution), so for token
    parity the noising is patched to identity: then groups ≡ generate_batch
    exactly (same rng split structure, greedy)."""
    from llava_align_tpu.decoding import engine as engine_mod

    cfg, params, image, prefix, suffixes = setup
    monkeypatch.setattr(
        engine_mod, "add_diffusion_noise", lambda img, rng, step: img
    )
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS,
        use_cd=True, cd_alpha=1.0, cd_beta=0.1,
    )
    eng = DecodeEngine(params, cfg, gen, attn_impl="xla", bucket=8)
    refs = eng.generate_batch([(prefix + s, image) for s in suffixes[:3]])
    outs = eng.generate_batch_prefix(prefix, suffixes[:3], image)
    _check_match(outs, refs)


def test_vcd_prefix_real_noise_runs(setup):
    """Real diffusion noise through the cd prefix segment (smoke: structure,
    determinism under a fixed rng)."""
    cfg, params, image, prefix, suffixes = setup
    gen = GenerationConfig(
        max_new_tokens=3, do_sample=False, eos_token_id=EOS,
        use_cd=True, use_dd=True, use_dd_unk=True, noise_step=500,
    )
    eng = DecodeEngine(params, cfg, gen, attn_impl="xla", bucket=8)
    assert eng.kinds == ["main", "cd", "none"]  # cd + dual-dd chain
    a = eng.generate_batch_prefix(prefix, suffixes[:2], image,
                                  rng=jax.random.PRNGKey(3))
    b = eng.generate_batch_prefix(prefix, suffixes[:2], image,
                                  rng=jax.random.PRNGKey(3))
    assert [o.token_ids for o in a] == [o.token_ids for o in b]
    assert all(o.num_generated > 0 for o in a)


def test_common_token_prefix():
    lists = [[1, 2, 3, 4], [1, 2, 3, 5, 6], [1, 2, 3, 4, 7]]
    assert DecodeEngine.common_token_prefix(lists) == 3
    # identical lists: cap keeps >= 1 suffix token
    assert DecodeEngine.common_token_prefix([[1, 2], [1, 2]]) == 1
    assert DecodeEngine.common_token_prefix([]) == 0


def test_qwen_prefix_matches_batch_with_branch_ids():
    """Qwen adapter shared-prefix: in-band image span as the shared prefix,
    per-question 'unk' branch via branch_ids_list — token-exact vs
    generate_batch on the same prompts."""
    from llava_align_tpu.decoding.adapters import QwenVLAdapter
    from llava_align_tpu.models import qwen_vl
    from llava_align_tpu.models.qwen import QwenConfig
    from llava_align_tpu.models.qwen_vit import QwenVisionConfig
    from llava_align_tpu.models.qwen_vl import QwenVLConfig

    text = QwenConfig(
        vocab_size=512, hidden_size=128, num_layers=2, num_heads=4, head_dim=32,
        intermediate_size=256, seq_length=2048, use_logn_attn=False,
        use_dynamic_ntk=False, dtype=jnp.float32,
    )
    vis = QwenVisionConfig(
        image_size=28, patch_size=14, width=32, num_layers=2, num_heads=2,
        mlp_ratio=2.0, n_queries=4, output_dim=128, dtype=jnp.float32,
    )
    cfg = QwenVLConfig(text=text, vision=vis, image_start_id=500)
    params = qwen_vl.init(jax.random.PRNGKey(0), cfg)
    image = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, 28, 28), jnp.float32)
    )
    span = qwen_vl.make_image_span_ids(cfg)
    suffixes = [[30, 40, 50], [30, 41, 55, 60], [70, 80]]
    prefix_raw = [10, 20] + span + [30]
    prefix, _ = qwen_vl.sentinelize_span(prefix_raw, cfg)
    branch_ids_list = [
        {"unk": [7, 8] + [int(t) for t in s]} for s in suffixes
    ]
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS,
        use_dd=True, use_dd_unk=True, cd_alpha=1.0, cd_beta=0.1,
    )
    eng = DecodeEngine(
        params, cfg, gen, adapter=QwenVLAdapter(cfg), attn_impl="xla", bucket=8
    )
    # generate_batch has no per-question branch_ids; compare against the
    # single-question path (itself oracle-pinned elsewhere)
    refs = [
        eng.generate(prefix + s, image, branch_ids=b)
        for s, b in zip(suffixes, branch_ids_list)
    ]
    outs = eng.generate_batch_prefix(
        prefix, suffixes, image, branch_ids_list=branch_ids_list
    )
    for o, r in zip(outs, refs):
        assert o.token_ids == r.token_ids
        np.testing.assert_allclose(
            o.first_scores_top_probs, r.first_scores_top_probs, atol=1e-5
        )


def test_multi_group_matches_per_group_calls(setup):
    """generate_batch_groups(G groups, one jitted call) must produce the
    same token streams as G separate generate_batch_prefix calls (which are
    themselves token-exact vs generate_batch)."""
    cfg, params, image, prefix, suffixes = setup
    rng2 = np.random.default_rng(7)
    H = cfg.vision.image_size
    image2 = np.asarray(rng2.normal(size=(3, H, H)), np.float32)
    prefix2 = [1, 19, IMAGE_TOKEN_INDEX, 29, 31, 59, 61]
    suffixes_a = suffixes[:3]
    suffixes_b = [[103, 107], [109, 113, 127], [131]]

    eng = DecodeEngine(params, cfg, _gen(True), attn_impl="xla", bucket=8)
    ref_a = eng.generate_batch_prefix(prefix, suffixes_a, image)
    ref_b = eng.generate_batch_prefix(prefix2, suffixes_b, image2)
    outs = eng.generate_batch_groups(
        [(prefix, suffixes_a, image), (prefix2, suffixes_b, image2)]
    )
    assert len(outs) == 6
    _check_match(outs[:3], ref_a)
    _check_match(outs[3:], ref_b)


def test_groups_require_uniform_question_count(setup):
    cfg, params, image, prefix, suffixes = setup
    eng = DecodeEngine(params, cfg, _gen(True), attn_impl="xla", bucket=8)
    with pytest.raises(ValueError, match="same"):
        eng.generate_batch_groups(
            [(prefix, suffixes[:2], image), (prefix, suffixes[:3], image)]
        )


def test_qwen_ntk_boundary_matches_unshared():
    """Dynamic-NTK alpha is driven by the same bucketed full-prompt length in
    the grouped path as in the unshared path (code-review finding): prompts
    crossing seq_length must produce identical tokens either way."""
    from llava_align_tpu.decoding.adapters import QwenVLAdapter
    from llava_align_tpu.models import qwen_vl
    from llava_align_tpu.models.qwen import QwenConfig
    from llava_align_tpu.models.qwen_vit import QwenVisionConfig
    from llava_align_tpu.models.qwen_vl import QwenVLConfig

    text = QwenConfig(
        vocab_size=512, hidden_size=128, num_layers=2, num_heads=4, head_dim=32,
        intermediate_size=256, seq_length=12,  # tiny: prompts cross it
        use_logn_attn=True, use_dynamic_ntk=True, dtype=jnp.float32,
    )
    vis = QwenVisionConfig(
        image_size=28, patch_size=14, width=32, num_layers=2, num_heads=2,
        mlp_ratio=2.0, n_queries=4, output_dim=128, dtype=jnp.float32,
    )
    cfg = QwenVLConfig(text=text, vision=vis, image_start_id=500)
    params = qwen_vl.init(jax.random.PRNGKey(0), cfg)
    image = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, 28, 28), jnp.float32)
    )
    span = qwen_vl.make_image_span_ids(cfg)
    prefix, _ = qwen_vl.sentinelize_span([10, 20] + span + [30, 31, 32], cfg)
    suffixes = [[40, 41, 42, 43], [50, 51], [60, 61, 62]]
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS, use_dd=True,
    )
    eng = DecodeEngine(
        params, cfg, gen, adapter=QwenVLAdapter(cfg), attn_impl="xla", bucket=8
    )
    refs = [eng.generate(prefix + s, image) for s in suffixes]
    outs = eng.generate_batch_prefix(prefix, suffixes, image)
    for o, r in zip(outs, refs):
        assert o.token_ids == r.token_ids


def test_prefix_eos_stops_rows_independently(setup):
    """Rows finishing early pad with pad_token while others continue —
    same semantics as generate_batch (reference unfinished_sequences,
    vcd_sample.py:256-291)."""
    cfg, params, image, prefix, suffixes = setup
    eng = DecodeEngine(params, cfg, _gen(True, max_new=6), attn_impl="xla", bucket=8)
    full = [(prefix + s, image) for s in suffixes]
    refs = eng.generate_batch(full)
    outs = eng.generate_batch_prefix(prefix, suffixes, image)
    for o, r in zip(outs, refs):
        assert o.num_generated == r.num_generated
        assert o.token_ids == r.token_ids
