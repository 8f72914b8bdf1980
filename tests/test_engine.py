"""End-to-end decode engine tests on a tiny LLaVA model.

The oracle is a deliberately naive re-implementation of the reference decode
semantics: per step, run each branch's full sequence from scratch through
llava.forward_multimodal (no KV cache, no packing), fuse in numpy, pick
argmax. If the engine's packed-cache while_loop matches this token-for-token,
the cache/branch/fusion machinery is correct.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llava_align_tpu.config import GenerationConfig, LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding.engine import DecodeEngine, branch_kinds, branch_token_ids
from llava_align_tpu.models import llava

CFG = LlavaConfig.tiny(vocab_size=97)
EOS = 2


@pytest.fixture(scope="module")
def setup():
    params = llava.init(jax.random.PRNGKey(0), CFG)
    H = CFG.vision.image_size
    image = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, H, H), jnp.float32)
    )
    ids = [1, 40, 50, IMAGE_TOKEN_INDEX, 60, 70, 80]
    return params, image, ids


def _oracle_greedy(params, ids, image, gen: GenerationConfig, steps: int):
    """Step-by-step no-cache reference decode."""
    kinds = branch_kinds(gen)
    assert not gen.use_cd, "oracle covers dd branches"
    branch_ids = {k: branch_token_ids(ids, k) for k in set(kinds)}
    generated = []
    img = jnp.asarray(image)[None]
    for _ in range(steps):
        logits = {}
        for kind in set(kinds):
            seq = branch_ids[kind] + generated
            use_img = kind in ("main", "cd")
            pad = ((len(seq) + (CFG.num_image_tokens if use_img else 0)) // 8 + 1) * 8
            lg, ln = llava.forward_multimodal(
                params, CFG, seq, img if use_img else None, pad_to=pad, attn_impl="xla"
            )
            logits[kind] = np.asarray(lg[ln - 1])
        main = logits["main"]
        contrast_kinds = kinds[1:]
        if contrast_kinds:
            contrast = np.mean([logits[k] for k in contrast_kinds], axis=0)
            cutoff = np.log(gen.cd_beta) + main.max()
            fused = (1 + gen.cd_alpha) * main - gen.cd_alpha * contrast
            fused = np.where(main < cutoff, -np.inf, fused)
        else:
            fused = main
        tok = int(np.argmax(fused))
        generated.append(tok)
        if tok == EOS:
            break
    return generated


def _engine(params, gen, **kw):
    return DecodeEngine(params, CFG, gen, attn_impl="xla", bucket=8, **kw)


def test_greedy_plain_matches_oracle(setup):
    params, image, ids = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=False, eos_token_id=EOS)
    out = _engine(params, gen).generate(ids, image)
    oracle = _oracle_greedy(params, ids, image, gen, 6)
    assert out.token_ids == oracle


def test_greedy_dual_dd_matches_oracle(setup):
    params, image, ids = setup
    gen = GenerationConfig(
        max_new_tokens=5, do_sample=False, eos_token_id=EOS,
        use_dd=True, use_dd_unk=True, cd_alpha=1.0, cd_beta=0.1,
    )
    out = _engine(params, gen).generate(ids, image)
    oracle = _oracle_greedy(params, ids, image, gen, 5)
    assert out.token_ids == oracle


def test_greedy_unk_only_matches_oracle(setup):
    params, image, ids = setup
    gen = GenerationConfig(
        max_new_tokens=5, do_sample=False, eos_token_id=EOS,
        use_dd_unk=True, cd_alpha=0.5, cd_beta=0.2,
    )
    out = _engine(params, gen).generate(ids, image)
    oracle = _oracle_greedy(params, ids, image, gen, 5)
    assert out.token_ids == oracle


def test_greedy_none_only_matches_oracle(setup):
    params, image, ids = setup
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS, use_dd=True,
    )
    out = _engine(params, gen).generate(ids, image)
    oracle = _oracle_greedy(params, ids, image, gen, 4)
    assert out.token_ids == oracle


def test_vcd_runs_and_differs_from_plain(setup):
    params, image, ids = setup
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS,
        use_cd=True, noise_step=999, cd_alpha=1.0,
    )
    out = _engine(params, gen).generate(ids, image)
    assert len(out.token_ids) >= 1
    assert branch_kinds(gen) == ["main", "cd"]


def test_sampling_deterministic_per_seed(setup):
    params, image, ids = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=True, temperature=0.9, seed=7, eos_token_id=EOS)
    eng = _engine(params, gen)
    a = eng.generate(ids, image)
    b = eng.generate(ids, image)
    assert a.token_ids == b.token_ids
    c = eng.generate(ids, image, rng=jax.random.PRNGKey(123))
    assert isinstance(c.token_ids, list)


def test_stop_keyword(setup):
    params, image, ids = setup
    gen = GenerationConfig(max_new_tokens=8, do_sample=False, eos_token_id=10**6)
    # find what greedy generates, then stop on its 2nd token
    base = _engine(params, gen).generate(ids, image)
    assert len(base.token_ids) == 8
    kw = [base.token_ids[1]]
    out = _engine(params, gen, stop_keyword_ids=[kw]).generate(ids, image)
    assert out.token_ids == base.token_ids[:2]


def test_first_scores_are_first_step(setup):
    params, image, ids = setup
    gen = GenerationConfig(max_new_tokens=3, do_sample=False, eos_token_id=EOS)
    out = _engine(params, gen).generate(ids, image)
    probs = out.first_scores_top_probs
    assert probs.shape[0] == 97  # top_k clamps to vocab? engine uses min later
    assert np.all(np.diff(probs) <= 1e-9)
    assert out.first_scores_top_ids[0] == out.token_ids[0]  # greedy == top prob


def test_branch_kinds_priority():
    assert branch_kinds(GenerationConfig(use_cd=True, use_dd=True, use_dd_unk=True)) == ["main", "cd", "none"]
    assert branch_kinds(GenerationConfig(use_dd=True, use_dd_unk=True)) == ["main", "unk", "none"]
    assert branch_kinds(GenerationConfig(use_dd_unk=True)) == ["main", "unk"]
    assert branch_kinds(GenerationConfig()) == ["main"]


def test_anyres_grid_stack(setup):
    """[G,3,H,W] grid stacks contribute G*num_patches concatenated features
    (llava-1.6 anyres capability)."""
    params, image, ids = setup
    H = CFG.vision.image_size
    stack = np.stack([image, image * 0.5, image * 0.1])  # G=3
    gen = GenerationConfig(max_new_tokens=3, do_sample=False, eos_token_id=EOS)
    eng = _engine(params, gen)
    out = eng.generate(ids, stack)
    n_text = len([t for t in ids if t != IMAGE_TOKEN_INDEX])
    assert out.prompt_length == n_text + 3 * CFG.num_image_tokens
    assert len(out.token_ids) >= 1

    # oracle: same features via forward_multimodal with a flattened splice
    feats = llava.encode_images(params, CFG, jnp.asarray(stack, jnp.float32))
    flat = np.asarray(feats).reshape(1, -1, CFG.text.hidden_size)
    plan = llava.plan_splice(ids, 3 * CFG.num_image_tokens, pad_to=out.prompt_length + 8)
    embeds = llava.splice_embeds(
        params, CFG,
        jnp.asarray(plan.tokens)[None], jnp.asarray(plan.tok_gather)[None],
        jnp.asarray(plan.img_gather)[None], jnp.asarray(plan.is_image)[None],
        jnp.asarray(flat),
    )
    from llava_align_tpu.models import llama
    positions = jnp.arange(embeds.shape[1], dtype=jnp.int32)[None]
    hidden, _ = llama.forward(params["llama"], CFG.text, embeds, positions, attn_impl="xla")
    logits = np.asarray(llama.logits_from_hidden(params["llama"], hidden[0, plan.length - 1]))
    assert out.token_ids[0] == int(np.argmax(logits))


def test_num_branches_matches_branch_kinds_everywhere():
    """config.GenerationConfig.num_branches must agree with the engine's
    branch_kinds row layout for every flag combination (a round-4 review
    found the property counting flags additively while the engine's
    cd > unk > none priority chain does not)."""
    import itertools

    for cd, dd, unk in itertools.product([False, True], repeat=3):
        gen = GenerationConfig(use_cd=cd, use_dd=dd, use_dd_unk=unk)
        assert gen.num_branches == len(branch_kinds(gen)), (cd, dd, unk)


def test_act_quant_flag_does_not_leak_into_shared_adapter(setup):
    """DecodeEngine(act_quant=True) must not mutate a caller-supplied adapter
    shared with engines that did NOT opt into W8A8 (round-4 review: the flag
    leaked, so the 'accuracy' engine silently ran not-bit-exact numerics)."""
    from llava_align_tpu.decoding.adapters import (
        Blip2OptAdapter,
        LlavaAdapter,
        LlavaMptAdapter,
    )

    params, _, _ = setup
    shared = LlavaAdapter(CFG)
    gen = GenerationConfig(max_new_tokens=2, do_sample=False)
    a = DecodeEngine(params, CFG, gen, adapter=shared, attn_impl="xla",
                     bucket=8, act_quant=True)
    b = DecodeEngine(params, CFG, gen, adapter=shared, attn_impl="xla",
                     bucket=8)
    assert a.adapter.act_quant is True
    assert shared.act_quant is False
    assert b.adapter.act_quant is False
    # adapters whose forward() has no act_quant kwarg must declare it, so
    # the engine warns-and-ignores instead of silently not engaging W8A8
    assert LlavaMptAdapter.supports_act_quant is False
    assert Blip2OptAdapter.supports_act_quant is False
