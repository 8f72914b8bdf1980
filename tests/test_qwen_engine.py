"""Decode engine with the QwenVLAdapter: greedy output must match a naive
no-cache stepwise oracle computed with the jax qwen model directly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llava_align_tpu.config import GenerationConfig
from llava_align_tpu.decoding.adapters import QwenVLAdapter
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import llava as llava_model
from llava_align_tpu.models import qwen, qwen_vl
from llava_align_tpu.models.qwen import QwenConfig
from llava_align_tpu.models.qwen_vit import QwenVisionConfig
from llava_align_tpu.models.qwen_vl import QwenVLConfig

IMG_START = 500
TEXT_CFG = QwenConfig(
    vocab_size=512, hidden_size=128, num_layers=2, num_heads=4, head_dim=32,
    intermediate_size=256, seq_length=2048, use_logn_attn=False,
    use_dynamic_ntk=False, dtype=jnp.float32,
)
VIS_CFG = QwenVisionConfig(
    image_size=28, patch_size=14, width=32, num_layers=2, num_heads=2,
    mlp_ratio=2.0, n_queries=4, output_dim=128, dtype=jnp.float32,
)
CFG = QwenVLConfig(text=TEXT_CFG, vision=VIS_CFG, image_start_id=IMG_START)
EOS = 2


@pytest.fixture(scope="module")
def setup():
    params = qwen_vl.init(jax.random.PRNGKey(0), CFG)
    image = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, 28, 28), jnp.float32)
    )
    raw_ids = [10, 20] + qwen_vl.make_image_span_ids(CFG) + [30, 40, 50]
    sent_ids, n_img = qwen_vl.sentinelize_span(raw_ids, CFG)
    assert n_img == 1
    return params, image, sent_ids


def _forward_logits(params, ids, image):
    """no-cache oracle forward over explicit ids (sentinel marks the span)."""
    S0 = len(ids)
    has_img = any(t < 0 for t in ids)
    plan = llava_model.plan_splice(ids, VIS_CFG.n_queries if has_img else 0, S0 + VIS_CFG.n_queries)
    S = plan.length
    if has_img:
        feats = qwen_vl.encode_images(params, CFG, jnp.asarray(image)[None])
    else:
        feats = jnp.zeros((1, 1, TEXT_CFG.hidden_size), jnp.float32)
    text_emb = qwen.embed_tokens(params["qwen"], jnp.asarray(plan.tokens)[None])
    g_text = jnp.take_along_axis(text_emb, jnp.asarray(plan.tok_gather)[None, :, None], axis=1)
    g_img = jnp.take_along_axis(feats, jnp.asarray(plan.img_gather)[None, :, None], axis=1)
    embeds = jnp.where(jnp.asarray(plan.is_image)[None, :, None], g_img, g_text)
    positions = jnp.arange(embeds.shape[1], dtype=jnp.int32)[None]
    hidden, _ = qwen.forward(params["qwen"], TEXT_CFG, embeds, positions, attn_impl="xla")
    return np.asarray(qwen.logits_from_hidden(params["qwen"], hidden[0, S - 1]))


def _oracle_greedy(params, ids, image, gen, steps):
    adapter = QwenVLAdapter(CFG)
    kinds = ["main"] + (["none"] if gen.use_dd else [])
    generated = []
    for _ in range(steps):
        logits = {}
        for kind in set(kinds):
            seq = adapter.branch_token_ids(ids, kind) + generated
            logits[kind] = _forward_logits(params, seq, image)
        if len(kinds) > 1:
            main, cd = logits["main"], logits["none"]
            cutoff = np.log(gen.cd_beta) + main.max()
            fused = (1 + gen.cd_alpha) * main - gen.cd_alpha * cd
            fused = np.where(main < cutoff, -np.inf, fused)
        else:
            fused = logits["main"]
        tok = int(np.argmax(fused))
        generated.append(tok)
        if tok == EOS:
            break
    return generated


def test_qwen_engine_greedy_plain(setup):
    params, image, ids = setup
    gen = GenerationConfig(max_new_tokens=5, do_sample=False, eos_token_id=EOS)
    eng = DecodeEngine(params, CFG, gen, adapter=QwenVLAdapter(CFG), attn_impl="xla", bucket=8)
    out = eng.generate(ids, image)
    assert out.token_ids == _oracle_greedy(params, ids, image, gen, 5)


def test_qwen_engine_greedy_vdd_none(setup):
    params, image, ids = setup
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS,
        use_dd=True, cd_alpha=1.0, cd_beta=0.1,
    )
    eng = DecodeEngine(params, CFG, gen, adapter=QwenVLAdapter(CFG), attn_impl="xla", bucket=8)
    out = eng.generate(ids, image)
    assert out.token_ids == _oracle_greedy(params, ids, image, gen, 4)


def test_qwen_engine_branch_ids_override(setup):
    """Explicit per-branch ids (the qwen 'unk' = 'None'-prefix prompt path)."""
    params, image, ids = setup
    gen = GenerationConfig(
        max_new_tokens=3, do_sample=False, eos_token_id=EOS,
        use_dd_unk=True, cd_alpha=0.5, cd_beta=0.2,
    )
    unk_ids = [11, 12, 13, 30, 40, 50]  # tokenized degraded prompt
    eng = DecodeEngine(params, CFG, gen, adapter=QwenVLAdapter(CFG), attn_impl="xla", bucket=8)
    out = eng.generate(ids, image, branch_ids={"unk": unk_ids})

    # oracle with the same override
    generated = []
    for _ in range(3):
        main = _forward_logits(params, list(ids) + generated, image)
        cd = _forward_logits(params, unk_ids + generated, image)
        cutoff = np.log(gen.cd_beta) + main.max()
        fused = (1 + gen.cd_alpha) * main - gen.cd_alpha * cd
        fused = np.where(main < cutoff, -np.inf, fused)
        tok = int(np.argmax(fused))
        generated.append(tok)
        if tok == EOS:
            break
    assert out.token_ids == generated
