"""Engine with InstructBlipAdapter: precomputed Q-Former features, VCD via an
embedding-stream contrast branch (reference blip2_vicuna_instruct.py:385-410 +
lavis modeling_llama.py:764-792 substitute the cd embedding stream)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llava_align_tpu.config import GenerationConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding.adapters import InstructBlipAdapter
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import instructblip, llama, llava
from llava_align_tpu.models.instructblip import InstructBlipConfig

CFG = InstructBlipConfig.tiny(vocab_size=128)
EOS = 2


@pytest.fixture(scope="module")
def setup():
    params = instructblip.init(jax.random.PRNGKey(0), CFG)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28), jnp.float32)
    qtext = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    feats_main = instructblip.encode(params, CFG, imgs, qtext)
    feats_cd = instructblip.encode(params, CFG, imgs * 0.1, qtext)  # degraded stream
    # prompt: [queries sentinel] + vicuna token ids (BOS first)
    ids = [IMAGE_TOKEN_INDEX, 1, 40, 50, 60]
    return params, np.asarray(feats_main), np.asarray(feats_cd), ids


def _forward_full(params, ids, feats):
    Q = CFG.num_query_tokens
    n_img = Q if any(t == IMAGE_TOKEN_INDEX for t in ids) else 0
    plan = llava.plan_splice(ids, n_img, len(ids) + Q)
    emb = llama.embed_tokens(params["llama"], jnp.asarray(plan.tokens)[None])
    g_t = jnp.take_along_axis(emb, jnp.asarray(plan.tok_gather)[None, :, None], axis=1)
    g_i = jnp.take_along_axis(jnp.asarray(feats), jnp.asarray(plan.img_gather)[None, :, None], axis=1)
    embeds = jnp.where(jnp.asarray(plan.is_image)[None, :, None], g_i, g_t)
    pos = jnp.arange(embeds.shape[1], dtype=jnp.int32)[None]
    hidden, _ = llama.forward(params["llama"], CFG.text, embeds, pos, attn_impl="xla")
    return np.asarray(llama.logits_from_hidden(params["llama"], hidden[0, plan.length - 1]))


def test_greedy_vcd_embedding_contrast(setup):
    params, feats_main, feats_cd, ids = setup
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS,
        use_cd=True, cd_alpha=1.0, cd_beta=0.1,
    )
    eng = DecodeEngine(params, CFG, gen, adapter=InstructBlipAdapter(CFG), attn_impl="xla", bucket=8)
    out = eng.generate(
        ids, None, precomputed_feats=np.concatenate([feats_main, feats_cd], 0)
    )

    # oracle
    generated = []
    for _ in range(4):
        main = _forward_full(params, list(ids) + generated, feats_main)
        cd = _forward_full(params, list(ids) + generated, feats_cd)
        cutoff = np.log(0.1) + main.max()
        fused = np.where(main < cutoff, -np.inf, 2 * main - cd)
        tok = int(np.argmax(fused))
        generated.append(tok)
        if tok == EOS:
            break
    assert out.token_ids == generated


def test_greedy_plain_precomputed(setup):
    params, feats_main, _, ids = setup
    gen = GenerationConfig(max_new_tokens=3, do_sample=False, eos_token_id=EOS)
    eng = DecodeEngine(params, CFG, gen, adapter=InstructBlipAdapter(CFG), attn_impl="xla", bucket=8)
    out = eng.generate(ids, None, precomputed_feats=feats_main)
    generated = []
    for _ in range(3):
        logits = _forward_full(params, list(ids) + generated, feats_main)
        tok = int(np.argmax(logits))
        generated.append(tok)
        if tok == EOS:
            break
    assert out.token_ids == generated


def test_none_branch_drops_queries(setup):
    params, feats_main, _, ids = setup
    adapter = InstructBlipAdapter(CFG)
    assert adapter.branch_token_ids(ids, "none") == [1, 40, 50, 60]
