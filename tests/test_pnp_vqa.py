"""PnP-VQA: GradCAM parity vs the reference med.py attention hooks + the
pipeline (sampled captioning, FiD QA) on tiny random models.

The GradCAM oracle re-composes blip_image_text_matching.py:151-200 in torch
at tiny dims using the reference med module's built-in save_attention hooks
(its hardcoded 12-head/24×24 reshape generalized to the test dims). FiD is
pinned by equivalence: encoding contexts separately + concatenating states
must equal decoding over them jointly, because T5 cross-attention has no
positional bias.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_align_tpu.models import blip as blip_mod
from llava_align_tpu.models import pnp_vqa
from llava_align_tpu.models import t5 as t5_mod
from llava_align_tpu.models.blip import BlipConfig, MedConfig
from llava_align_tpu.models.pnp_vqa import PnpVqaConfig
from llava_align_tpu.utils.hf_convert import convert_med

V = 64
D = 32


from tests.stub_utils import stub_module as _stub  # noqa: E402


@pytest.fixture(scope="module")
def ref_med():
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for fn in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
               "prune_linear_layer"):
        if not hasattr(mu, fn):
            setattr(mu, fn, getattr(pu, fn))
    for name in ("lavis", "lavis.common", "lavis.models"):
        if name not in sys.modules:
            _stub(name)
    _stub("lavis.common.utils", get_abs_path=lambda p: p)
    _stub("lavis.models.base_model", BaseEncoder=torch.nn.Module)
    spec = importlib.util.spec_from_file_location(
        "ref_med_pnp", "/root/reference/experiments/lavis/models/med.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_med_pnp"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_gradcam_matches_reference_hooks(ref_med):
    from transformers.models.bert.configuration_bert import BertConfig

    tcfg = MedConfig.tiny(vocab_size=V)
    hf_cfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=tcfg.num_layers,
        num_attention_heads=tcfg.num_heads, intermediate_size=tcfg.intermediate_size,
        max_position_embeddings=tcfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
    )
    hf_cfg.encoder_width = D
    hf_cfg.add_type_embeddings = True
    hf_cfg.add_cross_attention = True
    torch.manual_seed(0)
    bert = ref_med.BertModel(hf_cfg, add_pooling_layer=False)
    itm_head = torch.nn.Linear(D, 2)
    with torch.no_grad():
        for n, p in bert.named_parameters():
            if "bias" in n:
                p.normal_(0, 0.02)

    params = convert_med(
        {k: v.detach() for k, v in bert.state_dict().items()}, tcfg,
        prefix="", head_prefix="__none__.",
    )
    blip_cfg = BlipConfig.tiny(vocab_size=V)
    blip_cfg = BlipConfig(vision=blip_cfg.vision, text=tcfg, embed_dim=16)
    full = {
        "text": params,
        "visual": blip_mod.vit_init(jax.random.PRNGKey(0), blip_cfg.vision),
        "itm_head": {
            "w": jnp.asarray(itm_head.weight.detach().numpy()),
            "b": jnp.asarray(itm_head.bias.detach().numpy()),
        },
    }

    rng = np.random.default_rng(1)
    b, s, se = 2, 7, 5   # se = 1 cls + 4 patches
    ids = rng.integers(1, V, (b, s))
    mask = np.ones((b, s), np.int64)
    mask[1, 5:] = 0
    enc = rng.normal(size=(b, se, D)).astype(np.float32) * 0.3
    block = 1

    # --- torch oracle with save_attention hooks ---
    layer = bert.encoder.layer[block].crossattention.self
    layer.save_attention = True
    out = bert(
        input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
        encoder_hidden_states=torch.tensor(enc),
        encoder_attention_mask=torch.ones((b, se), dtype=torch.long),
    )
    loss = itm_head(out.last_hidden_state[:, 0])[:, 1].sum()
    bert.zero_grad()
    itm_head.zero_grad()
    loss.backward()
    with torch.no_grad():
        H = tcfg.num_heads
        m = torch.tensor(mask).view(b, 1, -1, 1).float()
        cams = layer.get_attention_map()[:, :, :, 1:] * m
        grads = layer.get_attn_gradients()[:, :, :, 1:].clamp(0) * m
        gradcam = (cams * grads).mean(dim=1)           # [b, s, patches]
        tok_len = torch.tensor(mask).sum(-1) - 2
        want_rows = []
        for i in range(b):
            want_rows.append(
                gradcam[i, 1 : tok_len[i] + 1].sum(0) / tok_len[i]
            )
        want = torch.stack(want_rows).numpy()

    avg, full_map = blip_mod.compute_gradcam(
        full, blip_cfg, None, jnp.asarray(ids), jnp.asarray(mask),
        block_num=block, enc_states=jnp.asarray(enc),
    )
    assert full_map.shape == (b, s, se - 1)
    np.testing.assert_allclose(np.asarray(avg), want, atol=1e-5, rtol=1e-4)


def test_fid_equals_joint_encoding():
    """Concatenating separately-encoded contexts == encoding is exact for the
    decoder: greedy FiD output must match decoding over hand-concatenated
    states."""
    cfg = t5_mod.T5Config.tiny(vocab_size=V)
    params = t5_mod.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    n_ctx, s = 3, 6
    ids = rng.integers(2, V, (n_ctx, s))
    mask = np.ones((n_ctx, s), np.int64)
    mask[2, 4:] = 0

    got = pnp_vqa.fid_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), max_len=6
    )

    emb = t5_mod.embed_tokens(params, jnp.asarray(ids))
    enc = t5_mod.encode(params, cfg, emb, jnp.asarray(mask))
    fused = enc.reshape(1, n_ctx * s, -1)
    fmask = jnp.asarray(mask.reshape(1, n_ctx * s))
    want = t5_mod.generate_greedy(
        params, cfg, fused, fmask, max_new_tokens=6, eos_token_id=1,
        decoder_start_token_id=0,
    )[0]
    assert got == want


def test_prepare_qa_input_grouping():
    caps = [f"cap {i}" for i in range(5)]
    ctx = pnp_vqa.prepare_qa_input("What IS this?", caps, num_captions=5, num_captions_fid=2)
    # groups of 2, 2, 1 — each prefixed with the lowered question
    assert len(ctx) == 3
    assert ctx[0] == "what is this? \\n cap 0. cap 1."
    assert ctx[2] == "what is this? \\n cap 4."
    ctx = pnp_vqa.prepare_qa_input("q", caps, num_captions=4, num_captions_fid=1)
    assert len(ctx) == 4


def test_pipeline_end_to_end_tiny():
    cfg = PnpVqaConfig.tiny(vocab_size=V)
    params = pnp_vqa.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    b = 2
    pixels = rng.normal(size=(b, 3, 32, 32)).astype(np.float32)

    def tokenize_q(texts):
        ids = np.full((len(texts), 6), 2, np.int64)
        for i, t in enumerate(texts):
            for j, w in enumerate(t.split()[:4]):
                ids[i, 1 + j] = abs(hash(w)) % (V - 3) + 3
        return ids, np.ones_like(ids)

    def tokenize_ctx(texts):
        ids = np.full((len(texts), 8), 3, np.int64)
        return ids, np.ones_like(ids)

    decode = lambda row: " ".join(str(t) for t in row)
    answers, captions, gradcams = pnp_vqa.predict_answers(
        params, cfg, jnp.asarray(pixels), ["what is this?", "how many?"],
        tokenize_q=tokenize_q, tokenize_ctx=tokenize_ctx,
        decode_cap=decode, decode_ans=decode,
        prompt_ids=[2, 5], rng=jax.random.PRNGKey(1),
        num_captions=3, num_captions_fid=2, num_patches=2,
        cap_max_length=5, max_len=4, max_rounds=4,
    )
    assert len(answers) == b
    assert gradcams.shape == (b, cfg.itm.vision.num_patches)
    assert all(len(c) <= 3 for c in captions)
    assert all(isinstance(a, str) for a in answers)


def test_sample_patches_without_replacement():
    w = jnp.asarray(np.tile([[0.1, 0.5, 0.2, 0.2]], (8, 1))[None])  # [1, 8, 4]
    idx = np.asarray(pnp_vqa._sample_patches(jax.random.PRNGKey(0), w, 3))
    assert idx.shape == (1, 8, 3)
    for row in idx[0]:
        assert len(set(row.tolist())) == 3          # no replacement
        assert (np.sort(row) == row).all()          # sorted
