"""BLIP variants: NLVR twin-cross parity vs the reference nlvr_encoder.py
torch oracle; retrieval/VQA/classification/pretrain functional tests.
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
from llava_align_tpu.models import blip_variants as bv
from llava_align_tpu.models.albef import init_queue_state
from llava_align_tpu.models.blip import BlipConfig, MedConfig
from llava_align_tpu.utils.hf_convert import convert_blip_nlvr

V = 64
D = 32


@pytest.fixture(scope="module")
def ref_nlvr():
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for fn in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
               "prune_linear_layer"):
        if not hasattr(mu, fn):
            setattr(mu, fn, getattr(pu, fn))
    spec = importlib.util.spec_from_file_location(
        "ref_nlvr_encoder",
        "/root/reference/experiments/lavis/models/blip_models/nlvr_encoder.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_nlvr_encoder"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_nlvr_twin_cross_matches_reference(ref_nlvr):
    from transformers.models.bert.configuration_bert import BertConfig

    # nlvr_encoder hardcodes merge at layer_num >= 6 — build 7 layers so the
    # last layer exercises the merge path and the first six the average path
    L = 7
    hf_cfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=L,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
        pad_token_id=0, attn_implementation="eager",
        add_cross_attention=True, is_decoder=False,
    )
    hf_cfg.encoder_width = D
    torch.manual_seed(1)
    hf = ref_nlvr.BertModel(hf_cfg, add_pooling_layer=False).eval()
    with torch.no_grad():
        for n, p in hf.named_parameters():
            if "bias" in n:
                p.normal_(0, 0.02)

    tcfg = MedConfig(
        vocab_size=V, hidden_size=D, num_layers=L, num_heads=4,
        intermediate_size=64, max_position_embeddings=64,
    )
    from llava_align_tpu.models.blip_variants import NlvrConfig

    cfg = NlvrConfig(
        base=BlipConfig(
            vision=BlipConfig.tiny(V).vision, text=tcfg, embed_dim=16
        ),
        merge_from=6,
    )
    sd = {f"text_encoder.{k}": v.detach() for k, v in hf.state_dict().items()}
    # dummy ViT keys for the converter
    vit = blip_mod.vit_init(jax.random.PRNGKey(0), cfg.base.vision)
    params = {
        "text": convert_blip_nlvr_text_only(sd, cfg),
        "visual": vit,
        "cls_head": {
            "fc1": {"w": jnp.zeros((D, D)), "b": jnp.zeros((D,))},
            "fc2": {"w": jnp.zeros((2, D)), "b": jnp.zeros((2,))},
        },
    }

    rng = np.random.default_rng(2)
    b, s, se = 2, 6, 5
    ids = rng.integers(1, V, (b, s))
    mask = np.ones((b, s), np.int64)
    mask[1, 4:] = 0
    e0 = rng.normal(size=(b, se, D)).astype(np.float32) * 0.3
    e1 = rng.normal(size=(b, se, D)).astype(np.float32) * 0.3

    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            encoder_hidden_states=[torch.tensor(e0), torch.tensor(e1)],
            encoder_attention_mask=[
                torch.ones((b, se), dtype=torch.long),
                torch.ones((b, se), dtype=torch.long),
            ],
            mode="multimodal",
        ).last_hidden_state.numpy()

    got = np.asarray(bv.nlvr_encode(
        params, cfg, jnp.asarray(e0), jnp.asarray(e1),
        jnp.asarray(ids), jnp.asarray(mask),
    ))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def convert_blip_nlvr_text_only(sd, cfg):
    """Converter path without the ViT (text tree only) for oracle tests."""
    import numpy as _np_mod

    full_sd = dict(sd)
    v = cfg.base.vision
    Dv, Lv = v.hidden_size, v.num_layers
    full_sd["visual_encoder.cls_token"] = _np_mod.zeros((1, 1, Dv), _np_mod.float32)
    full_sd["visual_encoder.pos_embed"] = _np_mod.zeros((1, v.num_patches + 1, Dv), _np_mod.float32)
    full_sd["visual_encoder.patch_embed.proj.weight"] = _np_mod.zeros(
        (Dv, 3, v.patch_size, v.patch_size), _np_mod.float32
    )
    full_sd["visual_encoder.patch_embed.proj.bias"] = _np_mod.zeros((Dv,), _np_mod.float32)
    for i in range(Lv):
        p = f"visual_encoder.blocks.{i}."
        full_sd[p + "attn.qkv.weight"] = _np_mod.zeros((3 * Dv, Dv), _np_mod.float32)
        full_sd[p + "attn.qkv.bias"] = _np_mod.zeros((3 * Dv,), _np_mod.float32)
        full_sd[p + "attn.proj.weight"] = _np_mod.zeros((Dv, Dv), _np_mod.float32)
        full_sd[p + "attn.proj.bias"] = _np_mod.zeros((Dv,), _np_mod.float32)
        full_sd[p + "mlp.fc1.weight"] = _np_mod.zeros((v.ffn_dim, Dv), _np_mod.float32)
        full_sd[p + "mlp.fc1.bias"] = _np_mod.zeros((v.ffn_dim,), _np_mod.float32)
        full_sd[p + "mlp.fc2.weight"] = _np_mod.zeros((Dv, v.ffn_dim), _np_mod.float32)
        full_sd[p + "mlp.fc2.bias"] = _np_mod.zeros((Dv,), _np_mod.float32)
        for ln in ("norm1", "norm2"):
            full_sd[p + ln + ".weight"] = _np_mod.ones((Dv,), _np_mod.float32)
            full_sd[p + ln + ".bias"] = _np_mod.zeros((Dv,), _np_mod.float32)
    full_sd["visual_encoder.norm.weight"] = _np_mod.ones((Dv,), _np_mod.float32)
    full_sd["visual_encoder.norm.bias"] = _np_mod.zeros((Dv,), _np_mod.float32)
    return convert_blip_nlvr(full_sd, cfg)["text"]


def test_retrieval_train_step_and_pretrain():
    cfg = BlipConfig.tiny(V)
    params = bv.init_retrieval(jax.random.PRNGKey(0), cfg)
    params["decoder"] = blip_mod.med_init(jax.random.PRNGKey(9), cfg.text)
    m_params = jax.tree_util.tree_map(jnp.copy, params)

    class QCfg:
        embed_dim = cfg.embed_dim
        queue_size = 8

    state = init_queue_state(QCfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    b, s = 4, 6
    pixels = jnp.asarray(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    ids = jnp.asarray(rng.integers(3, V, (b, s)))
    enc_ids = ids.at[:, 0].set(1)
    dec_ids = ids.at[:, 0].set(2)
    mask = jnp.asarray(np.ones((b, s), np.int64))
    idx = jnp.asarray([0, 1, 2, 1])

    losses, m2, s2 = bv.retrieval_train_step(
        params, m_params, state, cfg, jax.random.PRNGKey(2),
        pixels, ids, enc_ids, mask, idx, queue_size=8,
    )
    assert np.isfinite(float(losses["loss"]))
    assert int(s2["ptr"]) == b

    losses, _, _ = bv.pretrain_step(
        params, m_params, state, cfg, jax.random.PRNGKey(3),
        pixels, ids, enc_ids, dec_ids, mask, idx,
    )
    for k in ("loss", "loss_itc", "loss_itm", "loss_lm"):
        assert np.isfinite(float(losses[k])), k
    g = jax.grad(
        lambda p: bv.retrieval_train_step(
            p, m_params, state, cfg, jax.random.PRNGKey(2),
            pixels, ids, enc_ids, mask, idx, queue_size=8,
        )[0]["loss"]
    )(params)
    gn = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(gn) and gn > 0


def test_vqa_rank_and_generate():
    cfg = BlipConfig.tiny(V)
    params = bv.init_vqa(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    nq, sq, na, sa = 2, 5, 6, 4
    pixels = jnp.asarray(rng.normal(size=(nq, 3, 32, 32)).astype(np.float32))
    q_ids = jnp.asarray(rng.integers(1, V, (nq, sq)))
    q_mask = jnp.asarray(np.ones((nq, sq), np.int64))
    answer_ids = np.zeros((na, sa), np.int64)
    answer_ids[:, 0] = 2
    answer_ids[:, 1:3] = rng.integers(3, V, (na, 2))
    answer_mask = (answer_ids != 0).astype(np.int64)

    picks = bv.vqa_rank_answers(
        params, cfg, pixels, q_ids, q_mask,
        jnp.asarray(answer_ids), jnp.asarray(answer_mask),
        num_ans_candidates=3,
    )
    assert picks.shape == (nq,) and (picks < na).all()

    outs = bv.vqa_generate(
        params, cfg, pixels, q_ids, q_mask,
        bos_token_id=2, eos_token_id=5, max_new_tokens=4,
    )
    assert len(outs) == nq and all(len(o) <= 4 for o in outs)


def test_classification_loss_and_distill():
    cfg = BlipConfig.tiny(V)
    params = bv.init_classification(jax.random.PRNGKey(0), cfg, num_classes=3)
    rng = np.random.default_rng(2)
    b, s = 2, 5
    pixels = jnp.asarray(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, V, (b, s)))
    mask = jnp.asarray(np.ones((b, s), np.int64))
    targets = jnp.asarray([0, 2])
    loss, logits = bv.classification_loss(params, cfg, pixels, ids, mask, targets)
    assert logits.shape == (b, 3) and np.isfinite(float(loss))
    loss_d, _ = bv.classification_loss(
        params, cfg, pixels, ids, mask, targets, m_params=params, alpha=0.4
    )
    assert np.isfinite(float(loss_d))


def test_zoo_registers_blip_variant_archs():
    import llava_align_tpu  # noqa: F401
    from llava_align_tpu.framework.registry import registry

    for arch in ("blip_retrieval", "blip_vqa", "blip_classification",
                 "blip_nlvr", "blip_pretrain"):
        assert registry.get_model_class(arch) is not None, arch


def test_convert_blip_variant_separates_encoder_and_decoder():
    """A VQA checkpoint carries both text_encoder.* and text_decoder.* — the
    converter must keep them apart (review finding: convert_blip would load
    the decoder into the encoder slot)."""
    from transformers import BertConfig, BertLMHeadModel, BertModel
    from llava_align_tpu.utils.hf_convert import convert_blip_variant

    cfg = BlipConfig.tiny(V)
    hf_cfg = BertConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=cfg.text.num_layers,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, is_decoder=True, add_cross_attention=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=0, attn_implementation="eager",
    )
    torch.manual_seed(0)
    enc = BertModel(hf_cfg, add_pooling_layer=False)
    torch.manual_seed(1)
    dec = BertLMHeadModel(hf_cfg)
    sd = {}
    for k, v in enc.state_dict().items():
        sd[f"text_encoder.{k}"] = v.detach()
    for k, v in dec.state_dict().items():
        sd[f"text_decoder.{k}"] = v.detach()
    # tiny vit keys
    vit_hf = blip_mod.vit_init(jax.random.PRNGKey(0), cfg.vision)
    sd.update({
        "visual_encoder.cls_token": torch.zeros(1, 1, D),
        "visual_encoder.pos_embed": torch.zeros(1, cfg.vision.num_patches + 1, D),
        "visual_encoder.patch_embed.proj.weight": torch.zeros(D, 3, 16, 16),
        "visual_encoder.patch_embed.proj.bias": torch.zeros(D),
        "visual_encoder.norm.weight": torch.ones(D),
        "visual_encoder.norm.bias": torch.zeros(D),
    })
    for i in range(cfg.vision.num_layers):
        p = f"visual_encoder.blocks.{i}."
        sd[p + "attn.qkv.weight"] = torch.zeros(3 * D, D)
        sd[p + "attn.qkv.bias"] = torch.zeros(3 * D)
        sd[p + "attn.proj.weight"] = torch.zeros(D, D)
        sd[p + "attn.proj.bias"] = torch.zeros(D)
        sd[p + "mlp.fc1.weight"] = torch.zeros(cfg.vision.ffn_dim, D)
        sd[p + "mlp.fc1.bias"] = torch.zeros(cfg.vision.ffn_dim)
        sd[p + "mlp.fc2.weight"] = torch.zeros(D, cfg.vision.ffn_dim)
        sd[p + "mlp.fc2.bias"] = torch.zeros(D)
        for ln in ("norm1", "norm2"):
            sd[p + ln + ".weight"] = torch.ones(D)
            sd[p + ln + ".bias"] = torch.zeros(D)

    params = convert_blip_variant(sd, cfg, "vqa")
    want_enc = enc.state_dict()["embeddings.word_embeddings.weight"].numpy()
    want_dec = dec.state_dict()["bert.embeddings.word_embeddings.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(params["text"]["embeddings"]["word"]), want_enc, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["embeddings"]["word"]), want_dec, atol=1e-6
    )
    assert not np.allclose(want_enc, want_dec)
    # decoder LM head converted from text_decoder.cls.*
    want_head = dec.state_dict()["cls.predictions.transform.dense.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["head"]["transform"]["w"]), want_head, atol=1e-6
    )

    # classification: cls_head.{0,2} mapping
    sd["cls_head.0.weight"] = torch.full((D, D), 0.5)
    sd["cls_head.0.bias"] = torch.zeros(D)
    sd["cls_head.2.weight"] = torch.full((3, D), 0.25)
    sd["cls_head.2.bias"] = torch.zeros(3)
    params = convert_blip_variant(sd, cfg, "classification", num_classes=3)
    assert float(params["cls_head"]["fc2"]["w"][0, 0]) == 0.25


def test_fusion_mode_requires_fusion_layer():
    from llava_align_tpu.models.blip import med_forward, med_init

    cfg = BlipConfig.tiny(V).text  # fusion_layer=None
    params = blip_mod.med_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="fusion_layer"):
        med_forward(
            params, cfg, None, jnp.ones((1, 4), jnp.int32),
            mode="fusion", input_embeds=jnp.zeros((1, 4, cfg.hidden_size)),
        )
