"""BLIP base (ViT + MED BERT) parity vs HF torch oracles.

The reference's lavis/models/med.py is a fork of HF Bert (cross-attention
decoder) and lavis/models/vit.py a timm ViT structurally identical to HF
ViTModel — HF modules are therefore exact oracles for the math. Tests cover
the text decoder (causal + cross-attention), the plain text encoder, the ViT
tower, incremental≡full decoding, greedy caption equivalence vs a torch
composition, and ITM/feature shapes.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_align_tpu.models import blip
from llava_align_tpu.models.blip import BlipConfig, BlipVitConfig, MedConfig

V = 64
EOS = 5


@pytest.fixture(scope="module")
def med_models():
    from transformers import BertConfig, BertLMHeadModel

    cfg = MedConfig.tiny(vocab_size=V)
    torch.manual_seed(0)
    hf = BertLMHeadModel(
        BertConfig(
            vocab_size=V, hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            max_position_embeddings=cfg.max_position_embeddings,
            is_decoder=True, add_cross_attention=True,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
        )
    ).eval()
    from llava_align_tpu.utils.hf_convert import convert_med

    params = convert_med(
        {k: v.detach() for k, v in hf.state_dict().items()}, cfg,
        prefix="bert.", head_prefix="cls.",
    )
    return hf, cfg, params


def test_med_decoder_with_cross_matches_hf(med_models):
    hf, cfg, params = med_models
    rng = np.random.default_rng(0)
    ids = rng.integers(1, V, (2, 7))
    enc = rng.normal(size=(2, 5, cfg.hidden_size)).astype(np.float32) * 0.2
    enc_mask = np.ones((2, 5), np.int64)
    enc_mask[1, 3:] = 0
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=torch.tensor(enc_mask),
        ).logits.numpy()
    hidden = blip.med_forward(
        params, cfg, jnp.asarray(ids), None,
        encoder_states=jnp.asarray(enc), encoder_mask=jnp.asarray(enc_mask),
        causal=True,
    )
    got = np.asarray(blip.med_logits(params, hidden))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_med_encoder_mode_matches_hf_bert():
    from transformers import BertConfig, BertModel

    cfg = MedConfig.tiny(vocab_size=V)
    torch.manual_seed(1)
    hf = BertModel(
        BertConfig(
            vocab_size=V, hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            max_position_embeddings=cfg.max_position_embeddings,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            layer_norm_eps=1e-12, pad_token_id=0, attn_implementation="eager",
        ),
        add_pooling_layer=False,
    ).eval()
    from llava_align_tpu.utils.hf_convert import convert_med

    params = convert_med(
        {k: v.detach() for k, v in hf.state_dict().items()}, cfg,
        prefix="", head_prefix="__none__.",
    )
    rng = np.random.default_rng(2)
    ids = rng.integers(1, V, (2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[0, 6:] = 0
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(
        blip.med_forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    )
    # compare only attended positions (HF computes masked ones too, but their
    # values feed nothing downstream)
    np.testing.assert_allclose(got[mask == 1], want[mask == 1], atol=3e-4, rtol=1e-3)


def test_vit_matches_hf(med_models_unused=None):
    from transformers import ViTConfig, ViTModel

    cfg = BlipVitConfig.tiny()
    torch.manual_seed(3)
    hf = ViTModel(
        ViTConfig(
            hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads, intermediate_size=cfg.ffn_dim,
            image_size=cfg.image_size, patch_size=cfg.patch_size,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            layer_norm_eps=cfg.layer_norm_eps, attn_implementation="eager",
        ),
        add_pooling_layer=False,
    ).eval()
    sd = {k: v.detach() for k, v in hf.state_dict().items()}
    # map HF ViT names to the lavis-timm naming convert_blip_vit expects
    L, D = cfg.num_layers, cfg.hidden_size
    m = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight": sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias": sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(L):
        p = f"encoder.layer.{i}."
        qkv_w = torch.cat(
            [sd[p + f"attention.attention.{n}.weight"] for n in ("query", "key", "value")], 0
        )
        qkv_b = torch.cat(
            [sd[p + f"attention.attention.{n}.bias"] for n in ("query", "key", "value")], 0
        )
        m[f"blocks.{i}.attn.qkv.weight"] = qkv_w
        m[f"blocks.{i}.attn.qkv.bias"] = qkv_b
        m[f"blocks.{i}.attn.proj.weight"] = sd[p + "attention.output.dense.weight"]
        m[f"blocks.{i}.attn.proj.bias"] = sd[p + "attention.output.dense.bias"]
        m[f"blocks.{i}.norm1.weight"] = sd[p + "layernorm_before.weight"]
        m[f"blocks.{i}.norm1.bias"] = sd[p + "layernorm_before.bias"]
        m[f"blocks.{i}.norm2.weight"] = sd[p + "layernorm_after.weight"]
        m[f"blocks.{i}.norm2.bias"] = sd[p + "layernorm_after.bias"]
        m[f"blocks.{i}.mlp.fc1.weight"] = sd[p + "intermediate.dense.weight"]
        m[f"blocks.{i}.mlp.fc1.bias"] = sd[p + "intermediate.dense.bias"]
        m[f"blocks.{i}.mlp.fc2.weight"] = sd[p + "output.dense.weight"]
        m[f"blocks.{i}.mlp.fc2.bias"] = sd[p + "output.dense.bias"]
    from llava_align_tpu.utils.hf_convert import convert_blip_vit

    params = convert_blip_vit(m, cfg, prefix="")
    rng = np.random.default_rng(4)
    px = rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.tensor(px)).last_hidden_state.numpy()
    got = np.asarray(blip.vit_forward(params, cfg, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_incremental_decode_matches_full(med_models):
    _, cfg, params = med_models
    rng = np.random.default_rng(5)
    ids = rng.integers(1, V, (2, 6))
    enc = rng.normal(size=(2, 4, cfg.hidden_size)).astype(np.float32) * 0.2
    full = blip.med_forward(
        params, cfg, jnp.asarray(ids), None,
        encoder_states=jnp.asarray(enc),
        encoder_mask=jnp.ones((2, 4), jnp.int32), causal=True,
    )
    full_logits = np.asarray(blip.med_logits(params, full))

    cache = blip.init_self_cache(cfg, 2, 6)
    cross = blip.precompute_cross_kv(params, cfg, jnp.asarray(enc))
    for t in range(6):
        logits, cache = blip.decode_step(
            params, cfg, jnp.asarray(ids[:, t], jnp.int32),
            jnp.asarray(t, jnp.int32), cache, cross,
        )
        np.testing.assert_allclose(
            np.asarray(logits), full_logits[:, t], atol=1e-4, rtol=1e-3
        )


@pytest.fixture(scope="module")
def blip_setup(med_models):
    hf_med, med_cfg, med_params = med_models
    cfg = BlipConfig.tiny(vocab_size=V)
    # BLIP semantics (med.py:111-115): no token-type vector is ever added
    # (callers pass token_type_ids=None); HF Bert adds type[0] for its
    # zeros default — zero the oracle's type table so both sides agree
    with torch.no_grad():
        hf_med.bert.embeddings.token_type_embeddings.weight.zero_()
    import dataclasses as _dc

    from llava_align_tpu.utils.hf_convert import convert_med

    med_params = convert_med(
        {k: v.detach() for k, v in hf_med.state_dict().items()},
        _dc.replace(med_cfg, use_type_embeddings=False),
        prefix="bert.", head_prefix="cls.",
    )
    params = blip.init(jax.random.PRNGKey(0), cfg)
    params["text"] = med_params  # share the HF-converted decoder
    return hf_med, cfg, params


def test_greedy_caption_matches_torch_composition(blip_setup):
    """Our generate_caption ≡ manual torch greedy over (our ViT states →
    HF BertLMHeadModel) — the BLIP caption architecture composed in torch."""
    hf_med, cfg, params = blip_setup
    rng = np.random.default_rng(6)
    px = rng.normal(size=(1, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    prompt = [2, 9]  # [DEC]-style bos + prompt token

    ours = blip.generate_caption(
        params, cfg, jnp.asarray(px), prompt, max_new_tokens=5,
        eos_token_id=EOS, num_beams=1,
    )

    enc = np.asarray(blip.vit_forward(params["visual"], cfg.vision, jnp.asarray(px)))
    seq = list(prompt)
    want = []
    with torch.no_grad():
        for _ in range(5):
            logits = hf_med(
                input_ids=torch.tensor([seq]),
                encoder_hidden_states=torch.tensor(enc),
                encoder_attention_mask=torch.ones(1, enc.shape[1], dtype=torch.long),
            ).logits[0, -1]
            nxt = int(logits.argmax())
            if nxt == EOS:
                break
            want.append(nxt)
            seq.append(nxt)
    assert ours[0] == want, (ours, want)


def test_beam_caption_runs_and_beats_or_matches_greedy_score(blip_setup):
    _, cfg, params = blip_setup
    rng = np.random.default_rng(7)
    px = rng.normal(size=(1, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    outs = blip.generate_caption(
        params, cfg, jnp.asarray(px), [2, 9], max_new_tokens=4,
        eos_token_id=EOS, num_beams=3,
    )
    assert len(outs) == 1 and len(outs[0]) <= 4
    assert all(t != EOS for t in outs[0])


def test_itm_and_features_shapes(blip_setup):
    _, cfg, params = blip_setup
    rng = np.random.default_rng(8)
    px = rng.normal(size=(2, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    ids = rng.integers(1, V, (2, 6))
    mask = np.ones((2, 6), np.int32)
    itm = np.asarray(blip.itm_score(params, cfg, jnp.asarray(px), jnp.asarray(ids), jnp.asarray(mask)))
    assert itm.shape == (2, 2) and np.isfinite(itm).all()
    feats = blip.extract_features(
        params, cfg, pixels=jnp.asarray(px), text_ids=jnp.asarray(ids),
        text_mask=jnp.asarray(mask),
    )
    assert feats["image_features"].shape == (2, cfg.embed_dim)
    assert feats["text_features"].shape == (2, cfg.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats["text_features"]), axis=-1), 1.0, atol=1e-5
    )


def test_compute_sim_matrix_itm_rerank(blip_setup):
    _, cfg, params = blip_setup
    rng = np.random.default_rng(9)
    px = rng.normal(size=(2, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    ids = rng.integers(1, V, (3, 5))
    mask = np.ones((3, 5), np.int32)
    i2t, t2i = blip.compute_sim_matrix(
        params, cfg, jnp.asarray(px), jnp.asarray(ids), jnp.asarray(mask), k_test=2
    )
    assert i2t.shape == (2, 3) and t2i.shape == (3, 2)
    # exactly k entries per row re-ranked, rest at the -100 floor
    assert ((i2t > -100.0).sum(axis=1) == 2).all()
    assert ((t2i > -100.0).sum(axis=1) == 2).all()
