"""BLIP-2 LM-backend training losses vs HF torch oracles
(reference blip2_opt.py:107-162 and blip2_t5.py:102-156 loss assembly;
blip2_t5_instruct._predict_class per-candidate ranking :503-700)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_align_tpu.models import blip2, opt as opt_model, t5 as t5_model
from llava_align_tpu.models.blip2 import Blip2OptConfig, Blip2T5Config
from llava_align_tpu.utils.hf_convert import convert_opt, convert_t5

OPT_CFG = Blip2OptConfig.tiny(vocab_size=256)
T5_CFG = Blip2T5Config.tiny(vocab_size=128)


@pytest.fixture(scope="module")
def hf_opt():
    from transformers import OPTConfig as HFCfg
    from transformers import OPTForCausalLM

    c = OPT_CFG.text
    torch.manual_seed(0)
    hf = OPTForCausalLM(
        HFCfg(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            num_hidden_layers=c.num_layers, num_attention_heads=c.num_heads,
            ffn_dim=c.ffn_dim, max_position_embeddings=c.max_position_embeddings,
            do_layer_norm_before=True, attn_implementation="eager",
            pad_token_id=1,
        )
    ).eval()
    params = convert_opt({k: v.detach() for k, v in hf.state_dict().items()}, c)
    return hf, params


@pytest.fixture(scope="module")
def hf_t5():
    from transformers import T5Config as HFCfg
    from transformers import T5ForConditionalGeneration

    c = T5_CFG.text
    torch.manual_seed(1)
    hf = T5ForConditionalGeneration(
        HFCfg(
            vocab_size=c.vocab_size, d_model=c.d_model, d_kv=c.d_kv,
            num_heads=c.num_heads, d_ff=c.d_ff, num_layers=c.num_layers,
            num_decoder_layers=c.num_decoder_layers,
            relative_attention_num_buckets=c.relative_attention_num_buckets,
            relative_attention_max_distance=c.relative_attention_max_distance,
            feed_forward_proj="gated-gelu", tie_word_embeddings=False,
            dropout_rate=0.0, decoder_start_token_id=0, eos_token_id=1,
            pad_token_id=0,
        )
    ).eval()
    params = convert_t5({k: v.detach() for k, v in hf.state_dict().items()}, c)
    return hf, params


def test_opt_prefix_loss_matches_hf(hf_opt):
    """Blip2OPT.forward loss: [-100 query prefix; pad-masked caption]."""
    hf, lm_params = hf_opt
    rng = np.random.default_rng(0)
    B, Q, T = 2, 4, 9
    pad = 1
    D = OPT_CFG.text.hidden_size
    q_emb = rng.normal(size=(B, Q, D)).astype(np.float32) * 0.05
    ids = rng.integers(4, 200, (B, T))
    mask = np.ones((B, T), np.int64)
    mask[1, 6:] = 0
    ids[1, 6:] = pad

    with torch.no_grad():
        tok = hf.model.decoder.embed_tokens(torch.tensor(ids))
        embeds = torch.cat([torch.tensor(q_emb), tok], dim=1)
        attn = torch.cat([torch.ones(B, Q, dtype=torch.long), torch.tensor(mask)], dim=1)
        targets = torch.tensor(ids).masked_fill(torch.tensor(ids) == pad, -100)
        targets = torch.cat(
            [torch.full((B, Q), -100, dtype=torch.long), targets], dim=1
        )
        ref = hf(inputs_embeds=embeds, attention_mask=attn, labels=targets).loss

    params = {"lm": lm_params}
    ours = blip2.opt_forward_loss(
        params, OPT_CFG, None, jnp.asarray(ids), jnp.asarray(mask),
        pad_token_id=pad, q_emb=jnp.asarray(q_emb),
    )
    np.testing.assert_allclose(float(ours), float(ref), atol=2e-5, rtol=2e-5)


def test_opt_prompt_columns_masked(hf_opt):
    """prompt_length masks the leading prompt columns from the loss
    (blip2_opt.py:141-142)."""
    hf, lm_params = hf_opt
    rng = np.random.default_rng(1)
    B, Q, T, pad, PL = 2, 3, 8, 1, 3
    D = OPT_CFG.text.hidden_size
    q_emb = rng.normal(size=(B, Q, D)).astype(np.float32) * 0.05
    ids = rng.integers(4, 200, (B, T))
    mask = np.ones((B, T), np.int64)

    with torch.no_grad():
        tok = hf.model.decoder.embed_tokens(torch.tensor(ids))
        embeds = torch.cat([torch.tensor(q_emb), tok], dim=1)
        attn = torch.ones(B, Q + T, dtype=torch.long)
        targets = torch.tensor(ids).clone()
        targets[:, :PL] = -100
        targets = torch.cat(
            [torch.full((B, Q), -100, dtype=torch.long), targets], dim=1
        )
        ref = hf(inputs_embeds=embeds, attention_mask=attn, labels=targets).loss

    ours = blip2.opt_forward_loss(
        {"lm": lm_params}, OPT_CFG, None, jnp.asarray(ids), jnp.asarray(mask),
        pad_token_id=pad, prompt_length=PL, q_emb=jnp.asarray(q_emb),
    )
    np.testing.assert_allclose(float(ours), float(ref), atol=2e-5, rtol=2e-5)


def test_t5_prefix_loss_matches_hf(hf_t5):
    """Blip2T5.forward loss: encoder sees [query prefix; input tokens],
    decoder trains on pad-masked output tokens."""
    hf, lm_params = hf_t5
    rng = np.random.default_rng(2)
    B, Q, Ti, To = 2, 4, 7, 6
    D = T5_CFG.text.d_model
    q_emb = rng.normal(size=(B, Q, D)).astype(np.float32) * 0.05
    in_ids = rng.integers(3, 120, (B, Ti))
    in_mask = np.ones((B, Ti), np.int64)
    in_mask[1, 5:] = 0
    out_ids = rng.integers(3, 120, (B, To))
    out_mask = np.ones((B, To), np.int64)
    out_mask[0, 4:] = 0
    out_ids[0, 4:] = 0  # pad

    with torch.no_grad():
        tok = hf.encoder.embed_tokens(torch.tensor(in_ids))
        embeds = torch.cat([torch.tensor(q_emb), tok], dim=1)
        attn = torch.cat([torch.ones(B, Q, dtype=torch.long), torch.tensor(in_mask)], dim=1)
        targets = torch.tensor(out_ids).masked_fill(torch.tensor(out_ids) == 0, -100)
        ref = hf(
            inputs_embeds=embeds, attention_mask=attn,
            decoder_attention_mask=torch.tensor(out_mask), labels=targets,
        ).loss

    ours = blip2.t5_forward_loss(
        {"lm": lm_params}, T5_CFG, None,
        jnp.asarray(in_ids), jnp.asarray(in_mask),
        jnp.asarray(out_ids), jnp.asarray(out_mask),
        q_emb=jnp.asarray(q_emb),
    )
    np.testing.assert_allclose(float(ours), float(ref), atol=3e-5, rtol=3e-5)


def test_t5_candidate_ranking_matches_hf(hf_t5):
    """predict_class: per-candidate token-sum losses and their ranking
    (LAVIS modeling_t5 reduction='none' → per-sample sum :1874-1877)."""
    hf, lm_params = hf_t5
    rng = np.random.default_rng(3)
    B, Q, Ti, C, Tc = 2, 3, 5, 4, 4
    D = T5_CFG.text.d_model
    q_emb = rng.normal(size=(B, Q, D)).astype(np.float32) * 0.05
    in_ids = rng.integers(3, 120, (B, Ti))
    in_mask = np.ones((B, Ti), np.int64)
    cand = rng.integers(3, 120, (C, Tc))
    cand[2, 2:] = 0  # a shorter candidate (padded)

    params = {"lm": lm_params}
    enc_hidden, enc_mask = blip2.t5_encode_with_prefix(
        params, T5_CFG, jnp.asarray(q_emb), jnp.asarray(in_ids), jnp.asarray(in_mask)
    )
    ours = np.asarray(blip2.t5_candidate_losses(
        params, T5_CFG, enc_hidden, enc_mask, jnp.asarray(cand)
    ))

    with torch.no_grad():
        tok = hf.encoder.embed_tokens(torch.tensor(in_ids))
        embeds = torch.cat([torch.tensor(q_emb), tok], dim=1)
        attn = torch.cat([torch.ones(B, Q, dtype=torch.long), torch.tensor(in_mask)], dim=1)
        ref = np.zeros((B, C), np.float32)
        for b in range(B):
            for c in range(C):
                targets = torch.tensor(cand[c : c + 1]).masked_fill(
                    torch.tensor(cand[c : c + 1]) == 0, -100
                )
                out = hf(
                    inputs_embeds=embeds[b : b + 1], attention_mask=attn[b : b + 1],
                    labels=targets,
                )
                n_valid = int((targets != -100).sum())
                ref[b, c] = float(out.loss) * n_valid  # mean → sum
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)
    np.testing.assert_array_equal(np.argsort(ours, axis=-1), np.argsort(ref, axis=-1))


def test_instruct_encode_text_conditioning_and_video():
    """Text-conditioned queries differ from unconditioned; 5-D video input
    concatenates per-frame query outputs (blip2_t5_instruct.py:328-359)."""
    cfg = T5_CFG
    params = blip2.init_t5(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28), jnp.float32)
    txt = jnp.asarray([[5, 6, 7], [8, 9, 0]], jnp.int32)
    msk = jnp.asarray([[1, 1, 1], [1, 1, 0]], jnp.int32)
    cond = blip2.encode_image_queries_instruct(params, cfg, imgs, txt, msk)
    uncond = blip2.encode_image_queries_instruct(params, cfg, imgs)
    assert cond.shape == uncond.shape == (2, cfg.num_query_tokens, cfg.text.d_model)
    assert not np.allclose(np.asarray(cond), np.asarray(uncond))

    video = jnp.stack([imgs, imgs * 0.5], axis=2)  # [B, 3, F=2, H, W]
    v = blip2.encode_image_queries_instruct(params, cfg, video, txt, msk)
    assert v.shape == (2, 2 * cfg.num_query_tokens, cfg.text.d_model)
    np.testing.assert_allclose(
        np.asarray(v[:, : cfg.num_query_tokens]), np.asarray(cond), atol=1e-5
    )


def test_convert_qformer_tolerates_pruned_text_branches():
    """blip2_opt/t5 checkpoints drop cls, word/position embeddings and the
    text FFNs (blip2_opt.py:78-84); conversion must still produce working
    query-only params."""
    import importlib.util
    import sys

    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for fn in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, fn):
            setattr(mu, fn, getattr(pu, fn))
    from llava_align_tpu.models.qformer import QFormerConfig
    from llava_align_tpu.utils.hf_convert import convert_qformer
    from llava_align_tpu.models import qformer

    qf_cfg = QFormerConfig.tiny(encoder_width=24)
    spec = importlib.util.spec_from_file_location(
        "ref_qformer_pruned",
        "/root/reference/experiments/lavis/models/blip2_models/Qformer.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_qformer_pruned"] = mod
    spec.loader.exec_module(mod)
    from transformers.models.bert.configuration_bert import BertConfig

    cfg = BertConfig(
        vocab_size=qf_cfg.vocab_size, hidden_size=qf_cfg.hidden_size,
        num_hidden_layers=qf_cfg.num_layers, num_attention_heads=qf_cfg.num_heads,
        intermediate_size=qf_cfg.intermediate_size,
        max_position_embeddings=qf_cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg.encoder_width = qf_cfg.encoder_width
    cfg.add_cross_attention = True
    cfg.cross_attention_freq = qf_cfg.cross_attention_freq
    cfg.query_length = qf_cfg.query_length
    torch.manual_seed(2)
    ref = mod.BertModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach() for k, v in ref.state_dict().items()}
    pruned = {
        k: v for k, v in sd.items()
        if not (
            "word_embeddings" in k or "position_embeddings" in k
            or ".intermediate.dense" in k or ".output.dense" in k and "attention" not in k
        )
    }
    # keep attention output dense (the filter above only drops FFN output)
    pruned.update({k: v for k, v in sd.items() if "attention.output" in k})
    params = convert_qformer(pruned, qf_cfg, prefix="")

    rng = np.random.default_rng(4)
    B, Q, N = 1, qf_cfg.query_length, 5
    queries = rng.normal(size=(B, Q, qf_cfg.hidden_size)).astype(np.float32) * 0.05
    image_embeds = rng.normal(size=(B, N, qf_cfg.encoder_width)).astype(np.float32)
    with torch.no_grad():
        want = ref(
            query_embeds=torch.tensor(queries),
            encoder_hidden_states=torch.tensor(image_embeds),
            encoder_attention_mask=torch.ones(B, N, dtype=torch.long),
            return_dict=True,
        ).last_hidden_state.numpy()
    hidden, _ = qformer.forward_queries(
        params, qf_cfg, jnp.asarray(queries), jnp.asarray(image_embeds)
    )
    np.testing.assert_allclose(np.asarray(hidden), want, atol=3e-4, rtol=1e-3)


def test_t5_instruct_forward_loss_with_few_shot(hf_t5):
    """Instruct forward with a few-shot context prefix: loss equals HF on
    the concatenated [fs; queries; input] encoder stream
    (blip2_t5_instruct.py:161-190)."""
    hf, lm_params = hf_t5
    rng = np.random.default_rng(6)
    B, Q, Sfs, Ti, To = 2, 3, 4, 5, 4
    D = T5_CFG.text.d_model
    q_emb = rng.normal(size=(B, Q, D)).astype(np.float32) * 0.05
    fs = rng.normal(size=(B, Sfs, D)).astype(np.float32) * 0.05
    fs_mask = np.ones((B, Sfs), np.int64)
    fs_mask[1, 2:] = 0
    in_ids = rng.integers(3, 120, (B, Ti))
    in_mask = np.ones((B, Ti), np.int64)
    out_ids = rng.integers(3, 120, (B, To))
    out_mask = np.ones((B, To), np.int64)

    with torch.no_grad():
        tok = hf.encoder.embed_tokens(torch.tensor(in_ids))
        embeds = torch.cat([torch.tensor(fs), torch.tensor(q_emb), tok], dim=1)
        attn = torch.cat(
            [torch.tensor(fs_mask), torch.ones(B, Q, dtype=torch.long),
             torch.tensor(in_mask)], dim=1,
        )
        targets = torch.tensor(out_ids).masked_fill(torch.tensor(out_ids) == 0, -100)
        ref = hf(
            inputs_embeds=embeds, attention_mask=attn,
            decoder_attention_mask=torch.tensor(out_mask), labels=targets,
        ).loss

    ours = blip2.t5_forward_loss(
        {"lm": lm_params}, T5_CFG, None,
        jnp.asarray(in_ids), jnp.asarray(in_mask),
        jnp.asarray(out_ids), jnp.asarray(out_mask),
        q_emb=jnp.asarray(q_emb),
        few_shot_embeds=jnp.asarray(fs), few_shot_mask=jnp.asarray(fs_mask),
    )
    np.testing.assert_allclose(float(ours), float(ref), atol=3e-5, rtol=3e-5)
