"""Stage-1 BLIP-2 Q-Former parity vs the reference BertLMHeadModel
(lavis/models/blip2_models/Qformer.py, loaded by file path as a torch
oracle): text-only encode, causal LM over the cached query K/V
(past_key_values), label-smoothed LM loss, and greedy caption decoding.
Then the full Blip2Qformer pretrain / ITM / ITC / feature math re-enacted
head-to-head (blip2_qformer.py:90-275, 340-498)."""

import importlib.util
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from llava_align_tpu.models import qformer
from llava_align_tpu.models.qformer import QFormerConfig
from llava_align_tpu.utils.hf_convert import convert_qformer

QF_CFG = QFormerConfig.tiny(encoder_width=24)


def _load_by_path(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_lm():
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for fn in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, fn):
            setattr(mu, fn, getattr(pu, fn))

    mod = _load_by_path(
        "ref_qformer_lm",
        "/root/reference/experiments/lavis/models/blip2_models/Qformer.py",
    )
    from transformers.models.bert.configuration_bert import BertConfig

    cfg = BertConfig(
        vocab_size=QF_CFG.vocab_size,
        hidden_size=QF_CFG.hidden_size,
        num_hidden_layers=QF_CFG.num_layers,
        num_attention_heads=QF_CFG.num_heads,
        intermediate_size=QF_CFG.intermediate_size,
        max_position_embeddings=QF_CFG.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    cfg.encoder_width = QF_CFG.encoder_width
    cfg.add_cross_attention = True
    cfg.cross_attention_freq = QF_CFG.cross_attention_freq
    cfg.query_length = QF_CFG.query_length
    torch.manual_seed(7)
    model = mod.BertLMHeadModel(cfg).eval()
    with torch.no_grad():  # randomize the zero-init head bias for a real test
        model.cls.predictions.bias.normal_(0, 0.02)
    return model


@pytest.fixture(scope="module")
def params(ref_lm):
    sd = {k: v.detach() for k, v in ref_lm.state_dict().items()}
    return convert_qformer(sd, QF_CFG, prefix="bert.", head_prefix="cls.")


def test_text_only_parity(ref_lm, params):
    rng = np.random.default_rng(0)
    B, T = 2, 9
    ids = rng.integers(5, QF_CFG.vocab_size, (B, T))
    mask = np.ones((B, T), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        ref = ref_lm.bert(
            torch.tensor(ids), attention_mask=torch.tensor(mask), return_dict=True
        ).last_hidden_state.numpy()
    ours = np.asarray(
        qformer.forward_text(params, QF_CFG, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def _query_setup(rng, B):
    Q, N = QF_CFG.query_length, 5
    queries = rng.normal(size=(B, Q, QF_CFG.hidden_size)).astype(np.float32) * 0.05
    image_embeds = rng.normal(size=(B, N, QF_CFG.encoder_width)).astype(np.float32)
    return queries, image_embeds


def test_query_kv_matches_reference_past(ref_lm, params):
    rng = np.random.default_rng(1)
    B = 2
    queries, image_embeds = _query_setup(rng, B)
    with torch.no_grad():
        ref_out = ref_lm.bert(
            query_embeds=torch.tensor(queries),
            encoder_hidden_states=torch.tensor(image_embeds),
            encoder_attention_mask=torch.ones(B, image_embeds.shape[1], dtype=torch.long),
            use_cache=True,
            return_dict=True,
        )
    hidden, kv = qformer.forward_queries(
        params, QF_CFG, jnp.asarray(queries), jnp.asarray(image_embeds)
    )
    np.testing.assert_allclose(
        np.asarray(hidden), ref_out.last_hidden_state.numpy(), atol=3e-4, rtol=1e-3
    )
    for l, (k, v) in enumerate(kv):
        # reference past: [B, H, S, Dh]; ours: [B, S, H, Dh]
        ref_k = ref_out.past_key_values[l][0].numpy().transpose(0, 2, 1, 3)
        ref_v = ref_out.past_key_values[l][1].numpy().transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(k), ref_k, atol=3e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(v), ref_v, atol=3e-4, rtol=1e-3)


def test_lm_with_query_past_parity(ref_lm, params):
    """The captioning pass (blip2_qformer.py:249-268): decoder ids over the
    cached query K/V — logits and the label-smoothed mean loss."""
    rng = np.random.default_rng(2)
    B, T = 2, 8
    queries, image_embeds = _query_setup(rng, B)
    ids = rng.integers(5, QF_CFG.vocab_size, (B, T))
    mask = np.ones((B, T), np.int64)
    mask[1, 5:] = 0
    labels = np.where(mask == 1, ids, -100)

    with torch.no_grad():
        q_out = ref_lm.bert(
            query_embeds=torch.tensor(queries),
            encoder_hidden_states=torch.tensor(image_embeds),
            encoder_attention_mask=torch.ones(B, image_embeds.shape[1], dtype=torch.long),
            use_cache=True,
            return_dict=True,
        )
        attn = torch.cat(
            [torch.ones(B, QF_CFG.query_length, dtype=torch.long), torch.tensor(mask)],
            dim=1,
        )
        ref = ref_lm(
            torch.tensor(ids),
            attention_mask=attn,
            past_key_values=q_out.past_key_values,
            labels=torch.tensor(labels),
            return_dict=True,
        )

    _, kv = qformer.forward_queries(
        params, QF_CFG, jnp.asarray(queries), jnp.asarray(image_embeds)
    )
    hidden = qformer.forward_lm(params, QF_CFG, jnp.asarray(ids), jnp.asarray(mask), kv)
    logits = qformer.lm_logits(params["head"], hidden)
    np.testing.assert_allclose(
        np.asarray(logits), ref.logits.numpy(), atol=5e-4, rtol=1e-3
    )
    loss = qformer.lm_loss_mean(logits, jnp.asarray(labels))
    np.testing.assert_allclose(float(loss), float(ref.loss), atol=1e-5, rtol=1e-5)


def test_greedy_caption_matches_reference_stepwise(ref_lm, params):
    """Greedy decode: ours (incremental over query K/V) vs a stepwise
    reference argmax loop re-running BertLMHeadModel on the growing prefix
    (the semantics of Qformer.generate with num_beams=1)."""
    rng = np.random.default_rng(3)
    B = 2
    queries, image_embeds = _query_setup(rng, B)
    bos, steps = 3, 5

    with torch.no_grad():
        q_out = ref_lm.bert(
            query_embeds=torch.tensor(queries),
            encoder_hidden_states=torch.tensor(image_embeds),
            encoder_attention_mask=torch.ones(B, image_embeds.shape[1], dtype=torch.long),
            use_cache=True,
            return_dict=True,
        )
        ids = torch.full((B, 1), bos, dtype=torch.long)
        for _ in range(steps):
            attn = torch.cat(
                [torch.ones(B, QF_CFG.query_length, dtype=torch.long), torch.ones_like(ids)],
                dim=1,
            )
            out = ref_lm(
                ids, attention_mask=attn, past_key_values=q_out.past_key_values,
                return_dict=True,
            )
            nxt = out.logits[:, -1].argmax(-1, keepdim=True)
            ids = torch.cat([ids, nxt], dim=1)
        ref_tokens = ids[:, 1:].numpy()

    from llava_align_tpu.models import blip2

    ours = blip2.greedy_lm_decode(
        params, QF_CFG, jnp.asarray(queries), jnp.asarray(image_embeds),
        bos_token_id=bos, max_new_tokens=steps, eos_token_id=10**6,
    )
    np.testing.assert_array_equal(np.asarray(ours), ref_tokens)


# ---------------------------------------------------------------------------
# full stage-1 pretrain / ITM / ITC oracle (blip2_qformer.forward re-enacted)
# ---------------------------------------------------------------------------


def _stage1_params(params):
    """Assemble Blip2QformerConfig params around the converted reference
    Q-Former so torch and JAX share every weight."""
    from llava_align_tpu.models import blip2

    cfg = blip2.Blip2QformerConfig(
        qformer=QF_CFG, num_query_tokens=QF_CFG.query_length, embed_dim=12,
    )
    rng = np.random.default_rng(11)
    D = QF_CFG.hidden_size
    E = cfg.embed_dim

    def lin(o, i):
        return {
            "w": jnp.asarray(rng.normal(size=(o, i)).astype(np.float32) * 0.1),
            "b": jnp.asarray(rng.normal(size=(o,)).astype(np.float32) * 0.05),
        }

    p = {
        "qformer": params,
        "query_tokens": jnp.asarray(
            rng.normal(size=(QF_CFG.query_length, D)).astype(np.float32) * 0.05
        ),
        "vision_proj": lin(E, D),
        "text_proj": lin(E, D),
        "itm_head": lin(2, D),
        "temp": jnp.asarray(0.07, jnp.float32),
    }
    return cfg, p


def _torch_pretrain(ref_lm, p, image_embeds, text_ids, text_mask, img_neg, txt_neg,
                    bos, pad, image_ids=None):
    """blip2_qformer.forward :90-275 re-enacted (explicit negative indices in
    place of the multinomial draws; world_size 1 so concat_all_gather = id)."""
    B, Q = image_embeds.shape[0], p["query_tokens"].shape[0]
    t = lambda a: torch.tensor(np.asarray(a, np.float32))
    ti = lambda a: torch.tensor(np.asarray(a, np.int64))
    vp_w, vp_b = t(p["vision_proj"]["w"]), t(p["vision_proj"]["b"])
    tp_w, tp_b = t(p["text_proj"]["w"]), t(p["text_proj"]["b"])
    itm_w, itm_b = t(p["itm_head"]["w"]), t(p["itm_head"]["b"])
    temp = float(p["temp"])
    query_tokens = t(p["query_tokens"]).unsqueeze(0).expand(B, -1, -1)
    image_embeds_t = t(image_embeds)
    image_atts = torch.ones(image_embeds_t.size()[:-1], dtype=torch.long)

    with torch.no_grad():
        query_output = ref_lm.bert(
            query_embeds=query_tokens,
            encoder_hidden_states=image_embeds_t,
            encoder_attention_mask=image_atts,
            use_cache=True, return_dict=True,
        )
        image_feats = F.normalize(F.linear(query_output.last_hidden_state, vp_w, vp_b), dim=-1)
        text_output = ref_lm.bert(ti(text_ids), attention_mask=ti(text_mask), return_dict=True)
        text_feat = F.normalize(F.linear(text_output.last_hidden_state[:, 0, :], tp_w, tp_b), dim=-1)

        sim_q2t = torch.matmul(image_feats.unsqueeze(1), text_feat.unsqueeze(-1)).squeeze()
        sim_i2t, _ = sim_q2t.max(-1)
        sim_i2t = sim_i2t / temp
        sim_t2q = torch.matmul(
            text_feat.unsqueeze(1).unsqueeze(1), image_feats.permute(0, 2, 1)
        ).squeeze()
        sim_t2i, _ = sim_t2q.max(-1)
        sim_t2i = sim_t2i / temp

        if image_ids is not None:
            iid = ti(image_ids).view(-1, 1)
            pos_idx = torch.eq(iid, iid.t()).float()
            sim_targets = pos_idx / pos_idx.sum(1, keepdim=True)
            sim_targets = 0.9 * sim_targets + 0.1 * torch.ones_like(sim_targets) / sim_targets.size(1)
            loss_t2i = -torch.sum(F.log_softmax(sim_t2i, dim=1) * sim_targets, dim=1).mean()
            loss_i2t = -torch.sum(F.log_softmax(sim_i2t, dim=1) * sim_targets, dim=1).mean()
            loss_itc = (loss_t2i + loss_i2t) / 2
        else:
            targets = torch.arange(B)
            loss_itc = (
                F.cross_entropy(sim_i2t, targets, label_smoothing=0.1)
                + F.cross_entropy(sim_t2i, targets, label_smoothing=0.1)
            ) / 2

        image_embeds_neg = image_embeds_t[ti(img_neg)]
        text_ids_neg = ti(text_ids)[ti(txt_neg)]
        text_atts_neg = ti(text_mask)[ti(txt_neg)]
        text_ids_all = torch.cat([ti(text_ids), ti(text_ids), text_ids_neg], dim=0)
        text_atts_all = torch.cat([ti(text_mask), ti(text_mask), text_atts_neg], dim=0)
        query_tokens_itm = t(p["query_tokens"]).unsqueeze(0).expand(3 * B, -1, -1)
        query_atts_itm = torch.ones(query_tokens_itm.size()[:-1], dtype=torch.long)
        attention_mask_all = torch.cat([query_atts_itm, text_atts_all], dim=1)
        image_embeds_all = torch.cat([image_embeds_t, image_embeds_neg, image_embeds_t], dim=0)
        image_atts_all = torch.ones(image_embeds_all.size()[:-1], dtype=torch.long)
        output_itm = ref_lm.bert(
            text_ids_all, query_embeds=query_tokens_itm,
            attention_mask=attention_mask_all,
            encoder_hidden_states=image_embeds_all,
            encoder_attention_mask=image_atts_all,
            return_dict=True,
        )
        vl = output_itm.last_hidden_state[:, :Q, :]
        logits = F.linear(vl, itm_w, itm_b).mean(dim=1)
        itm_labels = torch.cat([torch.ones(B, dtype=torch.long), torch.zeros(2 * B, dtype=torch.long)])
        loss_itm = F.cross_entropy(logits, itm_labels)

        decoder_input_ids = ti(text_ids).clone()
        decoder_input_ids[:, 0] = bos
        labels = decoder_input_ids.masked_fill(decoder_input_ids == pad, -100)
        query_atts = torch.ones(query_tokens.size()[:-1], dtype=torch.long)
        attention_mask = torch.cat([query_atts, ti(text_mask)], dim=1)
        lm_output = ref_lm(
            decoder_input_ids, attention_mask=attention_mask,
            past_key_values=query_output.past_key_values,
            labels=labels, return_dict=True,
        )
        loss_lm = lm_output.loss

    return {
        "loss_itc": float(loss_itc), "loss_itm": float(loss_itm),
        "loss_lm": float(loss_lm),
        "loss": float(loss_itc + loss_itm + loss_lm),
    }


@pytest.mark.parametrize("with_image_ids", [False, True])
def test_pretrain_losses_match_reference(ref_lm, params, with_image_ids):
    from llava_align_tpu.models import blip2

    cfg, p = _stage1_params(params)
    rng = np.random.default_rng(4)
    B, N, T = 3, 5, 8
    image_embeds = rng.normal(size=(B, N, QF_CFG.encoder_width)).astype(np.float32)
    text_ids = rng.integers(5, QF_CFG.vocab_size, (B, T))
    text_ids[:, 0] = 2  # CLS
    text_mask = np.ones((B, T), np.int64)
    text_mask[2, 6:] = 0
    pad = 0
    text_ids[2, 6:] = pad
    img_neg = np.array([1, 2, 0])
    txt_neg = np.array([2, 0, 1])
    image_ids = np.array([7, 7, 9]) if with_image_ids else None
    if with_image_ids:
        # negatives must avoid same-image-id pairs (mask fill -10000)
        img_neg = np.array([2, 2, 0])
        txt_neg = np.array([2, 2, 0])

    ref = _torch_pretrain(
        ref_lm, p, image_embeds, text_ids, text_mask, img_neg, txt_neg,
        bos=1, pad=pad, image_ids=image_ids,
    )
    ours = blip2.pretrain_forward(
        p, cfg, None, jnp.asarray(text_ids), jnp.asarray(text_mask),
        bos_token_id=1, pad_token_id=pad,
        image_ids=None if image_ids is None else jnp.asarray(image_ids),
        neg_idx=(jnp.asarray(img_neg), jnp.asarray(txt_neg)),
        image_embeds=jnp.asarray(image_embeds),
    )
    for k in ("loss_itc", "loss_itm", "loss_lm", "loss"):
        np.testing.assert_allclose(float(ours[k]), ref[k], atol=2e-5, rtol=2e-5)


def test_match_heads_consistent(ref_lm, params):
    """Blip2ITM itm/itc heads: itm logit [B,2] equals the re-enacted mean
    itm-head over query positions; compute_itm equals its positive column."""
    from llava_align_tpu.models import blip2

    cfg, p = _stage1_params(params)
    rng = np.random.default_rng(5)
    B, N, T = 2, 5, 6
    image_embeds = rng.normal(size=(B, N, QF_CFG.encoder_width)).astype(np.float32)
    text_ids = jnp.asarray(rng.integers(5, QF_CFG.vocab_size, (B, T)))
    text_mask = jnp.ones((B, T), jnp.int32)

    itm2 = np.asarray(blip2.compute_itm(p, cfg, jnp.asarray(image_embeds), text_ids, text_mask))

    t = lambda a: torch.tensor(np.asarray(a, np.float32))
    query_tokens = t(p["query_tokens"]).unsqueeze(0).expand(B, -1, -1)
    with torch.no_grad():
        out = ref_lm.bert(
            torch.tensor(np.asarray(text_ids, np.int64)),
            query_embeds=query_tokens,
            attention_mask=torch.cat(
                [torch.ones(B, QF_CFG.query_length, dtype=torch.long),
                 torch.tensor(np.asarray(text_mask, np.int64))], dim=1,
            ),
            encoder_hidden_states=t(image_embeds),
            encoder_attention_mask=torch.ones(B, N, dtype=torch.long),
            return_dict=True,
        )
        vl = out.last_hidden_state[:, : QF_CFG.query_length, :]
        ref_logit = F.linear(vl, t(p["itm_head"]["w"]), t(p["itm_head"]["b"]))[:, :, 1].mean(1)
    np.testing.assert_allclose(itm2, ref_logit.numpy(), atol=3e-4, rtol=1e-3)


def test_sim_matrix_shapes_and_rerank():
    """compute_sim_matrix: ITM-reranked cells = itm + sim; others -100."""
    import jax as _jax

    from llava_align_tpu.models import blip2

    cfg = blip2.Blip2QformerConfig.tiny()
    p = blip2.init_stage1(_jax.random.PRNGKey(0), cfg)
    imgs = _jax.random.normal(_jax.random.PRNGKey(1), (3, 3, 28, 28), jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(5, 100, (4, 6)))
    mask = jnp.ones((4, 6), jnp.int32)
    i2t, t2i = blip2.compute_sim_matrix(p, cfg, imgs, ids, mask, k_test=2)
    assert i2t.shape == (3, 4) and t2i.shape == (4, 3)
    assert (np.sum(i2t > -100.0, axis=1) == 2).all()
    assert (np.sum(t2i > -100.0, axis=1) == 2).all()
    assert np.isfinite(i2t[i2t > -100]).all()
