"""BLIP variant models: retrieval training, VQA, classification, NLVR2,
pretraining.

Capability parity: the reference's vendored LAVIS BLIP family beyond the
caption/ITM/feature trio already in models/blip.py —
blip_retrieval.py (ITC with momentum queues + ITM with hard negatives,
optionally mined across all ranks), blip_vqa.py (multimodal question
encoder + answer decoder: open generation and two-stage answer ranking),
blip_classification.py (fused cls head + momentum distillation),
blip_nlvr.py + nlvr_encoder.py (every layer carries TWIN cross-attentions
over the two images, averaged below layer 6 and merge-projected above),
blip_pretrain.py (ITC + ITM + captioning LM). None of these are executed
by any reference experiment (SURVEY §2.4); provided for zoo completeness.

TPU-first: pure functional losses over explicit (params, momentum params,
queue state); `negative_all_rank` and the momentum queues ride a shard_map
`axis_name` (lax.all_gather) instead of torch.distributed; the NLVR twin
stack runs both merge modes under lax.scan with a per-layer selector.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.models import blip as blip_mod
from llava_align_tpu.models.albef import (
    _lm_loss_per_sample,
    init_queue_state,
    momentum_update,
)
from llava_align_tpu.models.blip import (
    BlipConfig,
    MedConfig,
    decode_step,
    init_self_cache,
    med_embed,
    med_forward,
    med_init,
    med_logits,
    precompute_cross_kv,
    vit_forward,
    vit_init,
    _lin,
    _mha,
)
from llava_align_tpu.ops.layers import layer_norm
from llava_align_tpu.ops.layers import (
    l2_normalize as _norm,
    linear_bias as _proj,
    sample_hard_negative_indices,
)

Params = Dict[str, Any]

__all__ = [
    "init_retrieval", "retrieval_train_step",
    "init_vqa", "vqa_rank_answers", "vqa_generate",
    "init_classification", "classification_loss", "classify",
    "NlvrConfig", "init_nlvr", "nlvr_forward", "nlvr_loss",
    "pretrain_step",
]




def _itc_feats(params: Params, cfg: BlipConfig, pixels, ids, mask):
    enc = vit_forward(params["visual"], cfg.vision, pixels)
    image_feat = _norm(_proj(enc[:, 0], params["vision_proj"]))
    te = med_forward(params["text"], cfg.text, ids, mask, mode="text")
    text_feat = _norm(_proj(te[:, 0], params["text_proj"]))
    return enc, image_feat, te, text_feat


def init_retrieval(rng: jax.Array, cfg: BlipConfig, temp: float = 0.07) -> Params:
    p = blip_mod.init(rng, cfg)
    p["temp"] = jnp.asarray(temp, jnp.float32)
    return p


def retrieval_train_step(
    params: Params, m_params: Params, state: Dict[str, jax.Array],
    cfg: BlipConfig, rng: jax.Array,
    pixels: jax.Array,
    ids: jax.Array,          # tokenized captions ([CLS]-leading)
    enc_ids: jax.Array,      # same with [ENC] as first token (blip_retrieval.py:224-225)
    mask: jax.Array,
    idx: jax.Array,
    *,
    alpha: float = 0.4, momentum: float = 0.995,
    negative_all_rank: bool = False,
    axis_name: Optional[str] = None,
    queue_size: Optional[int] = None,
    return_image_embeds: bool = False,
) -> Tuple[Dict[str, jax.Array], ...]:
    """One BLIP retrieval forward (blip_retrieval.py:116-355): ITC against
    momentum+queue features with soft distilled targets, ITM over positives
    + hard-mined negatives. With `axis_name` under shard_map, negatives are
    mined across the gathered batch when negative_all_rank — the TPU
    counterpart of concat_all_gather/all_gather_with_grad."""
    bs = pixels.shape[0]
    temp = jnp.clip(params["temp"], 0.001, 0.5)
    Q = queue_size if queue_size is not None else state["image_queue"].shape[1]

    image_embeds, image_feat, text_embeds, text_feat = _itc_feats(
        params, cfg, pixels, ids, mask
    )
    idx = idx.reshape(-1, 1)
    idx_all = jnp.concatenate([idx.T, state["idx_queue"]], axis=1)
    pos = (idx == idx_all).astype(jnp.float32)
    sim_targets = pos / pos.sum(1, keepdims=True)

    m_params = momentum_update(params, m_params, momentum)
    m_out = jax.lax.stop_gradient(_itc_feats(m_params, cfg, pixels, ids, mask))
    image_feat_m, text_feat_m = m_out[1], m_out[3]
    image_feat_m_all = jnp.concatenate([image_feat_m.T, state["image_queue"]], axis=1)
    text_feat_m_all = jnp.concatenate([text_feat_m.T, state["text_queue"]], axis=1)

    sim_i2t_m = image_feat_m @ text_feat_m_all / temp
    sim_t2i_m = text_feat_m @ image_feat_m_all / temp
    i2t_tgt = jax.lax.stop_gradient(
        alpha * jax.nn.softmax(sim_i2t_m, axis=1) + (1 - alpha) * sim_targets
    )
    t2i_tgt = jax.lax.stop_gradient(
        alpha * jax.nn.softmax(sim_t2i_m, axis=1) + (1 - alpha) * sim_targets
    )
    sim_i2t = image_feat @ text_feat_m_all / temp
    sim_t2i = text_feat @ image_feat_m_all / temp
    loss_itc = (
        -(jax.nn.log_softmax(sim_i2t, axis=1) * i2t_tgt).sum(1).mean()
        - (jax.nn.log_softmax(sim_t2i, axis=1) * t2i_tgt).sum(1).mean()
    ) / 2

    # wraparound column scatter, not dynamic_update_slice — see the note in
    # albef.retrieval_train_step (clamped start desyncs the FIFO when
    # Q % bs != 0)
    ptr = state["ptr"]
    pos = (ptr + jnp.arange(bs)) % Q
    new_state = {
        "image_queue": state["image_queue"].at[:, pos].set(image_feat_m.T),
        "text_queue": state["text_queue"].at[:, pos].set(text_feat_m.T),
        "idx_queue": state["idx_queue"].at[:, pos].set(idx.T),
        "ptr": (ptr + bs) % Q,
    }

    # --- ITM (blip_retrieval.py:221-355)
    am = jnp.ones(image_embeds.shape[:2], jnp.int32)
    pos_out = med_forward(
        params["text"], cfg.text, enc_ids, mask,
        encoder_states=image_embeds, encoder_mask=am,
    )
    if negative_all_rank and axis_name is not None:
        g_img_feat = jax.lax.all_gather(image_feat, axis_name, tiled=True)
        g_txt_feat = jax.lax.all_gather(text_feat, axis_name, tiled=True)
        g_idx = jax.lax.all_gather(idx[:, 0], axis_name, tiled=True)[:, None]
        g_image_embeds = jax.lax.all_gather(image_embeds, axis_name, tiled=True)
        g_enc_ids = jax.lax.all_gather(enc_ids, axis_name, tiled=True)
        g_mask = jax.lax.all_gather(mask, axis_name, tiled=True)
    else:
        g_img_feat, g_txt_feat, g_idx = image_feat, text_feat, idx
        g_image_embeds, g_enc_ids, g_mask = image_embeds, enc_ids, mask
    same = idx == g_idx.T
    w_i2t = jnp.where(same, 0.0, jax.nn.softmax(image_feat @ g_txt_feat.T / temp, axis=1))
    w_t2i = jnp.where(same, 0.0, jax.nn.softmax(text_feat @ g_img_feat.T / temp, axis=1))
    k1, k2 = jax.random.split(rng)
    neg_img = sample_hard_negative_indices(k1, w_t2i)
    neg_txt = sample_hard_negative_indices(k2, w_i2t)

    text_ids_all = jnp.concatenate([enc_ids, g_enc_ids[neg_txt]], axis=0)
    text_mask_all = jnp.concatenate([mask, g_mask[neg_txt]], axis=0)
    image_embeds_all = jnp.concatenate([g_image_embeds[neg_img], image_embeds], axis=0)
    am2 = jnp.ones(image_embeds_all.shape[:2], jnp.int32)
    neg_out = med_forward(
        params["text"], cfg.text, text_ids_all, text_mask_all,
        encoder_states=image_embeds_all, encoder_mask=am2,
    )
    vl = jnp.concatenate([pos_out[:, 0], neg_out[:, 0]], axis=0)
    itm_logits = (
        jnp.einsum("bd,od->bo", vl, params["itm_head"]["w"]) + params["itm_head"]["b"]
    )
    itm_labels = jnp.concatenate(
        [jnp.ones((bs,), jnp.int32), jnp.zeros((2 * bs,), jnp.int32)]
    )
    logp = jax.nn.log_softmax(itm_logits, axis=-1)
    loss_itm = -jnp.take_along_axis(logp, itm_labels[:, None], axis=-1).mean()

    losses = {"loss": loss_itc + loss_itm, "loss_itc": loss_itc, "loss_itm": loss_itm}
    if return_image_embeds:
        # lets pretrain_step reuse the encoded image instead of paying a
        # second full ViT forward on the same pixels
        return losses, m_params, new_state, image_embeds
    return losses, m_params, new_state


# ---------------------------------------------------------------------------
# VQA (blip_vqa.py)
# ---------------------------------------------------------------------------


def init_vqa(rng: jax.Array, cfg: BlipConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "visual": vit_init(k1, cfg.vision),
        "text": med_init(k2, cfg.text),       # question encoder (cross everywhere)
        "decoder": med_init(k3, cfg.text),    # answer decoder
    }


def _question_states(params: Params, cfg: BlipConfig, pixels, q_ids, q_mask):
    enc = vit_forward(params["visual"], cfg.vision, pixels)
    am = jnp.ones(enc.shape[:2], jnp.int32)
    return med_forward(
        params["text"], cfg.text, q_ids, q_mask,
        encoder_states=enc, encoder_mask=am,
    )


def vqa_rank_answers(
    params: Params, cfg: BlipConfig,
    pixels: jax.Array, q_ids: jax.Array, q_mask: jax.Array,
    answer_ids: jax.Array, answer_mask: jax.Array,
    *,
    num_ans_candidates: int = 128,
    pad_token_id: int = 0,
    label_smoothing: float = 0.1,
) -> np.ndarray:
    """blip_vqa.py:277-350 — identical two-stage math to ALBEF's
    rank_answers, but the question states come from the multimodal BLIP
    encoder (forward_automask over the image). NOTE: the reference leads
    the question with [ENC] (blip_vqa.py:113) — pass q_ids with the [ENC]
    id already in position 0."""
    k = min(num_ans_candidates, answer_ids.shape[0])
    fused = _question_states(params, cfg, pixels, q_ids, q_mask)
    nq = fused.shape[0]

    start = jnp.full((nq, 1), answer_ids[0, 0], jnp.int32)
    h = med_forward(
        params["decoder"], cfg.text, start,
        encoder_states=fused, encoder_mask=q_mask, causal=True,
    )
    logits0 = med_logits(params["decoder"], h)[:, 0]
    prob_first = jax.nn.softmax(logits0, axis=-1)[:, answer_ids[:, 1]]
    _, topk_ids = jax.lax.top_k(prob_first, k)

    cand_ids = answer_ids[topk_ids.reshape(-1)]
    cand_mask = answer_mask[topk_ids.reshape(-1)]
    targets = jnp.where(cand_ids == pad_token_id, -100, cand_ids)
    states = jnp.repeat(fused, k, axis=0)
    smask = jnp.repeat(q_mask, k, axis=0)
    h = med_forward(
        params["decoder"], cfg.text, cand_ids, cand_mask,
        encoder_states=states, encoder_mask=smask, causal=True,
    )
    loss = _lm_loss_per_sample(
        med_logits(params["decoder"], h), targets, label_smoothing
    )
    best = jnp.argmax((-loss).reshape(nq, k), axis=1)
    return np.asarray(jnp.take_along_axis(topk_ids, best[:, None], axis=1)[:, 0])


def vqa_generate(
    params: Params, cfg: BlipConfig,
    pixels: jax.Array, q_ids: jax.Array, q_mask: jax.Array,
    *,
    bos_token_id: int = 30522,
    eos_token_id: int = 102,
    max_new_tokens: int = 10,
) -> List[List[int]]:
    """Open-ended generation (blip_vqa.py:233-276): greedy decode with
    cross-attention over the fused question states."""
    fused = _question_states(params, cfg, pixels, q_ids, q_mask)
    B = fused.shape[0]
    cross = precompute_cross_kv(params["decoder"], cfg.text, fused)
    cache = init_self_cache(cfg.text, B, max_new_tokens + 1)
    step = jax.jit(
        lambda p, tok, t, c, x: decode_step(p, cfg.text, tok, t, c, x, q_mask)
    )
    token = np.full((B,), bos_token_id, np.int32)
    done = np.zeros((B,), bool)
    rows = []
    for t in range(max_new_tokens):
        logits, cache = step(
            params["decoder"], jnp.asarray(token), jnp.asarray(t, jnp.int32),
            cache, cross,
        )
        nxt = np.asarray(logits).argmax(-1).astype(np.int32)
        nxt = np.where(done, eos_token_id, nxt)
        rows.append(nxt)
        done |= nxt == eos_token_id
        token = nxt
        if done.all():
            break
    ids = np.stack(rows, axis=1) if rows else np.zeros((B, 0), np.int32)
    out = []
    for b in range(B):
        row = ids[b].tolist()
        if eos_token_id in row:
            row = row[: row.index(eos_token_id)]
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# classification (blip_classification.py)
# ---------------------------------------------------------------------------


def init_classification(rng: jax.Array, cfg: BlipConfig, num_classes: int) -> Params:
    if num_classes < 2:
        raise ValueError(f"num_classes must be >1, got {num_classes}")
    k1, k2, k3 = jax.random.split(rng, 3)
    D = cfg.text.hidden_size
    ka, kb = jax.random.split(k3)

    def w(key, o, i):
        return (jax.random.normal(key, (o, i), jnp.float32) / i**0.5).astype(cfg.text.dtype)

    return {
        "visual": vit_init(k1, cfg.vision),
        "text": med_init(k2, cfg.text),
        "cls_head": {
            "fc1": {"w": w(ka, D, D), "b": jnp.zeros((D,), cfg.text.dtype)},
            "fc2": {"w": w(kb, num_classes, D), "b": jnp.zeros((num_classes,), cfg.text.dtype)},
        },
    }


def classify(params: Params, cfg: BlipConfig, pixels, ids, mask) -> jax.Array:
    h = _question_states(params, cfg, pixels, ids, mask)
    c = params["cls_head"]
    return _proj(jax.nn.relu(_proj(h[:, 0], c["fc1"])), c["fc2"])


def classification_loss(
    params: Params, cfg: BlipConfig,
    pixels, ids, mask, targets,
    *,
    m_params: Optional[Params] = None,
    alpha: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """(1-α)·CE + α·distillation (blip_classification.py:98-129)."""
    # fp32 loss logits (no-op at fp32; mirrors autocast under bf16 AMP)
    logits = classify(params, cfg, pixels, ids, mask).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0].mean()
    if m_params is None or alpha == 0.0:
        return ce, logits
    logits_m = jax.lax.stop_gradient(
        classify(m_params, cfg, pixels, ids, mask).astype(jnp.float32)
    )
    distill = -(jax.nn.softmax(logits_m, axis=-1) * logp).sum(-1).mean()
    return (1.0 - alpha) * ce + alpha * distill, logits


# ---------------------------------------------------------------------------
# NLVR2 (blip_nlvr.py + nlvr_encoder.py: twin cross-attention per layer)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class NlvrConfig:
    base: BlipConfig = dataclasses.field(default_factory=BlipConfig)
    num_classes: int = 2
    merge_from: int = 6  # layers >= merge_from concat+project (nlvr_encoder.py:302)

    @staticmethod
    def tiny(vocab_size: int = 64) -> "NlvrConfig":
        return NlvrConfig(base=BlipConfig.tiny(vocab_size), merge_from=1)


def init_nlvr(rng: jax.Array, cfg: NlvrConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    t = cfg.base.text
    D, L = t.hidden_size, t.num_layers
    base = med_init(k2, t)
    ks = iter(jax.random.split(k3, 16))

    def w(shape, fan):
        return (jax.random.normal(next(ks), shape, jnp.float32) / fan**0.5).astype(t.dtype)

    def lin(o, i):
        return {"w": w((L, o, i), i), "b": jnp.zeros((L, o), t.dtype)}

    layers = dict(base["layers"])
    # twin cross stacks (self0/self1 + dense0/dense1 + merge_layer)
    for tw in ("0", "1"):
        layers[f"c{tw}q"] = lin(D, D)
        layers[f"c{tw}k"] = lin(D, D)
        layers[f"c{tw}v"] = lin(D, D)
        layers[f"d{tw}"] = lin(D, D)
    layers["merge"] = lin(D, 2 * D)
    for k in ("cq", "ck", "cv", "co"):
        layers.pop(k, None)
    base["layers"] = layers
    return {
        "visual": vit_init(k1, cfg.base.vision),
        "text": base,
        "cls_head": {
            "fc1": {"w": w((D, D), D), "b": jnp.zeros((D,), t.dtype)},
            "fc2": {"w": w((cfg.num_classes, D), D), "b": jnp.zeros((cfg.num_classes,), t.dtype)},
        },
    }


def nlvr_forward(
    params: Params, cfg: NlvrConfig,
    pixels0: jax.Array, pixels1: jax.Array,
    ids: jax.Array, mask: jax.Array,
) -> jax.Array:
    """blip_nlvr.py:77-116 over the twin-cross encoder: every layer attends
    both images; outputs averaged below `merge_from`, concat+merge-projected
    at or above it (nlvr_encoder.py:273-284)."""
    both = jnp.concatenate([pixels0, pixels1], axis=0)
    enc = vit_forward(params["visual"], cfg.base.vision, both)
    b = pixels0.shape[0]
    x = nlvr_encode(params, cfg, enc[:b], enc[b:], ids, mask)
    c = params["cls_head"]
    return _proj(jax.nn.relu(_proj(x[:, 0], c["fc1"])), c["fc2"])


def nlvr_encode(
    params: Params, cfg: NlvrConfig,
    e0: jax.Array, e1: jax.Array,
    ids: jax.Array, mask: jax.Array,
) -> jax.Array:
    """Twin-cross text encoder over precomputed image states → [B, S, D]."""
    t = cfg.base.text
    H, eps, L = t.num_heads, t.layer_norm_eps, t.num_layers

    B, S = ids.shape
    x = med_embed(params["text"], t, ids, jnp.arange(S, dtype=jnp.int32)[None])
    smask = mask[:, None, None, :].astype(bool)
    has_merge = jnp.asarray(
        [i >= cfg.merge_from for i in range(L)], jnp.float32
    )

    def body(x, scanned):
        lp, merge_f = scanned
        a = _mha(_lin(x, lp["sq"]), _lin(x, lp["sk"]), _lin(x, lp["sv"]), H, smask)
        x = layer_norm(x + _lin(a, lp["so"]), lp["s_ln"]["scale"], lp["s_ln"]["bias"], eps)
        ctx0 = _mha(_lin(x, lp["c0q"]), _lin(e0, lp["c0k"]), _lin(e0, lp["c0v"]), H)
        ctx1 = _mha(_lin(x, lp["c1q"]), _lin(e1, lp["c1k"]), _lin(e1, lp["c1v"]), H)
        h0 = _lin(ctx0, lp["d0"])
        h1 = _lin(ctx1, lp["d1"])
        # merge applies to the dense0/dense1 outputs (nlvr_encoder.py:274-283)
        merged = _lin(jnp.concatenate([h0, h1], axis=-1), lp["merge"])
        avg = (h0 + h1) / 2
        h = merge_f * merged + (1.0 - merge_f) * avg
        x = layer_norm(x + h, lp["c_ln"]["scale"], lp["c_ln"]["bias"], eps)
        f = _lin(jax.nn.gelu(_lin(x, lp["fc1"]), approximate=False), lp["fc2"])
        x = layer_norm(x + f, lp["f_ln"]["scale"], lp["f_ln"]["bias"], eps)
        return x, None

    x, _ = jax.lax.scan(
        body, x, (params["text"]["layers"], has_merge)
    )
    return x


def nlvr_loss(
    params: Params, cfg: NlvrConfig,
    pixels0, pixels1, ids, mask, targets,
) -> Tuple[jax.Array, jax.Array]:
    logits = nlvr_forward(params, cfg, pixels0, pixels1, ids, mask)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0].mean()
    return ce, logits


# ---------------------------------------------------------------------------
# pretraining (blip_pretrain.py): ITC + ITM + LM
# ---------------------------------------------------------------------------


def pretrain_step(
    params: Params, m_params: Params, state: Dict[str, jax.Array],
    cfg: BlipConfig, rng: jax.Array,
    pixels: jax.Array,
    ids: jax.Array, enc_ids: jax.Array, dec_ids: jax.Array,
    mask: jax.Array, idx: jax.Array,
    *,
    alpha: float = 0.4, momentum: float = 0.995,
    pad_token_id: int = 0,
) -> Tuple[Dict[str, jax.Array], Params, Dict[str, jax.Array]]:
    """blip_pretrain.py forward: the retrieval ITC/ITM losses plus the
    captioning LM loss on [DEC]-led ids (decoder_input_ids[:,0]=bos,
    targets pad→-100, :317-330). `params` needs the retrieval tree plus a
    "decoder" med."""
    losses, m_params, state, enc = retrieval_train_step(
        params, m_params, state, cfg, rng, pixels, ids, enc_ids, mask, idx,
        alpha=alpha, momentum=momentum, return_image_embeds=True,
    )
    # reference blip_pretrain.py computes image_embeds ONCE and shares them
    # between ITC/ITM and the LM decoder — reuse, don't re-encode
    am = jnp.ones(enc.shape[:2], jnp.int32)
    targets = jnp.where(dec_ids == pad_token_id, -100, dec_ids)
    h = med_forward(
        params["decoder"], cfg.text, dec_ids, mask,
        encoder_states=enc, encoder_mask=am, causal=True,
    )
    # reference: CrossEntropyLoss(reduction="mean") over the flattened valid
    # tokens (med.py:1238) — one token-mean, not a per-sample mean of means
    per = _lm_loss_per_sample(med_logits(params["decoder"], h), targets, 0.1)
    n_tok = jnp.maximum((targets[:, 1:] != -100).sum(), 1)
    loss_lm = per.sum() / n_tok
    losses = dict(losses)
    losses["loss_lm"] = loss_lm
    losses["loss"] = losses["loss"] + loss_lm
    return losses, m_params, state
