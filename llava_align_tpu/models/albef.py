"""ALBEF model family: ViT + fusion-BERT for retrieval/VQA/classification/
NLVR2/feature extraction.

Capability parity with the reference's vendored LAVIS ALBEF stack
(lavis/models/albef_models/{albef_retrieval.py, albef_vqa.py,
albef_classification.py, albef_nlvr.py, albef_feature_extractor.py} on
lavis/models/med.py's fusion-BERT and lavis/models/vit.py). The reference's
own experiments never execute ALBEF (SURVEY §2.4 model-zoo row); provided
for zoo completeness.

Architecture (reference med.py:395-470): a 12-layer BERT whose first
`fusion_layer`=6 layers are text-only and whose last 6 cross-attend the ViT
states — expressed here through the shared MED machinery in models/blip.py
(MedConfig.fusion_layer + mode="text"/"fusion"/"multimodal"). The VQA
variant adds a 6-layer causal MED decoder (albef_vqa.py:354-359,
fusion_layer=0 → cross-attention in every layer); NLVR2 uses an 18-layer
encoder whose 12 fusion layers alternate between the two images
(albef_nlvr.py:129-140, med.py:451-470).

TPU-first: stacked layer params under lax.scan, fp32 softmax/LN, training
losses as pure functions over explicit (params, momentum_params, queue
state) — the torch momentum/queue buffers become carried state, EMA via
jax.tree_map.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.models.blip import (
    BlipVitConfig,
    MedConfig,
    med_embed,
    med_forward,
    med_logits,
    med_init,
    vit_forward,
    vit_init,
)
from llava_align_tpu.ops.layers import (
    l2_normalize as _norm,
    linear_bias as _proj,
    sample_hard_negative_indices,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AlbefConfig:
    vision: BlipVitConfig = dataclasses.field(
        default_factory=lambda: BlipVitConfig(image_size=384)
    )
    # 12-layer encoder, cross-attention from layer 6 (albef med config)
    text: MedConfig = dataclasses.field(
        default_factory=lambda: MedConfig(vocab_size=30522, fusion_layer=6)
    )
    # VQA answer decoder: 6 layers, cross-attention everywhere (albef_vqa.py:354-359)
    decoder: MedConfig = dataclasses.field(
        default_factory=lambda: MedConfig(
            vocab_size=30522, num_layers=6, fusion_layer=0
        )
    )
    embed_dim: int = 256
    num_classes: int = 0          # classification / NLVR head width
    queue_size: int = 65536
    temp: float = 0.07
    label_smoothing: float = 0.1  # med.py:1238 CrossEntropyLoss(label_smoothing=0.1)

    @staticmethod
    def tiny(vocab_size: int = 64, *, num_classes: int = 0, nlvr: bool = False,
             queue_size: int = 16) -> "AlbefConfig":
        n_layers, fl = (6, 2) if nlvr else (4, 2)
        return AlbefConfig(
            vision=BlipVitConfig.tiny(),
            text=MedConfig(
                vocab_size=vocab_size, hidden_size=32, num_layers=n_layers,
                num_heads=4, intermediate_size=64, max_position_embeddings=64,
                fusion_layer=fl,
            ),
            decoder=MedConfig(
                vocab_size=vocab_size, hidden_size=32, num_layers=2,
                num_heads=4, intermediate_size=64, max_position_embeddings=64,
                fusion_layer=0,
            ),
            embed_dim=16,
            num_classes=num_classes,
            queue_size=queue_size,
        )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init(rng: jax.Array, cfg: AlbefConfig, variant: str = "retrieval") -> Params:
    """variant ∈ {retrieval, pretrain, vqa, classification, nlvr, feature}.
    pretrain (albef_pretrain.py:41-100) carries the retrieval heads plus the
    MED MLM head that med_init always provides."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    D, E = cfg.text.hidden_size, cfg.embed_dim
    ks = iter(jax.random.split(k4, 8))

    def w(o, i):
        return (
            jax.random.normal(next(ks), (o, i), jnp.float32) / i**0.5
        ).astype(cfg.text.dtype)

    p: Params = {"visual": vit_init(k1, cfg.vision), "text": med_init(k2, cfg.text)}
    if variant in ("retrieval", "feature", "pretrain"):
        p["vision_proj"] = {"w": w(E, cfg.vision.hidden_size), "b": jnp.zeros((E,), cfg.text.dtype)}
        p["text_proj"] = {"w": w(E, D), "b": jnp.zeros((E,), cfg.text.dtype)}
    if variant in ("retrieval", "pretrain"):
        p["itm_head"] = {"w": w(2, D), "b": jnp.zeros((2,), cfg.text.dtype)}
        p["temp"] = jnp.asarray(cfg.temp, jnp.float32)
    if variant == "vqa":
        p["decoder"] = med_init(k3, cfg.decoder)
    if variant in ("classification", "nlvr"):
        if cfg.num_classes < 2:
            raise ValueError(f"num_classes must be >1 for {variant}, got {cfg.num_classes}")
        # Linear → ReLU → Linear (albef_classification.py:54-58)
        p["cls_head"] = {
            "fc1": {"w": w(D, D), "b": jnp.zeros((D,), cfg.text.dtype)},
            "fc2": {"w": w(cfg.num_classes, D), "b": jnp.zeros((cfg.num_classes,), cfg.text.dtype)},
        }
    return p




def _cls_head(p, cls):
    h = jax.nn.relu(_proj(cls, p["fc1"]))
    return _proj(h, p["fc2"])


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------


def fused_encode(
    params: Params, cfg: AlbefConfig,
    pixels: jax.Array, ids: jax.Array, mask: jax.Array,
) -> jax.Array:
    """ViT + multimodal BERT (XBertEncoder.forward_automask,
    med.py:1388-1404) → fused hidden [B, S, D]."""
    enc = vit_forward(params["visual"], cfg.vision, pixels)
    enc_mask = jnp.ones(enc.shape[:2], jnp.int32)
    return med_forward(
        params["text"], cfg.text, ids, mask,
        encoder_states=enc, encoder_mask=enc_mask, mode="multimodal",
    )


def itc_features(
    params: Params, cfg: AlbefConfig,
    pixels: Optional[jax.Array] = None,
    ids: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Unimodal embeddings + normalized cls ITC projections
    (albef_retrieval.py:146-164)."""
    out: Dict[str, jax.Array] = {}
    if pixels is not None:
        enc = vit_forward(params["visual"], cfg.vision, pixels)
        out["image_embeds"] = enc
        out["image_feat"] = _norm(_proj(enc[:, 0], params["vision_proj"]))
    if ids is not None:
        h = med_forward(params["text"], cfg.text, ids, mask, mode="text")
        out["text_embeds"] = h
        out["text_feat"] = _norm(_proj(h[:, 0], params["text_proj"]))
    return out


def itm_logits_from_ids(
    params: Params, cfg: AlbefConfig,
    image_embeds: jax.Array, ids: jax.Array, mask: jax.Array,
) -> jax.Array:
    """Full multimodal pass + ITM head → [B, 2]
    (albef_models/__init__.py:152-160 compute_sim_matrix re-rank path)."""
    h = med_forward(
        params["text"], cfg.text, ids, mask,
        encoder_states=image_embeds,
        encoder_mask=jnp.ones(image_embeds.shape[:2], jnp.int32),
        mode="multimodal",
    )
    return _proj(h[:, 0], params["itm_head"])


def extract_features(
    params: Params, cfg: AlbefConfig,
    pixels: Optional[jax.Array] = None,
    ids: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    *,
    mode: str = "multimodal",
) -> Dict[str, jax.Array]:
    """albef_feature_extractor.py:49-165: per-token projections; "text" runs
    only the pre-fusion layers; "multimodal" continues them through fusion."""
    out: Dict[str, jax.Array] = {}
    if mode in ("image", "multimodal"):
        enc = vit_forward(params["visual"], cfg.vision, pixels)
        out["image_embeds"] = enc
        out["image_features"] = _norm(_proj(enc, params["vision_proj"]))
    if mode in ("text", "multimodal"):
        h = med_forward(params["text"], cfg.text, ids, mask, mode="text")
        out["text_embeds"] = h
        out["text_features"] = _norm(_proj(h, params["text_proj"]))
    if mode == "multimodal":
        enc = out["image_embeds"]
        out["multimodal_embeds"] = med_forward(
            params["text"], cfg.text, None, mask,
            encoder_states=enc,
            encoder_mask=jnp.ones(enc.shape[:2], jnp.int32),
            mode="fusion", input_embeds=out["text_embeds"],
        )
    return out


# ---------------------------------------------------------------------------
# VQA: answer ranking (albef_vqa.py:269-346)
# ---------------------------------------------------------------------------


def _lm_loss_per_sample(
    logits: jax.Array,   # [B, S, V] fp32
    labels: jax.Array,   # [B, S] (-100 = ignore)
    label_smoothing: float,
) -> jax.Array:
    """Shifted next-token CE with label smoothing, summed per sample
    (med.py:1235-1244)."""
    lg = logits[:, :-1]
    lb = labels[:, 1:]
    logp = jax.nn.log_softmax(lg, axis=-1)
    valid = lb != -100
    tgt = jnp.clip(lb, 0, lg.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    smooth = -logp.mean(axis=-1)
    tok = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.where(valid, tok, 0.0).sum(axis=-1)


def rank_answers(
    params: Params, cfg: AlbefConfig,
    pixels: jax.Array,         # [Nq, 3, H, W]
    q_ids: jax.Array,          # [Nq, Sq]
    q_mask: jax.Array,         # [Nq, Sq]
    answer_ids: jax.Array,     # [Na, Sa] (row 0's first token = bos/[CLS])
    answer_mask: jax.Array,    # [Na, Sa]
    *,
    num_ans_candidates: int = 128,
    pad_token_id: int = 0,
) -> np.ndarray:
    """Two-stage answer ranking (albef_vqa.py rank_answers): score answer
    first-tokens with one decoder step, keep top-k candidates, then rank by
    full label-smoothed LM loss. Returns [Nq] indices into the answer list."""
    fused = fused_encode(params, cfg, pixels, q_ids, q_mask)
    return rank_answers_from_states(
        params, cfg, fused, q_mask, answer_ids, answer_mask,
        num_ans_candidates=num_ans_candidates, pad_token_id=pad_token_id,
    )


def rank_answers_from_states(
    params: Params, cfg: AlbefConfig,
    fused: jax.Array,          # [Nq, Sq, D] multimodal question states
    q_mask: jax.Array,
    answer_ids: jax.Array,
    answer_mask: jax.Array,
    *,
    num_ans_candidates: int = 128,
    pad_token_id: int = 0,
) -> np.ndarray:
    k = min(num_ans_candidates, answer_ids.shape[0])
    nq = fused.shape[0]

    # stage 1: first-token logits from a single bos step
    start = jnp.full((nq, 1), answer_ids[0, 0], jnp.int32)
    h = med_forward(
        params["decoder"], cfg.decoder, start,
        encoder_states=fused, encoder_mask=q_mask, causal=True,
    )
    logits0 = med_logits(params["decoder"], h)[:, 0]           # [Nq, V]
    probs0 = jax.nn.softmax(logits0, axis=-1)
    first_tok = answer_ids[:, 1]                                # [Na]
    prob_first = probs0[:, first_tok]                           # [Nq, Na]
    _, topk_ids = jax.lax.top_k(prob_first, k)                  # [Nq, k]

    # stage 2: LM loss over each candidate answer
    cand_ids = answer_ids[topk_ids.reshape(-1)]                 # [Nq*k, Sa]
    cand_mask = answer_mask[topk_ids.reshape(-1)]
    targets = jnp.where(cand_ids == pad_token_id, -100, cand_ids)
    states = jnp.repeat(fused, k, axis=0)
    smask = jnp.repeat(q_mask, k, axis=0)
    h = med_forward(
        params["decoder"], cfg.decoder, cand_ids, cand_mask,
        encoder_states=states, encoder_mask=smask, causal=True,
    )
    logits = med_logits(params["decoder"], h)
    loss = _lm_loss_per_sample(logits, targets, cfg.label_smoothing)
    log_probs = (-loss).reshape(nq, k)
    best = jnp.argmax(log_probs, axis=1)
    return np.asarray(jnp.take_along_axis(topk_ids, best[:, None], axis=1)[:, 0])


# ---------------------------------------------------------------------------
# classification / NLVR2
# ---------------------------------------------------------------------------


def classify(
    params: Params, cfg: AlbefConfig,
    pixels: jax.Array, ids: jax.Array, mask: jax.Array,
) -> jax.Array:
    """albef_classification.py:96-101 → [B, num_classes]."""
    h = fused_encode(params, cfg, pixels, ids, mask)
    return _cls_head(params["cls_head"], h[:, 0])


def classification_loss(
    params: Params, cfg: AlbefConfig,
    pixels: jax.Array, ids: jax.Array, mask: jax.Array,
    targets: jax.Array,
    *,
    m_params: Optional[Params] = None,
    alpha: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """(1-α)·CE + α·distillation vs momentum logits
    (albef_classification.py:117-128). Returns (loss, logits)."""
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


def nlvr_forward(
    params: Params, cfg: AlbefConfig,
    pixels0: jax.Array, pixels1: jax.Array,
    ids: jax.Array, mask: jax.Array,
) -> jax.Array:
    """NLVR2: one ViT pass over both images; fusion layers alternate between
    the two (albef_nlvr.py:118-140, med.py:451-470) → [B, num_classes]."""
    both = jnp.concatenate([pixels0, pixels1], axis=0)
    enc = vit_forward(params["visual"], cfg.vision, both)
    b = pixels0.shape[0]
    e0, e1 = enc[:b], enc[b:]
    am = jnp.ones(e0.shape[:2], jnp.int32)
    h = med_forward(
        params["text"], cfg.text, ids, mask,
        encoder_states=(e0, e1), encoder_mask=(am, am), mode="multimodal",
    )
    return _cls_head(params["cls_head"], h[:, 0])


def nlvr_loss(
    params: Params, cfg: AlbefConfig,
    pixels0: jax.Array, pixels1: jax.Array,
    ids: jax.Array, mask: jax.Array, targets: jax.Array,
    *,
    m_params: Optional[Params] = None,
    alpha: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """CE + optional momentum distillation (albef_nlvr.py:142-167)."""
    logits = nlvr_forward(params, cfg, pixels0, pixels1, ids, mask)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0].mean()
    if m_params is None or alpha == 0.0:
        return ce, logits
    logits_m = jax.lax.stop_gradient(
        nlvr_forward(m_params, cfg, pixels0, pixels1, ids, mask)
    )
    distill = -(jax.nn.softmax(logits_m, axis=-1) * logp).sum(-1).mean()
    return (1.0 - alpha) * ce + alpha * distill, logits


# ---------------------------------------------------------------------------
# retrieval: inference sim matrix + ITC/ITM training step
# ---------------------------------------------------------------------------


def compute_sim_matrix(
    params: Params, cfg: AlbefConfig,
    pixels: jax.Array,       # [Ni, 3, H, W]
    text_ids: jax.Array,     # [Nt, S]
    text_mask: jax.Array,    # [Nt, S]
    *,
    k_test: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(scores_i2t, scores_t2i): ITC similarity, optionally re-ranked by the
    ITM head on the top-k_test pairs per row, ITM logit[1] + sim
    (albef_models/__init__.py:76-202)."""
    feats = itc_features(params, cfg, pixels=pixels, ids=text_ids, mask=text_mask)
    image_embeds = feats["image_embeds"]
    sims = np.asarray(feats["image_feat"]) @ np.asarray(feats["text_feat"]).T
    if k_test <= 0:
        return sims, sims.T

    Ni, Nt = sims.shape
    itm = jax.jit(
        lambda p, e, i, m: itm_logits_from_ids(p, cfg, e, i, m)[:, 1]
    )
    k = min(k_test, Nt)
    i2t = np.full_like(sims, -100.0)
    tids, tmask = np.asarray(text_ids), np.asarray(text_mask)
    for i in range(Ni):
        topk = np.argsort(sims[i])[::-1][:k]
        score = np.asarray(itm(
            params, jnp.repeat(image_embeds[i : i + 1], k, axis=0),
            jnp.asarray(tids[topk]), jnp.asarray(tmask[topk]),
        ))
        i2t[i, topk] = sims[i, topk] + score
    kt = min(k_test, Ni)
    t2i = np.full_like(sims.T, -100.0)
    for t in range(Nt):
        topk = np.argsort(sims[:, t])[::-1][:kt]
        score = np.asarray(itm(
            params, image_embeds[np.asarray(topk)],
            jnp.repeat(jnp.asarray(tids[t : t + 1]), kt, axis=0),
            jnp.repeat(jnp.asarray(tmask[t : t + 1]), kt, axis=0),
        ))
        t2i[t, topk] = sims[topk, t] + score
    return i2t, t2i


def init_queue_state(cfg: AlbefConfig, rng: jax.Array) -> Dict[str, jax.Array]:
    """Functional counterpart of the torch queue buffers
    (albef_retrieval.py:87-94)."""
    k1, k2 = jax.random.split(rng)
    iq = jax.random.normal(k1, (cfg.embed_dim, cfg.queue_size), jnp.float32)
    tq = jax.random.normal(k2, (cfg.embed_dim, cfg.queue_size), jnp.float32)
    return {
        "image_queue": iq / jnp.linalg.norm(iq, axis=0, keepdims=True),
        "text_queue": tq / jnp.linalg.norm(tq, axis=0, keepdims=True),
        "idx_queue": jnp.full((1, cfg.queue_size), -100, jnp.int32),
        "ptr": jnp.zeros((), jnp.int32),
    }


def momentum_update(params: Params, m_params: Params, momentum: float = 0.995) -> Params:
    """EMA step (base_model.py MomentumDistilationMixin._momentum_update)."""
    return jax.tree_util.tree_map(
        lambda m, p: m * momentum + p.astype(m.dtype) * (1.0 - momentum),
        m_params, params,
    )


def retrieval_train_step(
    params: Params, m_params: Params, state: Dict[str, jax.Array],
    cfg: AlbefConfig, rng: jax.Array,
    pixels: jax.Array, ids: jax.Array, mask: jax.Array, idx: jax.Array,
    *,
    alpha: float = 0.4, momentum: float = 0.995, use_distill: bool = True,
) -> Tuple[Dict[str, jax.Array], Params, Dict[str, jax.Array]]:
    """One ALBEF retrieval training forward (albef_retrieval.py:107-287):
    ITC over in-batch + queue negatives with momentum-distilled soft targets,
    ITM with in-batch hard negatives mined by ITC weight. Returns
    (losses, updated momentum params, updated queue state). Differentiate
    `losses["loss"]` w.r.t. params; the m_params/state updates are
    stop-gradient side effects, applied functionally by the caller."""
    bs = pixels.shape[0]
    temp = jnp.clip(params["temp"], 0.001, 0.5)

    feats = itc_features(params, cfg, pixels=pixels, ids=ids, mask=mask)
    image_embeds, text_embeds = feats["image_embeds"], feats["text_embeds"]
    image_feat, text_feat = feats["image_feat"], feats["text_feat"]

    idx = idx.reshape(-1, 1)
    idx_all = jnp.concatenate([idx.T, state["idx_queue"]], axis=1)      # [1, bs+Q]
    pos = (idx == idx_all).astype(jnp.float32)
    sim_targets = pos / pos.sum(1, keepdims=True)

    m_params = momentum_update(params, m_params, momentum)
    mfeats = jax.lax.stop_gradient(
        itc_features(m_params, cfg, pixels=pixels, ids=ids, mask=mask)
    )
    image_feat_m, text_feat_m = mfeats["image_feat"], mfeats["text_feat"]
    image_feat_all = jnp.concatenate([image_feat_m.T, state["image_queue"]], axis=1)
    text_feat_all = jnp.concatenate([text_feat_m.T, state["text_queue"]], axis=1)

    sim_i2t = image_feat @ text_feat_all / temp
    sim_t2i = text_feat @ image_feat_all / temp
    if use_distill:
        sim_i2t_m = image_feat_m @ text_feat_all / temp
        sim_t2i_m = text_feat_m @ image_feat_all / temp
        i2t_tgt = alpha * jax.nn.softmax(sim_i2t_m, axis=1) + (1 - alpha) * sim_targets
        t2i_tgt = alpha * jax.nn.softmax(sim_t2i_m, axis=1) + (1 - alpha) * sim_targets
        i2t_tgt = jax.lax.stop_gradient(i2t_tgt)
        t2i_tgt = jax.lax.stop_gradient(t2i_tgt)
    else:
        i2t_tgt, t2i_tgt = sim_targets, sim_targets
    loss_i2t = -(jax.nn.log_softmax(sim_i2t, axis=1) * i2t_tgt).sum(1).mean()
    loss_t2i = -(jax.nn.log_softmax(sim_t2i, axis=1) * t2i_tgt).sum(1).mean()
    loss_itc = (loss_i2t + loss_t2i) / 2

    # queue update (albef_retrieval.py:220; base_model _dequeue_and_enqueue).
    # Column scatter with explicit modulo positions: dynamic_update_slice
    # CLAMPS a start near the queue end (overwriting live columns while ptr
    # wraps modulo — silent FIFO desync whenever queue_size % bs != 0); the
    # reference guards that with an assert, this handles it exactly.
    ptr = state["ptr"]
    pos = (ptr + jnp.arange(bs)) % cfg.queue_size
    new_state = {
        "image_queue": state["image_queue"].at[:, pos].set(image_feat_m.T),
        "text_queue": state["text_queue"].at[:, pos].set(text_feat_m.T),
        "idx_queue": state["idx_queue"].at[:, pos].set(idx.T),
        "ptr": (ptr + bs) % cfg.queue_size,
    }

    # ITM: positive pairs + in-batch hard negatives (albef_retrieval.py:222-285)
    am = jnp.ones(image_embeds.shape[:2], jnp.int32)
    pos_out = med_forward(
        params["text"], cfg.text, None, mask,
        encoder_states=image_embeds, encoder_mask=am,
        mode="fusion", input_embeds=text_embeds,
    )
    w_i2t = jax.nn.softmax(sim_i2t[:, :bs] + 1e-4, axis=1)
    w_t2i = jax.nn.softmax(sim_t2i[:, :bs] + 1e-4, axis=1)
    same = idx == idx.T
    w_i2t = jnp.where(same, 0.0, w_i2t)
    w_t2i = jnp.where(same, 0.0, w_t2i)
    k1, k2 = jax.random.split(rng)
    neg_img = sample_hard_negative_indices(k1, w_t2i)
    neg_txt = sample_hard_negative_indices(k2, w_i2t)

    text_embeds_all = jnp.concatenate([text_embeds, text_embeds[neg_txt]], axis=0)
    text_mask_all = jnp.concatenate([mask, mask[neg_txt]], axis=0)
    image_embeds_all = jnp.concatenate([image_embeds[neg_img], image_embeds], axis=0)
    am2 = jnp.ones(image_embeds_all.shape[:2], jnp.int32)
    neg_out = med_forward(
        params["text"], cfg.text, None, text_mask_all,
        encoder_states=image_embeds_all, encoder_mask=am2,
        mode="fusion", input_embeds=text_embeds_all,
    )
    vl = jnp.concatenate([pos_out[:, 0], neg_out[:, 0]], axis=0)
    itm_logits = _proj(vl, params["itm_head"])
    itm_labels = jnp.concatenate(
        [jnp.ones((bs,), jnp.int32), jnp.zeros((2 * bs,), jnp.int32)]
    )
    logp = jax.nn.log_softmax(itm_logits, axis=-1)
    loss_itm = -jnp.take_along_axis(logp, itm_labels[:, None], axis=-1).mean()

    losses = {"loss": loss_itc + loss_itm, "loss_itc": loss_itc, "loss_itm": loss_itm}
    return losses, m_params, new_state


def mlm_mask_inputs(
    rng: jax.Array, ids: jax.Array, vocab_size: int,
    *,
    mask_token_id: int, pad_token_id: int, cls_token_id: int,
    mlm_probability: float = 0.15,
) -> Tuple[jax.Array, jax.Array]:
    """BERT-style MLM corruption (albef_pretrain.mask :341-380): select
    `mlm_probability` of non-pad/non-CLS positions; of those 80% → [MASK],
    10% → random token, 10% unchanged. Returns (masked_ids, labels) with
    labels -100 off the masked set."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    masked = jax.random.bernoulli(k1, mlm_probability, ids.shape)
    masked = masked & (ids != pad_token_id) & (ids != cls_token_id)
    labels = jnp.where(masked, ids, -100)
    replace = jax.random.bernoulli(k2, 0.8, ids.shape) & masked
    out = jnp.where(replace, mask_token_id, ids)
    rand = jax.random.bernoulli(k3, 0.5, ids.shape) & masked & ~replace
    rand_words = jax.random.randint(k4, ids.shape, 0, vocab_size)
    out = jnp.where(rand, rand_words, out)
    return out, labels


def mlm_loss(
    params: Params, cfg: AlbefConfig,
    masked_ids: jax.Array, mask: jax.Array,
    image_embeds: jax.Array,
    labels: jax.Array,
    *,
    m_params: Optional[Params] = None,
    image_embeds_m: Optional[jax.Array] = None,
    alpha: float = 0.0,
) -> jax.Array:
    """Masked-LM loss with momentum distillation (albef_pretrain.py:292-314 +
    med.py:1079-1091): CE over masked tokens, blended with the momentum
    model's soft distribution at the masked positions."""
    am = jnp.ones(image_embeds.shape[:2], jnp.int32)
    h = med_forward(
        params["text"], cfg.text, masked_ids, mask,
        encoder_states=image_embeds, encoder_mask=am, mode="multimodal",
    )
    logits = med_logits(params["text"], h)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    loss = jnp.where(valid, nll, 0.0).sum() / jnp.maximum(valid.sum(), 1)
    if m_params is not None and alpha > 0.0:
        h_m = med_forward(
            m_params["text"], cfg.text, masked_ids, mask,
            encoder_states=image_embeds_m, encoder_mask=am, mode="multimodal",
        )
        soft = jax.lax.stop_gradient(
            jax.nn.softmax(med_logits(m_params["text"], h_m).astype(jnp.float32), axis=-1)
        )
        distill = -(soft * logp).sum(-1)
        distill = jnp.where(valid, distill, 0.0).sum() / jnp.maximum(valid.sum(), 1)
        loss = (1.0 - alpha) * loss + alpha * distill
    return loss


def rampup_factor(epoch, iters, num_iters_per_epoch) -> float:
    """albef_pretrain._rampup_factor :102-103."""
    return min(1.0, (epoch * num_iters_per_epoch + iters) / (2 * num_iters_per_epoch))


def pretrain_train_step(
    params: Params, m_params: Params, state: Dict[str, jax.Array],
    cfg: AlbefConfig, rng: jax.Array,
    pixels: jax.Array, ids: jax.Array, mask: jax.Array,
    *,
    alpha: float, momentum: float = 0.995,
    mask_token_id: int = 103, pad_token_id: int = 0, cls_token_id: int = 101,
    mlm_probability: float = 0.15,
    mlm_inputs: Optional[jax.Array] = None,     # explicit corruption (oracles)
    mlm_labels: Optional[jax.Array] = None,
    neg_idx: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Tuple[Dict[str, jax.Array], Params, Dict[str, jax.Array]]:
    """One ALBEF pretraining forward (albef_pretrain.py:105-324): ITC over
    in-batch + queue negatives with momentum-distilled DIAGONAL targets,
    ITM with in-batch hard negatives, masked-LM with momentum distillation.
    alpha arrives pre-ramped (rampup_factor). Returns
    (losses, updated momentum params, updated queue state)."""
    bs = pixels.shape[0]
    temp = jnp.clip(params["temp"], 0.001, 0.5)

    feats = itc_features(params, cfg, pixels=pixels, ids=ids, mask=mask)
    image_embeds, text_embeds = feats["image_embeds"], feats["text_embeds"]
    image_feat, text_feat = feats["image_feat"], feats["text_feat"]

    m_params = momentum_update(params, m_params, momentum)
    mfeats = jax.lax.stop_gradient(
        itc_features(m_params, cfg, pixels=pixels, ids=ids, mask=mask)
    )
    image_feat_m, text_feat_m = mfeats["image_feat"], mfeats["text_feat"]
    image_feat_all = jnp.concatenate([image_feat_m.T, state["image_queue"]], axis=1)
    text_feat_all = jnp.concatenate([text_feat_m.T, state["text_queue"]], axis=1)

    sim_targets = jnp.zeros((bs, image_feat_all.shape[1]), jnp.float32)
    sim_targets = sim_targets.at[:, :bs].set(jnp.eye(bs))

    sim_i2t_m = image_feat_m @ text_feat_all / temp
    sim_t2i_m = text_feat_m @ image_feat_all / temp
    i2t_tgt = jax.lax.stop_gradient(
        alpha * jax.nn.softmax(sim_i2t_m, axis=1) + (1 - alpha) * sim_targets
    )
    t2i_tgt = jax.lax.stop_gradient(
        alpha * jax.nn.softmax(sim_t2i_m, axis=1) + (1 - alpha) * sim_targets
    )
    sim_i2t = image_feat @ text_feat_all / temp
    sim_t2i = text_feat @ image_feat_all / temp
    loss_i2t = -(jax.nn.log_softmax(sim_i2t, axis=1) * i2t_tgt).sum(1).mean()
    loss_t2i = -(jax.nn.log_softmax(sim_t2i, axis=1) * t2i_tgt).sum(1).mean()
    loss_itc = (loss_i2t + loss_t2i) / 2

    ptr = state["ptr"]
    pos = (ptr + jnp.arange(bs)) % cfg.queue_size
    new_state = dict(
        state,
        image_queue=state["image_queue"].at[:, pos].set(image_feat_m.T),
        text_queue=state["text_queue"].at[:, pos].set(text_feat_m.T),
        ptr=(ptr + bs) % cfg.queue_size,
    )

    # ITM (albef_pretrain.py:213-290); weights from diag(-inf)-masked sims,
    # NO +1e-4 here (that epsilon is retrieval-only, albef_retrieval.py:237)
    am = jnp.ones(image_embeds.shape[:2], jnp.int32)
    pos_out = med_forward(
        params["text"], cfg.text, None, mask,
        encoder_states=image_embeds, encoder_mask=am,
        mode="fusion", input_embeds=text_embeds,
    )
    w_i2t = jax.nn.softmax(jnp.where(jnp.eye(bs, dtype=bool), -jnp.inf, sim_i2t[:, :bs]), axis=1)
    w_t2i = jax.nn.softmax(jnp.where(jnp.eye(bs, dtype=bool), -jnp.inf, sim_t2i[:, :bs]), axis=1)
    w_i2t = jax.lax.stop_gradient(w_i2t)
    w_t2i = jax.lax.stop_gradient(w_t2i)
    k1, k2, k3 = jax.random.split(rng, 3)
    if neg_idx is not None:
        neg_img, neg_txt = neg_idx
    else:
        neg_img = sample_hard_negative_indices(k1, w_t2i)
        neg_txt = sample_hard_negative_indices(k2, w_i2t)

    text_embeds_all = jnp.concatenate([text_embeds, text_embeds[neg_txt]], axis=0)
    text_mask_all = jnp.concatenate([mask, mask[neg_txt]], axis=0)
    image_embeds_all = jnp.concatenate([image_embeds[neg_img], image_embeds], axis=0)
    am2 = jnp.ones(image_embeds_all.shape[:2], jnp.int32)
    neg_out = med_forward(
        params["text"], cfg.text, None, text_mask_all,
        encoder_states=image_embeds_all, encoder_mask=am2,
        mode="fusion", input_embeds=text_embeds_all,
    )
    vl = jnp.concatenate([pos_out[:, 0], neg_out[:, 0]], axis=0)
    itm_logits = _proj(vl, params["itm_head"])
    itm_labels = jnp.concatenate(
        [jnp.ones((bs,), jnp.int32), jnp.zeros((2 * bs,), jnp.int32)]
    )
    logp = jax.nn.log_softmax(itm_logits.astype(jnp.float32), axis=-1)
    loss_itm = -jnp.take_along_axis(logp, itm_labels[:, None], axis=-1).mean()

    # MLM (albef_pretrain.py:292-314)
    if mlm_inputs is None:
        mlm_inputs, mlm_labels = mlm_mask_inputs(
            k3, ids, cfg.text.vocab_size,
            mask_token_id=mask_token_id, pad_token_id=pad_token_id,
            cls_token_id=cls_token_id, mlm_probability=mlm_probability,
        )
    loss_mlm = mlm_loss(
        params, cfg, mlm_inputs, mask, image_embeds, mlm_labels,
        m_params=m_params, image_embeds_m=mfeats["image_embeds"], alpha=alpha,
    )

    losses = {
        "loss": loss_itc + loss_itm + loss_mlm,
        "loss_itc": loss_itc, "loss_itm": loss_itm, "loss_mlm": loss_mlm,
    }
    return losses, m_params, new_state


def vqa_train_loss(
    params: Params, cfg: AlbefConfig,
    pixels: jax.Array,          # [Nq, 3, H, W]
    q_ids: jax.Array, q_mask: jax.Array,
    answer_ids: jax.Array,      # [Na_total, Sa] (flattened per-question answers)
    answer_mask: jax.Array,
    n_answers,                  # python list/tuple, len Nq — answers per question
    weights: jax.Array,         # [Na_total] per-answer loss weights
    *,
    m_params: Optional[Params] = None,
    alpha: float = 0.0,
    pad_token_id: int = 0,
) -> jax.Array:
    """ALBEF VQA training objective (albef_vqa.py:83-226): fused question
    states tiled per answer, label-smoothed answer LM loss with optional
    momentum distillation (med.py:1246-1251:
    per-sample (1-α)·lm + α·distill), weighted and averaged over the
    question batch."""
    fused = fused_encode(params, cfg, pixels, q_ids, q_mask)
    rep = np.repeat(np.arange(len(n_answers)), np.asarray(n_answers))
    states = fused[rep]
    smask = q_mask[rep]
    targets = jnp.where(answer_ids == pad_token_id, -100, answer_ids)

    h = med_forward(
        params["decoder"], cfg.decoder, answer_ids, answer_mask,
        encoder_states=states, encoder_mask=smask, causal=True,
    )
    logits = med_logits(params["decoder"], h)
    loss = _lm_loss_per_sample(logits, targets, cfg.label_smoothing)

    if m_params is not None and alpha > 0.0:
        fused_m = jax.lax.stop_gradient(
            fused_encode(m_params, cfg, pixels, q_ids, q_mask)
        )
        h_m = med_forward(
            m_params["decoder"], cfg.decoder, answer_ids, answer_mask,
            encoder_states=fused_m[rep], encoder_mask=smask, causal=True,
        )
        logits_m = jax.lax.stop_gradient(med_logits(m_params["decoder"], h_m))
        soft = jax.nn.softmax(logits_m[:, :-1], axis=-1)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        distill = -(soft * logp).sum(-1)
        valid = targets[:, 1:] != -100
        distill = jnp.where(valid, distill, 0.0).sum(-1)
        loss = (1.0 - alpha) * loss + alpha * distill

    return (weights * loss).sum() / pixels.shape[0]
