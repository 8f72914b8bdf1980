"""BLIP-2 model family: stage-1 Q-Former (Blip2Qformer/Blip2ITM) and the
LM-backed variants Blip2-OPT / Blip2-T5 / Blip2-T5-Instruct.

Capability parity: reference lavis/models/blip2_models/blip2.py (Blip2Base:
init_vision_encoder :64, init_Qformer :48, checkpoint load :86,
compute_sim_matrix at module scope), blip2_qformer.py (first-stage ITC/ITM/LM
pretraining + feature extraction + captioning), blip2_image_text_matching.py
(itm/itc match heads), blip2_opt.py / blip2_t5.py (query-only Q-Former +
frozen LM with query-prefix embeddings), and blip2_t5_instruct.py
(text-conditioned Q-Former + Flan-T5, incl. per-candidate loss ranking).

  image → EVA-ViT-g → ln_vision → Q-Former(32 queries) → proj → LM prefix
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.models import eva_vit, qformer
from llava_align_tpu.models.eva_vit import EvaVitConfig
from llava_align_tpu.models.opt import OptConfig
from llava_align_tpu.models.qformer import QFormerConfig
from llava_align_tpu.models.t5 import T5Config
from llava_align_tpu.ops.layers import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Blip2OptConfig:
    vision: EvaVitConfig = dataclasses.field(default_factory=EvaVitConfig)
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig)
    text: OptConfig = dataclasses.field(default_factory=OptConfig)
    num_query_tokens: int = 32

    @staticmethod
    def tiny(vocab_size: int = 256) -> "Blip2OptConfig":
        vision = EvaVitConfig.tiny()
        return Blip2OptConfig(
            vision=vision,
            qformer=QFormerConfig.tiny(encoder_width=vision.width),
            text=OptConfig.tiny(vocab_size),
            num_query_tokens=QFormerConfig.tiny().query_length,
        )


@dataclasses.dataclass(frozen=True)
class Blip2T5Config:
    vision: EvaVitConfig = dataclasses.field(default_factory=EvaVitConfig)
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig)
    text: T5Config = dataclasses.field(default_factory=T5Config)
    num_query_tokens: int = 32

    @staticmethod
    def tiny(vocab_size: int = 128) -> "Blip2T5Config":
        vision = EvaVitConfig.tiny()
        return Blip2T5Config(
            vision=vision,
            qformer=QFormerConfig.tiny(encoder_width=vision.width),
            text=T5Config.tiny(vocab_size),
            num_query_tokens=QFormerConfig.tiny().query_length,
        )


def _init_common(rng, cfg, proj_out: int, lm_init) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    D_q = cfg.qformer.hidden_size
    W = cfg.vision.width
    return {
        "visual": eva_vit.init(k1, cfg.vision),
        "ln_vision": {
            "scale": jnp.ones((W,), cfg.vision.dtype),
            "bias": jnp.zeros((W,), cfg.vision.dtype),
        },
        "query_tokens": (
            jax.random.normal(k2, (cfg.num_query_tokens, D_q), jnp.float32) * 0.02
        ).astype(cfg.qformer.dtype),
        "qformer": qformer.init(k3, cfg.qformer),
        "proj": {
            "w": (jax.random.normal(k4, (proj_out, D_q), jnp.float32) / D_q**0.5).astype(cfg.text.dtype),
            "b": jnp.zeros((proj_out,), cfg.text.dtype),
        },
        "lm": lm_init(k5),
    }


def init_opt(rng: jax.Array, cfg: Blip2OptConfig) -> Params:
    from llava_align_tpu.models import opt as opt_model

    return _init_common(
        rng, cfg, cfg.text.hidden_size, lambda k: opt_model.init(k, cfg.text)
    )


def init_t5(rng: jax.Array, cfg: Blip2T5Config) -> Params:
    from llava_align_tpu.models import t5 as t5_model

    return _init_common(
        rng, cfg, cfg.text.d_model, lambda k: t5_model.init(k, cfg.text)
    )


def encode_image_queries(params: Params, cfg, images: jax.Array) -> jax.Array:
    """image → projected query embeddings [B, Q, lm_dim]
    (query-only Q-Former; reference blip2_opt/blip2_t5 generate path)."""
    feats = eva_vit.forward(params["visual"], cfg.vision, images)
    feats = layer_norm(
        feats, params["ln_vision"]["scale"], params["ln_vision"]["bias"],
        cfg.vision.layer_norm_eps,
    )
    B = images.shape[0]
    queries = jnp.broadcast_to(
        params["query_tokens"], (B, cfg.num_query_tokens, params["query_tokens"].shape[-1])
    )
    hidden = qformer.forward(
        params["qformer"], cfg.qformer, queries, feats.astype(cfg.qformer.dtype)
    )
    w, b = params["proj"]["w"], params["proj"]["b"]
    return (
        jnp.einsum("...d,od->...o", hidden.astype(w.dtype), w, preferred_element_type=w.dtype)
        + b
    )


# ---------------------------------------------------------------------------
# stage-1 Q-Former model (blip2 / blip2_feature_extractor / blip2_itm)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Blip2QformerConfig:
    """First-stage BLIP-2 (reference blip2_qformer.py:45-88)."""

    vision: EvaVitConfig = dataclasses.field(default_factory=EvaVitConfig)
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig)
    num_query_tokens: int = 32
    embed_dim: int = 256
    max_txt_len: int = 32

    @staticmethod
    def tiny(vocab_size: int = 128) -> "Blip2QformerConfig":
        vision = EvaVitConfig.tiny()
        return Blip2QformerConfig(
            vision=vision,
            qformer=QFormerConfig.tiny(encoder_width=vision.width),
            num_query_tokens=QFormerConfig.tiny().query_length,
            embed_dim=16,
        )


def init_stage1(rng: jax.Array, cfg: Blip2QformerConfig) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    D_q = cfg.qformer.hidden_size
    E = cfg.embed_dim
    W = cfg.vision.width
    ks = iter(jax.random.split(k4, 4))

    def lin(o, i):
        return {
            "w": (jax.random.normal(next(ks), (o, i), jnp.float32) / i**0.5).astype(cfg.qformer.dtype),
            "b": jnp.zeros((o,), cfg.qformer.dtype),
        }

    qf = qformer.init(k3, cfg.qformer)
    qf["head"] = qformer.lm_head_init(k5, cfg.qformer, qf["embeddings"]["word"])
    return {
        "visual": eva_vit.init(k1, cfg.vision),
        "ln_vision": {
            "scale": jnp.ones((W,), cfg.vision.dtype),
            "bias": jnp.zeros((W,), cfg.vision.dtype),
        },
        "query_tokens": (
            jax.random.normal(k2, (cfg.num_query_tokens, D_q), jnp.float32) * 0.02
        ).astype(cfg.qformer.dtype),
        "qformer": qf,
        "vision_proj": lin(E, D_q),
        "text_proj": lin(E, D_q),
        "itm_head": lin(2, D_q),
        "temp": jnp.asarray(0.07, jnp.float32),
    }


def _lin(x, p):
    return (
        jnp.einsum("...d,od->...o", x.astype(p["w"].dtype), p["w"], preferred_element_type=p["w"].dtype)
        + p["b"]
    )


def _l2norm(x):
    return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)


def vision_embeds(params: Params, cfg, images: jax.Array) -> jax.Array:
    """image → ln_vision(EVA-ViT features) [B, N, W] (blip2_qformer.py:94)."""
    feats = eva_vit.forward(params["visual"], cfg.vision, images)
    return layer_norm(
        feats, params["ln_vision"]["scale"], params["ln_vision"]["bias"],
        cfg.vision.layer_norm_eps,
    )


def _queries(params: Params, cfg, B: int) -> jax.Array:
    return jnp.broadcast_to(
        params["query_tokens"], (B, cfg.num_query_tokens, params["query_tokens"].shape[-1])
    )


def forward_image(params: Params, cfg: Blip2QformerConfig, images: jax.Array):
    """→ (query hidden [B, Q, D], image_embeds [B, N, W])
    (blip2_qformer.forward_image :340-354)."""
    image_embeds = vision_embeds(params, cfg, images)
    hidden, _ = qformer.forward_queries(
        params["qformer"], cfg.qformer, _queries(params, cfg, images.shape[0]),
        image_embeds.astype(cfg.qformer.dtype),
    )
    return hidden, image_embeds


def forward_text(params: Params, cfg: Blip2QformerConfig, text_ids, text_mask):
    """→ CLS hidden [B, D] (blip2_qformer.forward_text :356-362)."""
    return qformer.forward_text(params["qformer"], cfg.qformer, text_ids, text_mask)[:, 0]


def compute_itm(params: Params, cfg: Blip2QformerConfig, image_embeds, text_ids, text_mask):
    """ITM logit [B]: positive-class logit meaned over query positions
    (blip2_qformer.compute_itm :364-384). `image_embeds` are ln_vision
    outputs (the reference passes stored vit_feats)."""
    B = image_embeds.shape[0]
    hidden = qformer.forward(
        params["qformer"], cfg.qformer, _queries(params, cfg, B),
        image_embeds.astype(cfg.qformer.dtype), text_ids=text_ids, text_mask=text_mask,
    )[:, : cfg.num_query_tokens]
    logits = _lin(hidden, params["itm_head"])
    return logits[:, :, 1].mean(axis=1)


def match(params: Params, cfg: Blip2QformerConfig, images, text_ids, text_mask,
          match_head: str = "itm"):
    """Blip2ITM.forward (blip2_image_text_matching.py:53-116):
    'itm' → [B, 2] query-mean logits; 'itc' → [B] query-max cosine sim."""
    image_embeds = vision_embeds(params, cfg, images)
    if match_head == "itm":
        B = images.shape[0]
        hidden = qformer.forward(
            params["qformer"], cfg.qformer, _queries(params, cfg, B),
            image_embeds.astype(cfg.qformer.dtype), text_ids=text_ids, text_mask=text_mask,
        )[:, : cfg.num_query_tokens]
        return _lin(hidden, params["itm_head"]).mean(axis=1)
    if match_head == "itc":
        q_hidden, _ = qformer.forward_queries(
            params["qformer"], cfg.qformer, _queries(params, cfg, images.shape[0]),
            image_embeds.astype(cfg.qformer.dtype),
        )
        image_feats = _l2norm(_lin(q_hidden, params["vision_proj"]))
        text_feat = _l2norm(_lin(
            qformer.forward_text(params["qformer"], cfg.qformer, text_ids, text_mask)[:, 0],
            params["text_proj"],
        ))
        return jnp.einsum("bqe,be->bq", image_feats, text_feat).max(axis=1)
    raise ValueError(f"unknown match_head {match_head!r}")


def _ce_label_smooth(logits: jax.Array, targets, eps: float = 0.1) -> jax.Array:
    """torch CrossEntropyLoss(label_smoothing=eps) over hard integer targets."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    smooth = -logp.mean(-1)
    return ((1.0 - eps) * nll + eps * smooth).mean()


def pretrain_forward(
    params: Params,
    cfg: Blip2QformerConfig,
    images: jax.Array,           # [B, 3, H, W]
    text_ids: jax.Array,         # [B, T] (CLS-first BERT tokens, max_length padded)
    text_mask: jax.Array,        # [B, T]
    *,
    bos_token_id: int,
    pad_token_id: int,
    rng: Optional[jax.Array] = None,
    image_ids: Optional[jax.Array] = None,   # [B] coco-retrieval finetuning ids
    neg_idx: Optional[Tuple[jax.Array, jax.Array]] = None,  # (img_neg, txt_neg) for tests
    image_embeds: Optional[jax.Array] = None,  # bypass the vision tower (oracles)
) -> Dict[str, jax.Array]:
    """Stage-1 pretraining losses (blip2_qformer.forward :90-275):
    query-max ITC with label smoothing 0.1, ITM with ITC-weighted hard
    negatives, captioning LM over the cached query K/V. Single-process
    semantics (rank 0 / world 1 — the reference's concat_all_gather is the
    identity there; under a data mesh wrap this in shard_map and gather
    feats/ids as models/albef.py does)."""
    if image_embeds is None:
        image_embeds = vision_embeds(params, cfg, images)
    B = image_embeds.shape[0]
    q_hidden, q_kv = qformer.forward_queries(
        params["qformer"], cfg.qformer, _queries(params, cfg, B),
        image_embeds.astype(cfg.qformer.dtype),
    )
    image_feats = _l2norm(_lin(q_hidden, params["vision_proj"]))           # [B, Q, E]
    text_feat = _l2norm(_lin(
        qformer.forward_text(params["qformer"], cfg.qformer, text_ids, text_mask)[:, 0],
        params["text_proj"],
    ))                                                                      # [B, E]

    temp = params["temp"]
    sim_q2t = jnp.einsum("bqe,ne->bnq", image_feats.astype(jnp.float32), text_feat.astype(jnp.float32))
    sim_i2t = sim_q2t.max(-1) / temp                                        # [B, B]
    sim_t2i = jnp.einsum("be,nqe->bnq", text_feat.astype(jnp.float32), image_feats.astype(jnp.float32)).max(-1) / temp

    if image_ids is not None:
        iid = image_ids.reshape(-1, 1)
        pos_idx = (iid == iid.T).astype(jnp.float32)
        sim_targets = pos_idx / pos_idx.sum(1, keepdims=True)
        sim_targets = 0.9 * sim_targets + 0.1 * jnp.ones_like(sim_targets) / sim_targets.shape[1]
        loss_t2i = -(jax.nn.log_softmax(sim_t2i, axis=1) * sim_targets).sum(1).mean()
        loss_i2t = -(jax.nn.log_softmax(sim_i2t, axis=1) * sim_targets).sum(1).mean()
        loss_itc = (loss_t2i + loss_i2t) / 2
    else:
        targets = jnp.arange(B)
        loss_itc = (
            _ce_label_smooth(sim_i2t, targets) + _ce_label_smooth(sim_t2i, targets)
        ) / 2

    # --- ITM with hard negatives (:175-247) ---
    if image_ids is not None:
        mask_same = image_ids.reshape(-1, 1) == image_ids.reshape(1, -1)
    else:
        mask_same = jnp.eye(B, dtype=bool)
    w_t2i = jax.nn.softmax(jnp.where(mask_same, -10000.0, sim_t2i), axis=1)
    w_i2t = jax.nn.softmax(jnp.where(mask_same, -10000.0, sim_i2t), axis=1)
    w_t2i = jax.lax.stop_gradient(w_t2i)
    w_i2t = jax.lax.stop_gradient(w_i2t)
    if neg_idx is not None:
        img_neg_idx, txt_neg_idx = neg_idx
    else:
        if rng is None:
            raise ValueError("pretrain_forward needs rng (or explicit neg_idx)")
        k1, k2 = jax.random.split(rng)
        img_neg_idx = jax.random.categorical(k1, jnp.log(w_t2i + 1e-20), axis=1)
        txt_neg_idx = jax.random.categorical(k2, jnp.log(w_i2t + 1e-20), axis=1)

    text_ids_all = jnp.concatenate([text_ids, text_ids, text_ids[txt_neg_idx]], axis=0)
    text_mask_all = jnp.concatenate([text_mask, text_mask, text_mask[txt_neg_idx]], axis=0)
    image_embeds_all = jnp.concatenate(
        [image_embeds, image_embeds[img_neg_idx], image_embeds], axis=0
    )
    hidden_itm = qformer.forward(
        params["qformer"], cfg.qformer, _queries(params, cfg, 3 * B),
        image_embeds_all.astype(cfg.qformer.dtype),
        text_ids=text_ids_all, text_mask=text_mask_all,
    )[:, : cfg.num_query_tokens]
    itm_logits = _lin(hidden_itm, params["itm_head"]).mean(axis=1)          # [3B, 2]
    itm_labels = jnp.concatenate([jnp.ones((B,), jnp.int32), jnp.zeros((2 * B,), jnp.int32)])
    logp = jax.nn.log_softmax(itm_logits.astype(jnp.float32), axis=-1)
    loss_itm = -jnp.take_along_axis(logp, itm_labels[:, None], axis=-1).mean()

    # --- captioning LM (:249-268) ---
    dec_ids = text_ids.at[:, 0].set(bos_token_id)
    labels = jnp.where(dec_ids == pad_token_id, -100, dec_ids)
    lm_hidden = qformer.forward_lm(params["qformer"], cfg.qformer, dec_ids, text_mask, q_kv)
    lm_logits = qformer.lm_logits(params["qformer"]["head"], lm_hidden)
    loss_lm = qformer.lm_loss_mean(lm_logits, labels)

    return {
        "loss": loss_itc + loss_itm + loss_lm,
        "loss_itc": loss_itc,
        "loss_itm": loss_itm,
        "loss_lm": loss_lm,
    }


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(1,))
def _lm_step_logits(qf_params, qf_cfg, ids, kv):
    """Last-position LM logits over the cached query K/V (jit-cached across
    generate calls — kv rides as a pytree argument, not a closure)."""
    hidden = qformer.forward_lm(qf_params, qf_cfg, ids, None, list(kv))
    return qformer.lm_logits(qf_params["head"], hidden)[:, -1]


def greedy_lm_decode(
    qf_params: Params,
    qf_cfg: QFormerConfig,
    query_embeds: jax.Array,     # [B, Q, D]
    image_embeds: jax.Array,     # [B, N, E] (ln_vision outputs)
    *,
    bos_token_id: int,
    eos_token_id: int,
    max_new_tokens: int = 30,
    min_length: int = 0,
    rng: Optional[jax.Array] = None,
    top_p: Optional[float] = None,
) -> np.ndarray:
    """Caption decoding over the cached query K/V (the semantics of the
    reference Qformer.generate path, blip2_qformer.py:277-338). Greedy by
    default; nucleus sampling when top_p is given. Each step re-runs the
    (small, 12-layer) causal text pass on the growing prefix — this is the
    zoo/eval path, not the serving engine."""
    _, kv = qformer.forward_queries(qf_params, qf_cfg, query_embeds, image_embeds)
    B = query_embeds.shape[0]
    ids = np.full((B, 1), bos_token_id, np.int32)
    done = np.zeros((B,), bool)

    for t in range(max_new_tokens):
        logits = np.asarray(
            _lm_step_logits(qf_params, qf_cfg, jnp.asarray(ids), tuple(map(tuple, kv)))
        )
        if t < min_length - 1:
            logits[:, eos_token_id] = -1e30
        if top_p is not None:
            if rng is None:
                raise ValueError("top_p sampling needs rng")
            rng, sub = jax.random.split(rng)
            order = np.argsort(-logits, axis=-1)
            probs = np.take_along_axis(
                np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1)), order, axis=-1
            )
            keep = np.cumsum(probs, axis=-1) - probs < top_p
            keep[:, 0] = True
            filt = np.full_like(logits, -1e30)
            np.put_along_axis(filt, order, np.where(keep, np.take_along_axis(logits, order, -1), -1e30), -1)
            nxt = np.asarray(jax.random.categorical(sub, jnp.asarray(filt), axis=-1))
        else:
            nxt = logits.argmax(-1)
        nxt = np.where(done, eos_token_id, nxt).astype(np.int32)
        ids = np.concatenate([ids, nxt[:, None]], axis=1)
        done |= nxt == eos_token_id
        if done.all():
            break
    return ids[:, 1:]


def generate_caption(
    params: Params, cfg: Blip2QformerConfig, images: jax.Array, **kw
) -> np.ndarray:
    """blip2_qformer.generate: image → query K/V → caption token ids."""
    image_embeds = vision_embeds(params, cfg, images)
    return greedy_lm_decode(
        params["qformer"], cfg.qformer,
        _queries(params, cfg, images.shape[0]),
        image_embeds.astype(cfg.qformer.dtype), **kw,
    )


def extract_features(
    params: Params, cfg: Blip2QformerConfig,
    images: Optional[jax.Array] = None,
    text_ids: Optional[jax.Array] = None,
    text_mask: Optional[jax.Array] = None,
    mode: str = "multimodal",
) -> Dict[str, Optional[jax.Array]]:
    """blip2_qformer.extract_features (:386-498): image / text / multimodal."""
    out: Dict[str, Optional[jax.Array]] = {
        "image_embeds": None, "image_embeds_proj": None,
        "text_embeds": None, "text_embeds_proj": None, "multimodal_embeds": None,
    }
    if mode == "image":
        q_hidden, _ = forward_image(params, cfg, images)
        out["image_embeds"] = q_hidden
        out["image_embeds_proj"] = _l2norm(_lin(q_hidden, params["vision_proj"]))
    elif mode == "text":
        t_hidden = qformer.forward_text(params["qformer"], cfg.qformer, text_ids, text_mask)
        out["text_embeds"] = t_hidden
        out["text_embeds_proj"] = _l2norm(_lin(t_hidden, params["text_proj"]))
    elif mode == "multimodal":
        image_embeds = vision_embeds(params, cfg, images)
        B = images.shape[0]
        out["multimodal_embeds"] = qformer.forward(
            params["qformer"], cfg.qformer, _queries(params, cfg, B),
            image_embeds.astype(cfg.qformer.dtype),
            text_ids=text_ids, text_mask=text_mask,
        )[:, : cfg.num_query_tokens]
    else:
        raise ValueError(f"mode must be image|text|multimodal, got {mode!r}")
    return out


def compute_sim_matrix(
    params: Params, cfg: Blip2QformerConfig,
    images: jax.Array,            # [Ni, 3, H, W]
    text_ids: jax.Array,          # [Nt, T]
    text_mask: jax.Array,
    *,
    k_test: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Retrieval score matrices (blip2.py compute_sim_matrix): query-max
    cosine ITC shortlist, ITM re-rank of the top-k_test, final score =
    itm_logit + itc_sim."""
    q_hidden, vit_feats = forward_image(params, cfg, images)
    image_embeds = _l2norm(_lin(q_hidden, params["vision_proj"]))          # [Ni, Q, E]
    text_feat = _l2norm(_lin(
        qformer.forward_text(params["qformer"], cfg.qformer, text_ids, text_mask)[:, 0],
        params["text_proj"],
    ))                                                                      # [Nt, E]
    sims = np.asarray(
        jnp.einsum("iqe,te->itq", image_embeds.astype(jnp.float32), text_feat.astype(jnp.float32)).max(-1)
    )                                                                       # [Ni, Nt]
    Ni, Nt = sims.shape
    k = min(k_test, Nt)
    score_i2t = np.full((Ni, Nt), -100.0, np.float32)
    for i in range(Ni):
        topk = np.argsort(-sims[i])[:k]
        score = np.asarray(compute_itm(
            params, cfg,
            jnp.broadcast_to(vit_feats[i], (k,) + vit_feats.shape[1:]),
            text_ids[topk], text_mask[topk],
        ))
        score_i2t[i, topk] = score + sims[i, topk]
    k = min(k_test, Ni)
    score_t2i = np.full((Nt, Ni), -100.0, np.float32)
    for t in range(Nt):
        topk = np.argsort(-sims[:, t])[:k]
        score = np.asarray(compute_itm(
            params, cfg, vit_feats[topk],
            jnp.broadcast_to(text_ids[t], (k,) + text_ids.shape[1:]),
            jnp.broadcast_to(text_mask[t], (k,) + text_mask.shape[1:]),
        ))
        score_t2i[t, topk] = score + sims[topk, t]
    return score_i2t, score_t2i


# ---------------------------------------------------------------------------
# LM-backend training losses + instruct paths
# ---------------------------------------------------------------------------


def _ce_mean_ignore(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """CE mean over labels != -100 (HF default reduction)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def opt_forward_loss(
    params: Params, cfg: Blip2OptConfig,
    images: Optional[jax.Array],
    text_ids: jax.Array,          # [B, T] right-padded, "\n"-terminated captions
    text_mask: jax.Array,         # [B, T]
    *,
    pad_token_id: int,
    prompt_length: int = 0,
    q_emb: Optional[jax.Array] = None,   # bypass vision+Q-Former (oracles)
) -> jax.Array:
    """Blip2OPT.forward (blip2_opt.py:107-162): [query prefix; token embeds]
    into the frozen OPT with -100 targets on the prefix (and on the prompt's
    first `prompt_length` columns), shifted-CE mean."""
    from llava_align_tpu.models import opt as opt_model

    if q_emb is None:
        q_emb = encode_image_queries(params, cfg, images)  # [B, Q, D]
    B, Q, _ = q_emb.shape
    T = text_ids.shape[1]
    tok = opt_model.embed_tokens(params["lm"], text_ids)
    embeds = jnp.concatenate([q_emb.astype(tok.dtype), tok], axis=1)
    mask = jnp.concatenate([jnp.ones((B, Q), text_mask.dtype), text_mask], axis=1)
    # HF OPT positions derive from the attention mask: cumsum-1 (pads clamp,
    # harmless: right padding + causal attention keeps them out of the loss)
    positions = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0, None).astype(jnp.int32)
    hidden, _ = opt_model.forward(params["lm"], cfg.text, embeds, positions)
    logits = opt_model.logits_from_hidden(params["lm"], hidden)

    targets = jnp.where(text_ids == pad_token_id, -100, text_ids)
    if prompt_length:
        col = jnp.arange(T)
        targets = jnp.where(col[None, :] < prompt_length, -100, targets)
    targets = jnp.concatenate([jnp.full((B, Q), -100, targets.dtype), targets], axis=1)
    return _ce_mean_ignore(logits[:, :-1], targets[:, 1:])


def _t5_shift_right(targets: jax.Array, pad_token_id: int, start_id: int) -> jax.Array:
    ids = jnp.where(targets == -100, pad_token_id, targets)
    return jnp.concatenate(
        [jnp.full((targets.shape[0], 1), start_id, targets.dtype), ids[:, :-1]], axis=1
    )


def t5_encode_with_prefix(
    params: Params, cfg: Blip2T5Config,
    q_emb: jax.Array,             # [B, Qtok, D] projected query embeds
    input_ids: jax.Array, input_mask: jax.Array,
    *,
    few_shot_embeds: Optional[jax.Array] = None,
    few_shot_mask: Optional[jax.Array] = None,
):
    """[few-shot context?; query prefix; token embeds] → T5 encoder states +
    joint mask."""
    from llava_align_tpu.models import t5 as t5_model

    B = q_emb.shape[0]
    tok = t5_model.embed_tokens(params["lm"], input_ids)
    enc_in = jnp.concatenate([q_emb.astype(tok.dtype), tok], axis=1)
    mask = jnp.concatenate(
        [jnp.ones((B, q_emb.shape[1]), input_mask.dtype), input_mask], axis=1
    )
    if few_shot_embeds is not None:
        enc_in = jnp.concatenate([few_shot_embeds.astype(tok.dtype), enc_in], axis=1)
        if few_shot_mask is None:
            few_shot_mask = jnp.ones(few_shot_embeds.shape[:2], mask.dtype)
        mask = jnp.concatenate([few_shot_mask.astype(mask.dtype), mask], axis=1)
    return t5_model.encode(params["lm"], cfg.text, enc_in, mask), mask


def t5_forward_loss(
    params: Params, cfg: Blip2T5Config,
    images: Optional[jax.Array],
    input_ids: jax.Array, input_mask: jax.Array,
    output_ids: jax.Array, output_mask: jax.Array,
    *,
    pad_token_id: int = 0,
    decoder_start_token_id: int = 0,
    q_emb: Optional[jax.Array] = None,
    qformer_text_ids: Optional[jax.Array] = None,
    qformer_text_mask: Optional[jax.Array] = None,
    few_shot_embeds: Optional[jax.Array] = None,   # [B, Sfs, D]
    few_shot_mask: Optional[jax.Array] = None,     # [B, Sfs]
) -> jax.Array:
    """Blip2T5.forward (blip2_t5.py:102-156) / Blip2T5Instruct.forward
    (blip2_t5_instruct.py:118-202): [query prefix; input tokens] through the
    T5 encoder, targets = output ids with pads ignored, CE mean. With
    qformer_text_ids the queries are text-conditioned (instruct). Few-shot
    context embeds prepend to the encoder stream exactly as the reference
    concatenates prepare_few_shot_embeds' output (:188-190); the random
    example SAMPLING (:204-228) is a data-side policy left to the caller."""
    from llava_align_tpu.models import t5 as t5_model

    if q_emb is None:
        if qformer_text_ids is not None:
            q_emb = encode_image_queries_instruct(
                params, cfg, images, qformer_text_ids, qformer_text_mask
            )
        else:
            q_emb = encode_image_queries(params, cfg, images)
    enc_hidden, enc_mask = t5_encode_with_prefix(
        params, cfg, q_emb, input_ids, input_mask,
        few_shot_embeds=few_shot_embeds, few_shot_mask=few_shot_mask,
    )
    targets = jnp.where(output_ids == pad_token_id, -100, output_ids)
    dec_ids = _t5_shift_right(targets, pad_token_id, decoder_start_token_id)
    logits = t5_model.decode(params["lm"], cfg.text, dec_ids, enc_hidden, enc_mask)
    return _ce_mean_ignore(logits, targets)


def t5_candidate_losses(
    params: Params, cfg: Blip2T5Config,
    enc_hidden: jax.Array,        # [B, S, D] (t5_encode_with_prefix output)
    enc_mask: jax.Array,          # [B, S]
    cand_ids: jax.Array,          # [C, Tc] candidate class tokenizations
    *,
    pad_token_id: int = 0,
    decoder_start_token_id: int = 0,
) -> jax.Array:
    """Per-candidate summed LM loss [B, C] for predict_class ranking
    (blip2_t5_instruct._predict_class :503-700, LAVIS modeling_t5
    reduction='none' = per-sample token-sum). Rank with argsort(axis=-1)."""
    from llava_align_tpu.models import t5 as t5_model

    B, S, D = enc_hidden.shape
    C, Tc = cand_ids.shape
    enc_rep = jnp.repeat(enc_hidden, C, axis=0)                  # [B*C, S, D]
    mask_rep = jnp.repeat(enc_mask, C, axis=0)
    cand_rep = jnp.tile(cand_ids, (B, 1))                        # [B*C, Tc]
    targets = jnp.where(cand_rep == pad_token_id, -100, cand_rep)
    dec_ids = _t5_shift_right(targets, pad_token_id, decoder_start_token_id)
    logits = t5_model.decode(params["lm"], cfg.text, dec_ids, enc_rep, mask_rep)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = targets != -100
    safe = jnp.where(valid, targets, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum(-1).reshape(B, C)


def encode_image_queries_instruct(
    params: Params, cfg: Blip2T5Config,
    images: jax.Array,
    qformer_text_ids: Optional[jax.Array] = None,
    qformer_text_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Text-conditioned query encoding (blip2_t5_instruct.py:312-386,
    qformer_text_input=True). 5-D video input [B, 3, F, H, W] encodes each
    frame and concatenates query outputs along the token axis (:328-359)."""
    if images.ndim == 5:
        frames = [
            encode_image_queries_instruct(
                params, cfg, images[:, :, j], qformer_text_ids, qformer_text_mask
            )
            for j in range(images.shape[2])
        ]
        return jnp.concatenate(frames, axis=1)
    feats = eva_vit.forward(params["visual"], cfg.vision, images)
    feats = layer_norm(
        feats, params["ln_vision"]["scale"], params["ln_vision"]["bias"],
        cfg.vision.layer_norm_eps,
    )
    B = images.shape[0]
    hidden = qformer.forward(
        params["qformer"], cfg.qformer, _queries(params, cfg, B),
        feats.astype(cfg.qformer.dtype),
        text_ids=qformer_text_ids, text_mask=qformer_text_mask,
    )[:, : cfg.num_query_tokens]
    w, b = params["proj"]["w"], params["proj"]["b"]
    return (
        jnp.einsum("...d,od->...o", hidden.astype(w.dtype), w, preferred_element_type=w.dtype)
        + b
    )


def t5_generate(
    params: Params,
    cfg: Blip2T5Config,
    images: jax.Array,
    prompt_ids: Sequence[Sequence[int]],
    *,
    max_new_tokens: int = 32,
    decoder_start_token_id: int = 0,
    eos_token_id: int = 1,
    qformer_text_ids: Optional[jax.Array] = None,
    qformer_text_mask: Optional[jax.Array] = None,
) -> List[List[int]]:
    """BLIP-2 T5 generation: [query embeds; prompt embeds] → T5 encoder →
    decoder greedy (reference blip2_t5 generate). With qformer_text_ids this
    is the instruct path (text-conditioned Q-Former, blip2_t5_instruct)."""
    from llava_align_tpu.models import t5 as t5_model

    B = images.shape[0]
    if qformer_text_ids is not None:
        q_emb = encode_image_queries_instruct(
            params, cfg, images, qformer_text_ids, qformer_text_mask
        )
    else:
        q_emb = encode_image_queries(params, cfg, images)  # [B, Q, D]
    Qtok = q_emb.shape[1]
    T = max(len(p) for p in prompt_ids)
    ids = np.zeros((B, T), np.int32)
    mask = np.zeros((B, Qtok + T), np.int32)
    mask[:, :Qtok] = 1
    for b, p in enumerate(prompt_ids):
        ids[b, : len(p)] = p
        mask[b, Qtok : Qtok + len(p)] = 1
    tok_emb = t5_model.embed_tokens(params["lm"], jnp.asarray(ids))
    enc_in = jnp.concatenate([q_emb.astype(tok_emb.dtype), tok_emb], axis=1)
    enc_hidden = t5_model.encode(params["lm"], cfg.text, enc_in, jnp.asarray(mask))
    return t5_model.generate_greedy(
        params["lm"], cfg.text, enc_hidden, jnp.asarray(mask),
        max_new_tokens=max_new_tokens,
        decoder_start_token_id=decoder_start_token_id,
        eos_token_id=eos_token_id,
    )
