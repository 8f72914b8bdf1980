"""ALPRO: video-text retrieval and QA (TimeSformer + fusion BERT).

Capability parity: the reference's vendored LAVIS ALPRO stack
(lavis/models/alpro_models/{alpro_retrieval.py, alpro_qa.py} on the
bert_config_alpro.json fusion BERT: fusion_layer=6, add_cross_attention=
FALSE — fusion is pure self-attention over the concatenated [text; video]
embedding sequence, not cross-attention). The reference's own experiments
never execute ALPRO (SURVEY §2.4); provided for zoo completeness.

TPU-first: reuses the shared MED machinery (models/blip.py) in text/fusion
modes; the in-batch VTC loss takes an optional `axis_name` so a
data-parallel shard_map run reproduces the reference's cross-GPU
all_gather_with_grad (alpro_retrieval.py:102-117) with a lax.all_gather
over the mesh instead of torch.distributed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.models.blip import MedConfig, med_forward
from llava_align_tpu.models.timesformer import TimeSformerConfig, forward_features
from llava_align_tpu.models import timesformer as tsf
from llava_align_tpu.ops.layers import (
    l2_normalize as _norm,
    linear_bias as _proj,
    sample_hard_negative_indices,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class AlproConfig:
    video: TimeSformerConfig = dataclasses.field(default_factory=TimeSformerConfig)
    # bert_config_alpro.json: 12 layers, fusion at 6, NO cross-attention
    text: MedConfig = dataclasses.field(
        default_factory=lambda: MedConfig(vocab_size=30522, fusion_layer=6)
    )
    embed_dim: int = 256
    num_classes: int = 0
    temp: float = 0.07

    @staticmethod
    def tiny(vocab_size: int = 64, num_classes: int = 0) -> "AlproConfig":
        return AlproConfig(
            video=TimeSformerConfig.tiny(),
            text=MedConfig(
                vocab_size=vocab_size, hidden_size=32, num_layers=4, num_heads=4,
                intermediate_size=64, max_position_embeddings=64, fusion_layer=2,
            ),
            embed_dim=16,
            num_classes=num_classes,
        )


def init(rng: jax.Array, cfg: AlproConfig, variant: str = "retrieval") -> Params:
    """variant ∈ {retrieval, qa}."""
    from llava_align_tpu.models.blip import med_init

    k1, k2, k3 = jax.random.split(rng, 3)
    D, E = cfg.text.hidden_size, cfg.embed_dim
    ks = iter(jax.random.split(k3, 6))

    def w(o, i):
        return (jax.random.normal(next(ks), (o, i), jnp.float32) / i**0.5).astype(cfg.text.dtype)

    p: Params = {"visual": tsf.init(k1, cfg.video), "text": med_init(k2, cfg.text)}
    if variant == "retrieval":
        p["vision_proj"] = {"w": w(E, cfg.video.hidden_size), "b": jnp.zeros((E,), cfg.text.dtype)}
        p["text_proj"] = {"w": w(E, D), "b": jnp.zeros((E,), cfg.text.dtype)}
        p["itm_head"] = {"w": w(2, D), "b": jnp.zeros((2,), cfg.text.dtype)}
        p["temp"] = jnp.asarray(cfg.temp, jnp.float32)
    if variant == "qa":
        if cfg.num_classes < 2:
            raise ValueError(f"num_classes must be >1 for qa, got {cfg.num_classes}")
        # Linear(D, 2D) → ReLU → Linear(2D, C) (alpro_qa.py:41-45)
        p["classifier"] = {
            "fc1": {"w": w(2 * D, D), "b": jnp.zeros((2 * D,), cfg.text.dtype)},
            "fc2": {"w": w(cfg.num_classes, 2 * D), "b": jnp.zeros((cfg.num_classes,), cfg.text.dtype)},
        }
    return p




def encode_text(params: Params, cfg: AlproConfig, ids, mask) -> jax.Array:
    """forward_text: pre-fusion layers only (alpro_qa.py:71-77)."""
    return med_forward(params["text"], cfg.text, ids, mask, mode="text")


def encode_video(params: Params, cfg: AlproConfig, video) -> jax.Array:
    """[B, 3, T, H, W] → frame-pooled [B, 1+N, D] (alpro_qa.py:80-84)."""
    return forward_features(params["visual"], cfg.video, video, pool_frames=True)


def fuse(
    params: Params, cfg: AlproConfig,
    text_embeds, text_mask, video_embeds,
) -> jax.Array:
    """Fusion layers over the concatenated [text; video] sequence
    (alpro_qa.py:87-96, alpro_retrieval.py:155-165) → [B, St+Sv, D]."""
    video_mask = jnp.ones(video_embeds.shape[:2], jnp.int32)
    emb = jnp.concatenate([text_embeds, video_embeds], axis=1)
    mask = jnp.concatenate([text_mask, video_mask], axis=1)
    return med_forward(
        params["text"], cfg.text, None, mask, mode="fusion", input_embeds=emb
    )


# ---------------------------------------------------------------------------
# QA
# ---------------------------------------------------------------------------


def qa_logits(params: Params, cfg: AlproConfig, video, ids, mask) -> jax.Array:
    """alpro_qa.py:65-96 → [B, num_classes]."""
    text_embeds = encode_text(params, cfg, ids, mask)
    video_embeds = encode_video(params, cfg, video)
    h = fuse(params, cfg, text_embeds, mask, video_embeds)
    c = params["classifier"]
    return _proj(jax.nn.relu(_proj(h[:, 0], c["fc1"])), c["fc2"])


def qa_loss(
    params: Params, cfg: AlproConfig, video, ids, mask, targets
) -> Tuple[jax.Array, jax.Array]:
    logits = qa_logits(params, cfg, video, ids, mask)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0].mean()
    return ce, logits


# ---------------------------------------------------------------------------
# retrieval
# ---------------------------------------------------------------------------


def vtc_features(
    params: Params, cfg: AlproConfig,
    video: Optional[jax.Array] = None,
    ids: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    out: Dict[str, jax.Array] = {}
    if video is not None:
        ve = encode_video(params, cfg, video)
        out["video_embeds"] = ve
        out["video_feat"] = _norm(_proj(ve[:, 0], params["vision_proj"]))
    if ids is not None:
        te = encode_text(params, cfg, ids, mask)
        out["text_embeds"] = te
        out["text_feat"] = _norm(_proj(te[:, 0], params["text_proj"]))
    return out


def retrieval_train_step(
    params: Params, cfg: AlproConfig, rng: jax.Array,
    video: jax.Array, ids: jax.Array, mask: jax.Array,
    *,
    axis_name: Optional[str] = None,
) -> Dict[str, jax.Array]:
    """One ALPRO retrieval forward (alpro_retrieval.py:65-149): in-batch VTC
    + VTM with in-batch hard negatives. Under shard_map with `axis_name`,
    features are all-gathered across the data axis — the TPU-native
    counterpart of the reference's all_gather_with_grad."""
    temp = jnp.clip(params["temp"], 0.001, 0.5)
    feats = vtc_features(params, cfg, video=video, ids=ids, mask=mask)
    video_feat, text_feat = feats["video_feat"], feats["text_feat"]
    b = video_feat.shape[0]

    if axis_name is not None:
        g_video = jax.lax.all_gather(video_feat, axis_name, tiled=True)
        g_text = jax.lax.all_gather(text_feat, axis_name, tiled=True)
        rank = jax.lax.axis_index(axis_name)
    else:
        g_video, g_text = video_feat, text_feat
        rank = jnp.zeros((), jnp.int32)

    sim_v2t = video_feat @ g_text.T / temp
    sim_t2v = text_feat @ g_video.T / temp
    targets = jnp.zeros_like(sim_v2t)
    targets = jax.lax.dynamic_update_slice(
        targets, jnp.eye(b, dtype=targets.dtype), (0, rank * b)
    )
    loss_v2t = -(jax.nn.log_softmax(sim_v2t, axis=1) * targets).sum(1).mean()
    loss_t2v = -(jax.nn.log_softmax(sim_t2v, axis=1) * targets).sum(1).mean()
    vtc = (loss_v2t + loss_t2v) / 2

    # VTM with in-batch hard negatives (alpro_retrieval.py:150-240)
    text_embeds, video_embeds = feats["text_embeds"], feats["video_embeds"]
    pos = fuse(params, cfg, text_embeds, mask, video_embeds)
    local_v2t = jax.lax.dynamic_slice(sim_v2t, (0, rank * b), (b, b))
    local_t2v = jax.lax.dynamic_slice(sim_t2v, (0, rank * b), (b, b))
    eye = jnp.eye(b, dtype=bool)
    w_v2t = jax.nn.softmax(jnp.where(eye, -jnp.inf, local_v2t), axis=1)
    w_t2v = jax.nn.softmax(jnp.where(eye, -jnp.inf, local_t2v), axis=1)
    k1, k2 = jax.random.split(rng)
    neg_vid = sample_hard_negative_indices(k1, w_t2v)
    neg_txt = sample_hard_negative_indices(k2, w_v2t)

    text_all = jnp.concatenate([text_embeds, text_embeds[neg_txt]], axis=0)
    mask_all = jnp.concatenate([mask, mask[neg_txt]], axis=0)
    video_all = jnp.concatenate([video_embeds[neg_vid], video_embeds], axis=0)
    neg = fuse(params, cfg, text_all, mask_all, video_all)
    vl = jnp.concatenate([pos[:, 0], neg[:, 0]], axis=0)
    vtm_logits = _proj(vl, params["itm_head"])
    vtm_labels = jnp.concatenate(
        [jnp.ones((b,), jnp.int32), jnp.zeros((2 * b,), jnp.int32)]
    )
    logp = jax.nn.log_softmax(vtm_logits, axis=-1)
    vtm = -jnp.take_along_axis(logp, vtm_labels[:, None], axis=-1).mean()
    return {"loss": vtc + vtm, "loss_vtc": vtc, "loss_vtm": vtm}


def compute_sim_matrix(
    params: Params, cfg: AlproConfig,
    videos: jax.Array,       # [Nv, 3, T, H, W]
    text_ids: jax.Array,     # [Nt, S]
    text_mask: jax.Array,    # [Nt, S]
    *,
    k_test: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(scores_v2t, scores_t2v): VTC similarity, top-k_test re-ranked by the
    VTM head on fused pairs (alpro_retrieval.py:242-396)."""
    feats = vtc_features(params, cfg, video=videos, ids=text_ids, mask=text_mask)
    sims = np.asarray(feats["video_feat"]) @ np.asarray(feats["text_feat"]).T
    if k_test <= 0:
        return sims, sims.T
    video_embeds = feats["video_embeds"]
    text_embeds = feats["text_embeds"]

    vtm = jax.jit(
        lambda p, te, tm, ve: _proj(fuse(p, cfg, te, tm, ve)[:, 0], p["itm_head"])[:, 1]
    )
    Nv, Nt = sims.shape
    k = min(k_test, Nt)
    v2t = np.full_like(sims, -100.0)
    tmask = np.asarray(text_mask)
    for i in range(Nv):
        topk = np.argsort(sims[i])[::-1][:k]
        score = np.asarray(vtm(
            params, text_embeds[np.asarray(topk)], jnp.asarray(tmask[topk]),
            jnp.repeat(video_embeds[i : i + 1], k, axis=0),
        ))
        v2t[i, topk] = sims[i, topk] + score
    kt = min(k_test, Nv)
    t2v = np.full_like(sims.T, -100.0)
    for t in range(Nt):
        topk = np.argsort(sims[:, t])[::-1][:kt]
        score = np.asarray(vtm(
            params,
            jnp.repeat(text_embeds[t : t + 1], kt, axis=0),
            jnp.repeat(jnp.asarray(tmask[t : t + 1]), kt, axis=0),
            video_embeds[np.asarray(topk)],
        ))
        t2v[t, topk] = sims[topk, t] + score
    return v2t, t2v
