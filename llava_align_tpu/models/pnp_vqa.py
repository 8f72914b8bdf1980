"""PnP-VQA: plug-and-play zero-shot VQA (GradCAM → captions → FiD QA).

Capability parity: the reference's vendored LAVIS PNPVQA
(lavis/models/pnp_vqa_models/pnp_vqa.py + pnp_unifiedqav2_fid.py): a
three-stage training-free pipeline — (1) GradCAM patch relevance from a
BLIP-ITM model (forward_itm, :54-82), (2) stochastic captioning over
gradcam-sampled patch subsets with substring dedup until `num_captions`
per image (forward_cap, :84-172), (3) Fusion-in-Decoder QA with
UnifiedQAv2-T5: each question+caption context is encoded separately and the
decoder attends over the concatenated encoder states
(pnp_unifiedqav2_fid.py:20-66, forward_qa :174-230). The reference's own
experiments never execute PnP-VQA (SURVEY §2.4); provided for zoo
completeness.

TPU-first: patch subsets are drawn without replacement via vectorized
Gumbel top-k (one jit-able op per round, replacing the reference's
per-image torch.multinomial loop); FiD is a reshape — T5 cross-attention
carries no relative position bias, so concatenating per-context encoder
states is exact.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.models import blip as blip_mod
from llava_align_tpu.models import t5 as t5_mod
from llava_align_tpu.models.blip import BlipConfig
from llava_align_tpu.models.t5 import T5Config

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class PnpVqaConfig:
    itm: BlipConfig = dataclasses.field(default_factory=BlipConfig)
    cap: BlipConfig = dataclasses.field(default_factory=BlipConfig)
    qa: T5Config = dataclasses.field(default_factory=T5Config)
    block_num: int = 7  # cross-attention block for gradcam (pnp_vqa.py:54)

    @staticmethod
    def tiny(vocab_size: int = 64) -> "PnpVqaConfig":
        return PnpVqaConfig(
            itm=BlipConfig.tiny(vocab_size),
            cap=BlipConfig.tiny(vocab_size),
            qa=T5Config.tiny(vocab_size),
            block_num=1,
        )


def init(rng: jax.Array, cfg: PnpVqaConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "itm": blip_mod.init(k1, cfg.itm),
        "cap": blip_mod.init(k2, cfg.cap),
        "qa": t5_mod.init(k3, cfg.qa),
    }


def forward_itm(
    params: Params, cfg: PnpVqaConfig,
    pixels: jax.Array, q_ids: jax.Array, q_mask: jax.Array,
) -> jax.Array:
    """→ gradcams [B, N] (pnp_vqa.py:54-82)."""
    avg, _ = blip_mod.compute_gradcam(
        params["itm"], cfg.itm, pixels, q_ids, q_mask, block_num=cfg.block_num
    )
    return avg


def _sample_patches(rng: jax.Array, weights: jax.Array, num_patches: int) -> jax.Array:
    """[R, B, N] Gumbel top-k draw of `num_patches` patch indices without
    replacement per (round, image), sorted ascending — equivalent in
    distribution to the reference's torch.multinomial(replacement=False)
    (pnp_vqa.py:124-127)."""
    logw = jnp.log(jnp.clip(weights, 1e-20))
    g = -jnp.log(-jnp.log(jax.random.uniform(rng, weights.shape) + 1e-20) + 1e-20)
    _, idx = jax.lax.top_k(logw + g, num_patches)
    return jnp.sort(idx, axis=-1)


def forward_cap(
    params: Params, cfg: PnpVqaConfig,
    pixels: jax.Array,            # [B, 3, H, W]
    gradcams: jax.Array,          # [B, N]
    prompt_ids: Sequence[int],
    rng: jax.Array,
    *,
    num_captions: int = 100,
    num_patches: int = 20,
    cap_max_length: int = 20,
    cap_min_length: int = 0,
    top_k: int = 50,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    eos_token_id: int = 102,
    decode: Optional[Callable[[List[int]], str]] = None,
    max_rounds: int = 10,
) -> List[List[List[int]]]:
    """Stochastic captioning over gradcam-sampled patch subsets, deduped by
    substring containment (on decoded text when `decode` is given, token
    tuples otherwise) until every image has `num_captions`
    (pnp_vqa.py:117-172). Returns per-image lists of caption token ids."""
    enc = blip_mod.vit_forward(params["cap"]["visual"], cfg.cap.vision, pixels)
    B, _, D = enc.shape
    captions: List[List[List[int]]] = [[] for _ in range(B)]
    texts: List[List[str]] = [[] for _ in range(B)]

    for _ in range(max_rounds):
        if min(len(c) for c in captions) >= num_captions:
            break
        rng, k_sel, k_gen = jax.random.split(rng, 3)
        idx = _sample_patches(
            k_sel, jnp.broadcast_to(gradcams, (num_captions, B, gradcams.shape[-1])),
            num_patches,
        )                                             # [R, B, P]
        patch_states = jnp.take_along_axis(
            enc[None, :, 1:], idx[..., None], axis=2
        )                                             # [R, B, P, D] (skip cls, :125 +1)
        flat = patch_states.transpose(1, 0, 2, 3).reshape(B * num_captions, num_patches, D)
        outs = blip_mod.generate_caption_sampled(
            params["cap"], cfg.cap, flat, list(prompt_ids), k_gen,
            max_new_tokens=cap_max_length, min_new_tokens=cap_min_length,
            top_k=top_k, top_p=top_p, repetition_penalty=repetition_penalty,
            eos_token_id=eos_token_id,
        )
        for i, row in enumerate(outs):
            b = i // num_captions
            if len(captions[b]) >= num_captions:
                continue
            if decode is not None:
                text = decode(row)
                if any(text in prev for prev in texts[b]):
                    continue
                texts[b].append(text)
                captions[b].append(row)
            else:
                tup = tuple(row)
                if any(tup == tuple(prev) for prev in captions[b]):
                    continue
                captions[b].append(row)
    return captions


def fid_generate(
    params_qa: Params, cfg_qa: T5Config,
    context_ids: jax.Array,       # [n_ctx, S] tokenized question+caption contexts
    context_mask: jax.Array,      # [n_ctx, S]
    *,
    max_len: int = 20,
    min_len: int = 0,
    eos_token_id: int = 1,
    decoder_start_token_id: int = 0,
) -> List[int]:
    """Fusion-in-Decoder (pnp_unifiedqav2_fid.py:29-52): encode each context
    independently, concatenate the encoder states along sequence, decode
    once attending over all of them."""
    emb = t5_mod.embed_tokens(params_qa, context_ids)
    enc = t5_mod.encode(params_qa, cfg_qa, emb, context_mask)   # [n_ctx, S, D]
    n, S, D = enc.shape
    fused = enc.reshape(1, n * S, D)
    fused_mask = context_mask.reshape(1, n * S)
    out = t5_mod.generate_greedy(
        params_qa, cfg_qa, fused, fused_mask,
        max_new_tokens=max_len, eos_token_id=eos_token_id,
        decoder_start_token_id=decoder_start_token_id,
    )
    row = out[0]
    del min_len  # reference passes min_length=0 in every caller
    return row


def prepare_qa_input(
    question: str, captions: List[str],
    *,
    num_captions: int,
    num_captions_fid: int,
) -> List[str]:
    """pnp_vqa_models/__init__.py:11-29: group `num_captions_fid` captions
    per FiD context, each prefixed with the lower-cased question."""
    contexts = []
    acc = ""
    for cap_id, cap in enumerate(captions[:num_captions]):
        acc += cap.strip() + ". "
        last = (cap_id + 1) == num_captions
        if last or (cap_id + 1) % num_captions_fid == 0:
            contexts.append(
                question.lower().strip() + " \\n " + acc.lower().strip()
            )
            acc = ""
        if last:
            break
    return contexts


def predict_answers(
    params: Params, cfg: PnpVqaConfig,
    pixels: jax.Array,
    questions: List[str],
    *,
    tokenize_q: Callable[[List[str]], Any],     # → (ids, mask) for the ITM bert
    tokenize_ctx: Callable[[List[str]], Any],   # → (ids, mask) for the T5 QA model
    decode_cap: Callable[[List[int]], str],
    decode_ans: Callable[[List[int]], str],
    prompt_ids: Sequence[int],
    rng: jax.Array,
    num_captions: int = 50,
    num_captions_fid: int = 1,
    num_patches: int = 20,
    max_len: int = 20,
    **cap_kwargs,
):
    """Full pipeline (pnp_vqa.py predict_answers :232-318) →
    (answers, captions, gradcams)."""
    q_ids, q_mask = tokenize_q(questions)
    gradcams = forward_itm(params, cfg, pixels, jnp.asarray(q_ids), jnp.asarray(q_mask))
    cap_tokens = forward_cap(
        params, cfg, pixels, gradcams, prompt_ids, rng,
        num_captions=num_captions, num_patches=num_patches,
        decode=decode_cap, **cap_kwargs,
    )
    captions = [[decode_cap(row) for row in rows] for rows in cap_tokens]
    answers = []
    for b, question in enumerate(questions):
        contexts = prepare_qa_input(
            question, captions[b],
            num_captions=num_captions, num_captions_fid=num_captions_fid,
        )
        ids, mask = tokenize_ctx(contexts)
        ans_ids = fid_generate(
            params["qa"], cfg.qa, jnp.asarray(ids), jnp.asarray(mask),
            max_len=max_len,
        )
        answers.append(decode_ans(ans_ids))
    return answers, captions, np.asarray(gradcams)
