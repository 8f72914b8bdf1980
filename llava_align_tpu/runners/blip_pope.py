"""InstructBLIP POPE runner.

Capability parity: experiments/eval/calibrate/blip_calibrate.py — prompt
'{q} Please answer this question with one word.' (:43,76), nucleus sampling
num_beams=1 (:45,85), VCD via diffusion-noised image whose Q-Former embedding
stream is the contrast branch, content-free scoring runs for noise/none dumps
(:37-54,95+).
"""

from __future__ import annotations

import argparse
import os
import zlib

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.calibrate.posthoc import calibrate_label_dict, get_prob_from_logits
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding.adapters import InstructBlipAdapter
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import instructblip
from llava_align_tpu.models.instructblip import InstructBlipConfig
from llava_align_tpu.ops.noise import add_diffusion_noise
from llava_align_tpu.runners.common import (
    AnswerFile,
    MockTokenizer,
    load_questions_for,
    make_generation_config,
)


def load_blip_model(model_path: str):
    if model_path.startswith("random:"):
        cfg = InstructBlipConfig.tiny()
        params = instructblip.init(jax.random.PRNGKey(0), cfg)
        return MockTokenizer(), MockTokenizer(), params, cfg, "random-instructblip"
    from transformers import AutoTokenizer, BertTokenizer

    from llava_align_tpu.utils.hf_convert import convert_instructblip, load_state_dict

    cfg = InstructBlipConfig.vicuna7b()
    sd = load_state_dict(os.path.expanduser(model_path))
    params = convert_instructblip(sd, cfg)
    llm_tok = AutoTokenizer.from_pretrained(
        os.path.join(model_path, "llm_tokenizer"), use_fast=False
    )
    bert_tok = BertTokenizer.from_pretrained(os.path.join(model_path, "bert_tokenizer"))
    return llm_tok, bert_tok, params, cfg, "instructblip-vicuna7b"


def run(args) -> str:
    from llava_align_tpu.runners.common import apply_dist_auto, finish_dist_auto

    # --dist auto FIRST: jax.distributed.initialize must precede backend init
    apply_dist_auto(args)
    llm_tok, bert_tok, params, cfg, model_name = load_blip_model(args.model_path)
    questions = load_questions_for(args)
    if args.max_questions:
        questions = questions[: args.max_questions]
    ans = AnswerFile(args.answers_file, resume=args.resume)

    gen = make_generation_config(args, eos_token_id=2)
    adapter = InstructBlipAdapter(cfg)
    engine = DecodeEngine(params, cfg, gen, adapter=adapter, bucket=32)
    score_engine = None
    if args.calibrate:
        score_gen = make_generation_config(
            args, eos_token_id=2, use_cd=False, use_dd=False, use_dd_unk=False,
            max_new_tokens=1,
        )
        score_engine = DecodeEngine(params, cfg, score_gen, adapter=adapter, bucket=32)

    encode_jit = jax.jit(
        lambda p, img, tid, tmask: instructblip.encode(p, cfg, img, tid, tmask)
    )

    def encode_feats(image_np, prompt_text, noise_rng=None, noise_step=None):
        imgs = jnp.asarray(image_np, cfg.vision.dtype)[None]
        if noise_rng is not None:
            imgs = add_diffusion_noise(imgs, noise_rng, noise_step)
        # Q-Former instruction conditioning (blip2_vicuna_instruct.py:286-296;
        # the reference tokenizes with truncation=True, max_length=
        # max_txt_len=128 and keeps the trailing [SEP]); also cap at the
        # Q-Former's own position table (text positions start at 0)
        max_txt = min(
            int(getattr(cfg, "max_txt_len", 128)),
            cfg.qformer.max_position_embeddings,
        )
        raw = [int(t) for t in bert_tok(prompt_text).input_ids]
        if len(raw) > max_txt:
            raw = raw[: max_txt - 1] + [raw[-1]]
        # bucket the instruction length so encode_jit compiles once per
        # 32-bucket, not once per distinct prompt length (mask zeros pad)
        pad = min(-(-len(raw) // 32) * 32, max_txt)
        pad = max(pad, len(raw))
        tid = np.zeros((1, pad), np.int32)
        tid[0, : len(raw)] = raw
        tmask = np.zeros_like(tid)
        tmask[0, : len(raw)] = 1
        # stays a DEVICE array: fetching it to host (np.asarray) would block
        # per question and round-trip the features through the tunnel
        return encode_jit(params, imgs, jnp.asarray(tid), jnp.asarray(tmask))

    def _submit(line):
        """Queue every device call for one question; nothing blocks."""
        idx = line["question_id"]
        q = line["text"]
        prompt = q + " Please answer this question with one word."
        ids = [IMAGE_TOKEN_INDEX] + list(llm_tok(prompt).input_ids)
        image = _load_image(args, line.get("image", ""), cfg)
        rng = jax.random.PRNGKey(args.seed + (zlib.crc32(str(idx).encode()) % 65536))

        feats = encode_feats(image, prompt)
        if gen.use_cd:
            rng, rng_noise = jax.random.split(rng)
            feats_cd = encode_feats(image, prompt, rng_noise, gen.noise_step)
            feats = jnp.concatenate([feats, feats_cd], axis=0)

        handles = {"main": engine.submit_generate(ids, None, rng=rng, precomputed_feats=feats)}
        if score_engine is not None:
            # 'none' = text-only (use_image=False path, blip_calibrate.py:95);
            # dummy feats — no sentinel in the ids, so never gathered
            dummy = np.zeros((1, 1, feats.shape[-1]), np.float32)
            handles["none"] = score_engine.submit_generate(
                ids[1:], None, rng=rng, precomputed_feats=dummy
            )
            # 'noise' = pure-noise image (noise_step=999, blip_calibrate.py:94)
            rng, rng999 = jax.random.split(rng)
            feats_noise = encode_feats(image, prompt, rng999, 999)
            handles["noise"] = score_engine.submit_generate(
                ids, None, rng=rng, precomputed_feats=feats_noise
            )
        return line, handles

    def _finish(line, handles):
        out = engine.collect_generate(handles["main"])
        tokens_naive = calibrate_label_dict(
            out.first_scores_top_probs, out.first_scores_top_ids, llm_tok
        )
        record = {
            "question_id": line["question_id"],
            "prompt": line["text"],
            "text": llm_tok.decode(out.token_ids, skip_special_tokens=True).strip(),
            "model_id": model_name,
            "image": line.get("image", ""),
            "logits_score": get_prob_from_logits(tokens_naive),
            "naive": tokens_naive,
            "metadata": {},
        }
        for name in ("none", "noise"):
            if name in handles:
                o = score_engine.collect_generate(handles[name])
                record[name] = calibrate_label_dict(
                    o.first_scores_top_probs, o.first_scores_top_ids, llm_tok
                )
        ans.write(record)

    # one question in flight: all of q+1's device calls (Q-Former encodes +
    # main + content-free scores) queue while q's outputs are collected
    in_flight = None
    for line in questions:
        if ans.is_done(line["question_id"], line.get("text")):
            continue
        try:
            entry = _submit(line)
        except BaseException:
            if in_flight is not None:  # don't lose the decoded answer
                _finish(*in_flight)
                in_flight = None
            raise
        if in_flight is not None:
            _finish(*in_flight)
        in_flight = entry
    if in_flight is not None:
        _finish(*in_flight)
    ans.close()
    return finish_dist_auto(args)


def _load_image(args, image_file: str, cfg) -> np.ndarray:
    from llava_align_tpu.ops.image import clip_preprocess_pil

    path = os.path.join(args.image_folder, image_file) if args.image_folder else image_file
    if os.path.exists(path):
        from PIL import Image

        return clip_preprocess_pil(Image.open(path), cfg.vision.image_size)
    if not args.synthetic_images:
        raise FileNotFoundError(path)
    rng = np.random.default_rng(zlib.crc32(image_file.encode()))
    raw = rng.integers(0, 256, (cfg.vision.image_size, cfg.vision.image_size, 3), dtype=np.uint8)
    from PIL import Image

    return clip_preprocess_pil(Image.fromarray(raw), cfg.vision.image_size)


def build_parser() -> argparse.ArgumentParser:
    from llava_align_tpu.runners.pope import build_parser as base

    return base()


if __name__ == "__main__":
    run(build_parser().parse_args())
