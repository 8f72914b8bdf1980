"""Bias probe: first-token class distributions under meaningless visual inputs.

Capability parity: experiments/eval/calibrate/test_samples_llava.py:82-160
(the Figs 1/10 probes): for each probe question, dump the model's top-k
first-token distribution under inputs none / unk / pure-noise(999) / zeros /
ones (and the real image when provided).
"""

from __future__ import annotations

import argparse

import zlib

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.calibrate.posthoc import calibrate_label_dict
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.ops.noise import add_diffusion_noise
from llava_align_tpu.runners.common import (
    AnswerFile,
    build_prompt,
    load_image_tensor,
    load_model,
    load_questions_for,
    make_generation_config,
)
from llava_align_tpu.tokenization import keyword_token_ids, tokenizer_image_token


def run(args) -> str:
    model = load_model(args.model_path)
    tokenizer, params, cfg = model.tokenizer, model.params, model.cfg
    questions = load_questions_for(args)
    if args.max_questions:
        questions = questions[: args.max_questions]
    ans = AnswerFile(args.answers_file, resume=args.resume)

    gen = make_generation_config(
        args, use_cd=False, use_dd=False, use_dd_unk=False, max_new_tokens=1
    )
    _, stop_str = build_prompt("x", args.conv_mode)
    engine = DecodeEngine(
        params, cfg, gen, stop_keyword_ids=keyword_token_ids([stop_str], tokenizer)
    )
    H = cfg.vision.image_size

    def dump(input_ids, image, rng):
        out = engine.generate(input_ids, image, rng=rng)
        return calibrate_label_dict(
            out.first_scores_top_probs, out.first_scores_top_ids, tokenizer, top_k=args.probe_top_k
        )

    for line in questions:
        idx = line["question_id"]
        if ans.is_done(idx, line.get("text")):
            continue
        qs = line["text"]
        rng = jax.random.PRNGKey(args.seed + (zlib.crc32(str(idx).encode()) % 65536))

        p_img, _ = build_prompt(qs, args.conv_mode, with_image=True, one_word=args.one_word)
        p_txt, _ = build_prompt(qs, args.conv_mode, with_image=False, one_word=args.one_word)
        ids_img = tokenizer_image_token(p_img, tokenizer)
        ids_txt = tokenizer_image_token(p_txt, tokenizer)
        ids_unk = [
            getattr(tokenizer, "unk_token_id", 0) if t == -200 else t for t in ids_img
        ]

        record = {"question_id": idx, "prompt": qs}
        record["none"] = dump(ids_txt, None, rng)
        record["unk"] = dump(ids_unk, None, rng)
        zeros = np.zeros((3, H, H), np.float32)
        record["zero"] = dump(ids_img, zeros, rng)
        record["one"] = dump(ids_img, np.ones((3, H, H), np.float32), rng)
        rng, rn = jax.random.split(rng)
        noise = np.asarray(
            add_diffusion_noise(jnp.zeros((3, H, H), jnp.float32), rn, 999)
        )
        record["noise"] = dump(ids_img, noise, rng)

        if line.get("image") and (args.image_folder or args.synthetic_images):
            image = load_image_tensor(
                args.image_folder, line["image"], image_size=H,
                image_aspect_ratio=args.image_aspect_ratio,
                synthetic_ok=args.synthetic_images,
            )
            record["naive"] = dump(ids_img, image, rng)
        ans.write(record)
    ans.close()
    return args.answers_file


def build_parser() -> argparse.ArgumentParser:
    from llava_align_tpu.runners.pope import build_parser as base

    p = base()
    p.add_argument("--probe-top-k", type=int, default=10)
    return p


if __name__ == "__main__":
    run(build_parser().parse_args())
