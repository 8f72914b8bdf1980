"""Image-captioning runner: InstructBLIP / BLIP-2 beam-search captions via
the CaptionTask orchestration.

Capability parity: LAVIS's caption evaluation flow
(reference lavis/tasks/captioning.py valid_step → model.generate with
num_beams/max_len/min_len, blip2_vicuna_instruct.py:241-418 generate with
num_beams=5 default). Decoding uses the engine's TPU-native beam search
(decoding/beam.py, HF-exact semantics).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding.adapters import InstructBlipAdapter
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.framework.tasks import CaptionTask
from llava_align_tpu.models import instructblip
from llava_align_tpu.runners.blip_pope import _load_image, load_blip_model
from llava_align_tpu.runners.common import load_questions_for


def run(args) -> str:
    from llava_align_tpu.config import GenerationConfig

    llm_tok, bert_tok, params, cfg, model_name = load_blip_model(args.model_path)
    questions = load_questions_for(args)
    if args.max_questions:
        questions = questions[: args.max_questions]

    gen = GenerationConfig(
        max_new_tokens=args.max_len, do_sample=False, eos_token_id=2,
        pad_token_id=0,
    )
    adapter = InstructBlipAdapter(cfg)
    engine = DecodeEngine(params, cfg, gen, adapter=adapter, bucket=32)
    encode_jit = jax.jit(
        lambda p, img, tid, tmask: instructblip.encode(p, cfg, img, tid, tmask)
    )

    def generate_fn(params_unused, sample, **kw):
        image = _load_image(args, sample["image"], cfg)
        # instruction-conditioned Q-Former stream, then LLM beam decode
        prompt = args.prompt
        tid = np.asarray(bert_tok(prompt).input_ids, np.int32)[None]
        feats = np.asarray(
            encode_jit(
                params, jnp.asarray(image, cfg.vision.dtype)[None],
                jnp.asarray(tid), jnp.ones_like(jnp.asarray(tid)),
            )
        )
        ids = [IMAGE_TOKEN_INDEX] + list(llm_tok(prompt).input_ids)
        out = engine.generate_beam(
            ids, num_beams=kw.get("num_beams", args.num_beams),
            length_penalty=args.length_penalty,
            min_new_tokens=kw.get("min_length", args.min_len),
            precomputed_feats=feats,
        )
        return [llm_tok.decode(out.token_ids, skip_special_tokens=True).strip()]

    task = CaptionTask(
        generate_fn=generate_fn, num_beams=args.num_beams, max_len=args.max_len,
        min_len=args.min_len, result_dir=args.result_dir,
    )
    samples = [
        {"image_id": [q.get("image_id", q.get("question_id", i))], "image": q["image"]}
        for i, q in enumerate(questions)
    ]

    # CaptionTask.valid_step reads sample["image_id"]; generate_fn needs the
    # image path — pass the full sample through
    def wrapped_valid(params_, sample):
        caps = generate_fn(params_, sample)
        from llava_align_tpu.framework.tasks import _coerce_id

        return [{"caption": caps[0], "image_id": _coerce_id(sample["image_id"][0])}]

    task.valid_step = wrapped_valid
    results = task.evaluation(params, samples, log_freq=args.log_freq)
    metrics = task.after_evaluation(results, split_name=args.split, epoch=0)
    print(metrics)
    return args.result_dir


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--question-file", required=True,
                   help="jsonl rows with {image, image_id?}")
    p.add_argument("--image-folder", default="")
    p.add_argument("--result-dir", default="results")
    p.add_argument("--split", default="val")
    p.add_argument("--prompt", default="A short image description:")
    p.add_argument("--num-beams", type=int, default=5)
    p.add_argument("--max-len", dest="max_len", type=int, default=30)
    p.add_argument("--min-len", dest="min_len", type=int, default=8)
    p.add_argument("--length-penalty", type=float, default=1.0)
    p.add_argument("--num-chunks", type=int, default=1)
    p.add_argument("--chunk-idx", type=int, default=0)
    p.add_argument("--max-questions", type=int, default=0)
    p.add_argument("--log-freq", type=int, default=10)
    p.add_argument("--synthetic-images", action="store_true", default=False)
    return p


if __name__ == "__main__":
    run(build_parser().parse_args())
