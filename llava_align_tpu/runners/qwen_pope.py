"""Qwen-VL POPE runner.

Capability parity: experiments/eval/calibrate/qwen_calibrate.py — prompt
format '<img>{path}</img>{question} Answer:' (:41,100), content-free variants
'none' = '{q} Answer:' and 'unk' = 'None {q} Answer:' (:34-39), eod stopping,
max_new_tokens=20 (:47,115), VCD via diffusion-noised images.
"""

from __future__ import annotations

import argparse
import os
import zlib

import jax
import numpy as np

from llava_align_tpu.calibrate.posthoc import calibrate_label_dict, get_prob_from_logits
from llava_align_tpu.decoding.adapters import QwenVLAdapter
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import qwen_vl as qwen_vl_model
from llava_align_tpu.models.qwen_vl import QwenVLConfig
from llava_align_tpu.runners.common import (
    AnswerFile,
    MockTokenizer,
    load_questions_for,
    make_generation_config,
)


class QwenMockTokenizer(MockTokenizer):
    eod_id = 2


def load_qwen_model(model_path: str):
    import jax.numpy as jnp

    if model_path.startswith("random:"):
        cfg = QwenVLConfig.tiny()
        # not jitted: init interpolates pos embeds with host numpy
        params = qwen_vl_model.init(jax.random.PRNGKey(0), cfg)
        return QwenMockTokenizer(), params, cfg, "random-qwen-vl"
    from llava_align_tpu.utils.hf_convert import load_qwen_vl_checkpoint

    params, cfg = load_qwen_vl_checkpoint(os.path.expanduser(model_path))
    vocab_file = os.path.join(os.path.expanduser(model_path), "qwen.tiktoken")
    if os.path.exists(vocab_file):
        # native offline tokenizer (models/qwen_tokenizer.py) — no
        # trust_remote_code download of the reference tokenization_qwen.py
        from llava_align_tpu.models.qwen_tokenizer import QwenTokenizer

        tok = QwenTokenizer(vocab_file)
    else:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_path, trust_remote_code=True)
    name = "qwen-vl" if "Chat" not in model_path else "qwen-vl-chat"
    return tok, params, cfg, name


def _text_ids(tokenizer, text: str):
    return list(tokenizer(text).input_ids)


def run(args) -> str:
    from llava_align_tpu.runners.common import apply_dist_auto, finish_dist_auto

    # --dist auto FIRST: jax.distributed.initialize must precede backend init
    apply_dist_auto(args)
    tokenizer, params, cfg, model_name = load_qwen_model(args.model_path)
    quant = getattr(args, "quant", "none")
    act_quant = quant == "w8a8"  # int8 weights + W8A8 prefill (ops/quant)
    if act_quant:
        quant = "int8"
    if quant == "int4":
        raise ValueError(
            "qwen int4 is unsupported: the 13696-wide FFN is not 256-aligned "
            "for split-half int4 packing; use --quant int8"
        )
    if quant == "int8":
        # int8 weight-only serving for the Qwen decoder (ops/quant; the
        # visual tower stays bf16 — it runs once per group, not per token)
        from llava_align_tpu.ops.quant import quantize_qwen_params

        params = dict(params, qwen=quantize_qwen_params(params["qwen"]))
    eod = getattr(tokenizer, "eod_id", getattr(tokenizer, "eos_token_id", 2))
    questions = load_questions_for(args)
    if args.max_questions:
        questions = questions[: args.max_questions]
    ans = AnswerFile(args.answers_file, resume=args.resume)

    gen = make_generation_config(args, eos_token_id=eod, max_new_tokens=args.max_new_tokens)
    adapter = QwenVLAdapter(cfg)
    engine = DecodeEngine(params, cfg, gen, adapter=adapter, bucket=64,
                          act_quant=act_quant)
    score_engine = None
    if args.calibrate:
        score_gen = make_generation_config(
            args, eos_token_id=eod, use_cd=False, use_dd=False, use_dd_unk=False,
            max_new_tokens=1,
        )
        score_engine = DecodeEngine(params, cfg, score_gen, adapter=adapter,
                                    bucket=64, act_quant=act_quant)

    span = qwen_vl_model.make_image_span_ids(cfg)

    def prompt_ids(q: str):
        # main prompt: '<img>{path}</img>{q} Answer:' — span first, then text
        sent_ids, _ = qwen_vl_model.sentinelize_span(
            span + _text_ids(tokenizer, f"{q} Answer:"), cfg
        )
        # 'unk' branch = 'None {q} Answer:' — needs tokenizer text, passed as
        # an explicit branch override (qwen_calibrate.py:37)
        branch_ids = {}
        if gen.use_dd_unk:
            branch_ids["unk"] = _text_ids(tokenizer, f"None {q} Answer:")
        return sent_ids, branch_ids

    # consecutive same-image questions share the [<img> span] prefix KV —
    # the span is 256+ of the prompt's ~270 tokens, so the grouped path
    # prefills the image once per POPE group of 6 (engine shared-prefix
    # design; same grouping as runners/pope.py)
    group_by_image = (
        getattr(args, "group_by_image", True)
        and getattr(adapter, "supports_shared_prefix", False)
    )
    pending = [l for l in questions if not ans.is_done(l["question_id"], l.get("text"))]
    groups: list = []
    for l in pending:
        if (
            group_by_image
            and groups
            and len(groups[-1]) < 6
            and groups[-1][-1].get("image", "") == l.get("image", "")
        ):
            groups[-1].append(l)
        else:
            groups.append([l])

    from llava_align_tpu.constants import IMAGE_TOKEN_INDEX

    def write_group(group, outs, rng):
        for line, out in zip(group, outs):
            q = line["text"]
            text = tokenizer.decode(out.token_ids, skip_special_tokens=True).strip()
            tokens_naive = calibrate_label_dict(
                out.first_scores_top_probs, out.first_scores_top_ids, tokenizer
            )
            record = {
                "question_id": line["question_id"],
                "prompt": q,
                "text": text,
                "model_id": model_name,
                "image": line.get("image", ""),
                "logits_score": get_prob_from_logits(tokens_naive),
                "naive": tokens_naive,
                "metadata": {},
            }
            if score_engine is not None:
                out_none = score_engine.generate(
                    _text_ids(tokenizer, f"{q} Answer:"), None, rng=rng
                )
                record["none"] = calibrate_label_dict(
                    out_none.first_scores_top_probs, out_none.first_scores_top_ids, tokenizer
                )
                out_unk = score_engine.generate(
                    _text_ids(tokenizer, f"None {q} Answer:"), None, rng=rng
                )
                record["unk"] = calibrate_label_dict(
                    out_unk.first_scores_top_probs, out_unk.first_scores_top_ids, tokenizer
                )
            ans.write(record)

    def make_split(group, image):
        """(prefix, suffixes, image, bids_list) for the grouped engine path,
        or None when the group can't share a prefix."""
        prepped = [prompt_ids(l["text"]) for l in group]
        ids_list = [ids for ids, _ in prepped]
        if len(group) < 2:
            return None, prepped
        p = DecodeEngine.common_token_prefix(ids_list)
        prefix = ids_list[0][:p]
        if IMAGE_TOKEN_INDEX not in prefix:
            return None, prepped
        return (
            prefix, [ids[p:] for ids in ids_list], image,
            [b for _, b in prepped],
        ), prepped

    # multi-group batching + one in-flight call (same layout as runners/
    # pope.py): GB uniform-size image-groups per jitted call, submit g+1
    # before collecting g so host prep + input transfer overlap device
    # execution. Qwen's auto pick is GB=1 at int8: measured 28.6 samples/s
    # at GB=1 vs 21.3 at GB=2 on Qwen-7B (scripts/bench_qwen_grouped.py) —
    # the MHA cache's 4x-per-token KV traffic makes bigger working sets
    # lose. W8A8 flips that (prefill compute shrinks 1.4x): 41.1/s at GB=2
    # vs 29.6 at GB=1, so the auto pick is 2 there.
    GB = max(1, getattr(args, "group_batch", 0) or (2 if act_quant else 1))
    batches, cur = [], []
    for g in groups:
        if cur and (len(g) != len(cur[0]) or len(cur) >= GB):
            batches.append(cur)
            cur = []
        cur.append(g)
    if cur:
        batches.append(cur)

    in_flight = None  # (groups, rng, handle)

    def _flush_pending():
        nonlocal in_flight
        if in_flight is None:
            return
        gl, rng_p, handle = in_flight
        in_flight = None
        outs = engine.collect_batch_groups(handle)
        off = 0
        for g in gl:
            write_group(g, outs[off : off + len(g)], rng_p)
            off += len(g)

    gi = 0
    for batch in batches:
        rng = jax.random.PRNGKey(args.seed + (gi % 65536))
        gi += len(batch)
        images = [_load_image(args, g[0].get("image", ""), cfg) for g in batch]
        splits = [make_split(g, im) for g, im in zip(batch, images)]
        if all(sp is not None for sp, _ in splits):
            handle = engine.submit_batch_groups(
                [sp for sp, _ in splits], rng=rng
            )
            _flush_pending()  # collect the previous call while this one runs
            in_flight = (batch, rng, handle)
            continue
        _flush_pending()
        for g, im, (sp, prepped) in zip(batch, images, splits):
            if sp is not None:
                outs = engine.collect_batch_groups(
                    engine.submit_batch_groups([sp], rng=rng)
                )
            else:
                outs = [
                    engine.generate(ids, im, rng=rng, branch_ids=b)
                    for ids, b in prepped
                ]
            write_group(g, outs, rng)

    _flush_pending()
    ans.close()
    return finish_dist_auto(args)


def _load_image(args, image_file: str, cfg) -> np.ndarray:
    from llava_align_tpu.ops.image import qwen_preprocess_pil

    path = os.path.join(args.image_folder, image_file) if args.image_folder else image_file
    if os.path.exists(path):
        from PIL import Image

        return qwen_preprocess_pil(Image.open(path), cfg.vision.image_size)
    if not args.synthetic_images:
        raise FileNotFoundError(path)
    rng = np.random.default_rng(zlib.crc32(image_file.encode()))
    raw = rng.integers(0, 256, (cfg.vision.image_size, cfg.vision.image_size, 3), dtype=np.uint8)
    from PIL import Image

    return qwen_preprocess_pil(Image.fromarray(raw), cfg.vision.image_size)


def build_parser() -> argparse.ArgumentParser:
    from llava_align_tpu.runners.pope import build_parser as base

    p = base()
    p.set_defaults(max_new_tokens=20)  # qwen_calibrate.py:47
    return p


if __name__ == "__main__":
    run(build_parser().parse_args())
