"""POPE answer-generation runner (VDD/VCD + Post-Hoc logit dumping).

Capability parity: experiments/eval/llava_naive.py (plain answers) and
experiments/eval/calibrate/llava_calibrate.py (answers + naive/none/unk top-k
dicts for Post-Hoc calibration). Same public knobs, same jsonl schema.

Example:
    python -m llava_align_tpu.runners.pope \
        --model-path /ckpt/llava-v1.5-7b \
        --question-file data/POPE/coco/coco_pope_adversarial.json \
        --image-folder /data/coco/val2014 \
        --answers-file out/answers.jsonl \
        --use_dd --use_dd_unk --cd_alpha 1 --cd_beta 0.2 --calibrate
"""

from __future__ import annotations

import argparse
import time
from typing import Optional

import jax
import numpy as np

from llava_align_tpu.calibrate.posthoc import calibrate_label_dict, get_prob_from_logits
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.runners.common import (
    AnswerFile,
    LoadedModel,
    apply_dist_auto,
    finish_dist_auto,
    build_prompt,
    load_image_tensor,
    load_model,
    load_questions_for,
    make_generation_config,
    postprocess_answer,
)
from llava_align_tpu.tokenization import keyword_token_ids, tokenizer_image_token


def _auto_group_batch(engine, Qg: int, max_new: int) -> int:
    """Analytic multi-group batch pick: amortize per-call dispatch/transfer
    across as many image-groups as the HBM budget allows (≤4 — measured flat
    beyond that on a v5e chip). Mirrors bench.py's never-compile-to-discover
    policy: one per-group [prefix segment + Qg·branches local rows] estimate
    against HBM minus weights."""
    try:
        params_bytes = sum(
            int(x.nbytes) for x in jax.tree_util.tree_leaves(engine.params)
        )
        shp = jax.eval_shape(lambda: engine.adapter.init_cache(1, 1))
        per_pos = sum(  # KV bytes per (row, position)
            int(np.prod(s.shape)) * s.dtype.itemsize
            for s in jax.tree_util.tree_leaves(shp)
        )
        n_img_tok = getattr(engine.adapter, "num_image_tokens", 576) or 576
        bucket = max(int(getattr(engine, "bucket", 128)), 1)
        pad_prefix = -(-(n_img_tok + 128) // bucket) * bucket
        rows = Qg * max(len(engine.kinds), 1)
        # image segment + 2 text-prefix segments (bucket) + local rows at the
        # SUFFIX bucket (shared text-branch prefixes shrank the local caches;
        # same model as bench.py's gb_fit)
        group_bytes = (pad_prefix + 2 * bucket + rows * (32 + max_new)) * per_pos
        try:  # budget from the device when it reports one (bytes_limit)
            hbm = float(jax.devices()[0].memory_stats()["bytes_limit"])
        except Exception:
            hbm = 16.0e9
        fit = int((hbm * 0.94 - params_bytes - 1.2e9) // max(group_bytes, 1))
        return max(1, min(4, fit))
    except Exception:
        return 1


def run(args) -> str:
    # --dist auto FIRST: jax.distributed.initialize must run before any JAX
    # call initializes the XLA backend (model loading below does)
    apply_dist_auto(args)
    quant = getattr(args, "quant", "none")
    # w8a8 = int8 weights + opt-in dynamic activation quant on compute-bound
    # matmul row counts (prefill): ~1.4x prefill on the int8 MXU, NOT
    # bit-exact with int8 (ops/quant W8A8 note)
    act_quant = quant == "w8a8"
    quant = "int8" if act_quant else quant
    # random:{7b,13b} + quant builds the quantized tree directly (group by
    # group) — quantizing beside a live bf16 tree would OOM a 16GB chip
    model = load_model(args.model_path, quant=quant)
    tokenizer, params, cfg = model.tokenizer, model.params, model.cfg
    already_quant = (
        args.model_path.startswith("random:")
        and not args.model_path.endswith(":tiny")
    )
    if quant in ("int8", "int4") and not already_quant:
        # weight-only serving (reference load_8bit/load_4bit capability,
        # builder.py:29-38): int8 ~2x bf16 decode; int4 g128 decodes at int8
        # speed with half the weight HBM (ops/quant.py header)
        from llava_align_tpu.ops.quant import quantize_llama_params

        params = dict(params, llama=quantize_llama_params(
            params["llama"], bits=4 if quant == "int4" else 8))

    questions = load_questions_for(args)
    if args.max_questions:
        questions = questions[: args.max_questions]
    ans = AnswerFile(args.answers_file, resume=args.resume)

    gen = make_generation_config(args)
    _, stop_str = build_prompt("x", args.conv_mode)
    stop_ids = keyword_token_ids([stop_str], tokenizer)
    engine = DecodeEngine(params, cfg, gen, stop_keyword_ids=stop_ids,
                          act_quant=act_quant)
    score_engine: Optional[DecodeEngine] = None
    if args.calibrate:
        # content-free scoring runs use the plain sampling path
        # (reference calibrate_label_sapce, llava_calibrate.py:41-89)
        score_gen = make_generation_config(
            args, use_cd=False, use_dd=False, use_dd_unk=False, max_new_tokens=1
        )
        score_engine = DecodeEngine(params, cfg, score_gen,
                                    stop_keyword_ids=stop_ids,
                                    act_quant=act_quant)

    one_word = args.one_word or "POPE" in args.question_file

    def prep(line):
        qs = line["text"]
        prompt, stop = build_prompt(
            qs, args.conv_mode, with_image=True,
            mm_use_im_start_end=cfg.mm_use_im_start_end, one_word=one_word,
        )
        input_ids = tokenizer_image_token(prompt, tokenizer)
        image = load_image_tensor(
            args.image_folder, line.get("image", ""),
            image_size=cfg.vision.image_size,
            image_aspect_ratio=args.image_aspect_ratio,
            synthetic_ok=args.synthetic_images,
            grid_pinpoints=cfg.image_grid_pinpoints,
        )
        return input_ids, image, stop

    def none_unk_ids(line):
        qs = line["text"]
        p_none, _ = build_prompt(qs, args.conv_mode, with_image=False, one_word=one_word)
        ids_none = tokenizer_image_token(p_none, tokenizer)
        p_unk, _ = build_prompt(qs, args.conv_mode, with_image=True, one_word=one_word)
        ids_unk = [
            tokenizer.unk_token_id if t == -200 else t
            for t in tokenizer_image_token(p_unk, tokenizer)
        ]
        return ids_none, ids_unk

    def finalize(line, out, stop_str, out_none=None, out_unk=None):
        text = postprocess_answer(
            tokenizer.decode(out.token_ids, skip_special_tokens=True), stop_str
        )
        tokens_naive = calibrate_label_dict(
            out.first_scores_top_probs, out.first_scores_top_ids, tokenizer
        )
        record = {
            "question_id": line["question_id"],
            "prompt": line["text"],
            "text": text,
            "model_id": model.model_name,
            "image": line.get("image", ""),
            "logits_score": get_prob_from_logits(tokens_naive),
            "naive": tokens_naive,
            "metadata": {},
        }
        if out_none is not None:
            record["none"] = calibrate_label_dict(
                out_none.first_scores_top_probs, out_none.first_scores_top_ids, tokenizer
            )
        if out_unk is not None:
            record["unk"] = calibrate_label_dict(
                out_unk.first_scores_top_probs, out_unk.first_scores_top_ids, tokenizer
            )
        ans.write(record)

    t0 = time.time()
    n_done = 0
    pending = [
        l for l in questions
        if not ans.is_done(l["question_id"], l.get("text"))
    ]
    B = max(1, args.batch_size)
    # Shared-prefix grouping: every POPE split ships exactly 6 consecutive
    # questions per image; their prompts differ only after the shared
    # [system + <image>] prefix, so the image/prefix KV prefills once per
    # group (engine.generate_batch_prefix) instead of once per question —
    # the reference redoes the full prefill per question AND per branch
    # (vcd_sample.py:109-185).
    group_by_image = (
        args.group_by_image
        and getattr(engine.adapter, "supports_shared_prefix", False)
    )
    if group_by_image:
        groups = []
        cap = max(B, 6)
        for l in pending:
            if (
                groups
                and len(groups[-1]) < cap
                and groups[-1][-1].get("image", "") == l.get("image", "")
            ):
                groups[-1].append(l)
            else:
                groups.append([l])
    else:
        groups = [pending[i : i + B] for i in range(0, len(pending), B)]

    from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
    from llava_align_tpu.framework.data import ListDataset, PrefetchLoader

    # worker threads tokenize + decode images ahead of the device
    # (host-side analog of double buffering; torch-DataLoader capability)
    def prep_group(g):
        first = prep(g[0])
        rest = [prep_ids(l) for l in g[1:]] if group_by_image else [
            prep(l)[:2] for l in g[1:]
        ]
        return first, rest

    def prep_ids(line):
        prompt, _ = build_prompt(
            line["text"], args.conv_mode, with_image=True,
            mm_use_im_start_end=cfg.mm_use_im_start_end, one_word=one_word,
        )
        return tokenizer_image_token(prompt, tokenizer)

    # multi-group batching: GB uniform-size image-groups decode in ONE jitted
    # call (engine.generate_batch_groups) — per-call dispatch/transfer is the
    # dominant cost once the prefill is shared. 0 = auto: pick GB analytically
    # from the HBM budget (a failed remote compile costs minutes — never
    # discover OOM by trying; same policy as bench.py)
    GB = getattr(args, "group_batch", 0)
    if GB <= 0 and group_by_image:
        GB = _auto_group_batch(engine, max(B, 6), args.max_new_tokens)
    GB = max(1, GB)
    if group_by_image and GB > 1:
        batches, cur = [], []
        for g in groups:
            if cur and (len(g) != len(cur[0]) or len(cur) >= GB):
                batches.append(cur)
                cur = []
            cur.append(g)
        if cur:
            batches.append(cur)
    else:
        batches = [[g] for g in groups]

    loader = PrefetchLoader(
        ListDataset(batches, transform=lambda b: [(g, prep_group(g)) for g in b]),
        batch_size=1, num_workers=2, prefetch=4,
    )
    start = 0

    def split_prefix(prepped_group):
        (ids0, image0, stop), rest = prepped_group
        if args.use_cd and image0 is None:
            return None  # cd needs a noised prefix segment
        if image0 is not None and np.asarray(image0).ndim == 4:
            return None  # anyres grid stacks decode per question
        ids_list = [ids0] + rest
        p = DecodeEngine.common_token_prefix(ids_list)
        prefix = ids_list[0][:p]
        if IMAGE_TOKEN_INDEX not in prefix:
            return None
        return prefix, [ids[p:] for ids in ids_list], image0

    def _submit_scores(chunk, rng):
        """Queue both content-free scoring runs (reference
        calibrate_label_sapce, llava_calibrate.py:41-89: 'none' = prompt w/o
        image token; 'unk' = sentinel→unk id) — one logic for the pipelined
        and fallback calibrate paths."""
        nu = [none_unk_ids(l) for l in chunk]
        return (
            score_engine.submit_batch([(n_ids, None) for n_ids, _ in nu], rng=rng),
            score_engine.submit_batch([(u_ids, None) for _, u_ids in nu], rng=rng),
        )

    def _finish_chunk(chunk, outs, stop_str, rng, score_handles=None):
        nonlocal n_done
        outs_none = outs_unk = [None] * len(chunk)
        if score_handles is not None:
            # pre-submitted content-free runs (pipelined calibrate path)
            h_none, h_unk = score_handles
            outs_none = score_engine.collect_batch(h_none)
            outs_unk = score_engine.collect_batch(h_unk)
        elif score_engine is not None:
            if len(chunk) == 1:
                nu = [none_unk_ids(l) for l in chunk]
                outs_none = [score_engine.generate(nu[0][0], None, rng=rng)]
                outs_unk = [score_engine.generate(nu[0][1], None, rng=rng)]
            else:
                h_none, h_unk = _submit_scores(chunk, rng)
                outs_none = score_engine.collect_batch(h_none)
                outs_unk = score_engine.collect_batch(h_unk)
        for line, out, o_n, o_u in zip(chunk, outs, outs_none, outs_unk):
            finalize(line, out, stop_str, o_n, o_u)
        n_done += len(chunk)
        if args.verbose and n_done % 20 < len(chunk):
            rate = n_done / (time.time() - t0)
            print(f"{n_done} done, {rate:.2f} samples/s")

    # one in-flight grouped call: submitting batch g+1 before collecting g
    # overlaps g+1's host packing + input transfer with g's device execution
    # (the per-call fixed cost over the remote tunnel)
    in_flight = None  # (chunk, stop_str, rng, handle, score_handles)

    def _flush_pending():
        nonlocal in_flight
        if in_flight is None:
            return
        chunk_p, stop_p, rng_p, handle, sh = in_flight
        in_flight = None
        _finish_chunk(
            chunk_p, engine.collect_batch_groups(handle), stop_p, rng_p,
            score_handles=sh,
        )

    for prepped_batch in loader:
        prepped_batch = prepped_batch[0]
        chunk = [l for g, _ in prepped_batch for l in g]
        stop_str = prepped_batch[0][1][0][2]
        rng = jax.random.PRNGKey(args.seed + start)
        start += len(chunk)

        splits = [split_prefix(pg) for _, pg in prepped_batch] if group_by_image else []
        submit_ok = (
            group_by_image
            and all(len(g) > 1 for g, _ in prepped_batch)
            and len({len(g) for g, _ in prepped_batch}) == 1
            and splits
            and all(sp is not None for sp in splits)
        )
        multi = (
            group_by_image
            and len(prepped_batch) > 1
            and all(len(g) > 1 for g, _ in prepped_batch)
        )
        if submit_ok:
            handle = engine.submit_batch_groups(splits, rng=rng)
            # calibrate dumps: queue both content-free runs behind the main
            # call so all three overlap the previous chunk's finish
            score_handles = (
                _submit_scores(chunk, rng) if score_engine is not None else None
            )
            _flush_pending()  # collect the previous call while this one runs
            in_flight = (chunk, stop_str, rng, handle, score_handles)
            continue
        _flush_pending()
        if multi and all(sp is not None for sp in splits):
            outs = engine.generate_batch_groups(splits, rng=rng)
        else:
            outs = []
            for (g, ((ids0, image0, _), rest)), sp in zip(
                prepped_batch, splits or [None] * len(prepped_batch)
            ):
                if len(g) == 1:
                    outs.append(engine.generate(ids0, image0, rng=rng))
                elif group_by_image and sp is not None:
                    prefix, suffixes, img0 = sp
                    outs.extend(
                        engine.generate_batch_prefix(prefix, suffixes, img0, rng=rng)
                    )
                elif group_by_image:
                    if image0 is not None and np.asarray(image0).ndim == 4:
                        # anyres grid stacks are per-question engine inputs
                        outs.extend(
                            engine.generate(ids, image0, rng=rng)
                            for ids in [ids0] + rest
                        )
                    else:
                        outs.extend(
                            engine.generate_batch(
                                [(ids, image0) for ids in [ids0] + rest], rng=rng
                            )
                        )
                else:
                    outs.extend(
                        engine.generate_batch(
                            [(ids0, image0)] + [(ids, img) for ids, img in rest],
                            rng=rng,
                        )
                    )

        _finish_chunk(chunk, outs, stop_str, rng)

    _flush_pending()
    ans.close()
    return finish_dist_auto(args)


def build_parser() -> argparse.ArgumentParser:
    # knob names match the reference CLI (llava_calibrate.py:223-246)
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", type=str, required=True)
    p.add_argument("--model-base", type=str, default=None)
    p.add_argument("--image-folder", type=str, default="")
    p.add_argument("--question-file", type=str, required=True)
    p.add_argument("--answers-file", type=str, required=True)
    p.add_argument("--conv-mode", type=str, default="llava_v1")
    p.add_argument("--num-chunks", type=int, default=1)
    p.add_argument("--dist", default="none", choices=["none", "auto"],
                   help="auto = init jax.distributed and shard the eval set "
                   "by process rank (per-rank .rank{r}-of-{n} answer parts)")
    p.add_argument("--chunk-idx", type=int, default=0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--noise_step", type=int, default=500)
    p.add_argument("--use_cd", action="store_true", default=False)
    p.add_argument("--use_dd", action="store_true", default=False)
    p.add_argument("--use_dd_unk", action="store_true", default=False)
    p.add_argument("--cd_alpha", type=float, default=1.0)
    p.add_argument("--cd_beta", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--calibrate", action="store_true", default=False,
                   help="also dump none/unk content-free top-k dicts")
    p.add_argument("--one-word", action="store_true", default=False)
    p.add_argument("--image-aspect-ratio", type=str, default=None)
    p.add_argument("--synthetic-images", action="store_true", default=False)
    p.add_argument("--resume", action="store_true", default=False)
    p.add_argument("--max-questions", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=1,
                   help="questions decoded in lockstep (packed Q*branches batch)")
    p.add_argument("--group-batch", type=int, default=0,
                   help="uniform-size image-groups decoded per jitted call "
                   "(amortizes per-call dispatch; engine.generate_batch_groups). "
                   "0 = auto: analytic HBM-budget pick, capped at 4")
    p.add_argument("--group-by-image", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="lockstep-decode consecutive same-image questions "
                   "with one shared prefix KV prefill (POPE has 6 per image)")
    p.add_argument("--verbose", action="store_true", default=True)
    p.add_argument("--quant", default="none",
                   choices=["none", "int8", "int4", "w8a8"],
                   help="weight-only decoder serving (reference load_8bit/"
                   "load_4bit): int8 ~2x bf16 decode; int4 g128 = int8 "
                   "decode speed at half the weight HBM; w8a8 = EXPERIMENTAL "
                   "throughput mode (int8 weights + dynamic activation quant "
                   "on prefill, ~1.4x prefill, NOT bit-exact: measured 7.9% "
                   "greedy answer flips vs int8 at random-7B weights — "
                   "docs/ROUND4_NOTES.md). qwen family "
                   "supports int8/w8a8 only (13696-wide FFN is not "
                   "256-aligned for split-half int4 packing)")
    return p


if __name__ == "__main__":
    run(build_parser().parse_args())
