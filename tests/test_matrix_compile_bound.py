"""Compile-cache boundedness across the full POPE driver matrix.

The reference sweeps 3 datasets x 3 splits (x seeds) as independent GPU
processes (run.sh); here one engine serves the whole matrix, so prompt-length
bucketing must keep the number of distinct compiled programs small across
every split's real question file — otherwise a sweep silently re-jits
(VERDICT r2 item 9).
"""

import json
import os

import jax
import numpy as np
import pytest

from llava_align_tpu.config import GenerationConfig, LlavaConfig
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import llava
from llava_align_tpu.runners.common import MockTokenizer, build_prompt
from llava_align_tpu.tokenization import tokenizer_image_token

DATA = "/root/reference/experiments/data/POPE"
SPLITS = [
    (d, s)
    for d in ("coco", "aokvqa", "gqa")
    for s in ("random", "popular", "adversarial")
]


def _questions(dataset, split, n):
    path = os.path.join(DATA, dataset, f"{dataset}_pope_{split}.json")
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip().rstrip(",")
            if line:
                rows.append(json.loads(line))
            if len(rows) >= n:
                break
    return rows


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference data absent")
def test_nine_split_matrix_compiles_bounded():
    cfg = LlavaConfig.tiny(vocab_size=211)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=2,
        use_dd=True, use_dd_unk=True, cd_alpha=1.0, cd_beta=0.1,
    )
    eng = DecodeEngine(params, cfg, gen, attn_impl="xla", bucket=128)
    tok = MockTokenizer()
    H = cfg.vision.image_size
    rng = np.random.default_rng(0)

    n_groups = 0
    for dataset, split in SPLITS:
        rows = _questions(dataset, split, 24)  # 4 image-groups per split
        # group consecutive same-image questions, exactly like the runner
        groups = []
        for r in rows:
            if groups and groups[-1][-1]["image"] == r["image"] and len(groups[-1]) < 6:
                groups[-1].append(r)
            else:
                groups.append([r])
        for g in groups:
            ids_list = [
                tokenizer_image_token(
                    build_prompt(r["text"], "llava_v1", with_image=True,
                                 one_word=True)[0],
                    tok,
                )
                for r in g
            ]
            image = rng.integers(0, 256, (3, H, H), dtype=np.uint8)
            p = DecodeEngine.common_token_prefix(ids_list)
            outs = eng.generate_batch_prefix(
                ids_list[0][:p], [ids[p:] for ids in ids_list], image
            )
            assert len(outs) == len(g)
            n_groups += 1

    assert n_groups >= 36
    # bucketing must hold across all 9 real splits: a handful of programs,
    # not one per prompt length
    assert len(eng._compiled) <= 6, sorted(eng._compiled)
