"""SURVEY §4 determinism pinning: a seeded rerun reproduces answer files
bit-for-bit. Plus schema compatibility with the reference repo's actual POPE
data files (read-only)."""

import json
import os

import pytest

from llava_align_tpu.evals.pope import load_jsonl, score_pope
from llava_align_tpu.runners import pope

REF_POPE = "/root/reference/experiments/data/POPE/coco/coco_pope_adversarial.json"


def _args(question_file, answers_file, **kw):
    args = pope.build_parser().parse_args(
        ["--model-path", "random:tiny", "--question-file", question_file,
         "--answers-file", answers_file]
    )
    args.synthetic_images = True
    args.max_new_tokens = 4
    args.verbose = False
    for k, v in kw.items():
        setattr(args, k, v)
    return args


def test_seeded_rerun_bitwise_identical(tmp_path):
    qf = tmp_path / "q.json"
    with open(qf, "w") as f:
        for i in range(3):
            f.write(json.dumps({"question_id": i, "image": f"i{i}.jpg",
                                "text": f"Is there a dog #{i}?", "label": "yes"}) + "\n")
    out1, out2 = str(tmp_path / "a1.jsonl"), str(tmp_path / "a2.jsonl")
    # stochastic sampling, fixed seed
    pope.run(_args(str(qf), out1, temperature=0.9, seed=53, use_dd_unk=True))
    pope.run(_args(str(qf), out2, temperature=0.9, seed=53, use_dd_unk=True))
    assert open(out1).read() == open(out2).read()
    # a different seed may differ (don't assert it must — only that the
    # machinery accepts it)
    pope.run(_args(str(qf), str(tmp_path / "a3.jsonl"), temperature=0.9, seed=99))


@pytest.mark.skipif(not os.path.exists(REF_POPE), reason="reference data absent")
def test_reference_pope_data_schema(tmp_path):
    gt = load_jsonl(REF_POPE)
    assert len(gt) == 3000
    assert {"question_id", "text", "label", "image"} <= set(gt[0])
    assert {g["label"] for g in gt[:50]} <= {"yes", "no"}
    # our scorer consumes the real gt with synthetic answers
    gen = [{"question_id": g["question_id"], "text": "yes"} for g in gt]
    m = score_pope(gt, gen)
    assert m["recall"] == 1.0  # all-yes answers
    assert m["total"] == 3000


@pytest.mark.skipif(not os.path.exists(REF_POPE), reason="reference data absent")
def test_runner_on_real_pope_slice(tmp_path):
    out = str(tmp_path / "real.jsonl")
    args = _args(REF_POPE, out, temperature=0.0, max_questions=3, calibrate=True)
    pope.run(args)
    recs = load_jsonl(out)
    assert len(recs) == 3
    assert recs[0]["question_id"] == load_jsonl(REF_POPE)[0]["question_id"]
