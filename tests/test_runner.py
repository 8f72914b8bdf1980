"""End-to-end runner smoke: synthetic POPE questions → pope runner (tiny
random model, mock tokenizer, synthetic images, dual-branch VDD + calibrate
dumps) → both scorers consume the produced jsonl."""

import json
import os

import pytest

from llava_align_tpu.evals.pope import load_jsonl, score_pope, score_pope_calibrated
from llava_align_tpu.runners import pope


@pytest.fixture(scope="module")
def question_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("pope_data")
    qf = d / "tiny_POPE_questions.json"
    with open(qf, "w") as f:
        for i in range(4):
            f.write(
                json.dumps(
                    {
                        "question_id": i,
                        "image": f"img_{i}.jpg",
                        "text": f"Is there a dog in the image #{i}?",
                        "label": "yes" if i % 2 == 0 else "no",
                    }
                )
                + "\n"
            )
    return str(qf)


def _args(question_file, answers_file, **kw):
    parser = pope.build_parser()
    args = parser.parse_args(
        [
            "--model-path", "random:tiny",
            "--question-file", question_file,
            "--answers-file", answers_file,
        ]
    )
    args.synthetic_images = True
    args.max_new_tokens = 4
    args.temperature = 0.0  # greedy for determinism
    args.verbose = False
    for k, v in kw.items():
        setattr(args, k, v)
    return args


def test_runner_end_to_end_with_calibrate(question_file, tmp_path):
    out = str(tmp_path / "answers.jsonl")
    args = _args(question_file, out, use_dd=True, use_dd_unk=True, calibrate=True)
    pope.run(args)

    gen = load_jsonl(out)
    assert len(gen) == 4
    for rec in gen:
        assert set(["question_id", "text", "naive", "none", "unk", "logits_score"]) <= set(rec)
        assert isinstance(rec["naive"], dict) and len(rec["naive"]) >= 1

    gt = load_jsonl(question_file)
    plain = score_pope(gt, gen)
    assert 0.0 <= plain["accuracy"] <= 1.0
    cal = score_pope_calibrated(gt, gen, settings=("naive", "none", "unk", "none_unk"))
    assert set(cal) == {"naive", "none", "unk", "none_unk"}


def test_runner_resume_skips_done(question_file, tmp_path):
    out = str(tmp_path / "answers.jsonl")
    args = _args(question_file, out, max_questions=2)
    pope.run(args)
    assert len(load_jsonl(out)) == 2
    args2 = _args(question_file, out, resume=True)
    pope.run(args2)
    recs = load_jsonl(out)
    assert len(recs) == 4
    assert sorted(r["question_id"] for r in recs) == [0, 1, 2, 3]
