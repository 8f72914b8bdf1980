"""GPT-judge pipeline tests with an injected offline judge."""

import json

from llava_align_tpu.evals.gpt_review import (
    build_review_content,
    parse_score,
    run_review,
    summarize_reviews,
)


def test_parse_score():
    assert parse_score("8 7\nreasoning...") == [8.0, 7.0]
    assert parse_score("8, 7\nmore") == [8.0, 7.0]
    assert parse_score("garbage") == [-1, -1]


def test_build_content_layout():
    content = build_review_content(
        {"text": "What is shown?"},
        {"text": "a dog"},
        {"text": "a cat"},
        {"captions": ["cap1", "cap2"], "instances": [{"category": "dog", "bbox": [1, 2, 3, 4]}]},
        {"role": "Assistant", "prompt": "Rate both."},
    )
    assert content.startswith("[Context]\ncap1\ncap2\n\ndog: [1, 2, 3, 4]\n\n")
    assert "[Assistant 1]\na dog\n\n[End of Assistant 1]" in content
    assert content.endswith("[System]\nRate both.\n\n")


def test_run_review_resume_and_summary(tmp_path):
    questions = [
        {"question_id": i, "image": "img.jpg", "text": f"q{i}", "category": "conv"}
        for i in range(3)
    ]
    answers1 = [{"question_id": i, "text": "ref answer"} for i in range(3)]
    answers2 = [{"question_id": i, "text": "model answer"} for i in range(3)]
    contexts = [{"image": "img.jpg", "captions": ["c"], "instances": []}]
    rules = {"conv": {"role": "Assistant", "prompt": "rate"}}

    calls = []

    def judge(content, max_tokens):
        calls.append(content)
        return "8 9\nbecause"

    out = str(tmp_path / "review.jsonl")
    res = run_review(questions, answers1, answers2, contexts, rules, judge, out)
    assert len(res) == 3 and len(calls) == 3

    # resume: no new judge calls
    res2 = run_review(questions, answers1, answers2, contexts, rules, judge, out)
    assert len(res2) == 3 and len(calls) == 3

    s = summarize_reviews(res)
    assert s["all"]["score_1"] == 8.0 and s["all"]["score_2"] == 9.0
    assert s["all"]["win_rate_2"] == 1.0
    assert abs(s["all"]["relative"] - 112.5) < 1e-9
