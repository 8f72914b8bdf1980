"""POPE scorer parity tests (reference eval_pope.py / eval_pope_calibrate.py)."""

import numpy as np

from llava_align_tpu.evals.pope import (
    format_calibrated_report,
    score_pope,
    score_pope_calibrated,
)


def _gt(labels):
    return [{"question_id": i, "label": l} for i, l in enumerate(labels)]


def test_plain_scorer_counts():
    gt = _gt(["yes", "yes", "no", "no"])
    gen = [
        {"question_id": 0, "text": "Yes, there is."},
        {"question_id": 1, "text": "No"},
        {"question_id": 2, "text": "no"},
        {"question_id": 3, "text": "Yes"},
    ]
    m = score_pope(gt, gen)
    # tp=1, fn=1, tn=1, fp=1
    assert m["precision"] == 0.5
    assert m["recall"] == 0.5
    assert m["f1"] == 0.5
    assert m["accuracy"] == 0.5
    assert m["yes_ratio"] == 0.5


def test_plain_scorer_substring_semantics():
    # reference checks 'no' in gen_answer: "not sure" contains "no" → counted no
    gt = _gt(["no"])
    gen = [{"question_id": 0, "text": "not sure"}]
    m = score_pope(gt, gen)
    assert m["accuracy"] == 1.0


def test_calibrated_naive_equals_argmax_of_probs():
    gt = _gt(["yes", "no", "no"])
    gen = [
        {"question_id": 0, "text": "yes", "naive": {"yes": 0.7, "no": 0.2}},
        {"question_id": 1, "text": "yes", "naive": {"yes": 0.6, "no": 0.3}},
        {"question_id": 2, "text": "no", "naive": {"yes": 0.1, "no": 0.8}},
    ]
    res = score_pope_calibrated(gt, gen, settings=("naive",))
    m = res["naive"]
    # predictions: yes, yes, no → tp=1 fp=1 tn=1 fn=0
    assert m["accuracy"] == 2 / 3
    assert m["precision"] == 0.5
    assert m["recall"] == 1.0


def test_calibrated_individual_flips_biased_sample():
    """Sample biased to 'yes' under meaningless input gets corrected."""
    gt = _gt(["no"])
    gen = [
        {
            "question_id": 0,
            "text": "yes",
            "naive": {"yes": 0.6, "no": 0.4},
            # content-free distribution even more yes-biased:
            "none": {"yes": 0.8, "no": 0.2},
            "unk": {"yes": 0.8, "no": 0.2},
        }
    ]
    raw = score_pope_calibrated(gt, gen, settings=("naive",))["naive"]
    assert raw["accuracy"] == 0.0
    for setting in ("none", "unk", "none_unk"):
        cal = score_pope_calibrated(gt, gen, settings=(setting,))[setting]
        # p = [.6,.4]/[.8,.2] ∝ [.75, 2.0] → argmax 'no'
        assert cal["accuracy"] == 1.0, setting


def test_calibrated_all_mode_uses_global_p_cf():
    gt = _gt(["no", "no"])
    gen = [
        {"question_id": 0, "text": "", "naive": {"yes": 0.6, "no": 0.4},
         "none": {"yes": 0.9, "no": 0.1}},
        {"question_id": 1, "text": "", "naive": {"yes": 0.55, "no": 0.45},
         "none": {"yes": 0.7, "no": 0.3}},
    ]
    res = score_pope_calibrated(gt, gen, settings=("none",), calibrate_mode="all")
    # global p_cf = mean([.9,.1],[.7,.3]) = [.8,.2]; both flip to 'no'
    assert res["none"]["accuracy"] == 1.0


def test_short_answers_file_raises_named_error():
    """A truncated answers file must fail with counts + file names, not a
    bare IndexError (reference eval_pope.py:30 is a bare assert)."""
    import pytest

    gt = _gt(["yes", "no", "no"])
    gen = [{"question_id": 0, "text": "yes"}]
    with pytest.raises(ValueError, match=r"1 records.*3 questions"):
        score_pope(gt, gen)
    with pytest.raises(ValueError, match="short.jsonl"):
        score_pope_calibrated(gt, gen, gen_name="short.jsonl")


def test_misordered_question_ids_raise_named_error():
    import pytest

    gt = _gt(["yes", "no"])
    gen = [{"question_id": 1, "text": "yes"}, {"question_id": 0, "text": "no"}]
    with pytest.raises(ValueError, match="question_id mismatch at record 0"):
        score_pope(gt, gen)


def test_empty_logits_score_yields_finite_metrics():
    """Top-k dicts lacking both 'yes' and 'no' (degenerate [0,0] class
    vector) must not produce nan confidence or a RuntimeWarning."""
    import warnings

    gt = _gt(["yes", "no"])
    gen = [
        {"question_id": 0, "text": "yes", "naive": {"maybe": 0.9},
         "none": {"also": 1.0}, "unk": {}},
        {"question_id": 1, "text": "no", "naive": {"yes": 0.2, "no": 0.7},
         "none": {"yes": 0.5, "no": 0.5}, "unk": {"yes": 0.5, "no": 0.5}},
    ]
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        for mode in ("individual", "all"):
            res = score_pope_calibrated(
                gt, gen, settings=("naive", "none", "unk", "none_unk"),
                calibrate_mode=mode,
            )
            for name, m in res.items():
                assert np.isfinite(m["confidence"]), (mode, name)
                assert np.isfinite(m["f1"]), (mode, name)
                assert m["total"] == 2


def test_degenerate_sample_prediction_matches_reference_argmax():
    """[0,0] naive vector: reference argmax(nan)=0 → 'yes'; the uniform
    fallback argmax is also 0, so the prediction (and thus F1) is unchanged."""
    gt = _gt(["yes"])
    gen = [{"question_id": 0, "text": "", "naive": {"hmm": 1.0}}]
    res = score_pope_calibrated(gt, gen, settings=("naive",))["naive"]
    assert res["accuracy"] == 1.0  # predicted 'yes' (class 0)


def test_report_formatting():
    gt = _gt(["yes"])
    gen = [{"question_id": 0, "text": "yes", "naive": {"yes": 0.9, "no": 0.05}}]
    res = score_pope_calibrated(gt, gen, settings=("naive",))
    out = format_calibrated_report(res)
    assert "F1" in out and "naive" in out
