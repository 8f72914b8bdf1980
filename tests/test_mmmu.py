"""MMMU parsing/eval parity (reference MMMU/utils/eval_utils.py)."""

import numpy as np

from llava_align_tpu.evals.mmmu import (
    calculate_ins_level_acc,
    calibrate_choice_probs,
    choice_label_dict,
    eval_open,
    evaluate,
    extract_numbers,
    normalize_str,
    parse_multi_choice_response,
    parse_open_response,
)

I2A = {"A": "a dog", "B": "a cat", "C": "a bird", "D": "a fish"}
CHOICES = ["A", "B", "C", "D"]


def test_parse_multi_choice_bracket():
    assert parse_multi_choice_response("The answer is (B).", CHOICES, I2A) == "B"


def test_parse_multi_choice_bare_letter():
    assert parse_multi_choice_response("I think B is right", CHOICES, I2A) == "B"


def test_parse_multi_choice_content_match():
    resp = "Looking closely at the image it seems to show a cat sleeping"
    assert parse_multi_choice_response(resp, CHOICES, I2A) == "B"


def test_parse_multi_choice_last_mention_wins():
    assert parse_multi_choice_response("(A) no wait (C)", CHOICES, I2A) == "C"


def test_normalize_and_numbers():
    assert normalize_str("3,000") == [3000.0]
    assert normalize_str("Hello") == ["hello"]
    assert normalize_str("x") == [" x", "x "]
    assert "1.5" in extract_numbers("the value is 1.5 meters")
    assert "-2e3" in extract_numbers("coefficient -2e3 here") or "-2e3" in [
        s for s in extract_numbers("coefficient -2e3 here")
    ]


def test_parse_open_response_answer_indicator():
    preds = parse_open_response("First I compute things. The answer is 42.")
    assert 42.0 in preds


def test_eval_open_number_match():
    assert eval_open("42", [42.0, "something"])
    assert not eval_open("42", [41.0])


def test_evaluate_and_ins_level():
    samples = [
        {"id": "q1", "question_type": "multiple-choice", "answer": "A", "parsed_pred": "A"},
        {"id": "q2", "question_type": "multiple-choice", "answer": "B", "parsed_pred": "C"},
        {"id": "q3", "question_type": "open", "answer": "7", "parsed_pred": [7.0]},
    ]
    judge, m = evaluate(samples)
    assert judge == {"q1": "Correct", "q2": "Wrong", "q3": "Correct"}
    assert abs(m["acc"] - 2 / 3) < 1e-9
    acc = calculate_ins_level_acc(
        {"art": {"acc": 0.5, "num_example": 10}, "math": {"acc": 1.0, "num_example": 30}}
    )
    assert abs(acc - 0.875) < 1e-9


def test_four_way_calibration_flips_bias():
    # model biased to choice A; content-free input shows the same bias
    naive = [0.4, 0.3, 0.2, 0.1]
    content_free = [[0.7, 0.1, 0.1, 0.1]]
    cal = calibrate_choice_probs(naive, content_free)
    assert int(np.argmax(cal)) == 1  # B wins after de-biasing
    assert abs(cal.sum() - 1) < 1e-9


def test_choice_label_dict():
    assert choice_label_dict(["A", "B"]) == {0: ["A"], 1: ["B"]}


def test_calibrate_choice_probs_degenerate_is_finite():
    """All-zero naive/probe vectors (no choice letter in the dumped top-k)
    produce finite calibrated probs via the uniform fallback — prediction
    unchanged (argmax 0 = the reference's argmax-of-nan behavior), no
    RuntimeWarning (round-4 hardening)."""
    import warnings

    import numpy as np

    from llava_align_tpu.evals.mmmu import calibrate_choice_probs

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        cal = calibrate_choice_probs([0.0, 0.0, 0.0], [[0.0, 0.0, 0.0]])
    assert np.all(np.isfinite(cal))
    assert int(np.argmax(cal)) == 0
