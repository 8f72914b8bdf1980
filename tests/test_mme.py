"""MME scorer parity (reference eval_tool/calculation.py)."""

from llava_align_tpu.evals.mme import (
    compute_metric,
    convert_answers_to_category_txt,
    parse_pred_ans,
    score_results_dir,
    score_task_lines,
)


def test_parse_pred_ans():
    assert parse_pred_ans("yes") == "yes"
    assert parse_pred_ans("Yes, it is.") == "yes"
    assert parse_pred_ans("no") == "no"
    assert parse_pred_ans("No.") == "no"
    assert parse_pred_ans("maybe") == "other"
    # only the 4-char prefix is inspected (calculation.py:28-33)
    assert parse_pred_ans("that is yes") == "other"


def test_compute_metric_counts():
    gts = ["yes", "yes", "no", "no", "yes"]
    preds = ["yes", "no", "no", "yes", "other"]
    m = compute_metric(gts, preds)
    assert m["TP"] == 1 and m["FN"] == 1 and m["TN"] == 1 and m["FP"] == 1
    assert m["other_num"] == 1
    assert m["acc"] == 2 / 5  # 'other' counted wrong in accuracy
    assert m["precision"] == 0.5 and m["recall"] == 0.5


def test_task_score_acc_plus():
    lines = [
        "img1\tq1\tyes\tyes\n",
        "img1\tq2\tno\tno\n",   # both right → acc_plus hit
        "img2\tq1\tyes\tyes\n",
        "img2\tq2\tno\tyes\n",  # one wrong → no acc_plus
    ]
    m = score_task_lines(lines)
    assert m["acc"] == 0.75
    assert m["acc_plus"] == 0.5
    assert m["task_score"] == (0.75 + 0.5) * 100


def test_convert_and_score_dir(tmp_path):
    answers = [
        {"question_id": "existence/img1.png", "prompt": "Is there a dog? Please answer yes or no.", "text": "Yes"},
        {"question_id": "existence/img1.png", "prompt": "Is there a cat? Please answer yes or no.", "text": "No"},
    ]
    gt = {
        ("existence", "img1.txt", "Is there a dog? Please answer yes or no."): "yes",
        ("existence", "img1.txt", "Is there a cat? Please answer yes or no."): "no",
    }
    out = tmp_path / "res"
    written = convert_answers_to_category_txt(answers, gt, str(out))
    assert len(written) == 1
    report = score_results_dir(str(out))
    ex = report["Perception"]["tasks"]["existence"]
    assert ex["acc"] == 1.0 and ex["acc_plus"] == 1.0
    assert report["Perception"]["total_score"] == 200.0


def test_score_sweep_dirs(tmp_path):
    """calculation_sampling.py main-loop parity: per-setting dirs under one
    folder aggregate into {setting: report} over the combined 'All' group."""
    from llava_align_tpu.evals.mme import score_sweep_dirs

    lines_good = [
        "i0.txt\tIs there a dog? Please answer yes or no.\tyes\tYes\n",
        "i0.txt\tIs there a cat? Please answer yes or no.\tno\tNo\n",
    ]
    lines_bad = [
        "i0.txt\tIs there a dog? Please answer yes or no.\tyes\tNo\n",
        "i0.txt\tIs there a cat? Please answer yes or no.\tno\tYes\n",
        "malformed line without tabs\n",  # dropped by the 4-field filter
        "a\tb\tc\n",
    ]
    for setting, lines in (("default", lines_good), ("temp_0.5", lines_bad)):
        d = tmp_path / f"model-{setting}"
        d.mkdir()
        with open(d / "existence.txt", "w") as f:
            f.writelines(lines)
    csv = tmp_path / "sweep.csv"
    results = score_sweep_dirs(str(tmp_path), "model-", csv_path=str(csv))
    assert set(results) == {"default", "temp_0.5"}
    assert results["default"]["All"]["total_score"] == 200.0
    assert results["temp_0.5"]["All"]["total_score"] == 0.0
    body = csv.read_text()
    assert "default,All,200.00" in body and "temp_0.5,All,0.00" in body


def test_calibrated_predictions_flip_bias():
    from llava_align_tpu.evals.mme import calibrated_predictions

    answers = [
        {
            "question_id": "existence/img1.png",
            "prompt": "Is there a dog? Please answer yes or no.",
            "text": "Yes",
            "naive": {"yes": 0.6, "no": 0.4},
            "none": {"yes": 0.8, "no": 0.2},
            "unk": {"yes": 0.8, "no": 0.2},
        }
    ]
    assert calibrated_predictions(answers, "naive") == ["Yes"]
    # [.6,.4] / [.8,.2] ∝ [.75, 2.0] → No
    assert calibrated_predictions(answers, "none_unk") == ["No"]
    assert calibrated_predictions(answers, "none") == ["No"]


def test_convert_calibrated(tmp_path):
    from llava_align_tpu.evals.mme import convert_calibrated_answers_to_category_txt

    answers = [
        {
            "question_id": "existence/img1.png",
            "prompt": "Is there a dog? Please answer yes or no.",
            "text": "Yes",
            "naive": {"yes": 0.6, "no": 0.4},
            "none": {"yes": 0.8, "no": 0.2},
            "unk": {"yes": 0.8, "no": 0.2},
        },
        {
            "question_id": "existence/img1.png",
            "prompt": "Is there a cat? Please answer yes or no.",
            "text": "No",
            "naive": {"yes": 0.2, "no": 0.7},
            "none": {"yes": 0.5, "no": 0.5},
            "unk": {"yes": 0.5, "no": 0.5},
        },
    ]
    gt = {
        ("existence", "img1.txt", "Is there a dog? Please answer yes or no."): "no",
        ("existence", "img1.txt", "Is there a cat? Please answer yes or no."): "no",
    }
    out = tmp_path / "cal"
    written = convert_calibrated_answers_to_category_txt(answers, gt, str(out))
    lines = open(written[0]).readlines()
    assert lines[0].rstrip("\n").endswith("No")
    assert lines[1].rstrip("\n").endswith("No")


def test_scorer_misuse_clear_errors():
    """Malformed inputs raise named errors, not bare asserts/IndexErrors
    (round-4 hardening, same class as the POPE scorer's)."""
    import pytest

    from llava_align_tpu.evals.mme import compute_metric, score_task_lines

    with pytest.raises(ValueError, match="count mismatch"):
        compute_metric(["yes", "no"], ["yes"])
    with pytest.raises(ValueError, match="two questions per image"):
        score_task_lines(["img\tq\tyes\tYes\n"])
    with pytest.raises(ValueError, match="4 tab-separated"):
        score_task_lines(["img\tq\tyes\tYes\n", "img q no No\n"])
    with pytest.raises(ValueError, match="yes/no"):
        score_task_lines(["img\tq\tyes\tYes\n", "img\tq\tmaybe\tNo\n"])


def test_calibrated_predictions_degenerate_dumps():
    """Missing probe dumps raise a named error; all-zero content-free dumps
    produce finite predictions (uniform fallback) instead of nan."""
    import pytest

    from llava_align_tpu.evals.mme import calibrated_predictions

    answers = [
        {
            "question_id": "existence/img1.png",
            "prompt": "Is there a dog? Please answer yes or no.",
            "text": "Yes",
            "naive": {"yes": 0.6, "no": 0.3},
            "none": {"yes": 0.7, "no": 0.3},
        }
    ]
    with pytest.raises(ValueError, match="no 'unk' top-k dump"):
        calibrated_predictions(answers, setting="none_unk")

    degenerate = [
        dict(
            answers[0],
            none={"foo": 1.0},  # neither yes nor no in the top-k
            unk={"bar": 1.0},
        )
    ]
    preds = calibrated_predictions(degenerate, setting="none_unk")
    assert preds[0] in ("Yes", "No")
