"""Golden-artifact regression (SURVEY §4): score the reference repo's
checked-in llava-v1.5-7b MME answers with OUR scorer and with the REFERENCE
scorer (eval_tool/calculation.py, loaded read-only as oracle) — per-task
metrics must agree exactly."""

import importlib.util
import sys

import pytest

from llava_align_tpu.evals.mme import EVAL_TYPE_DICT, score_task_lines

GOLDEN_DIR = "/root/reference/experiments/eval_tool/answers/llava-v1.5-7b"


@pytest.fixture(scope="module")
def ref_calc():
    pytest.importorskip("sklearn")
    spec = importlib.util.spec_from_file_location(
        "ref_mme_calc",
        "/root/reference/experiments/eval/MME/eval_tool/calculation.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_mme_calc"] = mod
    spec.loader.exec_module(mod)
    return mod.calculate_metrics()


@pytest.mark.parametrize(
    "task", EVAL_TYPE_DICT["Perception"] + EVAL_TYPE_DICT["Cognition"]
)
def test_golden_task_scores_match_reference(ref_calc, task):
    import os

    path = os.path.join(GOLDEN_DIR, f"{task}.txt")
    if not os.path.exists(path):
        pytest.skip(f"golden file missing: {task}")
    with open(path) as f:
        lines = f.readlines()

    ours = score_task_lines(lines)

    # oracle: reproduce the reference's per-task computation
    chunks = list(ref_calc.divide_chunks(lines))
    gts, preds = [], []
    acc_plus_correct = 0
    for pair in chunks:
        correct = 0
        for item in pair:
            _, _, gt, pred = item.rstrip("\n").split("\t")
            gt = gt.lower()
            pred = ref_calc.parse_pred_ans(pred.lower())
            gts.append(gt)
            preds.append(pred)
            if gt == pred:
                correct += 1
        if correct == 2:
            acc_plus_correct += 1
    ref_metrics = ref_calc.compute_metric(gts, preds)
    ref_metrics["acc_plus"] = acc_plus_correct / len(chunks)
    ref_score = (ref_metrics["acc"] + ref_metrics["acc_plus"]) * 100

    assert abs(ours["acc"] - ref_metrics["acc"]) < 1e-12
    assert abs(ours["acc_plus"] - ref_metrics["acc_plus"]) < 1e-12
    assert abs(ours["precision"] - ref_metrics["precision"]) < 1e-9
    assert abs(ours["recall"] - ref_metrics["recall"]) < 1e-9
    assert ours["TP"] == ref_metrics["TP"] and ours["FN"] == ref_metrics["FN"]
    assert ours["other_num"] == ref_metrics["other_num"]
    assert abs(ours["task_score"] - ref_score) < 1e-9
