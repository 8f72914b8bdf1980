"""MMMU calibrate-best sweep + print_results table.

Parity targets: reference run_llava_calibrate_best.py:85-131 (9-setting
calibration sweep from one inference pass) and print_results.py:15-54
(domain/subject aggregation table). The sweep math is checked against an
in-test numpy re-enactment of the reference's cited lines; the table against
the reference eval_utils oracle on the checked-in golden example outputs.
"""

import importlib.util
import json
import sys

import numpy as np
import pytest

from llava_align_tpu.evals import mmmu as ours
from llava_align_tpu.runners import mmmu as runner

ANSWER_DICT = "/root/reference/experiments/eval/MMMU/answer_dict_val.json"
GOLDEN_13B = "/root/reference/experiments/eval/MMMU/example_outputs/llava1.5_13b_val.json"


def _ref_setting_pred(naive, probes, choices, setting):
    """Verbatim numpy re-enactment of run_llava_calibrate_best.py:86-121."""
    num_classes = len(choices)
    gen_answer = np.asarray(naive, np.float64)
    gen_answer = gen_answer / np.sum(gen_answer)
    if setting == "none_noise":
        all_p_y = np.array(probes["noise"]) + np.array(probes["none"])
        p_cf = all_p_y / np.sum(all_p_y)
    elif setting == "none_unk":
        all_p_y = np.array(probes["unk"]) + np.array(probes["zero"])
        p_cf = all_p_y / np.sum(all_p_y)
    elif setting == "none_unk_noise":
        all_p_y = np.array(probes["noise"]) + np.array(probes["none"]) + np.array(probes["unk"])
        p_cf = all_p_y / np.sum(all_p_y)
    elif setting == "all":
        all_p_y = (np.array(probes["noise"]) + np.array(probes["none"])
                   + np.array(probes["zero"]) + np.array(probes["unk"]))
        p_cf = all_p_y / np.sum(all_p_y)
    elif setting == "naive":
        p_cf = None
    else:
        p_cf = np.asarray(probes[setting], np.float64)
        p_cf = p_cf / np.sum(p_cf)
    if setting == "naive":
        W = np.identity(num_classes)
        b = np.zeros([num_classes, 1])
    else:
        p_cf = [x + 1e-4 for x in p_cf]
        W = np.linalg.inv(np.identity(num_classes) * p_cf)
        b = np.zeros([num_classes, 1])
    cal = np.matmul(W, np.expand_dims(gen_answer, axis=-1)) + b
    cal /= np.sum(cal)
    return choices[int(np.argmax(cal))]


def test_sweep_predict_matches_reference_math():
    rng = np.random.default_rng(0)
    choices = ["A", "B", "C", "D"]
    for _ in range(50):
        naive = rng.random(4) + 1e-3
        probes = {n: rng.random(4) + 1e-3 for n in ("noise", "none", "zero", "one", "unk")}
        for setting in ours.SWEEP_SETTINGS:
            got = ours.sweep_predict(naive, probes, choices, setting)
            want = _ref_setting_pred(naive, probes, choices, setting)
            assert got == want, (setting, naive, probes)


def test_settings_sweep_records_shapes():
    records = [
        {
            "question_id": "validation_Math_1",
            "question_type": "multiple-choice",
            "all_choices": ["A", "B"],
            "index2ans": {"A": "one", "B": "two"},
            "answer": "A",
            "text": "The answer is B",
            "naive": {"A": 0.2, "B": 0.7},
            "none": {"A": 0.5, "B": 0.4},
            "unk": {"A": 0.45, "B": 0.45},
            "zero": {"A": 0.5, "B": 0.4},
            "noise": {"A": 0.3, "B": 0.6},
        },
        {
            "question_id": "validation_Math_2",
            "question_type": "open",
            "answer": "42",
            "text": "the result is 42",
        },
    ]
    sweep = ours.settings_sweep(records)
    assert set(sweep) == set(ours.SWEEP_SETTINGS)
    for setting in ours.SWEEP_SETTINGS:
        assert set(sweep[setting]) == {"validation_Math_1", "validation_Math_2"}
        # open question keeps generated text in every setting
        assert sweep[setting]["validation_Math_2"] == "the result is 42"
    # naive answers from logit argmax, not the generated text
    assert sweep["naive"]["validation_Math_1"] == "B"
    # 'none' probe prefers A strongly -> calibration flips toward A... at
    # least: deterministic agreement with the reference math
    naive_p = [0.2, 0.7]
    probes = {"noise": [0.3, 0.6], "none": [0.5, 0.4], "zero": [0.5, 0.4],
              "unk": [0.45, 0.45]}
    for setting in ("none", "unk", "none_unk", "all"):
        assert sweep[setting]["validation_Math_1"] == _ref_setting_pred(
            naive_p, probes, ["A", "B"], setting
        )


@pytest.fixture(scope="module")
def ref_eval():
    spec = importlib.util.spec_from_file_location(
        "ref_mmmu_eval2",
        "/root/reference/experiments/eval/MMMU/utils/eval_utils.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_mmmu_eval2"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_results_table_golden_13b(ref_eval):
    """Build per-subject results from the checked-in 13B golden outputs and
    check the table's domain + overall aggregation against the reference
    calculate_ins_level_acc oracle (print_results.py:35-52 math)."""
    with open(GOLDEN_13B) as f:
        output_dict = json.load(f)
    with open(ANSWER_DICT) as f:
        answer_dict = json.load(f)

    from collections import defaultdict

    by_subject = defaultdict(list)
    for data_id, pred in output_dict.items():
        meta = answer_dict[data_id]
        subject = "_".join(data_id.split("_")[1:-1])
        parsed = (
            pred if meta["question_type"] == "multiple-choice"
            else ours.parse_open_response(pred)
        )
        by_subject[subject].append({
            "id": data_id, "question_type": meta["question_type"],
            "answer": meta["ground_truth"], "parsed_pred": parsed,
        })
    subject_results = {}
    for subject, samples in by_subject.items():
        _, m = ours.evaluate(samples)
        subject_results[subject] = {"acc": m["acc"], "num_example": len(samples)}

    table = ours.results_table(subject_results)
    # every domain with data appears, plus the Overall row
    for domain, cats in ours.DOMAIN_CAT2SUB_CAT.items():
        in_domain = {c: subject_results[c] for c in cats if c in subject_results}
        if not in_domain:
            continue
        ref_acc = ref_eval.calculate_ins_level_acc(in_domain)
        assert f"Overall-{domain}" in table
        assert str(round(ref_acc, 3)) in table.split(f"Overall-{domain}")[1].split("\n")[0]
    ref_overall = ref_eval.calculate_ins_level_acc(subject_results)
    last = [l for l in table.splitlines() if l.startswith("| Overall ")][-1]
    assert str(round(ref_overall, 3)) in last
    assert str(len(output_dict)) in last  # total sample count


def test_score_sweep_end_to_end(tmp_path):
    """score_sweep over a small synthetic answers file: per-setting accs +
    best pick + table."""
    records = []
    rng = np.random.default_rng(1)
    for i in range(12):
        ans = "AB"[i % 2]
        naive = {"A": 0.6, "B": 0.3} if ans == "A" else {"A": 0.45, "B": 0.5}
        records.append({
            "question_id": f"validation_Math_{i}",
            "subject": "Math",
            "question_type": "multiple-choice",
            "all_choices": ["A", "B"],
            "index2ans": {"A": "x", "B": "y"},
            "answer": ans,
            "text": ans,
            "naive": naive,
            "none": {"A": 0.5, "B": 0.5},
            "unk": {"A": 0.5, "B": 0.5},
            "zero": {"A": 0.5, "B": 0.5},
            "noise": {"A": 0.5, "B": 0.5},
        })
    path = tmp_path / "ans.jsonl"
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    res = runner.score_sweep(str(path))
    assert set(res["settings"]) == set(ours.SWEEP_SETTINGS)
    assert res["settings"]["naive"]["overall_acc"] == 1.0  # argmax matches labels
    assert res["best_setting"] in ours.SWEEP_SETTINGS
    assert "Overall" in res["table"] and "Math" in res["table"]
