"""MMMU answer parsing + evaluation.

Parity: reference experiments/eval/MMMU/utils/eval_utils.py —
parse_multi_choice_response (:10-62), normalize/number extraction (:65-120),
parse_open_response (:122-171), eval_multi_choice/eval_open (:175-216),
evaluate (:219-241), calculate_ins_level_acc (:246-255). The 4-way Post-Hoc
generalization (per-question dynamic label dict, run_llava_calibrate.py:82-135)
is `calibrate_choice_probs`.
"""

from __future__ import annotations

import random
import re
from typing import Dict, List, Mapping, Sequence

import numpy as np

from llava_align_tpu.calibrate.posthoc import calibrate_weight, get_prob_from_logits

_rng = random.Random(42)


def parse_multi_choice_response(
    response: str, all_choices: Sequence[str], index2ans: Mapping[str, str]
) -> str:
    """Extract the predicted choice letter from free-form text."""
    for ch in [",", ".", "!", "?", ";", ":", "'"]:
        response = response.strip(ch)
    response = " " + response + " "

    index_ans = True
    ans_with_brack = False
    candidates: List[str] = []
    for choice in all_choices:
        if f"({choice})" in response:
            candidates.append(choice)
            ans_with_brack = True
    if not candidates:
        for choice in all_choices:
            if f" {choice} " in response:
                candidates.append(choice)
    if not candidates and len(response.split()) > 5:
        for index, ans in index2ans.items():
            if ans.lower() in response.lower():
                candidates.append(index)
                index_ans = False

    if not candidates:
        return _rng.choice(list(all_choices))
    if len(candidates) == 1:
        return candidates[0]

    start_indexes = []
    if index_ans:
        pattern = "({})" if ans_with_brack else " {} "
        for can in candidates:
            start_indexes.append(response.rfind(pattern.format(can)))
    else:
        for can in candidates:
            start_indexes.append(response.lower().rfind(index2ans[can].lower()))
    return candidates[int(np.argmax(start_indexes))]


def check_is_number(string: str) -> bool:
    try:
        float(string.replace(",", ""))
        return True
    except ValueError:
        return False


def normalize_str(string: str) -> List:
    string = string.strip()
    if check_is_number(string):
        return [round(float(string.replace(",", "")), 2)]
    string = string.lower()
    if len(string) == 1:
        return [" " + string, string + " "]
    return [string]


def extract_numbers(string: str) -> List[str]:
    pattern_commas = r"-?\b\d{1,3}(?:,\d{3})+\b"
    pattern_scientific = r"-?\d+(?:\.\d+)?[eE][+-]?\d+"
    pattern_simple = r"-?(?:\d+\.\d+|\.\d+|\d+\b)(?![eE][+-]?\d+)(?![,\d])"
    return (
        re.findall(pattern_commas, string)
        + re.findall(pattern_scientific, string)
        + re.findall(pattern_simple, string)
    )


def parse_open_response(response: str) -> List:
    def get_key_subresponses(resp: str) -> List[str]:
        resp = resp.strip().strip(".").lower()
        sub_responses = re.split(r"\.\s(?=[A-Z])|\n", resp)
        indicators = ["could be ", "so ", "is ", "thus ", "therefore ", "final ", "answer ", "result "]
        keys = []
        for index, sub in enumerate(sub_responses):
            inds = indicators + ["="] if index == len(sub_responses) - 1 else indicators
            shortest = None
            for indicator in inds:
                if indicator in sub:
                    tail = sub.split(indicator)[-1].strip()
                    if shortest is None or len(tail) < len(shortest):
                        shortest = tail
            if shortest and shortest.strip() not in [":", ",", ".", "!", "?", ";", "'"]:
                keys.append(shortest)
        return keys or [resp]

    key_responses = get_key_subresponses(response)
    pred_list = list(key_responses)
    for resp in key_responses:
        pred_list.extend(extract_numbers(resp))
    out: List = []
    for p in pred_list:
        out.extend(normalize_str(p) if isinstance(p, str) else [p])
    return list(set(out))


def eval_multi_choice(gold_i, pred_i) -> bool:
    if isinstance(gold_i, list):
        return any(answer == pred_i for answer in gold_i)
    return gold_i == pred_i


def eval_open(gold_i, pred_i: Sequence) -> bool:
    if isinstance(gold_i, list):
        norm_answers: List = []
        for answer in gold_i:
            norm_answers.extend(normalize_str(answer))
    else:
        norm_answers = normalize_str(gold_i)
    for pred in pred_i:
        if isinstance(pred, str):
            if any(isinstance(a, str) and a in pred for a in norm_answers):
                return True
        elif pred in norm_answers:
            return True
    return False


def evaluate(samples: Sequence[dict]):
    """samples: {id, question_type, answer, parsed_pred} →
    (judge_dict, {'acc': ...})."""
    if not samples:
        return {"acc": 0}
    correct = 0
    judge: Dict[str, str] = {}
    for s in samples:
        ok = (
            eval_multi_choice(s["answer"], s["parsed_pred"])
            if s["question_type"] == "multiple-choice"
            else eval_open(s["answer"], s["parsed_pred"])
        )
        judge[s["id"]] = "Correct" if ok else "Wrong"
        correct += int(ok)
    return judge, {"acc": correct / len(samples)}


def calculate_ins_level_acc(results: Mapping[str, Mapping]) -> float:
    acc = sum(r["acc"] * r["num_example"] for r in results.values())
    n = sum(r["num_example"] for r in results.values())
    return acc / n if n else 0


def calibrate_choice_probs(
    naive_probs: Sequence[float],
    content_free_probs: Sequence[Sequence[float]],
    mode: str = "diagonal_W",
) -> np.ndarray:
    """N-way Post-Hoc calibration for one question: naive class probs plus
    one or more content-free prob vectors (summed into p_cf), returns
    calibrated class probabilities (run_llava_calibrate.py:82-135 semantics)."""
    gen = np.asarray(naive_probs, np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        gen = gen / np.sum(gen)
    p_cf = np.sum(np.asarray(content_free_probs, np.float64), axis=0)
    p_cf = p_cf / np.sum(p_cf) + 1e-4
    W, b = calibrate_weight(p_cf, mode)
    with np.errstate(invalid="ignore", divide="ignore"):
        cal = np.matmul(W, gen[:, None]) + b
        cal = cal / np.sum(cal)
    return cal.ravel()


def choice_label_dict(all_choices: Sequence[str]) -> Dict[int, List[str]]:
    """Per-question label dict mapping class index → choice letter
    (the dynamic LABEL_DICT of run_llava_calibrate.py:106-109)."""
    return {i: [c] for i, c in enumerate(all_choices)}
