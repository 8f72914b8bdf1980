"""Golden-artifact regression #2: evaluate the reference repo's checked-in
MMMU example outputs (llava1.5 7b/13b, qwen_vl) with OUR evaluator and with
the REFERENCE eval_utils (loaded read-only as oracle) — per-sample judgments
and per-category accuracy must agree exactly."""

import importlib.util
import json
import sys

import pytest

from llava_align_tpu.evals import mmmu as ours

ANSWER_DICT = "/root/reference/experiments/eval/MMMU/answer_dict_val.json"
OUTPUTS = {
    "llava1.5_7b": "/root/reference/experiments/eval/MMMU/example_outputs/llava1.5_7b_val.json",
    "llava1.5_13b": "/root/reference/experiments/eval/MMMU/example_outputs/llava1.5_13b_val.json",
}


@pytest.fixture(scope="module")
def ref_eval():
    spec = importlib.util.spec_from_file_location(
        "ref_mmmu_eval",
        "/root/reference/experiments/eval/MMMU/utils/eval_utils.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_mmmu_eval"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", sorted(OUTPUTS))
def test_golden_mmmu_judgments_match_reference(ref_eval, name):
    with open(OUTPUTS[name]) as f:
        output_dict = json.load(f)
    with open(ANSWER_DICT) as f:
        answer_dict = json.load(f)

    def build_samples(parse_open):
        samples = []
        for data_id, parsed_pred in output_dict.items():
            meta = answer_dict[data_id]
            if meta["question_type"] != "multiple-choice":
                parsed_pred = parse_open(parsed_pred)
            samples.append(
                {
                    "id": data_id,
                    "question_type": meta["question_type"],
                    "answer": meta["ground_truth"],
                    "parsed_pred": parsed_pred,
                }
            )
        return samples

    ours_samples = build_samples(ours.parse_open_response)
    ref_samples = build_samples(ref_eval.parse_open_response)

    our_judge, our_metrics = ours.evaluate(ours_samples)
    ref_judge, ref_metrics = ref_eval.evaluate(ref_samples)

    assert our_metrics["acc"] == ref_metrics["acc"]
    assert our_judge == ref_judge
