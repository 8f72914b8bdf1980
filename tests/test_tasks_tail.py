"""LAVIS task-layer tail: GQA / A-OKVQA / VQA-RC / GQA-RC / Dialogue /
ImageTextPretrain / TextToImageGeneration tasks.

Scoring math is pinned against hand-computed values that re-enact the
reference formulas (lavis/tasks/vqa.py:193-230 GQA exact match,
:258-293 A-OKVQA min(1, matches/3); vqa_reading_comprehension.py:93-153
three-stream save). The VQA-RC integration test drives the real tiny
PnP-VQA pipeline end-to-end through the task, the way the reference task
drives PNPVQA.predict_answers.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llava_align_tpu.framework.registry import registry
from llava_align_tpu.framework import tasks as tasks_mod
from llava_align_tpu.framework.tasks import (
    AOKVQATask, DialogueTask, GQARCTask, GQATask, ImageTextPretrainTask,
    TextToImageGenerationTask, VQARCTask,
)


def test_all_reference_tasks_registered():
    # the reference's 11 task registrations (lavis/tasks/*.py @register_task)
    for name in (
        "captioning", "vqa", "gqa", "aok_vqa", "vqa_reading_comprehension",
        "gqa_reading_comprehension", "dialogue", "image_text_pretrain",
        "text-to-image-generation", "multimodal_classification", "retrieval",
    ):
        assert registry.get_task_class(name) is not None, name


def test_gqa_exact_match_scoring(tmp_path):
    answers = {1: "two.", 2: "A Cat", 3: "no"}
    task = GQATask(
        generate_fn=lambda p, s, **kw: answers[s["question_id"]],
        result_dir=str(tmp_path),
    )
    samples = [
        {"question_id": 1, "answer": "2"},      # "two." → "2": match
        {"question_id": 2, "answer": "cat"},    # "A Cat" → "cat": match
        {"question_id": 3, "answer": "yes"},    # miss
    ]
    results = task.evaluation(None, samples, log_freq=10)
    m = task.after_evaluation(results, split_name="val")
    assert m["acc"] == pytest.approx(100.0 * 2 / 3)
    assert os.path.exists(tmp_path / "val_vqa_result.json")


def test_gqa_leaderboard_dump_when_no_gt(tmp_path):
    task = GQATask(
        generate_fn=lambda p, s, **kw: "ans", result_dir=str(tmp_path)
    )
    results = task.evaluation(None, [{"question_id": 7, "answer": None}])
    m = task.after_evaluation(results, split_name="test")
    assert m == {}
    rows = json.load(open(tmp_path / "leaderboard.json"))
    assert rows == [{"questionId": "7", "prediction": "ans"}]


def test_aokvqa_soft_accuracy(tmp_path):
    # reference vqa.py:276-281: acc = min(1, #exact matches among direct
    # answers / 3), no normalization.
    answers = {"a": "dog", "b": "cat"}
    task = AOKVQATask(
        generate_fn=lambda p, s, **kw: answers[s["question_id"]],
        result_dir=str(tmp_path),
    )
    samples = [
        {"question_id": "a", "direct_answers": ["dog", "dog", "puppy", "dog", "wolf"]},
        {"question_id": "b", "direct_answers": ["dog"] * 5},
    ]
    results = task.evaluation(None, samples)
    m = task.after_evaluation(results)
    assert m["acc"] == pytest.approx(100.0 * (min(1.0, 3 / 3) + 0.0) / 2)


def test_aokvqa_leaderboard_dict_format(tmp_path):
    task = AOKVQATask(
        generate_fn=lambda p, s, **kw: "blue", result_dir=str(tmp_path)
    )
    results = task.evaluation(None, [{"question_id": "q9"}])
    assert task.after_evaluation(results) == {}
    board = json.load(open(tmp_path / "leaderboard.json"))
    assert board == {"q9": {"direct_answer": "blue", "multiple_choice": ""}}


def test_vqarc_three_streams_with_tiny_pnp_vqa(tmp_path):
    """The task drives the real tiny PnP-VQA model exactly as the reference
    VQARCTask drives PNPVQA.predict_answers (vqa_reading_comprehension.py:
    61-91), and after_evaluation writes gradcam/caption/vqa files (:93-116)."""
    from llava_align_tpu.models import pnp_vqa
    from llava_align_tpu.models.pnp_vqa import PnpVqaConfig

    V = 64
    cfg = PnpVqaConfig.tiny(vocab_size=V)
    params = pnp_vqa.init(jax.random.PRNGKey(0), cfg)

    def tokenize_q(texts):
        ids = np.full((len(texts), 6), 2, np.int64)
        return ids, np.ones_like(ids)

    def tokenize_ctx(texts):
        ids = np.full((len(texts), 8), 3, np.int64)
        return ids, np.ones_like(ids)

    decode = lambda row: " ".join(str(t) for t in row)

    def predict_answers_fn(p, sample, *, num_captions, num_captions_fid,
                           num_patches, cap_max_length, max_len, **kw):
        return pnp_vqa.predict_answers(
            p, cfg, jnp.asarray(sample["image"]), sample["text_input"],
            tokenize_q=tokenize_q, tokenize_ctx=tokenize_ctx,
            decode_cap=decode, decode_ans=decode, prompt_ids=[2, 5],
            rng=jax.random.PRNGKey(1), num_captions=num_captions,
            num_captions_fid=num_captions_fid, num_patches=num_patches,
            cap_max_length=cap_max_length, max_len=max_len, max_rounds=4,
        )

    task = VQARCTask(
        predict_answers_fn=predict_answers_fn, result_dir=str(tmp_path),
        num_captions=2, num_captions_fid=1, num_patches=2,
        cap_max_length=4, internal_bsz_fid=1,
    )
    rng = np.random.default_rng(0)
    sample = {
        "question_id": [11, 12],
        "image": rng.normal(size=(2, 3, 32, 32)).astype(np.float32),
        "text_input": ["what is this?", "how many?"],
    }
    results = task.evaluation(params, [sample])
    assert len(results) == 3  # [cams, caps, qa] per batch
    m = task.after_evaluation(results, split_name="val")
    assert m["n"] == 2
    qa = json.load(open(tmp_path / "val_vqa_result.json"))
    assert {r["question_id"] for r in qa} == {11, 12}
    caps = json.load(open(tmp_path / "val_caption_result.json"))
    assert len(caps) == 2 and all(isinstance(c["caption"], list) for c in caps)
    cams = np.load(tmp_path / "val_gradcam_result.npz")
    assert set(cams.files) == {"11", "12"}
    assert cams["11"].shape == (cfg.itm.vision.num_patches,)


def test_gqarc_scoring_and_generate_gating(tmp_path):
    def predict_answers_fn(p, sample, **kw):
        return (["Two."], [["cap"]], [np.zeros(4)])

    # inference_method=generate → prediction normalized → match
    task = GQARCTask(
        predict_answers_fn=predict_answers_fn, result_dir=str(tmp_path),
        inference_method="generate",
    )
    sample = {"question_id": [5], "answer": ["2"]}
    m = task.after_evaluation(task.evaluation(None, [sample]), split_name="v")
    assert m["acc"] == pytest.approx(100.0)

    # inference_method=rank → raw string compare → miss
    # (reference vqa_reading_comprehension.py:211-215 gates normalization)
    task2 = GQARCTask(
        predict_answers_fn=predict_answers_fn, result_dir=str(tmp_path / "b"),
        inference_method="rank",
    )
    m2 = task2.after_evaluation(task2.evaluation(None, [sample]), split_name="v")
    assert m2["acc"] == pytest.approx(0.0)


def test_dialogue_task_mean_loss():
    losses = iter([2.0, 4.0])
    task = DialogueTask(loss_fn=lambda p, s: next(losses))
    results = task.evaluation(None, [{"x": 1}, {"x": 2}])
    m = task.after_evaluation(results)
    assert m["agg_metrics"] == pytest.approx(3.0)
    task_off = DialogueTask(loss_fn=lambda p, s: 1.0, report_metric=False)
    assert task_off.after_evaluation([1.0])["agg_metrics"] == 0.0


def test_pretrain_and_t2i_tasks():
    t = ImageTextPretrainTask()
    assert t.evaluation(None, [{"a": 1}]) == []
    assert t.after_evaluation([])["agg_metrics"] == 0.0

    t2i = TextToImageGenerationTask.setup_task({"task_args": {}})
    assert isinstance(t2i, TextToImageGenerationTask)
    assert "run_cfg" in t2i.cfg
