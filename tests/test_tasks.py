"""Task layer tests."""

from llava_align_tpu.framework.registry import registry
from llava_align_tpu.framework.tasks import BaseTask, PopeTask


def test_task_registry():
    assert registry.get_task_class("base") is BaseTask
    assert registry.get_task_class("pope") is PopeTask


def test_pope_task_eval_flow():
    samples = [
        {"question_id": 0, "text": "Is there a dog?", "label": "yes"},
        {"question_id": 1, "text": "Is there a cat?", "label": "no"},
    ]

    def gen(params, sample):
        return "Yes" if sample["question_id"] == 0 else "No"

    task = PopeTask(generate_fn=gen)
    results = task.evaluation(None, samples, log_freq=100)
    metrics = task.after_evaluation(results)
    assert metrics["accuracy"] == 1.0
    assert metrics["agg_metrics"] == metrics["f1"] == 1.0


def test_base_task_build_model_via_registry():
    @registry.register_model("toy_arch")
    class Toy:
        def __init__(self, size=1):
            self.size = size

    task = BaseTask()
    m = task.build_model({"arch": "toy_arch", "size": 3})
    assert m.size == 3


def test_caption_task_flow(tmp_path):
    from llava_align_tpu.framework.tasks import CaptionTask

    def gen(params, sample, **kw):
        assert kw["num_beams"] == 3 and kw["max_length"] == 30
        return [f"caption {i}" for i in sample["image_id"]]

    task = CaptionTask(generate_fn=gen, result_dir=str(tmp_path))
    samples = [{"image_id": [1, 2]}, {"image_id": [2, 3]}]  # duplicate id 2
    results = task.evaluation(None, samples, log_freq=100)
    m = task.after_evaluation(results, split_name="val", epoch=0)
    assert m["n"] == 4
    import json, os
    saved = json.load(open(os.path.join(tmp_path, "val_epoch0.json")))
    assert [r["image_id"] for r in saved] == [1, 2, 3]  # deduped


def test_vqa_task_soft_accuracy(tmp_path):
    from llava_align_tpu.framework.tasks import VQATask, vqa_normalize

    assert vqa_normalize("The two dogs!") == "2 dogs"
    assert vqa_normalize("A cat.") == "cat"

    def gen(params, sample, **kw):
        return sample["_model_answer"]

    task = VQATask(generate_fn=gen, result_dir=str(tmp_path))
    samples = [
        {"question_id": 0, "_model_answer": "two",
         "gt_answers": ["2", "2", "2", "three"]},     # 3 matches -> 1.0
        {"question_id": 1, "_model_answer": "red",
         "gt_answers": ["red", "blue", "blue"]},      # 1 match -> 1/3
    ]
    results = task.evaluation(None, samples, log_freq=100)
    m = task.after_evaluation(results)
    assert abs(m["accuracy"] - 100.0 * (1.0 + 1.0 / 3.0) / 2) < 1e-6


def test_classification_task(tmp_path):
    from llava_align_tpu.framework.tasks import MultimodalClassificationTask

    task = MultimodalClassificationTask(
        predict_fn=lambda p, s: s["_pred"], result_dir=str(tmp_path)
    )
    samples = [
        {"question_id": 0, "_pred": "yes", "label": "yes"},
        {"question_id": 1, "_pred": "no", "label": "yes"},
    ]
    m = task.after_evaluation(task.evaluation(None, samples, log_freq=100))
    assert m["accuracy"] == 50.0


def test_new_tasks_registered():
    for name in ("captioning", "vqa", "multimodal_classification"):
        assert registry.get_task_class(name) is not None


def test_model_zoo_registry_assembly():
    """Every shipped family assembles by arch name through the registry
    (LAVIS lavis/models/__init__ capability)."""
    from llava_align_tpu.framework.tasks import BaseTask
    import llava_align_tpu.framework  # registers models  # noqa: F401

    task = BaseTask()
    for arch in ("llava", "llava_mpt", "qwen_vl", "blip2_vicuna_instruct",
                 "blip_caption", "blip_image_text_matching",
                 "blip_feature_extractor"):
        m = task.build_model({"arch": arch})
        assert m.params is not None and m.cfg is not None, arch


def test_zoo_blip_caption_generates():
    import numpy as np
    import jax.numpy as jnp
    from llava_align_tpu.framework.registry import registry
    import llava_align_tpu.framework  # noqa: F401

    cls = registry.get_model_class("blip_caption")
    m = cls()
    px = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 32, 32)), jnp.float32)
    caps = m.generate(px, [2, 9], max_new_tokens=3, eos_token_id=5)
    assert len(caps) == 1
