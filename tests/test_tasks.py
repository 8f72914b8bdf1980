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
