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
        # official leave-one-out rule (reference vqa_eval.py:217-231): for
        # each gt answer, min(1, matches-among-the-OTHERS / 3), averaged.
        # q0: the three '2's each see 2 other matches (2/3), 'three' sees 3
        #     matches (1.0) -> (3*(2/3) + 1) / 4 = 0.75
        #     (the simplified min(total/3, 1) rule would over-credit to 1.0)
        {"question_id": 0, "_model_answer": "two",
         "gt_answers": ["2", "2", "2", "three"]},
        # q1: 'red' sees 0 matches, each 'blue' sees 1 (1/3) ->
        #     (0 + 1/3 + 1/3) / 3 = 2/9
        {"question_id": 1, "_model_answer": "red",
         "gt_answers": ["red", "blue", "blue"]},
    ]
    results = task.evaluation(None, samples, log_freq=100)
    m = task.after_evaluation(results)
    assert abs(m["accuracy"] - 100.0 * (0.75 + 2.0 / 9.0) / 2) < 1e-6


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


def test_retrieval_task_recalls():
    """Recall math matches the reference retrieval.py:54-100 formulation on a
    hand-checkable case (BLIP ITC features drive sim_fn in practice)."""
    import numpy as np
    from llava_align_tpu.framework.tasks import RetrievalTask

    # 3 images, 6 texts (2 captions per image); block-diagonal similarity
    sims = np.full((3, 6), -1.0)
    for i in range(3):
        sims[i, 2 * i] = 2.0      # best caption
        sims[i, 2 * i + 1] = 1.0
    sims[0, 2] = 3.0              # image 0 prefers a WRONG caption → rank 1
    t2i = sims.T
    img2txt = {i: [2 * i, 2 * i + 1] for i in range(3)}
    txt2img = {t: t // 2 for t in range(6)}

    task = RetrievalTask(sim_fn=lambda p, l: (sims, t2i))
    res = task.evaluation(None, None)
    m = task.after_evaluation(res, txt2img=txt2img, img2txt=img2txt)
    # i2t: images 1,2 rank 0; image 0 best own-caption rank 1 → r1 = 2/3
    assert abs(m["txt_r1"] - 100.0 * 2 / 3) < 1e-6
    assert m["txt_r5"] == 100.0
    # t2i: text 2 now also ranks image 0 first -> its own image ranks 1
    assert m["img_r1"] < 100.0 and m["img_r10"] == 100.0
    assert "r_mean" in m


def test_blip_itc_features_drive_retrieval():
    import numpy as np
    import jax, jax.numpy as jnp
    from llava_align_tpu.models import blip
    from llava_align_tpu.models.blip import BlipConfig
    from llava_align_tpu.framework.tasks import RetrievalTask

    cfg = BlipConfig.tiny(vocab_size=64)
    params = blip.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(1, 64, (4, 5))
    mask = np.ones((4, 5), np.int32)

    def sim_fn(p, loader):
        f = blip.extract_features(
            p, cfg, pixels=jnp.asarray(px), text_ids=jnp.asarray(ids),
            text_mask=jnp.asarray(mask),
        )
        s = np.asarray(f["image_features"]) @ np.asarray(f["text_features"]).T
        return s, s.T

    task = RetrievalTask(sim_fn=sim_fn)
    res = task.evaluation(params, None)
    m = task.after_evaluation(
        res, txt2img={t: t // 2 for t in range(4)},
        img2txt={i: [2 * i, 2 * i + 1] for i in range(2)},
    )
    assert m["txt_r5"] == 100.0  # only 4 candidates
