"""Task abstraction: dataset/model assembly + train/eval orchestration hooks.

Capability parity: reference lavis/tasks/base_task.py — setup from config via
the registry (:32-84), train_epoch/_train_inner_loop delegation (:158-251),
evaluation loop collecting per-sample results (:86-120), after_evaluation
aggregation hook + save_result (:180-220). Concrete tasks override
`valid_step`/`after_evaluation`: captioning (lavis/tasks/captioning.py),
VQA with soft accuracy (lavis/tasks/vqa.py + common/vqa_tools/vqa_eval.py),
multimodal classification (lavis/tasks/multimodal_classification.py), and
this repo's PopeTask.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Callable, Dict, Iterable, List, Optional

from llava_align_tpu.framework.logger import MetricLogger
from llava_align_tpu.framework.registry import registry


def save_result(
    results: List[dict],
    result_dir: str,
    filename: str,
    remove_duplicate: Optional[str] = None,
) -> str:
    """Write per-sample results to json, deduplicating on a key (reference
    base_task.save_result; the dist-gather collapses to a no-op under SPMD
    where every host holds the full result list)."""
    os.makedirs(result_dir, exist_ok=True)
    if remove_duplicate:
        seen, deduped = set(), []
        for r in results:
            k = r.get(remove_duplicate)
            if k not in seen:
                seen.add(k)
                deduped.append(r)
        results = deduped
    path = os.path.join(result_dir, f"{filename}.json")
    with open(path, "w") as f:
        json.dump(results, f)
    logging.info("result file saved to %s", path)
    return path


@registry.register_task("base")
class BaseTask:
    def __init__(self, **kwargs):
        self.cfg = kwargs

    # -- assembly ------------------------------------------------------------

    @classmethod
    def setup_task(cls, run_cfg: Dict[str, Any]) -> "BaseTask":
        return cls(**run_cfg.get("task_args", {}))

    def build_model(self, model_cfg: Dict[str, Any]):
        arch = model_cfg.get("arch")
        model_cls = registry.get_model_class(arch)
        if model_cls is None:
            raise KeyError(f"unknown model arch {arch!r}")
        return model_cls(**{k: v for k, v in model_cfg.items() if k != "arch"})

    def build_datasets(self, datasets_cfg: Dict[str, Any]) -> Dict[str, Any]:
        datasets = {}
        for name, dcfg in datasets_cfg.items():
            builder_cls = registry.get_builder_class(dcfg.get("builder", name))
            if builder_cls is None:
                raise KeyError(f"unknown dataset builder {name!r}")
            datasets[name] = builder_cls(**{k: v for k, v in dcfg.items() if k != "builder"})
        return datasets

    # -- training ------------------------------------------------------------

    def train_epoch(
        self, epoch: int, train_step: Callable, state: tuple, loader: Iterable,
        *, log_freq: int = 50,
    ):
        """state = (params, opt_state); returns (state, stats)."""
        params, opt_state = state
        metrics = MetricLogger()
        for batch in metrics.log_every(loader, log_freq, header=f"Train epoch {epoch}"):
            params, opt_state, loss = train_step(params, opt_state, batch)
            metrics.update(loss=float(loss))
        return (params, opt_state), metrics.global_avg()

    # -- evaluation ----------------------------------------------------------

    def valid_step(self, params, sample) -> List[dict]:
        raise NotImplementedError

    def evaluation(self, params, loader: Iterable, *, log_freq: int = 50) -> List[dict]:
        metrics = MetricLogger()
        results: List[dict] = []
        for sample in metrics.log_every(loader, log_freq, header="Evaluation"):
            results.extend(self.valid_step(params, sample))
        return results

    def after_evaluation(self, results: List[dict], **kwargs) -> Dict[str, float]:
        return {"agg_metrics": 0.0, "n": len(results)}


@registry.register_task("captioning")
class CaptionTask(BaseTask):
    """Image captioning (reference lavis/tasks/captioning.py:16-85): generate
    with beam/len knobs, save {caption, image_id} results deduped on
    image_id. COCO CIDEr/BLEU scoring needs pycocoevalcap (not in this
    image), so report_metric defaults False and `metric_fn` is the hook."""

    def __init__(
        self,
        generate_fn: Optional[Callable] = None,
        num_beams: int = 3,
        max_len: int = 30,
        min_len: int = 8,
        evaluate: bool = True,
        report_metric: bool = False,
        metric_fn: Optional[Callable] = None,
        result_dir: str = "results",
        **kw,
    ):
        super().__init__(**kw)
        self.generate_fn = generate_fn
        self.num_beams = num_beams
        self.max_len = max_len
        self.min_len = min_len
        self.evaluate = evaluate
        self.report_metric = report_metric
        self.metric_fn = metric_fn
        self.result_dir = result_dir

    def valid_step(self, params, sample) -> List[dict]:
        captions = self.generate_fn(
            params, sample, num_beams=self.num_beams,
            max_length=self.max_len, min_length=self.min_len,
        )
        ids = sample["image_id"]
        if not isinstance(ids, (list, tuple)):
            ids, captions = [ids], [captions]
        return [
            {"caption": c, "image_id": int(i)} for c, i in zip(captions, ids)
        ]

    def after_evaluation(self, results, split_name="val", epoch=0, **kwargs):
        path = save_result(
            results, self.result_dir, f"{split_name}_epoch{epoch}",
            remove_duplicate="image_id",
        )
        if self.report_metric and self.metric_fn is not None:
            return self.metric_fn(path, split_name)
        return {"agg_metrics": 0.0, "n": len(results)}


_VQA_PUNCT = re.compile(r"[;/\[\]\"{}()=+\\_\-><@`,?!]")


def vqa_normalize(ans: str) -> str:
    """VQAv2 answer normalization (reference common/vqa_tools/vqa_eval.py):
    lowercase, strip punctuation/articles, digit words → digits."""
    ans = ans.replace("\n", " ").replace("\t", " ").strip().lower()
    ans = _VQA_PUNCT.sub("", ans)
    ans = ans.replace(".", "")
    digits = {
        "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
        "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
        "nine": "9", "ten": "10",
    }
    words = []
    for w in ans.split():
        w = digits.get(w, w)
        if w not in ("a", "an", "the"):
            words.append(w)
    return " ".join(words)


@registry.register_task("vqa")
class VQATask(BaseTask):
    """Open-ended VQA (reference lavis/tasks/vqa.py): generate short answers,
    save {question_id, answer}, and when per-question human answer lists are
    attached, score with the VQAv2 soft accuracy min(#matching humans / 3, 1)
    (reference vqa_eval.py accuracy rule)."""

    def __init__(
        self,
        generate_fn: Optional[Callable] = None,
        num_beams: int = 3,
        max_len: int = 10,
        min_len: int = 1,
        prompt: str = "",
        inference_method: str = "generate",
        result_dir: str = "results",
        **kw,
    ):
        super().__init__(**kw)
        self.generate_fn = generate_fn
        self.num_beams = num_beams
        self.max_len = max_len
        self.min_len = min_len
        self.prompt = prompt
        self.inference_method = inference_method
        self.result_dir = result_dir

    def valid_step(self, params, sample) -> List[dict]:
        answer = self.generate_fn(
            params, sample, num_beams=self.num_beams,
            max_length=self.max_len, min_length=self.min_len,
            prompt=self.prompt,
        )
        out = {"question_id": sample["question_id"], "answer": answer}
        if "gt_answers" in sample:
            out["gt_answers"] = sample["gt_answers"]
        return [out]

    def after_evaluation(self, results, split_name="val", **kwargs):
        save_result(
            results, self.result_dir, f"{split_name}_vqa_result",
            remove_duplicate="question_id",
        )
        scored = [r for r in results if r.get("gt_answers")]
        if not scored:
            return {"agg_metrics": 0.0, "n": len(results)}
        total = 0.0
        for r in scored:
            pred = vqa_normalize(str(r["answer"]))
            gts = [vqa_normalize(str(g)) for g in r["gt_answers"]]
            total += min(sum(1 for g in gts if g == pred) / 3.0, 1.0)
        acc = 100.0 * total / len(scored)
        logging.info("VQA accuracy: %.2f (%d scored)", acc, len(scored))
        return {"agg_metrics": acc, "accuracy": acc, "n": len(results)}


@registry.register_task("multimodal_classification")
class MultimodalClassificationTask(BaseTask):
    """Prediction-vs-label accuracy (reference
    lavis/tasks/multimodal_classification.py): valid_step emits
    {prediction, target}; after_evaluation reports accuracy."""

    def __init__(self, predict_fn: Optional[Callable] = None, result_dir: str = "results", **kw):
        super().__init__(**kw)
        self.predict_fn = predict_fn
        self.result_dir = result_dir

    def valid_step(self, params, sample) -> List[dict]:
        pred = self.predict_fn(params, sample)
        return [{
            "question_id": sample.get("question_id"),
            "prediction": pred,
            "target": sample.get("label"),
        }]

    def after_evaluation(self, results, split_name="val", **kwargs):
        save_result(results, self.result_dir, f"{split_name}_cls_result")
        n = len(results)
        correct = sum(1 for r in results if r["prediction"] == r["target"])
        acc = 100.0 * correct / max(n, 1)
        return {"agg_metrics": acc, "accuracy": acc, "n": n}


@registry.register_task("pope")
class PopeTask(BaseTask):
    """Eval-only task: samples are POPE jsonl rows; valid_step is supplied a
    generate callable; after_evaluation runs the plain scorer."""

    def __init__(self, generate_fn: Optional[Callable] = None, **kw):
        super().__init__(**kw)
        self.generate_fn = generate_fn

    def valid_step(self, params, sample) -> List[dict]:
        text = self.generate_fn(params, sample)
        return [{"question_id": sample["question_id"], "text": text,
                 "label": sample.get("label")}]

    def after_evaluation(self, results: List[dict], **kwargs) -> Dict[str, float]:
        from llava_align_tpu.evals.pope import score_pope

        gt = [{"question_id": r["question_id"], "label": r["label"]} for r in results]
        m = score_pope(gt, results)
        m["agg_metrics"] = m["f1"]
        logging.info("POPE eval: %s", m)
        return m
