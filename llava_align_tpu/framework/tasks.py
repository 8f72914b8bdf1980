"""Task abstraction: dataset/model assembly + train/eval orchestration hooks.

Capability parity: reference lavis/tasks/base_task.py — setup from config via
the registry (:32-84), train_epoch/_train_inner_loop delegation (:158-251),
evaluation loop collecting per-sample results (:86-120), after_evaluation
aggregation hook. Concrete tasks override `valid_step`/`after_evaluation`.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Iterable, List, Optional

from llava_align_tpu.framework.logger import MetricLogger
from llava_align_tpu.framework.registry import registry


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
