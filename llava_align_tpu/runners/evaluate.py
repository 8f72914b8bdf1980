"""Config-driven evaluation entry point (the LAVIS `evaluate.py` surface).

Capability parity: LAVIS assembles every run from a YAML config — task,
model arch, dataset builders — through its registries and
`RunnerBase.evaluate` (reference lavis/common/config.py + runners/
runner_base.py; the reference repo vendors the machinery but drives its own
experiments through per-benchmark scripts instead). This CLI closes the
same loop on the registry in framework/: a YAML of the shape

    run:
      task: retrieval            # registry task name
      task_args: {...}           # optional task kwargs
      split: test                # which built split to evaluate
      k_test: 2                  # retrieval re-rank depth
    model:
      arch: albef_retrieval      # registry model arch
      model_path: null           # checkpoint dir, or null for random/tiny
    datasets:
      flickr_tiny:
        builder: retrieval
        synthetic_images: true
        build_info:
          test: {ann_paths: [/path/ann.json], vis_root: ""}

evaluates and prints one JSON metrics line. Tokenization for zoo models
without a bundled tokenizer uses a deterministic hash mock (the offline
smoke configuration used across tests) unless the model provides one.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from typing import Any, Dict

import numpy as np


def _mock_tokenize(texts, vocab: int = 64, length: int = 16):
    ids = np.zeros((len(texts), length), np.int64)
    for i, t in enumerate(texts):
        for j, w in enumerate(str(t).split()[:length]):
            ids[i, j] = abs(hash(w)) % (vocab - 2) + 1
    return ids, (ids != 0).astype(np.int64)


def _eval_retrieval(task, model, dataset, run_cfg: Dict[str, Any]) -> Dict[str, float]:
    import jax.numpy as jnp

    pixels = np.stack([dataset[i]["image"] for i in range(len(dataset.image))])
    vocab = getattr(model.cfg.text, "vocab_size", 64) if hasattr(model.cfg, "text") else 64
    ids, mask = _mock_tokenize(dataset.text, vocab=min(vocab, 30000))
    k_test = int(run_cfg.get("k_test", 0))
    task.sim_fn = lambda params, loader: model.compute_sim_matrix(
        jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask), k_test=k_test
    )
    results = task.evaluation(model.params, loader=None)
    return task.after_evaluation(
        results, txt2img=dataset.txt2img, img2txt=dataset.img2txt
    )


def _eval_classification(task, model, dataset, run_cfg) -> Dict[str, float]:
    import jax.numpy as jnp

    correct = total = 0
    for i in range(len(dataset)):
        s = dataset[i]
        vocab = getattr(getattr(model.cfg, "text", None), "vocab_size", 64) or 64
        ids, mask = _mock_tokenize([s["text_input"]], vocab=min(vocab, 30000))
        logits = model.predict(
            jnp.asarray(s["image"][None]), jnp.asarray(ids), jnp.asarray(mask)
        )
        pred = int(np.asarray(logits).argmax(-1)[0])
        correct += int(pred == int(s["label"]))
        total += 1
    acc = 100.0 * correct / max(total, 1)
    return {"acc": acc, "agg_metrics": acc, "n": total}


def main(argv=None) -> Dict[str, float]:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--cfg-path", required=True, help="run YAML")
    ap.add_argument(
        "--options", nargs="*", default=[],
        help="dot-list overrides, e.g. run.k_test=4 model.arch=blip_retrieval",
    )
    args = ap.parse_args(argv)

    import llava_align_tpu  # noqa: F401 — registers tasks/models/builders
    from llava_align_tpu.framework.config import Config
    from llava_align_tpu.framework.registry import registry

    cfg = Config(args.cfg_path, options=args.options)
    run_cfg = cfg.run_cfg
    task_name = run_cfg.get("task")
    task_cls = registry.get_task_class(task_name)
    if task_cls is None:
        raise KeyError(f"unknown task {task_name!r}")
    task = task_cls.setup_task(run_cfg)

    model = task.build_model(cfg.model_cfg)

    # default image processor sized to the model's vision tower when the
    # config doesn't name one (LAVIS resolves processors from the registry)
    from llava_align_tpu.framework.processors import BlipImageEvalProcessor

    mcfg = model.cfg
    vision = getattr(mcfg, "vision", None) or getattr(
        getattr(mcfg, "base", None), "vision", None
    )
    img_size = getattr(vision, "image_size", 224)
    default_proc = BlipImageEvalProcessor(image_size=img_size)
    datasets_cfg = {}
    for name, dcfg in cfg.datasets_cfg.items():
        dcfg = dict(dcfg)
        dcfg.setdefault(
            "vis_processors", {"train": default_proc, "eval": default_proc}
        )
        datasets_cfg[name] = dcfg
    datasets = task.build_datasets(datasets_cfg)
    split = run_cfg.get("split", "test")
    name, splits = next(iter(datasets.items()))
    if split not in splits:
        raise KeyError(f"dataset {name!r} has no split {split!r} (has {list(splits)})")
    dataset = splits[split]

    if task_name == "retrieval":
        metrics = _eval_retrieval(task, model, dataset, run_cfg)
    elif task_name == "multimodal_classification":
        metrics = _eval_classification(task, model, dataset, run_cfg)
    else:
        results = task.evaluation(model.params, loader=(
            dataset[i] for i in range(len(dataset))
        ))
        metrics = task.after_evaluation(results, split_name=split)
    print(json.dumps({"dataset": name, "split": split, **{
        k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
        for k, v in metrics.items()
    }}))
    return metrics


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    main()
