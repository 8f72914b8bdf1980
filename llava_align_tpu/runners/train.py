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
  * llava — multimodal next-token LM over spliced image+caption sequences
    (train/trainer.py multimodal_lm_loss; under a mesh GSPMD shards it
    DP/TP like __graft_entry__.dryrun_multichip).

Text tokenization: pass `run.tokenizer_path` (a local BERT vocab file) for
real checkpoints; without it the deterministic crc32 mock is used (offline
smoke — training on mock tokens is only meaningful for random-weight
models). Batches are reshuffled every epoch with a seeded permutation.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from typing import Any, Dict, Iterable, List

import numpy as np

from llava_align_tpu.runners.common import resolve_tokenizer


def _batches(dataset, batch_size: int, *, tokenize, epoch: int = 0,
             drop_last: bool = True):
    """Seeded per-epoch shuffle (contrastive losses need fresh in-batch
    negative sets each epoch); a trailing partial batch is dropped only when
    at least one full batch was produced — a dataset smaller than
    batch_size still yields its single partial batch."""
    rng = np.random.default_rng(epoch)
    idx = rng.permutation(len(dataset))
    yielded = False
    for lo in range(0, len(idx), batch_size):
        rows = [dataset[int(i)] for i in idx[lo : lo + batch_size]]
        if drop_last and len(rows) < batch_size and yielded:
            return
        batch = dataset.collater(rows)
        if "text_input" in batch:
            ids, mask = tokenize(batch["text_input"])
            batch["text_ids"], batch["text_mask"] = ids, mask
        yielded = True
        yield batch


def _make_train_step(arch: str, model, tx, amp: bool = False):
    """amp=True runs forward/backward in bfloat16 with fp32 master weights
    (framework.optims.amp_cast) — the TPU-native form of the reference's
    `amp: True` run knob (runner_base.py reads it; base_task.py:221
    autocast + GradScaler; bf16 needs no scaler)."""
    import jax
    import jax.numpy as jnp
    import optax

    from llava_align_tpu.framework.optims import amp_cast

    cast = amp_cast if amp else (lambda p: p)

    if arch == "albef_retrieval":
        from llava_align_tpu.models import albef

        cfg = model.cfg
        momentum = 0.995

        def init_state(params):
            m_params = jax.tree_util.tree_map(jnp.copy, params)
            qstate = albef.init_queue_state(cfg, jax.random.PRNGKey(1))
            return (tx.init(params), m_params, qstate, jax.random.PRNGKey(2))

        @jax.jit
        def step(params, ext, batch):
            opt_state, m_params, qstate, rng = ext
            rng, sub = jax.random.split(rng)

            # Under AMP the EMA update runs on the fp32 master weights here
            # (torch AMP semantics: autocast covers compute, not the
            # parameter EMA); the inner momentum=1.0 makes the loss use this
            # already-updated tree unchanged. Without AMP the update stays
            # inside the differentiated fn (identical math either way).
            if amp:
                m_params = albef.momentum_update(params, m_params, momentum)

            def loss_fn(p):
                losses, m2, q2 = albef.retrieval_train_step(
                    cast(p), cast(m_params), qstate, cfg, sub,
                    batch["image"], batch["text_ids"], batch["text_mask"],
                    batch["image_id"],
                    momentum=1.0 if amp else momentum,
                )
                return losses["loss"], (m2, q2)

            (loss, (m2, q2)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if amp:
                m2 = m_params  # keep the fp32 EMA, not its bf16 cast
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
                    cast(p), cfg, batch["image"], batch["text_ids"],
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
                    cast(p), cfg, batch["image"], batch["text_ids"]
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

    if arch == "llava":
        from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
        from llava_align_tpu.train import trainer

        cfg = model.cfg
        step = trainer.make_train_step(cfg, tx, donate=False, amp=amp)

        def init_state(params):
            return tx.init(params)

        def prep(batch):
            # caption rows → "<image> caption" LM sequences
            # (reference llava pretraining objective; llava_arch.py splice)
            samples = []
            for ids_row, img in zip(batch["text_ids"], batch["image"]):
                toks = [int(t) for t in np.asarray(ids_row).tolist() if t != 0]
                samples.append({
                    "input_ids": np.asarray(
                        [IMAGE_TOKEN_INDEX] + toks, np.int32
                    ),
                    "images": np.asarray(img),
                })
            max_txt = max(len(s["input_ids"]) for s in samples)
            # bucket to multiples of 16 so drifting caption lengths don't
            # re-jit the train step every batch (engine compile-cache rule)
            pad_to = cfg.num_image_tokens + ((max_txt + 15) // 16) * 16
            b = trainer.build_train_batch(cfg, samples, pad_to)
            import jax.numpy as jnp

            return {k: jnp.asarray(v) for k, v in b.items()}

        return step, init_state, prep

    raise ValueError(
        f"no config-driven train step for arch {arch!r}; supported: "
        "albef_retrieval, albef_classification, blip_classification, clip, "
        "llava"
    )


def main(argv=None) -> Dict[str, float]:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--cfg-path", required=True)
    ap.add_argument("--options", nargs="*", default=[])
    args = ap.parse_args(argv)

    import llava_align_tpu  # noqa: F401
    from llava_align_tpu.framework.config import Config
    from llava_align_tpu.framework.registry import registry
    from llava_align_tpu.framework.runner import Runner, RunnerConfig

    cfg = Config(args.cfg_path, options=args.options)
    run_cfg = cfg.run_cfg
    task_cls = registry.get_task_class(run_cfg.get("task", "base"))
    task = task_cls.setup_task(run_cfg)
    model = task.build_model(cfg.model_cfg)
    arch = cfg.model_cfg.get("arch")

    from llava_align_tpu.framework.datasets import build_datasets_for_model

    datasets = build_datasets_for_model(task, model, cfg.datasets_cfg)
    train_sets = [
        splits["train"] for splits in datasets.values() if "train" in splits
    ]
    if not train_sets:
        raise KeyError("no configured dataset has a 'train' split")

    lr = float(run_cfg.get("init_lr", 1e-4))
    batch_size = int(run_cfg.get("batch_size_train", 4))
    max_epoch = int(run_cfg.get("max_epoch", 1))
    iters_per_epoch = max(1, sum(len(ds) for ds in train_sets) // max(batch_size, 1))
    # reference optimizer assembly (runner_base.py:96-112 + base_model
    # get_optimizer_params): AdamW with the bias/norm no-decay split, lr
    # schedule by registered name with the run-config knob names
    from llava_align_tpu.framework.optims import build_optimizer

    tx = build_optimizer(
        lr_sched=run_cfg.get("lr_sched", "linear_warmup_cosine_lr"),
        weight_decay=float(run_cfg.get("weight_decay", 0.05)),
        beta2=float(run_cfg.get("beta2", 0.999)),
        max_grad_norm=float(run_cfg.get("max_grad_norm", 1.0)),
        init_lr=lr,
        min_lr=float(run_cfg.get("min_lr", 0.0)),
        warmup_steps=int(run_cfg.get("warmup_steps", 0)),
        warmup_start_lr=float(run_cfg.get("warmup_lr", -1.0)),
        max_steps=iters_per_epoch * max_epoch,
        steps_per_epoch=iters_per_epoch,
        decay_rate=float(run_cfg.get("lr_decay_rate", 1.0)),
        accum_grad_iters=int(run_cfg.get("accum_grad_iters", 1)),
    )
    amp = bool(run_cfg.get("amp", False))
    step, init_state, prep = _make_train_step(arch, model, tx, amp=amp)

    vocab = getattr(getattr(model.cfg, "text", None), "vocab_size", 64) or 64
    tokenize = resolve_tokenizer(run_cfg, vocab)

    def loader_fn(epoch: int) -> Iterable:
        import itertools

        return (
            prep(b)
            for b in itertools.chain.from_iterable(
                _batches(ds, batch_size, tokenize=tokenize, epoch=epoch)
                for ds in train_sets
            )
        )

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
