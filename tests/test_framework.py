"""Framework layer: registry, yaml config + dot overrides, metric logger,
LR schedulers, training runner with best-ckpt save/resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_registry_roundtrip():
    from llava_align_tpu.framework.registry import Registry

    r = Registry()

    @r.register_model("m1")
    class M:
        pass

    assert r.get_model_class("m1") is M
    r.register_path("cache", "/tmp/x")
    assert r.get_path("cache") == "/tmp/x"
    assert "m1" in r.list("model")
    with pytest.raises(KeyError):
        r.register("model", "m1", object())


def test_config_yaml_and_overrides(tmp_path):
    from llava_align_tpu.framework.config import Config

    p = tmp_path / "cfg.yaml"
    p.write_text("run:\n  max_epoch: 3\n  lr: 1e-4\nmodel:\n  arch: llava\n")
    cfg = Config(str(p), options=["run.max_epoch=5", "model.size=7", "run.new.flag=true"])
    assert cfg.run_cfg["max_epoch"] == 5
    assert cfg.model_cfg == {"arch": "llava", "size": 7}
    assert cfg.get("run.new.flag") is True
    assert cfg.get("missing.key", "d") == "d"
    cfg.validate(["run.max_epoch", "model.arch"])
    with pytest.raises(ValueError):
        cfg.validate(["nope"])


def test_smoothed_value_and_metric_logger():
    from llava_align_tpu.framework.logger import MetricLogger, SmoothedValue

    v = SmoothedValue(window_size=3)
    for x in [1, 2, 3, 4]:
        v.update(x)
    assert v.avg == 3.0  # window [2,3,4]
    assert v.global_avg == 2.5
    assert v.median == 3

    m = MetricLogger()
    m.update(loss=2.0)
    m.update(loss=4.0)
    assert m.global_avg()["loss"] == 3.0
    assert "loss" in str(m)


def test_lr_schedules():
    from llava_align_tpu.framework.optims import registry

    cos = registry.get_lr_scheduler_class("linear_warmup_cosine_lr")(
        init_lr=1.0, min_lr=0.1, warmup_steps=10, warmup_start_lr=0.0, max_steps=100
    )
    assert float(cos(0)) == 0.0
    assert abs(float(cos(10)) - 1.0) < 0.05  # cosine already decaying slightly
    assert abs(float(cos(100)) - 0.1) < 1e-6

    step = registry.get_lr_scheduler_class("linear_warmup_step_lr")(
        init_lr=1.0, min_lr=0.01, warmup_steps=0, decay_rate=0.1, steps_per_epoch=10
    )
    assert abs(float(step(5)) - 1.0) < 1e-6
    assert abs(float(step(15)) - 0.1) < 1e-6


def test_weight_decay_mask_matches_reference_split():
    """build_optimizer must reproduce the reference's decay split
    (base_model.py:107-120): no decay for ndim<2 params or bias/ln/bn/norm
    names; decay for plain matrices. Verified both on the mask and on an
    actual zero-grad AdamW update (only decayed params shrink)."""
    import jax.numpy as jnp

    from llava_align_tpu.framework.optims import build_optimizer, decay_mask

    params = {
        "w": jnp.ones((4, 4)),
        "bias": jnp.ones((4,)),
        "ln": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))},
        "norm_proj": {"kernel": jnp.ones((4, 4))},  # name rule beats ndim
        "emb": jnp.ones((8, 4)),
    }
    m = decay_mask(params)
    assert m["w"] and m["emb"]
    assert not m["bias"] and not m["ln"]["scale"] and not m["ln"]["bias"]
    assert not m["norm_proj"]["kernel"]

    tx = build_optimizer(
        lr_sched="constant_lr", init_lr=1.0, weight_decay=0.1, max_grad_norm=0.0
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert float(jnp.abs(new["w"]).max()) < 1.0  # decayed
    assert float(jnp.abs(new["bias"] - 1.0).max()) == 0.0  # not decayed
    assert float(jnp.abs(new["ln"]["scale"] - 1.0).max()) == 0.0


def test_runner_train_eval_resume(tmp_path):
    from llava_align_tpu.framework.runner import Runner, RunnerConfig

    # toy quadratic: params w, loss = (w - 3)^2 over "batches"
    import optax

    opt = optax.sgd(0.1)
    w0 = jnp.asarray(0.0)

    @jax.jit
    def step(w, opt_state, batch):
        loss, g = jax.value_and_grad(lambda w: (w - batch) ** 2)(w)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(w, updates), opt_state, loss

    evals = []

    def eval_fn(w):
        m = -float((w - 3.0) ** 2)
        evals.append(m)
        return {"agg_metrics": m}

    cfg = RunnerConfig(max_epoch=3, output_dir=str(tmp_path / "run"), log_freq=100)
    runner = Runner(cfg, step, w0, opt.init(w0), lambda e: [jnp.asarray(3.0)] * 20, eval_fn)
    stats = runner.train()
    assert abs(float(runner.params) - 3.0) < 1e-2
    assert (tmp_path / "run" / "checkpoint_best").exists()
    assert (tmp_path / "run" / "checkpoint_last").exists()

    # resume from last: start_epoch advances past max_epoch → no training
    cfg2 = RunnerConfig(
        max_epoch=3, output_dir=str(tmp_path / "run"),
        resume_ckpt_path=str(tmp_path / "run" / "checkpoint_last"),
    )
    runner2 = Runner(cfg2, step, w0, opt.init(w0), lambda e: [], eval_fn)
    runner2.train()
    assert runner2.start_epoch == 3
    assert abs(float(runner2.params) - 3.0) < 1e-2


def test_runner_iteration_mode(tmp_path):
    """runner_iter.py capability: fixed iters per inner epoch from an
    (endless) loader."""
    import itertools
    import optax
    from llava_align_tpu.framework.runner import Runner, RunnerConfig

    opt = optax.sgd(0.2)

    @jax.jit
    def step(w, opt_state, batch):
        loss, g = jax.value_and_grad(lambda w: (w - batch) ** 2)(w)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(w, updates), opt_state, loss

    def endless(epoch):
        return itertools.repeat(jnp.asarray(5.0))

    cfg = RunnerConfig(
        max_epoch=2, iters_per_inner_epoch=15,
        output_dir=str(tmp_path / "it"), log_freq=100,
    )
    r = Runner(cfg, step, jnp.asarray(0.0), opt.init(jnp.asarray(0.0)), endless, None)
    r.train()
    assert abs(float(r.params) - 5.0) < 1e-2


def test_runner_iteration_granular_resume(tmp_path):
    """reference runner_iter.py:49-85: checkpoints persist the global iter
    count and resume fast-forwards the (deterministic) loader instead of
    replaying it — the resumed run must consume batches 5..9, not 0..4."""
    import optax
    from llava_align_tpu.framework.runner import Runner, RunnerConfig

    opt = optax.sgd(0.0)  # lr 0: params untouched, we only watch the data

    @jax.jit
    def step(w, opt_state, batch):
        return w, opt_state, batch  # "loss" echoes the batch value

    consumed = []

    def loader(epoch):
        # deterministic stream: values 100*epoch + i
        for i in range(10):
            v = jnp.asarray(float(100 * epoch + i))
            consumed.append(float(v))
            yield v

    cfg = RunnerConfig(
        max_epoch=1, iters_per_inner_epoch=5,
        output_dir=str(tmp_path / "itr"), log_freq=100,
    )
    r = Runner(cfg, step, jnp.asarray(0.0), opt.init(jnp.asarray(0.0)), loader, None)
    r.train()
    assert r.global_step == 5
    assert consumed == [0.0, 1.0, 2.0, 3.0, 4.0]

    consumed.clear()
    cfg2 = RunnerConfig(
        max_epoch=2, iters_per_inner_epoch=5,
        output_dir=str(tmp_path / "itr"), log_freq=100,
        resume_ckpt_path=str(tmp_path / "itr" / "checkpoint_last"),
    )
    r2 = Runner(cfg2, step, jnp.asarray(0.0), opt.init(jnp.asarray(0.0)), loader, None)
    r2.train()
    # fast-forward re-drew 0..4, then inner epoch 1 trained on 5..9
    assert r2.global_step == 10
    assert consumed == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0]
