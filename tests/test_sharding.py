"""DP+TP sharding on the 8-device CPU mesh: sharded results must equal
single-device results, and the trainer step must run under the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from llava_align_tpu.config import ClipVisionConfig, LlamaConfig, LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.models import llama, llava
from llava_align_tpu.parallel.mesh import make_mesh
from llava_align_tpu.parallel.sharding import (
    cache_shardings,
    llava_param_shardings,
    shard_params,
)
from llava_align_tpu.train.trainer import build_train_batch, make_optimizer, make_train_step


def _cfg(model_axis: int) -> LlavaConfig:
    text = LlamaConfig(
        vocab_size=32 * model_axis,
        hidden_size=16 * model_axis,
        intermediate_size=32 * model_axis,
        num_layers=2,
        num_heads=2 * model_axis,
        num_kv_heads=model_axis,
        head_dim=8,
        dtype=jnp.float32,
    )
    vision = ClipVisionConfig(
        image_size=28, patch_size=14, hidden_size=8 * model_axis,
        intermediate_size=16 * model_axis, num_layers=2, num_heads=model_axis,
        dtype=jnp.float32,
    )
    return LlavaConfig(text=text, vision=vision, mm_projector_type="mlp2x_gelu")


def test_eight_cpu_devices_available():
    assert len(jax.devices()) == 8


def test_tp_forward_matches_single_device():
    cfg = _cfg(4)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    ids = [1, 5, IMAGE_TOKEN_INDEX, 7, 8]
    H = cfg.vision.image_size
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 3, H, H)).astype(np.float32)
    )

    ref_logits, length = llava.forward_multimodal(params, cfg, ids, img, pad_to=16, attn_impl="xla")

    mesh = make_mesh(model=4, data=2)
    shardings = llava_param_shardings(cfg, mesh, params)
    sharded = shard_params(params, shardings)
    with mesh:
        tp_logits, _ = llava.forward_multimodal(sharded, cfg, ids, img, pad_to=16, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(tp_logits)[:length], np.asarray(ref_logits)[:length], atol=2e-4, rtol=1e-4
    )


def test_cache_shardings_shape():
    mesh = make_mesh(model=8, data=1)
    cs = cache_shardings(mesh)
    assert cs["k"].spec == P(None, None, None, "model", None)


def test_train_step_runs_on_mesh():
    cfg = _cfg(2)
    mesh = make_mesh(model=2, data=4)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    params = shard_params(params, llava_param_shardings(cfg, mesh, params))
    H = cfg.vision.image_size
    rng = np.random.default_rng(1)
    samples = [
        {"input_ids": [1, 5, IMAGE_TOKEN_INDEX, 7, 8, 9],
         "images": rng.normal(size=(3, H, H)).astype(np.float32)}
        for _ in range(8)
    ]
    batch = build_train_batch(cfg, samples, pad_to=16)
    batch = {
        k: jax.device_put(
            jnp.asarray(v), NamedSharding(mesh, P("data", *([None] * (np.asarray(v).ndim - 1))))
        )
        for k, v in batch.items()
    }
    opt = make_optimizer(lr=1e-3, warmup_steps=1, total_steps=8)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, attn_impl="xla", donate=False)
    losses = []
    with mesh:
        for _ in range(3):  # step 0 is warmup (lr=0); later steps must learn
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # repeated steps on same batch reduce loss


def test_graft_entry_and_dryrun():
    """entry() inline; the dryrun in a SUBPROCESS. In-process, late in a
    full suite, XLA:CPU's LLVM JIT segfaults while compiling the dryrun's
    while_loop program (observed three times at exactly this call — once
    even on a 256MB-stack worker thread, so it is not Python stack depth);
    standalone processes have never failed. The subprocess also matches how
    the driver itself executes the dryrun."""
    import os
    import subprocess
    import sys

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 32000

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for n in (8, 4):
        env = dict(
            os.environ,
            PYTHONPATH=repo,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={n}",
        )
        env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "__graft_entry__.py")],
            env=env, cwd=repo, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, f"dryrun({n}) failed:\n{r.stdout}\n{r.stderr}"
        assert f"dryrun_multichip ok: mesh=" in r.stdout and f"devices={n}" in r.stdout, r.stdout


def test_qwen_tp_matches_single_device():
    from llava_align_tpu.models import qwen
    from llava_align_tpu.models.qwen import QwenConfig
    from llava_align_tpu.parallel.sharding import qwen_param_shardings

    cfg = QwenConfig(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4, head_dim=16,
        intermediate_size=128, seq_length=64, use_logn_attn=False,
        use_dynamic_ntk=False, dtype=jnp.float32,
    )
    params = qwen.init(jax.random.PRNGKey(0), cfg)
    ids = np.random.default_rng(0).integers(0, 128, (1, 9))
    emb = qwen.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(9, dtype=jnp.int32)[None]
    ref_h, _ = qwen.forward(params, cfg, emb, pos, attn_impl="xla")
    ref = np.asarray(qwen.logits_from_hidden(params, ref_h))

    mesh = make_mesh(model=4, data=2)
    sharded = shard_params(params, qwen_param_shardings(mesh))
    with mesh:
        emb2 = qwen.embed_tokens(sharded, jnp.asarray(ids))
        h, _ = qwen.forward(sharded, cfg, emb2, pos, attn_impl="xla")
        tp = np.asarray(qwen.logits_from_hidden(sharded, h))
    np.testing.assert_allclose(tp, ref, atol=2e-4, rtol=1e-4)


def test_mpt_tp_matches_single_device():
    from llava_align_tpu.models import mpt
    from llava_align_tpu.models.mpt import MptConfig
    from llava_align_tpu.parallel.sharding import mpt_param_shardings

    cfg = MptConfig.tiny(vocab_size=128, multiquery=True)
    params = mpt.init(jax.random.PRNGKey(1), cfg)
    ids = np.random.default_rng(1).integers(0, 128, (1, 7))
    emb = mpt.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(7, dtype=jnp.int32)[None]
    ref_h, _ = mpt.forward(params, cfg, emb, pos)
    ref = np.asarray(mpt.logits_from_hidden(params, ref_h))

    mesh = make_mesh(model=2, data=4)
    sharded = shard_params(params, mpt_param_shardings(mesh))
    with mesh:
        emb2 = mpt.embed_tokens(sharded, jnp.asarray(ids))
        h, _ = mpt.forward(sharded, cfg, emb2, pos)
        tp = np.asarray(mpt.logits_from_hidden(sharded, h))
    np.testing.assert_allclose(tp, ref, atol=2e-4, rtol=1e-4)


def test_opt_tp_matches_single_device():
    from llava_align_tpu.models import opt
    from llava_align_tpu.models.opt import OptConfig
    from llava_align_tpu.parallel.sharding import opt_param_shardings

    cfg = OptConfig.tiny(vocab_size=128)
    params = opt.init(jax.random.PRNGKey(2), cfg)
    ids = np.random.default_rng(2).integers(0, 128, (1, 8))
    emb = opt.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(8, dtype=jnp.int32)[None]
    ref_h, _ = opt.forward(params, cfg, emb, pos)
    ref = np.asarray(opt.logits_from_hidden(params, ref_h))

    mesh = make_mesh(model=4, data=2)
    sharded = shard_params(params, opt_param_shardings(mesh))
    with mesh:
        emb2 = opt.embed_tokens(sharded, jnp.asarray(ids))
        h, _ = opt.forward(sharded, cfg, emb2, pos)
        tp = np.asarray(opt.logits_from_hidden(sharded, h))
    np.testing.assert_allclose(tp, ref, atol=2e-4, rtol=1e-4)
