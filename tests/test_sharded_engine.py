"""Mesh-sharded DecodeEngine ≡ single-device DecodeEngine (token-exact).

The north-star workload (BASELINE.json) is dual-branch VDD on a v5e-8 mesh;
the reference's counterpart capability is multi-GPU placement + synced
generation (reference builder.py:27 device_map='auto',
vcd_sample.py:94-102 synced_gpus). These tests run the SAME engine TP+DP
sharded over the 8-device CPU mesh and require bit-identical greedy token
traces vs the unsharded engine, for the llava and qwen adapters, on both the
single-question (split-bucket prefill) and lockstep-batch paths.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llava_align_tpu.config import ClipVisionConfig, GenerationConfig, LlamaConfig, LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding.adapters import QwenVLAdapter
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import llava, qwen_vl
from llava_align_tpu.models.qwen import QwenConfig
from llava_align_tpu.models.qwen_vit import QwenVisionConfig
from llava_align_tpu.models.qwen_vl import QwenVLConfig
from llava_align_tpu.parallel.mesh import make_mesh

EOS = 2


def _llava_cfg(m: int) -> LlavaConfig:
    text = LlamaConfig(
        vocab_size=32 * m, hidden_size=16 * m, intermediate_size=32 * m,
        num_layers=2, num_heads=2 * m, num_kv_heads=m, head_dim=8,
        dtype=jnp.float32,
    )
    vision = ClipVisionConfig(
        image_size=28, patch_size=14, hidden_size=8 * m,
        intermediate_size=16 * m, num_layers=2, num_heads=m, dtype=jnp.float32,
    )
    return LlavaConfig(text=text, vision=vision, mm_projector_type="mlp2x_gelu")


@pytest.fixture(scope="module")
def llava_setup():
    cfg = _llava_cfg(4)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    H = cfg.vision.image_size
    image = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, H, H), jnp.float32)
    )
    ids = [1, 40, 50, IMAGE_TOKEN_INDEX, 60, 70, 80]
    return cfg, params, image, ids


GEN = GenerationConfig(
    max_new_tokens=5, do_sample=False, eos_token_id=EOS,
    use_dd=True, use_dd_unk=True, cd_alpha=1.0, cd_beta=0.1,
)


def test_llava_tp_engine_matches_single_device(llava_setup):
    cfg, params, image, ids = llava_setup
    ref = DecodeEngine(params, cfg, GEN, attn_impl="xla", bucket=8).generate(ids, image)

    mesh = make_mesh(model=4, data=2)
    eng = DecodeEngine(params, cfg, GEN, attn_impl="xla", bucket=8, mesh=mesh)
    out = eng.generate(ids, image)
    assert out.token_ids == ref.token_ids
    np.testing.assert_allclose(
        out.first_scores_top_probs, ref.first_scores_top_probs, atol=1e-5
    )
    # params actually live sharded on the mesh
    q = eng.params["llama"]["layers"]["q"]
    assert len(q.sharding.device_set) == 8


def test_llava_dp_tp_engine_batch_matches_single_device(llava_setup):
    cfg, params, image, ids = llava_setup
    batch = [(ids, image), (ids + [90], image), (ids, None), ([1, 7, 9], None)]
    ref = DecodeEngine(params, cfg, GEN, attn_impl="xla", bucket=8).generate_batch(batch)

    mesh = make_mesh(model=4, data=2)  # R = 4 questions * 3 branches = 12 rows over data=2
    eng = DecodeEngine(params, cfg, GEN, attn_impl="xla", bucket=8, mesh=mesh)
    outs = eng.generate_batch(batch)
    for o, r in zip(outs, ref):
        assert o.token_ids == r.token_ids
        np.testing.assert_allclose(
            o.first_scores_top_probs, r.first_scores_top_probs, atol=1e-5
        )


def test_qwen_tp_engine_matches_single_device():
    text = QwenConfig(
        vocab_size=512, hidden_size=128, num_layers=2, num_heads=4, head_dim=32,
        intermediate_size=256, seq_length=2048, use_logn_attn=False,
        use_dynamic_ntk=False, dtype=jnp.float32,
    )
    vis = QwenVisionConfig(
        image_size=28, patch_size=14, width=32, num_layers=2, num_heads=2,
        mlp_ratio=2.0, n_queries=4, output_dim=128, dtype=jnp.float32,
    )
    cfg = QwenVLConfig(text=text, vision=vis, image_start_id=500)
    params = qwen_vl.init(jax.random.PRNGKey(0), cfg)
    image = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, 28, 28), jnp.float32))
    raw_ids = [10, 20] + qwen_vl.make_image_span_ids(cfg) + [30, 40, 50]
    ids, _ = qwen_vl.sentinelize_span(raw_ids, cfg)
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS,
        use_dd=True, cd_alpha=1.0, cd_beta=0.1,
    )
    ref = DecodeEngine(
        params, cfg, gen, adapter=QwenVLAdapter(cfg), attn_impl="xla", bucket=8
    ).generate(ids, image)

    mesh = make_mesh(model=4, data=2)
    eng = DecodeEngine(
        params, cfg, gen, adapter=QwenVLAdapter(cfg), attn_impl="xla", bucket=8,
        mesh=mesh,
    )
    out = eng.generate(ids, image)
    assert out.token_ids == ref.token_ids
    np.testing.assert_allclose(
        out.first_scores_top_probs, ref.first_scores_top_probs, atol=1e-5
    )


def test_compile_cache_logged_and_capped(llava_setup, caplog):
    cfg, params, image, ids = llava_setup
    eng = DecodeEngine(
        params, cfg, GEN, attn_impl="xla", bucket=8, max_compiled=1
    )
    with caplog.at_level(logging.INFO, logger="llava_align_tpu.engine"):
        eng.generate(ids, image)
        assert any("engine compile #1" in r.message for r in caplog.records)
        # second, longer prompt forces a new bucket → warn past the cap
        eng.generate(ids + list(range(3, 14)), image)
    assert len(eng._compiled) == 2
    assert any(r.levelno == logging.WARNING for r in caplog.records)


def test_pope_dry_sweep_compiles_bounded(llava_setup):
    """A drifting-prompt-length sweep must stay within a handful of programs
    (VERDICT weak #6): bucketing bounds distinct compile keys."""
    cfg, params, image, ids = llava_setup
    eng = DecodeEngine(params, cfg, GEN, attn_impl="xla", bucket=32)
    rng = np.random.default_rng(0)
    for _ in range(12):
        extra = [int(t) for t in rng.integers(3, 30, size=rng.integers(0, 20))]
        eng.generate(ids + extra, image)
    assert len(eng._compiled) <= 2  # one (pad_img, pad_txt) pair at bucket 32


def test_mpt_adapter_mesh_unshardable_kv_falls_back():
    """MQA (kv_heads=1) cannot shard the cache over 'model'; the engine must
    replicate it and still decode token-exact under the mesh."""
    import jax.numpy as jnp
    from llava_align_tpu.decoding.adapters import LlavaMptAdapter
    from llava_align_tpu.models import llava_mpt as lm

    from llava_align_tpu.models.mpt import MptConfig
    from llava_align_tpu.config import ClipVisionConfig

    cfg = lm.LlavaMptConfig(
        text=MptConfig.tiny(256, multiquery=True), vision=ClipVisionConfig.tiny()
    )
    params = lm.init(jax.random.PRNGKey(0), cfg)
    H = cfg.vision.image_size
    image = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, H, H), jnp.float32)
    )
    ids = [1, 40, IMAGE_TOKEN_INDEX, 60, 70]
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS,
        use_dd=True, use_dd_unk=True,
    )
    ref = DecodeEngine(
        params, cfg, gen, adapter=LlavaMptAdapter(cfg), attn_impl="xla", bucket=8
    ).generate(ids, image)
    mesh = make_mesh(model=2, data=4)
    eng = DecodeEngine(
        params, cfg, gen, adapter=LlavaMptAdapter(cfg), attn_impl="xla",
        bucket=8, mesh=mesh,
    )
    assert not eng._kv_shardable  # MQA: 1 kv head % 2 != 0
    out = eng.generate(ids, image)
    assert out.token_ids == ref.token_ids


def test_int8_tp_engine_matches_single_device():
    """Aligned int8 stacks run TRUE tensor-parallel (shard_map around the
    weight-streaming kernel: column-parallel qkv/gateup, row-parallel o/down
    with psum) — token-exact vs the unsharded int8 engine."""
    from llava_align_tpu.ops.quant import quantize_llama_params

    text = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=64,
        dtype=jnp.float32,
    )
    vision = ClipVisionConfig(
        image_size=28, patch_size=14, hidden_size=16, intermediate_size=32,
        num_layers=2, num_heads=2, dtype=jnp.float32,
    )
    cfg = LlavaConfig(text=text, vision=vision, mm_projector_type="mlp2x_gelu")
    params = llava.init(jax.random.PRNGKey(0), cfg)
    params = dict(params)
    params["llama"] = quantize_llama_params(params["llama"], fuse=True)
    H = cfg.vision.image_size
    image = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, H, H), jnp.float32)
    )
    ids = [1, 40, IMAGE_TOKEN_INDEX, 60, 70]
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS,
        use_dd=True, use_dd_unk=True,
    )
    ref = DecodeEngine(params, cfg, gen, attn_impl="xla", bucket=8).generate(ids, image)

    mesh = make_mesh(model=2, data=4)
    eng = DecodeEngine(params, cfg, gen, attn_impl="xla", bucket=8, mesh=mesh)
    assert eng._int8_tp  # per-shard dims are lane-aligned -> TP path active
    # quant stacks actually live sharded
    q = eng.params["llama"]["layers"]["qkv"]["q"]
    from jax.sharding import PartitionSpec as P
    assert q.sharding.spec == P(None, "model", None)
    out = eng.generate(ids, image)
    assert out.token_ids == ref.token_ids
    np.testing.assert_allclose(
        out.first_scores_top_probs, ref.first_scores_top_probs, atol=1e-4
    )


def test_int8_tp8_autopads_7b_alignment_case(caplog):
    """The flagship-config-on-flagship-mesh gap (VERDICT r2 #1): 7B's
    intermediate size (11008) is lane-aligned only at TP<=4; at model=8 the
    engine must auto-pad the gateup/down int8 stacks (bit-inert) and run the
    TRUE shard_map TP path — token-exact, NO replication warning."""
    import logging as _logging

    from jax.sharding import PartitionSpec as P

    from llava_align_tpu.ops.quant import quantize_llama_params

    # same alignment shape as 7B at TP=8: head dims align (head_dim 128-like),
    # intermediate/8 is NOT a 128-multiple (1408/8 = 176)
    text = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=1408,
        num_layers=2, num_heads=8, num_kv_heads=8, head_dim=128,
        dtype=jnp.float32,
    )
    vision = ClipVisionConfig(
        image_size=28, patch_size=14, hidden_size=16, intermediate_size=32,
        num_layers=2, num_heads=2, dtype=jnp.float32,
    )
    cfg = LlavaConfig(text=text, vision=vision, mm_projector_type="mlp2x_gelu")
    params = llava.init(jax.random.PRNGKey(0), cfg)
    params = dict(params)
    params["llama"] = quantize_llama_params(params["llama"], fuse=True)
    H = cfg.vision.image_size
    image = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, H, H), jnp.float32)
    )
    ids = [1, 40, IMAGE_TOKEN_INDEX, 60, 70]
    gen = GenerationConfig(
        max_new_tokens=3, do_sample=False, eos_token_id=EOS,
        use_dd=True, use_dd_unk=True,
    )
    ref = DecodeEngine(params, cfg, gen, attn_impl="xla", bucket=8).generate(ids, image)

    mesh = make_mesh(model=8, data=1)
    with caplog.at_level(_logging.WARNING, logger="llava_align_tpu.engine"):
        eng = DecodeEngine(params, cfg, gen, attn_impl="xla", bucket=8, mesh=mesh)
    assert eng._int8_tp  # padding unlocked the TP path
    assert not any("replicated" in r.message for r in caplog.records)
    gu = eng.params["llama"]["layers"]["gateup"]["q"]
    assert gu.shape[1] == 2 * 2048  # each 1408 half padded to 128*8-multiple
    assert gu.sharding.spec == P(None, "model", None)
    dn = eng.params["llama"]["layers"]["down"]["q"]
    assert dn.shape[2] == 2048 and dn.sharding.spec == P(None, None, "model")
    out = eng.generate(ids, image)
    assert out.token_ids == ref.token_ids
    np.testing.assert_allclose(
        out.first_scores_top_probs, ref.first_scores_top_probs, atol=1e-4
    )


def test_int8_tp_misaligned_falls_back_replicated(caplog):
    """Per-shard dims not 128-aligned -> warn + replicate, still correct."""
    import logging as _logging

    from llava_align_tpu.ops.quant import quantize_llama_params

    cfg = _llava_cfg(4)  # tiny dims: per-shard far below 128 lanes
    params = llava.init(jax.random.PRNGKey(0), cfg)
    params = dict(params)
    params["llama"] = quantize_llama_params(params["llama"], fuse=True)
    H = cfg.vision.image_size
    image = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, H, H), jnp.float32)
    )
    ids = [1, 40, IMAGE_TOKEN_INDEX, 60, 70]
    gen = GenerationConfig(max_new_tokens=3, do_sample=False, eos_token_id=EOS)
    ref = DecodeEngine(params, cfg, gen, attn_impl="xla", bucket=8).generate(ids, image)
    with caplog.at_level(_logging.WARNING, logger="llava_align_tpu.engine"):
        eng = DecodeEngine(
            params, cfg, gen, attn_impl="xla", bucket=8,
            mesh=make_mesh(model=4, data=2),
        )
    assert not eng._int8_tp
    assert any("replicated" in r.message for r in caplog.records)
    out = eng.generate(ids, image)
    assert out.token_ids == ref.token_ids
