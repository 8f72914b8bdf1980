"""int8 weight-only quantization: kernel correctness and end-to-end decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llava_align_tpu.config import GenerationConfig, LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import llava
from llava_align_tpu.ops.quant import (
    dequantize,
    int8_matmul_tpu,
    int8_matmul_xla,
    quantize_llama_params,
    quantize_weight,
)


def test_quantize_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 128)).astype(np.float32)
    wq = quantize_weight(jnp.asarray(w))
    w2 = np.asarray(dequantize(wq, jnp.float32))
    rel = np.abs(w2 - w).max() / np.abs(w).max()
    assert rel < 1.2 / 127  # per-channel absmax bound


def test_quantize_handles_zero_rows():
    w = jnp.zeros((4, 8), jnp.float32)
    wq = quantize_weight(w)
    assert np.all(np.asarray(dequantize(wq)) == 0)


def test_pallas_kernel_matches_xla():
    rng = np.random.default_rng(1)
    B, D, O = 24, 512, 256
    h = rng.normal(size=(B, D)).astype(np.float32)
    w = rng.normal(size=(O, D)).astype(np.float32)
    wq = quantize_weight(jnp.asarray(w))
    ref = np.asarray(int8_matmul_xla(jnp.asarray(h), wq["q"], wq["s"]))
    out = np.asarray(int8_matmul_tpu(jnp.asarray(h), wq["q"], wq["s"], interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)


def test_pallas_kernel_pads_ragged_batch():
    rng = np.random.default_rng(2)
    B, D, O = 3, 256, 256  # B not a multiple of the block
    h = rng.normal(size=(B, D)).astype(np.float32)
    w = rng.normal(size=(O, D)).astype(np.float32)
    wq = quantize_weight(jnp.asarray(w))
    ref = np.asarray(int8_matmul_xla(jnp.asarray(h), wq["q"], wq["s"]))
    out = np.asarray(int8_matmul_tpu(jnp.asarray(h), wq["q"], wq["s"], interpret=True))
    assert out.shape == (B, O)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)


def test_quantized_llava_decode_close_to_fp():
    cfg = LlavaConfig.tiny(vocab_size=97)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    qparams = dict(params)
    qparams["llama"] = quantize_llama_params(params["llama"])

    H = cfg.vision.image_size
    image = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, H, H), jnp.float32))
    ids = [1, 40, 50, IMAGE_TOKEN_INDEX, 60, 70]
    gen = GenerationConfig(max_new_tokens=4, do_sample=False, eos_token_id=2,
                           use_dd=True, use_dd_unk=True)
    fp = DecodeEngine(params, cfg, gen, attn_impl="xla", bucket=8).generate(ids, image)
    q8 = DecodeEngine(qparams, cfg, gen, attn_impl="xla", bucket=8).generate(ids, image)
    # random tiny weights are noise-sensitive: require the machinery to run
    # and the first-token distributions to be close
    assert len(q8.token_ids) >= 1
    fp_top = dict(zip(fp.first_scores_top_ids[:5].tolist(), fp.first_scores_top_probs[:5]))
    q8_top = dict(zip(q8.first_scores_top_ids[:5].tolist(), q8.first_scores_top_probs[:5]))
    common = set(fp_top) & set(q8_top)
    assert len(common) >= 3  # top-5 mostly agree
    for t in common:
        assert abs(fp_top[t] - q8_top[t]) < 0.05


def test_quantized_qwen_fused_matches_unfused_and_runs_engine():
    """int8 weight-only for the Qwen decoder (ops/quant.quantize_qwen_params):
    fused w12 == unfused w1/w2 exactly (per-output-channel scales), and the
    quantized model decodes through the engine's shared-prefix path."""
    from llava_align_tpu.config import GenerationConfig
    from llava_align_tpu.decoding.adapters import QwenVLAdapter
    from llava_align_tpu.decoding.engine import DecodeEngine
    from llava_align_tpu.models import qwen, qwen_vl
    from llava_align_tpu.models.qwen import QwenConfig
    from llava_align_tpu.models.qwen_vit import QwenVisionConfig
    from llava_align_tpu.models.qwen_vl import QwenVLConfig
    from llava_align_tpu.ops.quant import quantize_qwen_params

    tcfg = QwenConfig.tiny(vocab_size=128)
    params = qwen.init(jax.random.PRNGKey(0), tcfg)
    qf = quantize_qwen_params(params, fuse=True)
    qu = quantize_qwen_params(params, fuse=False)
    emb = qwen.embed_tokens(params, jnp.arange(6)[None])
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    hf, _ = qwen.forward(qf, tcfg, emb, pos, attn_impl="xla")
    hu, _ = qwen.forward(qu, tcfg, emb, pos, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hu), atol=1e-5, rtol=1e-4)
    lf = qwen.logits_from_hidden(qf, hf[:, -1])
    np.testing.assert_allclose(
        np.asarray(lf), np.asarray(qwen.logits_from_hidden(qu, hu[:, -1])),
        atol=1e-5, rtol=1e-4,
    )

    # end-to-end: quantized qwen-vl through the shared-prefix engine path
    vis = QwenVisionConfig(
        image_size=28, patch_size=14, width=32, num_layers=2, num_heads=2,
        mlp_ratio=2.0, n_queries=4, output_dim=tcfg.hidden_size,
        dtype=jnp.float32,
    )
    cfg = QwenVLConfig(text=tcfg, vision=vis, image_start_id=120)
    vparams = qwen_vl.init(jax.random.PRNGKey(1), cfg)
    vparams = dict(vparams, qwen=quantize_qwen_params(vparams["qwen"]))
    span = qwen_vl.make_image_span_ids(cfg)
    prefix, _ = qwen_vl.sentinelize_span([10, 20] + span + [30], cfg)
    image = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (3, 28, 28), jnp.float32)
    )
    gen = GenerationConfig(
        max_new_tokens=3, do_sample=False, eos_token_id=2,
        use_dd=True, cd_alpha=1.0, cd_beta=0.1,
    )
    eng = DecodeEngine(
        vparams, cfg, gen, adapter=QwenVLAdapter(cfg), attn_impl="xla", bucket=8
    )
    refs = [eng.generate(prefix + s, image) for s in ([40, 50], [60])]
    outs = eng.generate_batch_prefix(prefix, [[40, 50], [60]], image)
    for o, r in zip(outs, refs):
        assert o.token_ids == r.token_ids


def test_tp_lane_padding_is_bit_inert():
    """pad_llama_quantized_for_tp (VERDICT r2 #1): padded gateup halves emit
    exact-zero columns, padded down contraction ignores them — forward output
    matches the unpadded quantized model (only reduction regrouping noise:
    the padded values themselves are exact zeros)."""
    from llava_align_tpu.models import llama
    from llava_align_tpu.config import LlamaConfig
    from llava_align_tpu.ops.quant import int8_tp_aligned, int8_tp_mode, pad_llama_quantized_for_tp

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, dtype=jnp.float32,
    )
    params = llama.init(jax.random.PRNGKey(3), cfg)
    q = quantize_llama_params(params, fuse=True)
    n = 2
    padded_layers, changed = pad_llama_quantized_for_tp(q["layers"], n)
    assert changed
    qp = dict(q, layers=padded_layers)
    # 96/2 = 48: not lane-aligned; padded to 256-multiples per half
    assert padded_layers["gateup"]["q"].shape[1] == 2 * 256
    assert padded_layers["down"]["q"].shape[2] == 256
    for name in ("gateup", "down"):
        assert int8_tp_aligned(padded_layers[name], int8_tp_mode(name), n)
    # idempotent
    _, changed2 = pad_llama_quantized_for_tp(padded_layers, n)
    assert not changed2

    emb = llama.embed_tokens(params, jnp.arange(6)[None])
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    h0, _ = llama.forward(q, cfg, emb, pos, attn_impl="xla")
    h1, _ = llama.forward(qp, cfg, emb, pos, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6, rtol=1e-6)


def test_fused_quantization_matches_unfused():
    """qkv / gateup fusion preserves per-name quantization values (scales are
    per-output-channel, so quantizing the concatenation == the parts); logits
    match to matmul-regrouping fp tolerance."""
    from llava_align_tpu.models import llama
    from llava_align_tpu.config import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, dtype=jnp.float32,
    )
    params = llama.init(jax.random.PRNGKey(3), cfg)
    qf = quantize_llama_params(params, fuse=True)
    qu = quantize_llama_params(params, fuse=False)
    emb = llama.embed_tokens(params, jnp.arange(6)[None])
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    hf, _ = llama.forward(qf, cfg, emb, pos, attn_impl="xla")
    hu, _ = llama.forward(qu, cfg, emb, pos, attn_impl="xla")
    # quantized values themselves are bit-identical under the packing
    np.testing.assert_array_equal(
        np.asarray(qf["layers"]["qkv"]["q"][:, : qu["layers"]["q"]["q"].shape[1]]),
        np.asarray(qu["layers"]["q"]["q"]),
    )
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hu), atol=1e-5, rtol=1e-4)
    lf = llama.logits_from_hidden(qf, hf[:, -1])
    lu = llama.logits_from_hidden(qu, hu[:, -1])
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lu), atol=1e-5, rtol=1e-4)


def test_stacked_kernel_prefill_rows_match_xla():
    """Round-3 dispatch widening: the weight-streaming stacked kernel now
    also serves prefill-shaped row counts (64 < B <= _STREAM_MAX_B) for
    output-major stacks.  Pin the interpret-mode kernel against the XLA
    dequant path at a prefill B, and the dispatch boundary itself (streams
    below the ceiling for O >= D, XLA above, for reduction-major stacks at
    prefill rows, and wherever no VMEM block config exists)."""
    from llava_align_tpu.ops import quant

    rng = np.random.default_rng(7)
    L, O, D = 2, 512, 256
    q = jnp.asarray(rng.integers(-127, 128, size=(L, O, D), dtype=np.int8))
    s = jnp.asarray(rng.uniform(0.9, 1.1, size=(L, O)).astype(np.float32) * 0.01)
    B = 200  # prefill-shaped: above the old decode-only 64-row cutoff
    h = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    for li in (0, 1):
        ref = np.asarray(
            quant.int8_matmul_stacked_dispatch(h, {"q": q, "s": s}, li, impl="xla")
        )
        out = np.asarray(
            quant.int8_matmul_stacked_dispatch(
                h, {"q": q, "s": s}, li, impl="pallas_interpret"
            )
        )
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)

    # boundary: feasible block configs exist right up to the ceiling...
    Bp = quant._round_up(quant._STREAM_MAX_B, 16)
    assert quant._choose_blocks(O, D, Bp) is not None
    # ...and 7B's down projection (D=11008 halves only to 5504 under the
    # 128-lane constraint) correctly reports infeasible at large B — the
    # dispatcher falls back to XLA there instead of building a bad kernel
    assert quant._choose_blocks(4096, 11008, 640) is None
    assert quant._choose_blocks(4096, 11008, 64) is not None

    # the measured dispatch rule (scripts/bench_int8_prefill.py on a v5e):
    # everything streams at decode rows; output-major stacks (7B qkv
    # [12288,4096], gateup [22016,4096]) stream up to the ceiling; the
    # reduction-major down stack [4096,11008] loses to XLA at prefill rows
    # (0.55x at B=256) and streams only at decode rows
    assert quant._stream_rows_ok(64, 4096, 11008)
    assert quant._stream_rows_ok(quant._STREAM_MAX_B, 12288, 4096)
    assert quant._stream_rows_ok(256, 22016, 4096)
    assert not quant._stream_rows_ok(256, 4096, 11008)
    assert not quant._stream_rows_ok(quant._STREAM_MAX_B + 1, 12288, 4096)


# ---------------------------------------------------------------------------
# int4 weight-only (group-wise) — the reference load_4bit capability analog
# ---------------------------------------------------------------------------


def test_int4_quantize_roundtrip_error_small():
    from llava_align_tpu.ops.quant import dequantize_int4, quantize_weight_int4

    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 512)).astype(np.float32)
    wq = quantize_weight_int4(jnp.asarray(w), group=128)
    # transposed storage: contraction dim on sublanes, channels on lanes
    assert wq["q4"].shape == (256, 64) and wq["gs"].shape == (4, 64)
    w2 = np.asarray(dequantize_int4(wq, jnp.float32))
    # error bound: half a quantization step per group, step = absmax/7
    groups = w.reshape(64, 4, 128)
    bound = np.abs(groups).max(-1) / 7.0 / 2.0 + 1e-6
    err = np.abs(w2 - w).reshape(64, 4, 128).max(-1)
    assert np.all(err <= bound)


def test_int4_zero_and_extreme_values():
    from llava_align_tpu.ops.quant import dequantize_int4, quantize_weight_int4

    w = jnp.zeros((8, 256), jnp.float32)
    assert np.all(np.asarray(dequantize_int4(quantize_weight_int4(w))) == 0)
    # full-scale values land exactly on the +-7 code (absmax/7 scaling never
    # reaches the -8 code) and round-trip exactly
    w = jnp.full((8, 256), -3.0, jnp.float32)
    wq = quantize_weight_int4(w)
    w2 = np.asarray(dequantize_int4(wq, jnp.float32))
    np.testing.assert_allclose(w2, -3.0, rtol=1e-6)


def test_int4_pallas_kernel_matches_xla_multiblock():
    """interpret-mode stacked kernel == XLA dequant path, on shapes that
    exercise multiple D-grid steps (the in-kernel pl.ds group slicing)."""
    from llava_align_tpu.ops.quant import (
        _choose_blocks_int4,
        int4_matmul_stacked,
        int4_matmul_xla,
        quantize_weight_int4,
    )

    rng = np.random.default_rng(3)
    L, O, D = 2, 512, 16384  # Dp=8192 exceeds the VMEM budget -> bDp halves, nkh>1
    assert _choose_blocks_int4(O, D // 2, 16)[0] < D // 2
    w = rng.normal(size=(L, O, D)).astype(np.float32) * 0.05
    wq = quantize_weight_int4(jnp.asarray(w))
    h = jnp.asarray(rng.normal(size=(3, D)).astype(np.float32))  # ragged B
    for li in range(L):
        ref = np.asarray(int4_matmul_xla(h, wq["q4"][li], wq["gs"][li]))
        out = np.asarray(
            int4_matmul_stacked(h, wq["q4"], wq["gs"], li, interpret=True)
        )
        assert out.shape == (3, O)
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)


def test_int4_llava_decode_matches_dequantized_params_exactly():
    """Engine wiring: the int4 XLA path dequantizes to bf16 then matmuls, so
    decoding with int4 params must match decoding with the SAME weights
    dequantized to dense bf16 token-for-token — both paths see identical
    bf16 weight VALUES (the transposed [K, N] contraction does reorder the
    bf16 accumulation, so probs carry that noise but greedy tokens match)."""
    from llava_align_tpu.ops.quant import (
        dequantize_int4, is_quantized_int4, quantize_llama_params,
    )

    cfg = LlavaConfig.tiny(vocab_size=97)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    q4params = dict(params, llama=quantize_llama_params(
        params["llama"], bits=4, group=8))
    assert is_quantized_int4(q4params["llama"]["layers"]["qkv"])
    # lm_head stays int8 (near-lossless logits)
    assert "q" in q4params["llama"]["lm_head"]

    deq_layers = {
        k: dequantize_int4(v) if is_quantized_int4(v) else v
        for k, v in q4params["llama"]["layers"].items()
    }
    deqparams = dict(params, llama=dict(
        q4params["llama"], layers=deq_layers))

    H = cfg.vision.image_size
    image = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, H, H), jnp.float32))
    ids = [1, 40, 50, IMAGE_TOKEN_INDEX, 60, 70]
    gen = GenerationConfig(max_new_tokens=4, do_sample=False, eos_token_id=2,
                           use_dd=True, use_dd_unk=True)
    o4 = DecodeEngine(q4params, cfg, gen, attn_impl="xla", bucket=8).generate(ids, image)
    od = DecodeEngine(deqparams, cfg, gen, attn_impl="xla", bucket=8).generate(ids, image)
    assert o4.token_ids == od.token_ids
    # the transposed contraction + dequant fusion reorder bf16 accumulation
    # vs the dense run — tokens are exact, first-step probs agree to
    # accumulation-order noise
    np.testing.assert_allclose(
        o4.first_scores_top_probs, od.first_scores_top_probs, atol=2e-2
    )


def test_int4_fused_matches_unfused():
    """Group scales run along the contraction dim, so quantizing the fused
    qkv/gateup concatenation is bit-identical to quantizing the parts."""
    from llava_align_tpu.ops.quant import quantize_llama_params

    cfg = LlavaConfig.tiny(vocab_size=97)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    qf = quantize_llama_params(params["llama"], fuse=True, bits=4, group=8)
    qu = quantize_llama_params(params["llama"], fuse=False, bits=4, group=8)
    # transposed stacks [L, D/2, O]: the fused O axis is LAST
    f = np.asarray(qf["layers"]["qkv"]["q4"])
    parts = [np.asarray(qu["layers"][k]["q4"]) for k in ("q", "k", "v")]
    np.testing.assert_array_equal(f, np.concatenate(parts, axis=2))
    fg = np.asarray(qf["layers"]["gateup"]["gs"])
    pg = [np.asarray(qu["layers"][k]["gs"]) for k in ("gate", "up")]
    np.testing.assert_array_equal(fg, np.concatenate(pg, axis=2))


# ---------------------------------------------------------------------------
# W8A8: opt-in dynamic activation quant -> int8 MXU (prefill throughput mode)
# ---------------------------------------------------------------------------


def test_w8a8_matmul_matches_integer_emulation():
    """The int32 accumulation is exact; the whole op must match a numpy
    re-enactment of quantize -> integer matmul -> fp32 scale epilogue."""
    from llava_align_tpu.ops.quant import int8_matmul_w8a8

    rng = np.random.default_rng(7)
    B, D, O = 9, 64, 48
    h = rng.normal(size=(B, D)).astype(np.float32)
    q = rng.integers(-127, 127, size=(O, D), dtype=np.int8)
    s = (rng.random(O).astype(np.float32) * 0.02 + 1e-3)

    out = np.asarray(int8_matmul_w8a8(jnp.asarray(h), jnp.asarray(q), jnp.asarray(s)))

    amax = np.abs(h).max(axis=1, keepdims=True)
    a_scale = np.maximum(amax, 1e-30) / 127.0
    hq = np.clip(np.round(h / a_scale), -127, 127).astype(np.int8)
    acc = hq.astype(np.int32) @ q.astype(np.int32).T
    ref = acc.astype(np.float32) * a_scale * s[None, :]
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_w8a8_relative_error_vs_exact_dequant_small():
    """Activation quant adds bounded error on Gaussian data (weights keep
    their per-channel scales; only the activation rounds to 8 bits)."""
    from llava_align_tpu.ops.quant import int8_matmul_w8a8, int8_matmul_xla

    rng = np.random.default_rng(8)
    B, D, O = 32, 256, 128
    h = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    q = jnp.asarray(rng.integers(-127, 127, size=(O, D), dtype=np.int8))
    s = jnp.asarray(rng.random(O).astype(np.float32) * 0.02 + 1e-3)
    exact = np.asarray(int8_matmul_xla(h, q, s), np.float32)
    w8 = np.asarray(int8_matmul_w8a8(h, q, s), np.float32)
    rel = np.abs(w8 - exact).max() / np.abs(exact).max()
    assert rel < 0.02


def test_w8a8_dispatch_row_threshold():
    """act_quant routes only compute-bound row counts (>= _W8A8_MIN_B) to the
    W8A8 path; below that the dispatch is bit-identical to the exact path."""
    from llava_align_tpu.ops.quant import (
        _W8A8_MIN_B,
        int8_matmul_stacked_dispatch,
        int8_matmul_w8a8,
    )

    rng = np.random.default_rng(9)
    L, D, O = 2, 64, 32
    q = jnp.asarray(rng.integers(-127, 127, size=(L, O, D), dtype=np.int8))
    s = jnp.asarray(rng.random((L, O)).astype(np.float32) * 0.02 + 1e-3)
    wq = {"q": q, "s": s}
    li = jnp.asarray(1, jnp.int32)

    h_small = jnp.asarray(rng.normal(size=(_W8A8_MIN_B - 1, D)).astype(np.float32))
    base = np.asarray(int8_matmul_stacked_dispatch(h_small, wq, li))
    act = np.asarray(int8_matmul_stacked_dispatch(h_small, wq, li, act_quant=True))
    np.testing.assert_array_equal(base, act)

    h_big = jnp.asarray(rng.normal(size=(_W8A8_MIN_B, D)).astype(np.float32))
    act_big = np.asarray(
        int8_matmul_stacked_dispatch(h_big, wq, li, act_quant=True)
    )
    ref_big = np.asarray(int8_matmul_w8a8(h_big, q[1], s[1]))
    np.testing.assert_allclose(act_big, ref_big, rtol=1e-6, atol=1e-6)

    # leading dims flatten into the row count ([B, S, D] inputs)
    h3 = h_big.reshape(16, -1, D)
    act3 = np.asarray(int8_matmul_stacked_dispatch(h3, wq, li, act_quant=True))
    np.testing.assert_allclose(act3.reshape(-1, O), ref_big, rtol=1e-6, atol=1e-6)


def test_w8a8_tp_column_and_row_bitexact_vs_single_device():
    """Sharded W8A8 (VERDICT r3 #4): int8_matmul_stacked_tp(act_quant=True)
    must match the single-device W8A8 path BIT-FOR-BIT on the 8-way CPU mesh.
    column: full contraction per shard → same row scales. row: pmax'd global
    absmax + psum'd exact int32 partials + identical fp32 epilogue."""
    from llava_align_tpu.ops.quant import (
        _W8A8_MIN_B,
        int8_matmul_stacked_tp,
        int8_matmul_w8a8,
    )
    from llava_align_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(model=8, data=1)
    rng = np.random.default_rng(11)
    L, D, O, B = 2, 128 * 8, 64 * 8, _W8A8_MIN_B
    q = jnp.asarray(rng.integers(-127, 127, size=(L, O, D), dtype=np.int8))
    s = jnp.asarray(rng.random((L, O)).astype(np.float32) * 0.02 + 1e-3)
    wq = {"q": q, "s": s}
    li = jnp.asarray(1, jnp.int32)
    h = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    ref = np.asarray(int8_matmul_w8a8(h, q[1], s[1]))
    for mode in ("column", "row"):
        out = np.asarray(
            int8_matmul_stacked_tp(h, wq, li, mesh, mode, act_quant=True)
        )
        np.testing.assert_array_equal(out, ref, err_msg=mode)

    # below the row threshold act_quant is inert: identical to the exact TP path
    h_small = jnp.asarray(rng.normal(size=(_W8A8_MIN_B - 1, D)).astype(np.float32))
    for mode in ("column", "row"):
        base = np.asarray(int8_matmul_stacked_tp(h_small, wq, li, mesh, mode))
        act = np.asarray(
            int8_matmul_stacked_tp(h_small, wq, li, mesh, mode, act_quant=True)
        )
        np.testing.assert_array_equal(base, act, err_msg=mode)


def test_w8a8_tp_forward_matches_single_device_w8a8():
    """Full llama.forward under the model mesh with act_quant: the sharded
    W8A8 prefill matches the single-device W8A8 forward (B*S >= _W8A8_MIN_B
    so every stack takes the W8A8 route). The W8A8 matmuls themselves are
    bit-exact (previous test); the residual ~1e-6 here is GSPMD fp-ordering
    drift in the NON-quant ops (norms/attention), measured identical in
    magnitude on the exact-int8 TP path."""
    from llava_align_tpu.config import LlamaConfig
    from llava_align_tpu.models import llama
    from llava_align_tpu.ops.quant import _W8A8_MIN_B, quantize_llama_params
    from llava_align_tpu.parallel.mesh import make_mesh

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=16, dtype=jnp.float32,
    )
    params = llama.init(jax.random.PRNGKey(5), cfg)
    qp = dict(params, layers=quantize_llama_params(params, fuse=True)["layers"])
    mesh = make_mesh(model=8, data=1)

    B, S = 2, _W8A8_MIN_B // 2
    ids = jax.random.randint(jax.random.PRNGKey(6), (B, S), 0, cfg.vocab_size)
    emb = llama.embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))

    h_single, _ = llama.forward(qp, cfg, emb, pos, attn_impl="xla", act_quant=True)
    h_tp, _ = llama.forward(
        qp, cfg, emb, pos, attn_impl="xla", tp_mesh=mesh, act_quant=True
    )
    np.testing.assert_allclose(
        np.asarray(h_single), np.asarray(h_tp), atol=1e-5, rtol=1e-5
    )


def test_engine_act_quant_runs_and_first_step_close():
    """DecodeEngine(act_quant=True) exercises the W8A8 prefill path (3
    branches x 128-token bucket >= 256 rows) and stays distribution-close to
    the exact int8 engine."""
    cfg = LlavaConfig.tiny(vocab_size=97)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    qparams = dict(params)
    qparams["llama"] = quantize_llama_params(params["llama"])

    H = cfg.vision.image_size
    image = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, H, H), jnp.float32))
    ids = [1] + list(range(40, 80)) + [IMAGE_TOKEN_INDEX] + list(range(80, 120))
    gen = GenerationConfig(max_new_tokens=4, do_sample=False, eos_token_id=2,
                           use_dd=True, use_dd_unk=True)
    exact = DecodeEngine(qparams, cfg, gen, attn_impl="xla", bucket=128).generate(ids, image)
    w8 = DecodeEngine(qparams, cfg, gen, attn_impl="xla", bucket=128,
                      act_quant=True).generate(ids, image)
    assert len(w8.token_ids) >= 1
    e_top = dict(zip(exact.first_scores_top_ids[:5].tolist(),
                     exact.first_scores_top_probs[:5]))
    w_top = dict(zip(w8.first_scores_top_ids[:5].tolist(),
                     w8.first_scores_top_probs[:5]))
    common = set(e_top) & set(w_top)
    assert len(common) >= 3
    for t in common:
        assert abs(e_top[t] - w_top[t]) < 0.05
