"""On-chip numerics verification: value-check every TPU-only code path
against an XLA/dequant reference ON THE REAL CHIP.

The CPU test suite exercises Pallas kernels in interpret mode and all
engine paths on the XLA CPU backend — it cannot catch a Mosaic miscompile
or a TPU-only dispatch branch going wrong on hardware. This script is the
hardware counterpart: run it on the chip after kernel or engine changes
(round-4 addition; motivated by a debugging session where grouped TPU
answers could not be cross-checked anywhere).

Checks (each prints PASS/FAIL, exits nonzero on any FAIL):
  1. int8 weight-streaming kernels (single + stacked + short-prefill
     streaming dispatch) vs the XLA dequant path, 7B shapes, decode and
     prefill row counts.
  2. int4 g128 transposed kernel vs its XLA fallback.
  3. W8A8 int8-MXU matmul vs a float emulation of the same integer math
     (the quantization is shared; only the MXU accumulate is kernel-side).
  4. Grouped shared-prefix engine decode: token-exact vs the UNSHARED
     engine on the same questions (the property tests/test_engine_prefix.py
     pins on CPU), at 7B shapes with int8 weights, greedy.
  5. bf16 flash-attention (Mosaic blockwise) vs XLA attention.

Usage:  python scripts/verify_on_chip.py [--model 7b] [--skip-engine]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILED = []


def check(name: str, ok: bool, detail: str = ""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    if not ok:
        FAILED.append(name)


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = max(float(np.sqrt(np.mean(a * a))), 1e-12)
    return float(np.max(np.abs(a - b))) / denom


def ulp_err(a, b):
    """Max |a-b| in units of the bf16 ulp at the reference's max magnitude.

    Both compared paths round outputs to bf16, so 1-2 ulps at the largest
    element is the noise floor (observed: int8 kernel vs XLA dequant sits
    at exactly 1 ulp of the max element, i.e. max-abs/RMS ~ 2^-5 at 7B
    shapes — a power-of-two quantum, not a kernel defect)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    ulp = max(float(np.max(np.abs(a))), 1e-12) * 2.0**-8
    return float(np.max(np.abs(a - b))) / ulp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b", choices=["7b", "tiny"])
    ap.add_argument("--skip-engine", action="store_true")
    args = ap.parse_args()

    from llava_align_tpu.ops import quant

    dev = jax.devices()[0]
    print(f"device: {dev}")
    on_tpu = dev.platform != "cpu"

    # ---- 1. int8 kernels vs XLA dequant --------------------------------
    key = jax.random.PRNGKey(0)
    L, O, D = 4, 12288, 4096  # 7B fused-qkv stack shape
    w = jax.random.normal(key, (L, O, D), jnp.float32) * (D**-0.5)
    wq = jax.jit(quant.quantize_weight)(w)
    wq = {"q": wq["q"], "s": wq["s"]}
    for B in (3, 18, 24, 128, 640):
        h = jax.random.normal(jax.random.fold_in(key, B), (B, D),
                              jnp.float32).astype(jnp.bfloat16)
        ref = quant.int8_matmul_xla(h, wq["q"][1], wq["s"][1])
        out = quant.int8_matmul_stacked_dispatch(h, wq, jnp.asarray(1))
        # the streaming kernel accumulates fp32 with post-scale vs XLA's
        # dequant-to-bf16 matmul: <=4 ulp of the max output is bf16 noise,
        # garbage (wrong tile/row) shows up as thousands of ulps
        e = ulp_err(np.asarray(ref, np.float32), np.asarray(out, np.float32))
        check(f"int8_stacked_dispatch_B{B}", e < 4.0, f"ulp={e:.2f}")

    # single (lm_head-shaped) matmul
    w2 = jax.random.normal(jax.random.fold_in(key, 7), (32000, D),
                           jnp.float32) * (D**-0.5)
    wq2 = jax.jit(quant.quantize_weight)(w2)
    h = jax.random.normal(jax.random.fold_in(key, 8), (3, D),
                          jnp.float32).astype(jnp.bfloat16)
    ref = quant.int8_matmul_xla(h, wq2["q"], wq2["s"])
    out = quant.int8_matmul(h, wq2)
    e = ulp_err(np.asarray(ref, np.float32), np.asarray(out, np.float32))
    check("int8_matmul_lmhead_B3", e < 4.0, f"ulp={e:.2f}")

    # ---- 2. int4 kernel vs XLA fallback --------------------------------
    try:
        w4 = jax.random.normal(jax.random.fold_in(key, 9), (L, 11008, D),
                               jnp.float32) * (D**-0.5)
        q4 = jax.jit(lambda x: jax.vmap(quant.quantize_weight_int4)(x))(w4)
        h = jax.random.normal(jax.random.fold_in(key, 10), (18, D),
                              jnp.float32).astype(jnp.bfloat16)
        ref = quant.int4_matmul_xla(h, q4["q4"][1], q4["gs"][1])
        out = quant.int4_matmul_stacked_dispatch(h, q4, jnp.asarray(1))
        e = ulp_err(np.asarray(ref, np.float32), np.asarray(out, np.float32))
        check("int4_stacked_dispatch_B18", e < 4.0, f"ulp={e:.2f}")
    except Exception as ex:  # keys differ per int4 tree layout
        check("int4_stacked_dispatch_B18", False, f"{type(ex).__name__}: {ex}")

    # ---- 3. W8A8 vs integer emulation ----------------------------------
    h = jax.random.normal(jax.random.fold_in(key, 11), (640, D),
                          jnp.float32).astype(jnp.bfloat16)
    out = quant.int8_matmul_w8a8(h, wq["q"][0], wq["s"][0].astype(jnp.float32))
    hf = np.asarray(h, np.float32)
    amax = np.max(np.abs(hf), axis=-1, keepdims=True)
    a_scale = np.maximum(amax, 1e-30) / 127.0
    hq = np.clip(np.round(hf / a_scale), -127, 127).astype(np.int64)
    acc = hq @ np.asarray(wq["q"][0], np.int64).T
    # mirror the kernel's epilogue exactly: int32-exact accumulate, fp32
    # scale multiplies, then the cast to the activation dtype (bf16)
    ref = (acc.astype(np.float32) * a_scale.astype(np.float32)
           * np.asarray(wq["s"][0], np.float32)[None, :])
    ref = np.asarray(jnp.asarray(ref).astype(jnp.bfloat16), np.float32)
    # XLA may reassociate the two fp32 scale multiplies -> the bf16 cast can
    # land 1 ulp away from the numpy emulation; the int32 accumulate itself
    # is exact (any real defect shows up as thousands of ulps)
    e = ulp_err(ref, np.asarray(out, np.float32))
    check("w8a8_vs_int_emulation_B640", e < 2.5, f"ulp={e:.2f}")

    # ---- 5. flash attention vs XLA --------------------------------------
    from llava_align_tpu.ops import attention as attn

    B, S, H, Dh = 2, 640, 32, 128
    q = jax.random.normal(jax.random.fold_in(key, 12), (B, S, H, Dh),
                          jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 13), (B, S, H, Dh),
                          jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 14), (B, S, H, Dh),
                          jnp.float32).astype(jnp.bfloat16)
    ref = attn.causal_attention(q, k, v, impl="xla")
    try:
        out = attn.causal_attention(q, k, v, impl="pallas")
        e = ulp_err(np.asarray(ref, np.float32), np.asarray(out, np.float32))
        check("flash_attention_640", e < 8.0, f"ulp={e:.2f}")
    except Exception as ex:
        check("flash_attention_640", not on_tpu, f"{type(ex).__name__} (ok off-TPU)")

    # ---- 4. grouped shared-prefix engine vs unshared, token-exact ------
    # free the kernel-check device buffers first: the 7B params build below
    # needs most of HBM (observed ResourceExhausted when these lingered)
    del w, wq, w2, wq2, h, ref, out, q, k, v
    try:
        del w4, q4
    except NameError:
        pass
    import gc

    gc.collect()
    if not args.skip_engine:
        from llava_align_tpu.config import GenerationConfig, LlavaConfig
        from llava_align_tpu.decoding.engine import DecodeEngine
        from llava_align_tpu.utils.synthetic import build_random_llava_params
        from llava_align_tpu.constants import IMAGE_TOKEN_INDEX

        cfg = (LlavaConfig.llava_v15_7b() if args.model == "7b"
               else LlavaConfig.tiny(vocab_size=1024))
        params = build_random_llava_params(cfg, quant="int8")
        rng = np.random.default_rng(3)
        vmax = min(20000, cfg.text.vocab_size - 1)
        prefix = [1] + rng.integers(10, vmax, size=51).tolist()
        prefix.insert(2, IMAGE_TOKEN_INDEX)
        sufs = [rng.integers(10, vmax, size=int(n)).tolist()
                for n in rng.integers(8, 24, size=6)]
        Himg = cfg.vision.image_size
        image = np.asarray(rng.integers(0, 256, (3, Himg, Himg)), np.uint8)
        gen = GenerationConfig(
            max_new_tokens=6, do_sample=False, use_dd=True, use_dd_unk=True,
            cd_alpha=1.0, cd_beta=0.1, eos_token_id=10**9,
        )
        eng = DecodeEngine(params, cfg, gen, attn_impl="auto")
        grouped = eng.generate_batch_groups([(prefix, sufs, image)])
        single = [eng.generate(prefix + s, image) for s in sufs]
        # First step: the grouped suffix prefill and the single-path prefill
        # must agree on the greedy token AND the top-k first-step scores —
        # this pins the shared-prefix attention + packing on hardware.
        ok1 = all(
            g.token_ids[:1] == s.token_ids[:1] for g, s in zip(grouped, single)
        )
        dmax = max(
            float(np.max(np.abs(
                np.asarray(g.first_scores_top_probs)
                - np.asarray(s.first_scores_top_probs)
            ))) for g, s in zip(grouped, single)
        )
        check("grouped_vs_single_first_token", ok1 and dmax < 5e-3,
              f"first={[s.token_ids[0] for s in single]} dprob={dmax:.5f}")
        # Full-sequence token-exactness is asserted only at tiny: at 7B with
        # random weights the fused top1-top2 gap piles up near zero (p1 ~
        # 0.004, scripts/w8a8_deviation.py), so the grouped and single decode
        # paths — different-but-both-correct attention decompositions, each
        # within a couple bf16 ulps — legitimately flip near-tied argmaxes
        # from step 2 on. Trained weights separate answer tokens by whole
        # logits; the tiny config's 1024-vocab gaps are wide enough to pin
        # exactness on hardware.
        if args.model == "tiny":
            ok = all(
                g.token_ids == s.token_ids for g, s in zip(grouped, single)
            )
            detail = "; ".join(
                f"{g.token_ids}=={s.token_ids}"
                for g, s in zip(grouped, single)
            )[:160]
            check("grouped_vs_single_token_exact", ok, detail)
        else:
            agree = sum(
                g.token_ids == s.token_ids for g, s in zip(grouped, single)
            )
            print(f"INFO  grouped_vs_single full-sequence agreement "
                  f"{agree}/{len(single)} (near-tie noise expected at "
                  f"random 7B weights; not a gate)")

        # int8 KV cache on hardware: first-step scores must match the bf16
        # cache within quantization tolerance (the prefill hidden state is
        # never quantized; the branches' cache reads are), and the grouped
        # path (quantized shared segments) must execute.
        keng = DecodeEngine(params, cfg, gen, attn_impl="auto", kv_quant="int8")
        ksingle = [keng.generate(prefix + s, image) for s in sufs]
        dmax_kv = max(
            float(np.max(np.abs(
                np.asarray(k.first_scores_top_probs)
                - np.asarray(s.first_scores_top_probs)
            ))) for k, s in zip(ksingle, single)
        )
        first_agree = sum(
            k.token_ids[:1] == s.token_ids[:1]
            for k, s in zip(ksingle, single)
        )
        check("kv_quant_first_step_probs", dmax_kv < 2e-2,
              f"dprob={dmax_kv:.5f} first_agree={first_agree}/{len(single)}")
        kgrouped = keng.generate_batch_groups([(prefix, sufs, image)])
        check("kv_quant_grouped_runs",
              all(len(g.token_ids) == 6 for g in kgrouped),
              f"lens={[len(g.token_ids) for g in kgrouped]}")

    print(f"\n{len(FAILED)} failure(s)" if FAILED else "\nall checks passed")
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
