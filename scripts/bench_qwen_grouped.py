"""Grouped POPE throughput at Qwen-7B shapes, int8 decoder.

Builds the quantized decoder leaf-by-leaf (a bf16 Qwen-7B tree would OOM the
chip beside its int8 copy) plus a bf16 visual tower, then measures the POPE
runner's execution layout: 6 questions/image sharing the <img>-span prefix
segment, per-question explicit 'unk' branch ids (qwen_calibrate.py:37), the
derived 'none' branch on the shared text-segment path, multi-group batching,
one call in flight.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from llava_align_tpu.decoding.adapters import QwenVLAdapter
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import qwen_vl
from llava_align_tpu.models.qwen_vl import QwenVLConfig
from llava_align_tpu.utils.synthetic import build_random_qwen_vl_params


def build_params(cfg):
    return build_random_qwen_vl_params(cfg, quant="int8")


def main():
    act_quant = "--act-quant" in sys.argv  # W8A8 prefill (ops/quant note)
    kv_quant = "int8" if "--kv-quant" in sys.argv else None  # int8 KV cache
    cfg = QwenVLConfig()  # Qwen-VL 7B defaults
    params = build_params(cfg)
    adapter = QwenVLAdapter(cfg)
    from llava_align_tpu.config import GenerationConfig

    gen = GenerationConfig(
        max_new_tokens=4, do_sample=True, temperature=1.0,
        use_dd=True, use_dd_unk=True, cd_alpha=1.0, cd_beta=0.1,
        eos_token_id=10**9,
    )
    eng = DecodeEngine(params, cfg, gen, adapter=adapter, bucket=64,
                       act_quant=act_quant, kv_quant=kv_quant)

    span = qwen_vl.make_image_span_ids(cfg)
    rngq = np.random.default_rng(3)
    Qg = 6
    prompts, bids = [], []
    for _ in range(Qg):
        q_ids = [int(t) for t in rngq.integers(100, 100000, size=10)]
        sent_ids, _ = qwen_vl.sentinelize_span(span + q_ids, cfg)
        prompts.append(sent_ids)
        # 'None {q} Answer:' — explicit short text branch
        bids.append({"unk": [151644] + q_ids})
    p = DecodeEngine.common_token_prefix(prompts)
    prefix = prompts[0][:p]
    suffixes = [ids[p:] for ids in prompts]
    H = cfg.vision.image_size
    image = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (3, H, H), 0, 256),
        dtype=np.uint8,
    ).astype(np.float32) / 255.0

    for GB in (1, 2):
        gps = [(prefix, suffixes, image, bids)] * GB
        eng.generate_batch_groups(gps)  # compile
        N = 8
        pending = None
        t0 = time.perf_counter()
        for i in range(N):
            h = eng.submit_batch_groups(gps, rng=jax.random.PRNGKey(100 + i))
            if pending is not None:
                eng.collect_batch_groups(pending)
            pending = h
        eng.collect_batch_groups(pending)
        dt = (time.perf_counter() - t0) / N
        label = ("w8a8" if act_quant else "int8") + ("+kvq" if kv_quant else "")
        print(
            f"qwen-7B {label} grouped POPE GB={GB}: {dt*1e3:.1f}ms/call "
            f"-> {GB*Qg/dt:.2f} samples/s (pipelined)",
            flush=True,
        )


if __name__ == "__main__":
    main()
