"""Focused measurement: grouped POPE throughput, int8 weights, bf16 vs int8
KV cache (scale-folded reads), at GB in {4, 8}. Run on the real chip."""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def steady(eng, gps, iters=6):
    eng.generate_batch_groups(gps)  # compile
    pending = None
    t0 = time.perf_counter()
    for i in range(iters):
        h = eng.submit_batch_groups(gps, rng=jax.random.PRNGKey(200 + i))
        if pending is not None:
            eng.collect_batch_groups(pending)
        pending = h
    eng.collect_batch_groups(pending)
    return (time.perf_counter() - t0) / iters


def main():
    from llava_align_tpu.config import GenerationConfig, LlavaConfig
    from llava_align_tpu.decoding.engine import DecodeEngine

    cfg = LlavaConfig.llava_v15_7b()
    params = bench._build_params(cfg, quant="int8")
    ids = bench._prompt_ids(52)
    H = cfg.vision.image_size
    image = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (3, H, H), 0, 256), np.uint8
    )
    G = 6
    rngq = np.random.default_rng(3)
    suffixes = [
        [int(t) for t in rngq.integers(10, 20000, size=6)] for _ in range(G)
    ]
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=True, temperature=1.0,
        use_dd=True, use_dd_unk=True, cd_alpha=1.0, cd_beta=0.1,
        eos_token_id=10**9,
    )
    for kvq in (None, "int8"):
        eng = DecodeEngine(params, cfg, gen, attn_impl="auto", kv_quant=kvq)
        for GB in (4, 8) if kvq else (4,):
            gps = [(ids, suffixes, image)] * GB
            try:
                dt = steady(eng, gps)
                print(f"kvq={kvq} GB={GB}: {GB*G/dt:.2f} samples/s "
                      f"({dt*1e3:.0f} ms/call)")
            except Exception as e:
                print(f"kvq={kvq} GB={GB}: failed {type(e).__name__}: {e}")
        del eng


if __name__ == "__main__":
    main()
