"""Phase bisection of the grouped shared-prefix POPE path (7B int8, one chip).

Times generate_batch_groups under configurations that isolate:
  - text-only degraded rows (dual vs single branch)
  - decode steps (T=4 vs T=1)
  - host/dispatch overlap (two calls enqueued back-to-back)

Usage: python scripts/profile_grouped.py [--quant int8] [--model 7b]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (reuse _build_params/_prompt_ids)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b")
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--text-len", type=int, default=52)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from llava_align_tpu.config import GenerationConfig, LlavaConfig
    from llava_align_tpu.decoding.engine import DecodeEngine

    cfg = (
        LlavaConfig.llava_v15_7b()
        if args.model == "7b"
        else LlavaConfig.tiny(vocab_size=1024)
    )
    params = bench._build_params(cfg, quant=args.quant)
    ids = bench._prompt_ids(args.text_len)
    H = cfg.vision.image_size
    image = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (3, H, H), 0, 256),
        dtype=np.uint8,
    )
    NO_EOS = 10**9
    G = 6
    rngq = np.random.default_rng(3)
    suffixes = [
        [int(t) for t in rngq.integers(10, 20000, size=6)] for _ in range(G)
    ]

    def make_engine(max_new, dual):
        gen = GenerationConfig(
            max_new_tokens=max_new,
            do_sample=True,
            temperature=1.0,
            use_dd=dual,
            use_dd_unk=dual,
            cd_alpha=1.0,
            cd_beta=0.1,
            eos_token_id=NO_EOS,
        )
        return DecodeEngine(params, cfg, gen, attn_impl="auto")

    def timeit(label, eng, gb=1):
        gps = [(ids, suffixes, image)] * gb
        eng.generate_batch_groups(gps)  # compile
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            eng.generate_batch_groups(gps, rng=jax.random.PRNGKey(100 + i))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(
            f"{label:34s} gb={gb} best={best*1e3:8.1f}ms "
            f"per_group={best/gb*1e3:8.1f}ms samples/s={gb*G/best:6.2f}",
            flush=True,
        )
        return best

    t_dual_4 = timeit("dual T=4 (headline)", make_engine(4, True))
    t_dual_1 = timeit("dual T=1", make_engine(1, True))
    t_sing_4 = timeit("single-branch T=4", make_engine(4, False))
    t_sing_1 = timeit("single-branch T=1", make_engine(1, False))
    timeit("dual T=4 GB=2", make_engine(4, True), gb=2)
    timeit("dual T=4 GB=4", make_engine(4, True), gb=4)

    print(f"\n3 decode steps dual (18 rows): {(t_dual_4-t_dual_1)*1e3:.1f}ms "
          f"-> {(t_dual_4-t_dual_1)/3*1e3:.1f}ms/step")
    print(f"3 decode steps single (6 rows): {(t_sing_4-t_sing_1)*1e3:.1f}ms "
          f"-> {(t_sing_4-t_sing_1)/3*1e3:.1f}ms/step")
    print(f"txt rows + extra decode rows (T=1 dual-single): "
          f"{(t_dual_1-t_sing_1)*1e3:.1f}ms")


if __name__ == "__main__":
    main()
