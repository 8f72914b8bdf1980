"""Split generate_batch_groups wall time into pack / put / dispatch / block.

Monkeypatches engine._put and the compiled fn to timestamp each phase.
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    from llava_align_tpu.config import GenerationConfig, LlavaConfig
    from llava_align_tpu.decoding.engine import DecodeEngine

    cfg = LlavaConfig.llava_v15_7b()
    params = bench._build_params(cfg, quant="int8")
    ids = bench._prompt_ids(52)
    H = cfg.vision.image_size
    image = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (3, H, H), 0, 256),
        dtype=np.uint8,
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
    eng = DecodeEngine(params, cfg, gen, attn_impl="auto")
    gps = [(ids, suffixes, image)]
    eng.generate_batch_groups(gps)  # compile

    stats = {"put": 0.0, "dispatch": 0.0, "exec_block": 0.0, "n": 0}

    orig_put = eng._put

    def timed_put(x):
        t0 = time.perf_counter()
        y = orig_put(x)
        stats["put"] += time.perf_counter() - t0
        return y

    eng._put = timed_put

    (key, fn), = [(k, v) for k, v in eng._compiled.items() if k[0] == "prefix"]

    def timed_fn(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        t1 = time.perf_counter()
        out = tuple(np.asarray(o) for o in out)
        t2 = time.perf_counter()
        stats["dispatch"] += t1 - t0
        stats["exec_block"] += t2 - t1
        stats["n"] += 1
        return out

    eng._compiled[key] = timed_fn

    iters = 5
    walls = []
    for i in range(iters):
        for k in ("put", "dispatch", "exec_block"):
            stats[k] = 0.0
        t0 = time.perf_counter()
        eng.generate_batch_groups(gps, rng=jax.random.PRNGKey(100 + i))
        wall = time.perf_counter() - t0
        pack = wall - stats["put"] - stats["dispatch"] - stats["exec_block"]
        walls.append((wall, pack, stats["put"], stats["dispatch"], stats["exec_block"]))
        print(
            f"wall={wall*1e3:7.1f}ms pack+fetch={pack*1e3:6.1f} put={stats['put']*1e3:6.1f} "
            f"dispatch={stats['dispatch']*1e3:6.1f} exec+block={stats['exec_block']*1e3:7.1f}",
            flush=True,
        )
    best = min(walls)
    print(f"\nbest: wall={best[0]*1e3:.1f}ms pack={best[1]*1e3:.1f} put={best[2]*1e3:.1f} "
          f"dispatch={best[3]*1e3:.1f} exec+block={best[4]*1e3:.1f}")


if __name__ == "__main__":
    main()
