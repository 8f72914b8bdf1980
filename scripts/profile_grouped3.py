"""Slope-decompose the grouped-POPE call at 7B int8: fixed vs per-group vs
per-decode-step cost.

Pipelined steady-state per-call time t(GB, T) fit as
    t = c0 + GB * g + T * d
by varying T at GB=4 and GB at T=4. Attribution tells us whether the next
lever is prefill compute (per-group g), decode (d), or dispatch (c0).
"""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def steady_rate(eng, gps, iters=8):
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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--act-quant", action="store_true")
    ap.add_argument("--configs", default="4:4,2:4,8:4,4:1,4:2",
                    help="comma list of T:GB")
    cli = ap.parse_args()

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

    def make_engine(T):
        gen = GenerationConfig(
            max_new_tokens=T, do_sample=True, temperature=1.0,
            use_dd=True, use_dd_unk=True, cd_alpha=1.0, cd_beta=0.1,
            eos_token_id=10**9,
        )
        return DecodeEngine(params, cfg, gen, attn_impl="auto",
                            act_quant=cli.act_quant)

    rows = []
    for T, GB in [tuple(int(x) for x in c.split(":")) for c in cli.configs.split(",")]:
        eng = make_engine(T)
        gps = [(ids, suffixes, image)] * GB
        dt = steady_rate(eng, gps)
        rate = GB * G / dt
        rows.append((T, GB, dt))
        print(f"T={T} GB={GB}: {dt*1e3:8.2f} ms/call  {rate:6.2f} samples/s",
              flush=True)

    if len(rows) >= 3:
        # fit t = c0 + GB*g + T*d (least squares)
        A = np.array([[1.0, gb, T] for (T, gb, _) in rows])
        y = np.array([dt for (_, _, dt) in rows])
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        c0, g, d = coef
        print(f"fit: c0={c0*1e3:.1f}ms  per-group g={g*1e3:.1f}ms  "
              f"per-step d={d*1e3:.2f}ms (at GB=4, all rows)")


if __name__ == "__main__":
    main()
