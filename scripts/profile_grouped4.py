"""Phase-attribute the PIPELINED grouped-POPE loop at 7B int8.

profile_grouped3 fits t = c0 + GB*g + T*d from steady-state rates; this
script decomposes c0 directly: in the submit(g+1)-then-collect(g) loop it
times host packing, input device transfers (jnp.asarray/_put), dispatch,
and the collect-side blocking fetch. Optionally issues
copy_to_host_async() on the outputs at submit time (--host-async) to see
whether the blocking fetch is request-latency or data-availability bound.
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=int, default=4)
    ap.add_argument("--new", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--host-async", action="store_true")
    ap.add_argument("--depth", type=int, default=1,
                    help="calls kept in flight (1 = runner's current pattern)")
    ap.add_argument("--exec-only", action="store_true",
                    help="N dispatches, ONE final collect: pure device rate")
    cli = ap.parse_args()

    from llava_align_tpu.config import GenerationConfig, LlavaConfig
    from llava_align_tpu.decoding.engine import DecodeEngine

    cfg = LlavaConfig.llava_v15_7b()
    t0 = time.perf_counter()
    params = bench._build_params(cfg, quant="int8")
    print(f"params built {time.perf_counter()-t0:.1f}s", flush=True)
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
        max_new_tokens=cli.new, do_sample=True, temperature=1.0,
        use_dd=True, use_dd_unk=True, cd_alpha=1.0, cd_beta=0.1,
        eos_token_id=10**9,
    )
    eng = DecodeEngine(params, cfg, gen, attn_impl="auto")
    gps = [(ids, suffixes, image)] * cli.gb
    t0 = time.perf_counter()
    eng.generate_batch_groups(gps)  # compile
    print(f"compiled {time.perf_counter()-t0:.1f}s", flush=True)

    stats = {"put": 0.0, "dispatch": 0.0}

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
        stats["dispatch"] += time.perf_counter() - t0
        if cli.host_async:
            for o in out:
                try:
                    o.copy_to_host_async()
                except Exception as e:  # noqa: BLE001 - report once
                    print("copy_to_host_async failed:", e, flush=True)
                    cli.host_async = False
                    break
        return out

    eng._compiled[key] = timed_fn

    if cli.exec_only:
        # dispatch the whole run up front, fetch only the final call: the
        # steady spacing between device completions with NO per-call fetch
        eng.generate_batch_groups(gps, rng=jax.random.PRNGKey(1))  # sync point
        t0 = time.perf_counter()
        handles = [
            eng.submit_batch_groups(gps, rng=jax.random.PRNGKey(300 + i))
            for i in range(cli.iters)
        ]
        eng.collect_batch_groups(handles[-1])
        dt = (time.perf_counter() - t0) / cli.iters
        print(f"exec-only: {1e3*dt:.1f} ms/call "
              f"({cli.gb * 6 / dt:.2f} samples/s)", flush=True)
        for h in handles[:-1]:
            eng.collect_batch_groups(h)
        return

    # warm pipelined loop (depth calls in flight), then measure
    from collections import deque

    pend = deque(
        eng.submit_batch_groups(gps, rng=jax.random.PRNGKey(50 + j))
        for j in range(max(1, cli.depth))
    )
    rows = []
    for i in range(cli.iters):
        stats["put"] = stats["dispatch"] = 0.0
        t0 = time.perf_counter()
        pend.append(eng.submit_batch_groups(gps, rng=jax.random.PRNGKey(100 + i)))
        t1 = time.perf_counter()
        eng.collect_batch_groups(pend.popleft())
        t2 = time.perf_counter()
        submit = t1 - t0
        pack = submit - stats["put"] - stats["dispatch"]
        rows.append((t2 - t0, pack, stats["put"], stats["dispatch"], t2 - t1))
        print(
            f"cycle={1e3*(t2-t0):7.1f}ms  pack={1e3*pack:6.1f} "
            f"put={1e3*stats['put']:6.1f} dispatch={1e3*stats['dispatch']:6.1f} "
            f"collect_block={1e3*(t2-t1):7.1f}",
            flush=True,
        )
    while pend:
        eng.collect_batch_groups(pend.popleft())
    arr = np.asarray(rows)
    med = np.median(arr, axis=0)
    print(
        f"\nmedian: cycle={1e3*med[0]:.1f}ms pack={1e3*med[1]:.1f} "
        f"put={1e3*med[2]:.1f} dispatch={1e3*med[3]:.1f} "
        f"collect_block={1e3*med[4]:.1f}  "
        f"(host_async={cli.host_async} depth={cli.depth})",
        flush=True,
    )


if __name__ == "__main__":
    main()
