"""Measure the int8 stacked matmul at prefill row counts: Pallas streaming
kernel vs the XLA dequant path, on 7B llava shapes.

Round-3 question: the streaming kernel was decode-only (B<=64); a POPE
shared-prefix prefill runs ~600-1100 rows through the same stacks.  Which
path wins there decides `_STREAM_MAX_B` in ops/quant.py.

Technique: slope timing with device-side repetition — one jitted call runs
the whole L-layer pass R times (outer lax.scan), and the per-pass time is
the slope between two R values.  Anything per-dispatch (axon tunnel RPC,
host sync) cancels; a trailing np.asarray forces real completion
(block_until_ready alone can resolve before remote execution finishes).
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.ops import quant


def make_stack(key, L, O, D):
    # per-layer on-device generation: a whole-stack randint would materialize
    # an L*O*D uint32 bits buffer (12GB at 7B gateup shapes) and thrash HBM
    kq, ks = jax.random.split(key)
    gen = jax.jit(lambda k: jax.random.randint(k, (O, D), -127, 128, jnp.int8))
    q = jnp.stack([gen(jax.random.fold_in(kq, i)) for i in range(L)])
    s = jax.random.uniform(ks, (L, O), jnp.float32, 0.9, 1.1) * 0.01
    return {"q": jax.block_until_ready(q), "s": s}


def make_pass(impl, R):
    @functools.partial(jax.jit, static_argnames=())
    def f(wq, h):
        L = wq["q"].shape[0]

        def one_pass(hh, r):
            def body(c, li):
                o = quant.int8_matmul_stacked_dispatch(c, wq, li, impl=impl)
                Din = c.shape[-1]
                if o.shape[-1] >= Din:
                    fold = o[..., :Din]
                else:  # down: O < Din
                    fold = jnp.pad(o, ((0, 0), (0, Din - o.shape[-1])))
                return c + 1e-6 * fold.astype(c.dtype), ()

            out, _ = jax.lax.scan(body, hh, jnp.arange(L))
            return out, ()

        out, _ = jax.lax.scan(one_pass, h, jnp.arange(R))
        return out

    return f


def run_once(fn, wq, h):
    t0 = time.perf_counter()
    np.asarray(fn(wq, h)[0, :8])
    return time.perf_counter() - t0


def slope(impl, wq, h, r1, r2, reps):
    f1, f2 = make_pass(impl, r1), make_pass(impl, r2)
    run_once(f1, wq, h)  # compile
    run_once(f2, wq, h)
    t1 = min(run_once(f1, wq, h) for _ in range(reps))
    t2 = min(run_once(f2, wq, h) for _ in range(reps))
    return (t2 - t1) / (r2 - r1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--D", type=int, default=4096)
    ap.add_argument("--r1", type=int, default=2)
    ap.add_argument("--r2", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stacks", default="qkv,gateup,down")
    ap.add_argument("--rows", default="64,256,640,1024,2048")
    args = ap.parse_args()

    L, D = args.L, args.D
    key = jax.random.PRNGKey(0)
    # 7B llava stacks: fused qkv [12288, 4096], gateup [22016, 4096],
    # down [4096, 11008]
    all_stacks = {
        "qkv": (3 * D, D),
        "gateup": (22016, D),
        "down": (D, 11008),
    }
    stacks = {
        n: make_stack(jax.random.fold_in(key, i), L, *all_stacks[n])
        for i, n in enumerate(args.stacks.split(","))
    }
    int8_gb = sum(v["q"].size for v in stacks.values()) / 2**30
    print(f"int8 stacks: {int8_gb:.2f} GiB over {L} layers "
          f"(slope R={args.r1}->{args.r2}, min of {args.reps})", flush=True)

    for B in (int(b) for b in args.rows.split(",")):
        row = [f"B={B:5d}"]
        for name, wq in stacks.items():
            Din = wq["q"].shape[2]
            h = jax.random.normal(jax.random.fold_in(key, B), (B, Din), jnp.bfloat16)
            gb = wq["q"].size / 2**30
            blk = quant._choose_blocks(
                wq["q"].shape[1], wq["q"].shape[2], quant._round_up(B, 16)
            )
            per = {}
            for impl in ("pallas", "xla"):
                per[impl] = slope(impl, wq, h, args.r1, args.r2, args.reps)
            msg = f"{name}{'' if blk else '[no-blk]'}:"
            for impl in ("pallas", "xla"):
                dt = per[impl]
                msg += f" {impl}={dt*1e3:7.2f}ms({gb/dt:5.0f}GB/s)"
            msg += f" win={per['xla']/per['pallas']:.2f}x"
            row.append(msg)
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
