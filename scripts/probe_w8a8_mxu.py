"""Bisect the W8A8 prefill matmul: where does the MXU int8 rate go?

The full W8A8 stack measured 211.8 TF/s at B=2560 (bench_w8a8_stack2.py) —
54% of the v5e's 394 TOPS int8 peak, while bf16 reaches 85% of its peak.
This probe separates: (1) pure int8 dot rate as XLA emits it, (2) the
dynamic per-row activation-quant cost, (3) the fp32 scale epilogue, using
the L=4 vs L=12 stacked-scan slope so remote-dispatch overhead cancels.

Usage: python scripts/probe_w8a8_mxu.py <B> <mode> [L]
  mode in {bf16, i8dot, i8dot_epi, w8a8, quantonly}
    bf16      x_bf16 @ w_bf16        (bf16 MXU reference)
    i8dot     xq_int8 @ q_int8 -> int32, sum              (pure MXU int8)
    i8dot_epi ... + fp32 a_scale*s epilogue -> bf16       (+ epilogue)
    w8a8      dynamic quant + dot + epilogue              (the real path)
    quantonly dynamic quant alone (abs-max, round, clip)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

D, O = 4096, 22016  # the 7B gateup stack (the big prefill matmul)
ITERS = 5


def run(B, mode, L):
    rng = np.random.default_rng(0)
    wq = jax.device_put(rng.integers(-127, 127, (L, O, D), dtype=np.int8))
    wb = jax.device_put(
        (rng.standard_normal((L, O, D)) * 0.01).astype(np.float16).astype(jnp.bfloat16)
    )
    s = jax.device_put((rng.random((L, O)) * 0.01).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal((B, D)) * 0.05, jnp.bfloat16)

    def quant(x):
        hf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
        a_scale = jnp.maximum(amax, 1e-30) / 127.0
        xq = jnp.clip(jnp.round(hf / a_scale), -127, 127).astype(jnp.int8)
        return xq, a_scale

    @jax.jit
    def stack(x, wq, wb, s):
        def layer(carry, _):
            x, li, acc = carry
            if mode == "bf16":
                w = jax.lax.dynamic_index_in_dim(wb, li, 0, keepdims=False)
                out = jax.lax.dot_general(
                    x, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc + jnp.sum(out)
            elif mode == "quantonly":
                xq, a_scale = quant(x)
                acc = acc + jnp.sum(xq.astype(jnp.float32)) + jnp.sum(a_scale)
            else:
                qi = jax.lax.dynamic_index_in_dim(wq, li, 0, keepdims=False)
                if mode == "w8a8":
                    xq, a_scale = quant(x)
                else:  # i8dot / i8dot_epi: quant hoisted out of the timing
                    xq = (x * 8.0).astype(jnp.int8)  # plain cast, no reduction
                    a_scale = jnp.full((B, 1), 1 / 8.0, jnp.float32)
                iacc = jax.lax.dot_general(
                    xq, qi, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                if mode == "i8dot":
                    acc = acc + jnp.sum(iacc)
                else:
                    si = jax.lax.dynamic_index_in_dim(s, li, 0, keepdims=False)
                    out = (iacc.astype(jnp.float32) * a_scale * si[None, :]).astype(
                        jnp.bfloat16
                    )
                    acc = acc + jnp.sum(out.astype(jnp.float32))
            # perturb x so nothing is loop-invariant (blocks hoisting)
            x = x * jnp.bfloat16(1.0 + 1e-7)
            return (x, li + 1, acc), ()

        acc0 = (
            jnp.asarray(0, jnp.int64)
            if mode == "i8dot"
            else jnp.asarray(0.0, jnp.float32)
        )
        (x, _, acc), _ = jax.lax.scan(
            layer, (x, jnp.asarray(0, jnp.int32), acc0), None, length=L
        )
        return acc.astype(jnp.float32) + jnp.sum(x.astype(jnp.float32)) * 1e-6

    _ = float(np.asarray(stack(x0, wq, wb, s)))  # compile
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = stack(x0, wq, wb, s)
    _ = float(np.asarray(out))  # dependent host fetch (tunnel-safe timing)
    dt = (time.perf_counter() - t0) / ITERS
    flops = 2 * B * L * D * O
    print(
        f"B={B:5d} {mode:10s} L={L:2d} {dt*1e3:8.2f}ms total "
        f"({dt/L*1e3:6.3f} ms/layer, {flops/dt/1e12:6.1f} TF/s)"
    )
    return dt


if __name__ == "__main__":
    B = int(sys.argv[1])
    mode = sys.argv[2]
    if len(sys.argv) > 3:
        run(B, mode, int(sys.argv[3]))
    else:
        t4 = run(B, mode, 4)
        t12 = run(B, mode, 12)
        per = (t12 - t4) / 8
        flops = 2 * B * D * O
        print(
            f"B={B:5d} {mode:10s} slope {per*1e3:6.3f} ms/layer "
            f"-> {flops/per/1e12:6.1f} TF/s"
        )
