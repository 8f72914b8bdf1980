"""Probe 3: repo-real comparison — current int8 dispatch vs W8A8, [L,O,D]
stacked layout, 4-layer 7B matmul scan (qkv/gateup/silu-glue/down).

Usage: python scripts/bench_w8a8_stack2.py <B> <mode>   mode in {current,w8a8}
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from llava_align_tpu.ops.quant import int8_matmul_stacked_dispatch  # noqa: E402

L, D, QKV_O, GU_O, FF = 4, 4096, 12288, 22016, 11008
ITERS = 5


def mm_w8a8(x, q, s, li):
    qi = jax.lax.dynamic_index_in_dim(q, li, 0, keepdims=False)  # [O, D]
    si = jax.lax.dynamic_index_in_dim(s, li, 0, keepdims=False)  # [O]
    hf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
    a_scale = jnp.maximum(amax, 1e-30) / 127.0
    xq = jnp.clip(jnp.round(hf / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, qi, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * a_scale * si[None, :]


def run(B, mode):
    rng = np.random.default_rng(0)

    def wq(O, Din):
        return {
            "q": jax.device_put(rng.integers(-127, 127, (L, O, Din), dtype=np.int8)),
            "s": jax.device_put((rng.random((L, O)) * .01).astype(np.float32)),
        }

    qkv, gu, dn = wq(QKV_O, D), wq(GU_O, D), wq(FF * 0 + D, FF)
    x0 = jnp.asarray(rng.standard_normal((B, D)) * .05, jnp.bfloat16)

    def mm(x, w, li):
        if mode == "w8a8":
            return mm_w8a8(x, w["q"], w["s"], li)
        return int8_matmul_stacked_dispatch(x, w, li)

    @jax.jit
    def stack(x, qkv, gu, dn):
        def layer(carry, _):
            x, li = carry
            o1 = mm(x, qkv, li)
            x = x + o1[:, :D].astype(x.dtype) * 1e-3
            o2 = mm(x, gu, li)
            g, u = o2[:, :FF], o2[:, FF:]
            h = (jax.nn.silu(g) * u).astype(x.dtype)
            o3 = mm(h, dn, li)
            x = x + o3.astype(x.dtype) * 1e-3
            return (x, li + 1), ()
        (x, _), _ = jax.lax.scan(layer, (x, jnp.asarray(0, jnp.int32)), None,
                                 length=L)
        return jnp.sum(x * 1e-6)

    print(f"compiling B={B} {mode}...", flush=True)
    _ = float(np.asarray(stack(x0, qkv, gu, dn)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = stack(x0, qkv, gu, dn)
    _ = float(np.asarray(out))
    dt = (time.perf_counter() - t0) / ITERS
    flops = 2 * B * L * (D * QKV_O + D * GU_O + FF * D)
    print(f"B={B:5d} {mode:8s} {dt*1e3:8.2f}ms  {flops/dt/1e12:6.1f} TF/s"
          f"  ({dt/L*1e3:6.3f} ms/layer)")


if __name__ == "__main__":
    run(int(sys.argv[1]), sys.argv[2])
