"""Slope-time the PRODUCTION int4 stacked kernel (ops/quant.int4_matmul_stacked)
on 7B decode shapes, against the int8 kernel. L=4 vs L=12 cancels dispatch."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import time
import jax, jax.numpy as jnp
import numpy as np
from llava_align_tpu.ops.quant import (
    int4_matmul_stacked, int4_matmul_xla, int8_matmul_stacked,
    quantize_weight, quantize_weight_int4,
)

D, F, QD = 4096, 11008, 4096
B = 16
shapes = {"qkv": (3*QD, D), "o": (D, QD), "gateup": (2*F, D), "down": (D, F)}

def make(shape, dtype=jnp.bfloat16, seed=0):
    return jax.block_until_ready(jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32)*0.05).astype(dtype))(jax.random.PRNGKey(seed)))

def pack(q4):
    lo = q4[..., : q4.shape[-1] // 2] & 0xF
    hi = q4[..., q4.shape[-1] // 2 :] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)

def mk(L):
    # synthesize quantized tensors directly (a float master at L=12 OOMs the
    # 16GB chip alongside both quantized copies)
    w4, w8 = {}, {}
    for i, (k, s) in enumerate(shapes.items()):
        q = jax.block_until_ready(
            jax.random.randint(jax.random.PRNGKey(10 + i), (L,) + s, -8, 8, jnp.int8))
        gs = jax.block_until_ready(
            jnp.abs(make((L, s[0], s[1] // 128), jnp.float32, seed=40 + i)) + 0.01)
        w4[k] = {"q4": jax.block_until_ready(pack(q)), "gs": gs}
        w8[k] = {"q": q, "s": gs[..., 0]}
    return w4, w8

hs = {k: make((B, v[1]), seed=20+i) for i, (k, v) in enumerate(shapes.items())}

def timeit(f, *a, iters=30):
    np.asarray(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters

def mk_step(fn, L, keys=("q4", "gs")):
    @jax.jit
    def step(hs, ws):
        def body(c, i):
            acc = c
            for name in shapes:
                y = fn(hs[name], ws[name][keys[0]], ws[name][keys[1]], i)
                acc = acc + jnp.sum(y.astype(jnp.float32))
            return acc, None
        out, _ = jax.lax.scan(body, jnp.asarray(0.0), jnp.arange(L))
        return out
    return step

w4a, w8a = mk(4)
w4b, w8b = mk(12)
bytes4 = sum(np.prod(s) // 2 for s in shapes.values())

# on-chip correctness vs the XLA dequant path
got = np.asarray(int4_matmul_stacked(hs["qkv"], w4a["qkv"]["q4"], w4a["qkv"]["gs"], 1))
want = np.asarray(int4_matmul_xla(hs["qkv"], w4a["qkv"]["q4"][1], w4a["qkv"]["gs"][1]))
rel = np.abs(got.astype(np.float32) - want.astype(np.float32)).max() / np.abs(want).max()
print(f"kernel vs xla relerr: {rel:.2e}")

t4 = timeit(mk_step(int4_matmul_stacked, 4), hs, w4a)
t12 = timeit(mk_step(int4_matmul_stacked, 12), hs, w4b)
sl = (t12 - t4) / (8 * bytes4)
print(f"int4: t4={t4*1e3:.2f}ms t12={t12*1e3:.2f}ms slope-> {1/sl/1e9:.0f} GB/s raw ({2/sl/1e9:.0f} int8-equiv)")

t4 = timeit(mk_step(int8_matmul_stacked, 4, ("q", "s")), hs, w8a)
t12 = timeit(mk_step(int8_matmul_stacked, 12, ("q", "s")), hs, w8b)
sl8 = (t12 - t4) / (8 * bytes4 * 2)
print(f"int8: t4={t4*1e3:.2f}ms t12={t12*1e3:.2f}ms slope-> {1/sl8/1e9:.0f} GB/s  speedup {sl8*2/sl:.2f}x")
