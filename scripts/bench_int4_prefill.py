"""int4 prefill dispatch: transposed streaming kernel vs XLA dequant at
prefill row counts (B in {256, 640}), 7B stacks, slope-timed over L."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import time
import jax, jax.numpy as jnp
import numpy as np
from llava_align_tpu.ops.quant import int4_matmul_stacked, int4_matmul_xla

D, F, QD = 4096, 11008, 4096
shapes = {"qkv": (3*QD, D), "o": (D, QD), "gateup": (2*F, D), "down": (D, F)}

def make(shape, dtype=jnp.bfloat16, seed=0):
    return jax.block_until_ready(jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32)*0.05).astype(dtype))(jax.random.PRNGKey(seed)))

def mk(L):
    w = {}
    for i, (k, s) in enumerate(shapes.items()):
        O_, D_ = s
        q4 = jax.block_until_ready(jax.random.randint(jax.random.PRNGKey(10 + i), (L, D_ // 2, O_), -128, 128, jnp.int8))
        gs = jax.block_until_ready(jnp.abs(make((L, D_ // 128, O_), jnp.float32, seed=40 + i)) + 0.01)
        w[k] = {"q4": q4, "gs": gs}
    return w

def timeit(f, *a, iters=10):
    np.asarray(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters

w2 = mk(2)
w6 = mk(6)
bytes4 = sum(np.prod(s) // 2 for s in shapes.values())

for B in (256, 640, 1024, 2048):
    hs = {k: make((B, v[1]), seed=20) for k, v in shapes.items()}
    for name, fn in (
        ("pallas", lambda h, ww, i: int4_matmul_stacked(h, ww["q4"], ww["gs"], i)),
        ("xla", lambda h, ww, i: int4_matmul_xla(
            h, jax.lax.dynamic_index_in_dim(ww["q4"], i, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(ww["gs"], i, 0, keepdims=False))),
    ):
        def mk_step(L, ws):
            @jax.jit
            def step(hs, ws):
                def body(c, i):
                    acc = c
                    for n in shapes:
                        y = fn(hs[n], ws[n], i)
                        acc = acc + jnp.sum(y.astype(jnp.float32))
                    return acc, None
                out, _ = jax.lax.scan(body, jnp.asarray(0.0), jnp.arange(L))
                return out
            return step
        try:
            t2 = timeit(mk_step(2, w2), hs, w2)
            t6 = timeit(mk_step(6, w6), hs, w6)
            per_layer = (t6 - t2) / 4
            print(f"B={B} {name}: t2={t2*1e3:.2f}ms t6={t6*1e3:.2f}ms -> {per_layer*1e3:.3f} ms/layer")
        except Exception as e:
            print(f"B={B} {name}: FAIL {type(e).__name__}: {str(e)[:150]}")
