"""Microbench: XLA bf16 decode matmul vs a bf16 weight-streaming variant of
the int8 stacked Pallas kernel, 7B shapes, on the real chip."""
import time
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from llava_align_tpu.ops.quant import _choose_blocks, _round_up

L, D, F, QD = 8, 4096, 11008, 4096  # 8 layers is enough to time; scale later
B = 16

def make(shape, dtype=jnp.bfloat16, seed=0):
    return jax.block_until_ready(jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32)*0.02).astype(dtype))(jax.random.PRNGKey(seed)))

shapes = {"qkv": (L, 3*QD, D), "o": (L, D, QD), "gateup": (L, 2*F, D), "down": (L, D, F)}
ws = {k: make(s, seed=i) for i, (k, s) in enumerate(shapes.items())}
h = make((B, D), seed=9)

hs = {k: make((B, v.shape[2]), seed=20+i) for i, (k, v) in enumerate(ws.items())}

# ---- XLA loop over layers (mimics scan xs slicing)
@jax.jit
def xla_step(hs, ws):
    def body(c, i):
        acc = c
        for name in ("qkv", "o", "gateup", "down"):
            w = jax.lax.dynamic_index_in_dim(ws[name], i, 0, keepdims=False)
            y = jax.lax.dot_general(hs[name], w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            acc = acc + jnp.sum(y)
        return acc, None
    out, _ = jax.lax.scan(body, jnp.asarray(0.0), jnp.arange(L))
    return out

# ---- pallas streaming (scalar prefetch layer index), per-layer loop
def _kern(li_ref, h_ref, w_ref, o_ref, acc_ref):
    k = pl.program_id(1); nk = pl.num_programs(1)
    @pl.when(k == 0)
    def _(): acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jax.lax.dot_general(h_ref[:], w_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    @pl.when(k == nk - 1)
    def _(): o_ref[:] = acc_ref[:].astype(o_ref.dtype)

def _choose_blocks_b(O, D_, bB, itemsize):
    budget = 8 * 2**20
    def fits(bO, bD):
        return itemsize*bD*bO + 2*bD*2*bB + 4*bB*bO <= budget
    for bO in (512, 256, 128):
        if O % bO: continue
        bD = D_
        while not fits(bO, bD) and bD % 2 == 0 and (bD//2) % 128 == 0 and D_ % (bD//2) == 0:
            bD //= 2
        if fits(bO, bD):
            return bO, bD
    return None

@functools.partial(jax.jit, static_argnames=())
def stream_mm(h, w, li):
    Bp = _round_up(h.shape[0], 16)
    O, D_ = w.shape[1], w.shape[2]
    bO, bD = _choose_blocks_b(O, D_, Bp, 2)
    if Bp != h.shape[0]:
        h = jnp.pad(h, ((0, Bp - h.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(O // bO, D_ // bD),
        in_specs=[pl.BlockSpec((Bp, bD), lambda j, k, li_ref: (0, k)),
                  pl.BlockSpec((1, bO, bD), lambda j, k, li_ref: (li_ref[0], j, k))],
        out_specs=pl.BlockSpec((Bp, bO), lambda j, k, li_ref: (0, j)),
        scratch_shapes=[pltpu.VMEM((Bp, bO), jnp.float32)],
    )
    return pl.pallas_call(_kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, O), h.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(jnp.asarray(li, jnp.int32).reshape(1), h, w)[:h.shape[0]]

@jax.jit
def pallas_step(hs, ws):
    def body(c, i):
        acc = c
        for name in ("qkv", "o", "gateup", "down"):
            y = stream_mm(hs[name], ws[name], i)
            acc = acc + jnp.sum(y.astype(jnp.float32))
        return acc, None
    out, _ = jax.lax.scan(body, jnp.asarray(0.0), jnp.arange(L))
    return out

def timeit(f, *a, iters=20):
    np.asarray(f(*a))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters

bytes_per_layer = sum(np.prod(s[1:]) * 2 for s in shapes.values())
total = bytes_per_layer * L
t_x = timeit(xla_step, hs, ws)
t_p = timeit(pallas_step, hs, ws)
print(f"weight bytes/step: {total/1e9:.2f} GB")
print(f"xla:    {t_x*1e3:.3f} ms  -> {total/t_x/1e9:.0f} GB/s")
print(f"pallas: {t_p*1e3:.3f} ms  -> {total/t_p/1e9:.0f} GB/s")
