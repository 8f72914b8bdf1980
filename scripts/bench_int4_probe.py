"""Microbench probe: int4 weight-streaming decode matmul options on the chip.

Variants, 7B stacked decode shapes (B=16 rows, L=8 layers):
  A) native jnp.int4 operand into the pallas kernel (may not be supported)
  B) nibble-packed int8 [L, O, D/2] with split-half packing (low nibble =
     cols [0, D/2), high nibble = cols [D/2, D)), dual h operands via two
     BlockSpec index maps, dequant on the VPU
  C) the existing int8 kernel (reference point)
"""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import time
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from llava_align_tpu.ops.quant import _round_up, int8_matmul_stacked, quantize_weight

L, D, F, QD = 8, 4096, 11008, 4096
B = 16

def make(shape, dtype=jnp.bfloat16, seed=0):
    return jax.block_until_ready(jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32)*0.02).astype(dtype))(jax.random.PRNGKey(seed)))

shapes = {"qkv": (L, 3*QD, D), "o": (L, D, QD), "gateup": (L, 2*F, D), "down": (L, D, F)}

def pack_nibbles(q4):  # q4 int8 values in [-8, 7], [L, O, D] -> [L, O, D/2]
    lo = q4[..., : q4.shape[-1] // 2] & 0xF
    hi = q4[..., q4.shape[-1] // 2 :] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)

# random int4 weights + per-channel scales
ws4, ss, ws8 = {}, {}, {}
for i, (k, s) in enumerate(shapes.items()):
    key = jax.random.PRNGKey(100 + i)
    q4 = jax.random.randint(key, s, -8, 8, jnp.int8)
    ws4[k] = jax.block_until_ready(pack_nibbles(q4))
    ss[k] = make(s[:2], jnp.float32, seed=200 + i)
    ws8[k] = {"q": jax.block_until_ready(q4), "s": ss[k]}

hs = {k: make((B, v[2]), seed=20+i) for i, (k, v) in enumerate(shapes.items())}

# ---- B) nibble-packed kernels (two unpack flavors)
def _unpack_i8(p):
    # Mosaic rejects shli on i8 vectors; (p & 15 ^ 8) - 8 sign-extends the low
    # nibble with and/xor/sub only; the high nibble uses arithmetic >> 4.
    lo = ((p & 15) ^ 8) - 8
    hi = p >> 4
    return lo, hi

def _unpack_i32(p):
    p32 = p.astype(jnp.int32)
    lo = ((p32 & 15) ^ 8) - 8
    hi = p32 >> 4
    return lo, hi

def _make_kern4(unpack):
    def _kern4(li_ref, hlo_ref, hhi_ref, p_ref, s_ref, o_ref, acc_ref):
        k = pl.program_id(1); nk = pl.num_programs(1)
        @pl.when(k == 0)
        def _(): acc_ref[:] = jnp.zeros_like(acc_ref)
        p = p_ref[0]
        h = hlo_ref[:]
        lo, hi = unpack(p)
        lo = lo.astype(h.dtype); hi = hi.astype(h.dtype)
        acc_ref[:] += jax.lax.dot_general(h, lo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        acc_ref[:] += jax.lax.dot_general(hhi_ref[:], hi, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        @pl.when(k == nk - 1)
        def _(): o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)
    return _kern4

def _choose_blocks4(O, Dp, bB):
    budget = 8 * 2**20
    def fits(bO, bDp):
        return 2*(bO*bDp + 2*2*bB*bDp) + 4*bB*bO <= budget
    for bO in (512, 256, 128):
        if O % bO: continue
        bDp = Dp
        while not fits(bO, bDp) and bDp % 2 == 0 and (bDp//2) % 128 == 0 and Dp % (bDp//2) == 0:
            bDp //= 2
        if fits(bO, bDp):
            return bO, bDp
    return None

@functools.partial(jax.jit, static_argnames=("flavor",))
def int4_mm(h, p, s, li, flavor="i8"):
    Bq, Dfull = h.shape
    Lq, O, Dp = p.shape
    Bp = _round_up(Bq, 16)
    bO, bDp = _choose_blocks4(O, Dp, Bp)
    if Bp != Bq:
        h = jnp.pad(h, ((0, Bp - Bq), (0, 0)))
    nkh = Dp // bDp
    s3 = s.reshape(Lq, 1, O)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(O // bO, nkh),
        in_specs=[
            pl.BlockSpec((Bp, bDp), lambda j, k, li_ref: (0, k)),
            pl.BlockSpec((Bp, bDp), lambda j, k, li_ref: (0, k + nkh)),
            pl.BlockSpec((1, bO, bDp), lambda j, k, li_ref: (li_ref[0], j, k)),
            pl.BlockSpec((1, 1, bO), lambda j, k, li_ref: (li_ref[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((Bp, bO), lambda j, k, li_ref: (0, j)),
        scratch_shapes=[pltpu.VMEM((Bp, bO), jnp.float32)],
    )
    kern = _make_kern4(_unpack_i8 if flavor == "i8" else _unpack_i32)
    out = pl.pallas_call(kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, O), h.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(jnp.asarray(li, jnp.int32).reshape(1), h, h, p, s3)
    return out[:Bq]

# ---- A) native int4 operand
def _kern_n4(li_ref, h_ref, q_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1); nk = pl.num_programs(1)
    @pl.when(k == 0)
    def _(): acc_ref[:] = jnp.zeros_like(acc_ref)
    h = h_ref[:]
    w = q_ref[0].astype(h.dtype)
    acc_ref[:] += jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    @pl.when(k == nk - 1)
    def _(): o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)

@jax.jit
def int4_native_mm(h, q, s, li):
    Bq, Dfull = h.shape
    Lq, O, Dq = q.shape
    Bp = _round_up(Bq, 16)
    bO, bDp = _choose_blocks4(O, Dq // 2, Bp)
    bD = bDp * 2
    if Bp != Bq:
        h = jnp.pad(h, ((0, Bp - Bq), (0, 0)))
    s3 = s.reshape(Lq, 1, O)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(O // bO, Dq // bD),
        in_specs=[
            pl.BlockSpec((Bp, bD), lambda j, k, li_ref: (0, k)),
            pl.BlockSpec((1, bO, bD), lambda j, k, li_ref: (li_ref[0], j, k)),
            pl.BlockSpec((1, 1, bO), lambda j, k, li_ref: (li_ref[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((Bp, bO), lambda j, k, li_ref: (0, j)),
        scratch_shapes=[pltpu.VMEM((Bp, bO), jnp.float32)],
    )
    out = pl.pallas_call(_kern_n4, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, O), h.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(jnp.asarray(li, jnp.int32).reshape(1), h, q, s3)
    return out[:Bq]

def timeit(f, *a, iters=30):
    np.asarray(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters

# correctness reference (dequant then matmul), one layer one stack
def ref_mm(h, q4_packed, s):
    q32 = q4_packed.astype(jnp.int32)
    lo = (((q32 & 15) ^ 8) - 8).astype(jnp.float32)
    hi = (q32 >> 4).astype(jnp.float32)
    w = jnp.concatenate([lo, hi], axis=-1) * s[..., None]
    return (h.astype(jnp.float32) @ w[0].T).astype(h.dtype)

want = ref_mm(hs["qkv"], ws4["qkv"][0:1], ss["qkv"][0:1])
bytes4 = sum(np.prod(s[1:]) // 2 for s in shapes.values()) * L
bytes8 = bytes4 * 2

for flavor in ("i8", "i32"):
    try:
        got = int4_mm(hs["qkv"], ws4["qkv"], ss["qkv"], 0, flavor=flavor)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        @jax.jit
        def step4(hs, ws4, ss):
            def body(c, i):
                acc = c
                for name in shapes:
                    y = int4_mm(hs[name], ws4[name], ss[name], i, flavor=flavor)
                    acc = acc + jnp.sum(y.astype(jnp.float32))
                return acc, None
            out, _ = jax.lax.scan(body, jnp.asarray(0.0), jnp.arange(L))
            return out
        t4 = timeit(step4, hs, ws4, ss)
        print(f"B/{flavor}) packed int4: err={err:.2e}  {t4*1e3:.3f} ms -> {bytes4/t4/1e9:.0f} GB/s (int8-equiv {bytes8/t4/1e9:.0f})")
    except Exception as e:
        print(f"B/{flavor}) failed: {type(e).__name__}: {str(e)[:200]}")

try:
    @jax.jit
    def step8(hs, ws8):
        def body(c, i):
            acc = c
            for name in shapes:
                y = int8_matmul_stacked(hs[name], ws8[name]["q"], ws8[name]["s"], i)
                acc = acc + jnp.sum(y.astype(jnp.float32))
            return acc, None
        out, _ = jax.lax.scan(body, jnp.asarray(0.0), jnp.arange(L))
        return out
    t8 = timeit(step8, hs, ws8)
    print(f"C) int8 kernel: {t8*1e3:.3f} ms -> {bytes8/t8/1e9:.0f} GB/s")
except Exception as e:
    print(f"C) failed: {type(e).__name__}: {str(e)[:200]}")

# A) native int4 dtype, guarded
try:
    ws4n = {k: jax.block_until_ready(jax.random.randint(jax.random.PRNGKey(7), s, -8, 8, jnp.int8).astype(jnp.int4)) for k, s in shapes.items()}
    got = int4_native_mm(hs["qkv"], ws4n["qkv"], ss["qkv"], 0)
    wantn = (hs["qkv"].astype(jnp.float32) @ (ws4n["qkv"][0].astype(jnp.float32) * ss["qkv"][0][:, None]).T).astype(hs["qkv"].dtype)
    errn = float(jnp.max(jnp.abs(got.astype(jnp.float32) - wantn.astype(jnp.float32))))
    @jax.jit
    def step4n(hs, ws, ss):
        def body(c, i):
            acc = c
            for name in shapes:
                y = int4_native_mm(hs[name], ws[name], ss[name], i)
                acc = acc + jnp.sum(y.astype(jnp.float32))
            return acc, None
        out, _ = jax.lax.scan(body, jnp.asarray(0.0), jnp.arange(L))
        return out
    t4n = timeit(step4n, hs, ws4n, ss)
    print(f"A) native int4: err={errn:.2e}  {t4n*1e3:.3f} ms -> {bytes4/t4n/1e9:.0f} GB/s (int8-equiv {bytes8/t4n/1e9:.0f})")
except Exception as e:
    print(f"A) native int4 failed: {type(e).__name__}: {str(e)[:200]}")
