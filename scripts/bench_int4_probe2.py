"""int4 probe v2: unpack flavors + slope timing (L=32 vs L=8 cancels the
fixed per-call dispatch overhead of the remote runtime)."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import time
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from llava_align_tpu.ops.quant import _round_up, int8_matmul_stacked

D, F, QD = 4096, 11008, 4096
B = 16
shapes = {"qkv": (3*QD, D), "o": (D, QD), "gateup": (2*F, D), "down": (D, F)}

def make(shape, dtype=jnp.bfloat16, seed=0):
    return jax.block_until_ready(jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32)*0.02).astype(dtype))(jax.random.PRNGKey(seed)))

def pack(q4):  # [L, O, D] int4-valued int8 -> [L, O, D/2]
    lo = q4[..., : q4.shape[-1] // 2] & 0xF
    hi = q4[..., q4.shape[-1] // 2 :] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)

def mk_weights(L):
    ws4, ss, ws8 = {}, {}, {}
    for i, (k, s) in enumerate(shapes.items()):
        full = (L,) + s
        q4 = jax.random.randint(jax.random.PRNGKey(100 + i), full, -8, 8, jnp.int8)
        ws4[k] = jax.block_until_ready(pack(q4))
        ss[k] = make(full[:2], jnp.float32, seed=200 + i)
        ws8[k] = {"q": jax.block_until_ready(q4), "s": ss[k]}
    return ws4, ss, ws8

hs = {k: make((B, v[1]), seed=20+i) for i, (k, v) in enumerate(shapes.items())}

def unpack_i32(p, dt):
    p32 = p.astype(jnp.int32)
    return (((p32 & 15) ^ 8) - 8).astype(dt), (p32 >> 4).astype(dt)

def unpack_i16(p, dt):
    p16 = p.astype(jnp.int16)
    return (((p16 & 15) ^ 8) - 8).astype(dt), (p16 >> 4).astype(dt)

def unpack_bf16(p, dt):
    # exact in bf16: |v|<=127 integer, /16 is a power-of-2 scale, floor exact
    v = p.astype(jnp.float32)
    hi = jnp.floor(v * (1.0 / 16.0))
    lo = v - 16.0 * hi
    lo = lo - 16.0 * (lo >= 8.0).astype(jnp.float32)
    return lo.astype(dt), hi.astype(dt)

FLAVORS = {"i32": unpack_i32, "i16": unpack_i16, "bf16": unpack_bf16}

def _make_kern4(unpack):
    def _kern4(li_ref, hlo_ref, hhi_ref, p_ref, s_ref, o_ref, acc_ref):
        k = pl.program_id(1); nk = pl.num_programs(1)
        @pl.when(k == 0)
        def _(): acc_ref[:] = jnp.zeros_like(acc_ref)
        h = hlo_ref[:]
        lo, hi = unpack(p_ref[0], h.dtype)
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
def int4_mm(h, p, s, li, flavor="i32"):
    Bq = h.shape[0]
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
    out = pl.pallas_call(_make_kern4(FLAVORS[flavor]), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, O), h.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(jnp.asarray(li, jnp.int32).reshape(1), h, h, p, s3)
    return out[:Bq]

def timeit(f, *a, iters=30):
    np.asarray(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters

def mk_step4(flavor, L):
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
    return step4

def mk_step8(L):
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
    return step8

bytes4_per_layer = sum(np.prod(s) // 2 for s in shapes.values())

w8, s8, w88 = mk_weights(4)
w32, s32, w3232 = mk_weights(12)

# correctness once (i16/bf16 vs i32)
def ref_mm(h, p, s):
    q32 = p.astype(jnp.int32)
    lo = (((q32 & 15) ^ 8) - 8).astype(jnp.float32)
    hi = (q32 >> 4).astype(jnp.float32)
    w = jnp.concatenate([lo, hi], axis=-1) * s[..., None]
    return (h.astype(jnp.float32) @ w[0].T).astype(h.dtype)

only = sys.argv[1] if len(sys.argv) > 1 else None

want = ref_mm(hs["qkv"], w8["qkv"][0:1], s8["qkv"][0:1])
for fl in FLAVORS:
    if only and fl != only:
        continue
    try:
        got = int4_mm(hs["qkv"], w8["qkv"], s8["qkv"], 0, flavor=fl)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        t8l = timeit(mk_step4(fl, 4), hs, w8, s8)
        t32l = timeit(mk_step4(fl, 12), hs, w32, s32)
        slope = (t32l - t8l) / (8 * bytes4_per_layer)
        print(f"{fl}: err={err:.1e} t8={t8l*1e3:.2f}ms t32={t32l*1e3:.2f}ms slope-> {1/slope/1e9:.0f} GB/s raw ({2/slope/1e9:.0f} int8-equiv)")
    except Exception as e:
        print(f"{fl}: failed {type(e).__name__}: {str(e)[:150]}")

if only in (None, "int8"):
    t8l = timeit(mk_step8(4), hs, w88)
    t32l = timeit(mk_step8(12), hs, w3232)
    slope = (t32l - t8l) / (8 * bytes4_per_layer * 2)
    print(f"int8: t8={t8l*1e3:.2f}ms t32={t32l*1e3:.2f}ms slope-> {1/slope/1e9:.0f} GB/s")

# native int4 dtype, standalone (no outer jit/scan)
if only not in (None, "native"):
    sys.exit(0)
try:
    q4n = jax.block_until_ready(jax.random.randint(jax.random.PRNGKey(7), (4,) + shapes["qkv"], -8, 8, jnp.int8).astype(jnp.int4))
    def _kern_n(li_ref, h_ref, q_ref, s_ref, o_ref, acc_ref):
        k = pl.program_id(1); nk = pl.num_programs(1)
        @pl.when(k == 0)
        def _(): acc_ref[:] = jnp.zeros_like(acc_ref)
        h = h_ref[:]
        w = q_ref[0].astype(h.dtype)
        acc_ref[:] += jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        @pl.when(k == nk - 1)
        def _(): o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)
    O, Dq = shapes["qkv"]
    bO, bD = 512, 2048
    s3 = s8["qkv"].reshape(4, 1, O)
    h = hs["qkv"]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(O // bO, Dq // bD),
        in_specs=[
            pl.BlockSpec((B, bD), lambda j, k, li_ref: (0, k)),
            pl.BlockSpec((1, bO, bD), lambda j, k, li_ref: (li_ref[0], j, k)),
            pl.BlockSpec((1, 1, bO), lambda j, k, li_ref: (li_ref[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((B, bO), lambda j, k, li_ref: (0, j)),
        scratch_shapes=[pltpu.VMEM((B, bO), jnp.float32)],
    )
    f = pl.pallas_call(_kern_n, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, O), h.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )
    li0 = jnp.zeros((1,), jnp.int32)
    got = f(li0, h, q4n, s3)
    wantn = (h.astype(jnp.float32) @ (q4n[0].astype(jnp.float32) * s8["qkv"][0][:, None]).T).astype(h.dtype)
    errn = float(jnp.max(jnp.abs(got.astype(jnp.float32) - wantn.astype(jnp.float32))))
    def loop(n):
        def run():
            for i in range(n):
                r = f(li0, h, q4n, s3)
            return r
        return run
    t1 = timeit(loop(1), iters=10)
    t5 = timeit(loop(5), iters=10)
    per = (t5 - t1) / 4
    rawb = np.prod(shapes["qkv"]) // 2
    print(f"native int4: err={errn:.1e} per-call {per*1e3:.3f}ms -> {rawb/per/1e9:.0f} GB/s raw ({2*rawb/per/1e9:.0f} int8-equiv)")
except Exception as e:
    print(f"native int4 failed: {type(e).__name__}: {str(e)[:200]}")
