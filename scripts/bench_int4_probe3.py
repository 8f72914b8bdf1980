"""int4 probe v3: group-wise (g=128) scales applied in-kernel.

Flavors:
  g128rep : unpack i32 -> f32, multiply by pltpu.repeat'ed per-group scales,
            cast bf16, 2 dots per block (no post-scale)
  g128dot : per-subgroup partial dots with fp32 post-scale (32 dots/block)
  int8    : existing int8 kernel slope (reference point)
Slope-timed L=4 vs L=12.
"""
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
G = 128  # scale group size along D
shapes = {"qkv": (3*QD, D), "o": (D, QD), "gateup": (2*F, D), "down": (D, F)}

def make(shape, dtype=jnp.bfloat16, seed=0):
    return jax.block_until_ready(jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32)*0.02).astype(dtype))(jax.random.PRNGKey(seed)))

def pack(q4):
    lo = q4[..., : q4.shape[-1] // 2] & 0xF
    hi = q4[..., q4.shape[-1] // 2 :] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)

def mk_weights(L):
    ws4, ss, ws8 = {}, {}, {}
    for i, (k, s) in enumerate(shapes.items()):
        full = (L,) + s
        q4 = jax.random.randint(jax.random.PRNGKey(100 + i), full, -8, 8, jnp.int8)
        ws4[k] = jax.block_until_ready(pack(q4))
        # group scales [L, O, D/G], positive
        ss[k] = jax.block_until_ready(jnp.abs(make((L, s[0], s[1] // G), jnp.float32, seed=200 + i)) + 0.01)
        ws8[k] = {"q": jax.block_until_ready(q4), "s": make(full[:2], jnp.float32, seed=300 + i)}
    return ws4, ss, ws8

hs = {k: make((B, v[1]), seed=20+i) for i, (k, v) in enumerate(shapes.items())}

def _kern_rep(li_ref, hlo_ref, hhi_ref, p_ref, s_ref, o_ref, acc_ref):
    # s_ref block = the layer's FULL [bO, D/G] scale row-block (the group dim
    # is far below the 128-lane block granularity); slice this step's groups
    # in-kernel: low half at [k*bG, bG), high half at [nGh + k*bG, bG)
    k = pl.program_id(1); nk = pl.num_programs(1)
    @pl.when(k == 0)
    def _(): acc_ref[:] = jnp.zeros_like(acc_ref)
    h = hlo_ref[:]
    p32 = p_ref[0].astype(jnp.int32)
    bG = p32.shape[-1] // G
    nGh = nk * bG
    s_lo = s_ref[0, :, pl.ds(k * bG, bG)]
    s_hi = s_ref[0, :, pl.ds(nGh + k * bG, bG)]
    lo = ((((p32 & 15) ^ 8) - 8).astype(jnp.float32) * jnp.repeat(s_lo, G, axis=1)).astype(h.dtype)
    hi = ((p32 >> 4).astype(jnp.float32) * jnp.repeat(s_hi, G, axis=1)).astype(h.dtype)
    acc_ref[:] += jax.lax.dot_general(h, lo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(hhi_ref[:], hi, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    @pl.when(k == nk - 1)
    def _(): o_ref[:] = acc_ref[:].astype(o_ref.dtype)

KERNS = {"g128rep": _kern_rep}

def _choose_blocks4(O, Dp, bB):
    budget = 8 * 2**20
    def fits(bO, bDp):
        return 2*(bO*bDp + 2*2*bB*bDp) + 4*bB*bO <= budget
    for bO in (512, 256, 128):
        if O % bO: continue
        bDp = Dp
        while not fits(bO, bDp) and bDp % 2 == 0 and (bDp//2) % G == 0 and Dp % (bDp//2) == 0:
            bDp //= 2
        if fits(bO, bDp):
            return bO, bDp
    return None

@functools.partial(jax.jit, static_argnames=("flavor",))
def int4_mm(h, p, s, li, flavor="g128rep"):
    Bq = h.shape[0]
    Lq, O, Dp = p.shape
    nGh = Dp // G  # groups per half
    Bp = _round_up(Bq, 16)
    bO, bDp = _choose_blocks4(O, Dp, Bp)
    if Bp != Bq:
        h = jnp.pad(h, ((0, Bp - Bq), (0, 0)))
    nkh = Dp // bDp
    bG = bDp // G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(O // bO, nkh),
        in_specs=[
            pl.BlockSpec((Bp, bDp), lambda j, k, li_ref: (0, k)),
            pl.BlockSpec((Bp, bDp), lambda j, k, li_ref: (0, k + nkh)),
            pl.BlockSpec((1, bO, bDp), lambda j, k, li_ref: (li_ref[0], j, k)),
            pl.BlockSpec((1, bO, 2 * nGh), lambda j, k, li_ref: (li_ref[0], j, 0)),
        ],
        out_specs=pl.BlockSpec((Bp, bO), lambda j, k, li_ref: (0, j)),
        scratch_shapes=[pltpu.VMEM((Bp, bO), jnp.float32)],
    )
    out = pl.pallas_call(KERNS[flavor], grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, O), h.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(jnp.asarray(li, jnp.int32).reshape(1), h, h, p, s)
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

def ref_mm(h, p, s):
    # p [1, O, Dp] packed; s [1, O, D/G] group scales, low groups then high
    q32 = p.astype(jnp.int32)
    lo = (((q32 & 15) ^ 8) - 8).astype(jnp.float32)
    hi = (q32 >> 4).astype(jnp.float32)
    w = jnp.concatenate([lo, hi], axis=-1)
    sfull = jnp.repeat(s, G, axis=-1)
    return (h.astype(jnp.float32) @ (w * sfull)[0].T).astype(h.dtype)

only = sys.argv[1] if len(sys.argv) > 1 else None

w4a, sa, w8a = mk_weights(4)
w4b, sb, w8b = mk_weights(12)
want = ref_mm(hs["qkv"], w4a["qkv"][0:1], sa["qkv"][0:1])
for fl in KERNS:
    if only and fl != only:
        continue
    try:
        got = int4_mm(hs["qkv"], w4a["qkv"], sa["qkv"], 0, flavor=fl)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        rel = err / float(jnp.max(jnp.abs(want.astype(jnp.float32))))
        t4 = timeit(mk_step4(fl, 4), hs, w4a, sa)
        t12 = timeit(mk_step4(fl, 12), hs, w4b, sb)
        slope = (t12 - t4) / (8 * bytes4_per_layer)
        print(f"{fl}: relerr={rel:.1e} t4={t4*1e3:.2f}ms t12={t12*1e3:.2f}ms slope-> {1/slope/1e9:.0f} GB/s raw ({2/slope/1e9:.0f} int8-equiv)")
    except Exception as e:
        print(f"{fl}: failed {type(e).__name__}: {str(e)[:200]}")

if only in (None, "int8"):
    t4 = timeit(mk_step8(4), hs, w8a)
    t12 = timeit(mk_step8(12), hs, w8b)
    slope = (t12 - t4) / (8 * bytes4_per_layer * 2)
    print(f"int8: t4={t4*1e3:.2f}ms t12={t12*1e3:.2f}ms slope-> {1/slope/1e9:.0f} GB/s")
