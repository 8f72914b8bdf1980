"""Bisect which part of the int4 g128 kernel crashes the Mosaic compiler.
Variants (argv[1]): full | nods | norep | noslice | perchan
One pallas call at the qkv decode shape, correctness-checked."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

variant = sys.argv[1] if len(sys.argv) > 1 else "full"
G = 128
O, D = 12288, 4096
Dp = D // 2
B = 16
bO, bDp = 512, 1024  # force nkh=2 so k-dependent slicing is exercised
nkh = Dp // bDp
nG = D // G

q4 = jax.random.randint(jax.random.PRNGKey(0), (O, Dp), -128, 128, jnp.int8)
gs = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (O, nG), jnp.float32)) + 0.01
h = (jax.random.normal(jax.random.PRNGKey(2), (B, D), jnp.float32) * 0.1).astype(jnp.bfloat16)

def kern(hlo_ref, hhi_ref, p_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1); nk = pl.num_programs(1)
    @pl.when(k == 0)
    def _(): acc_ref[:] = jnp.zeros_like(acc_ref)
    hh = hlo_ref[:]
    p32 = p_ref[:].astype(jnp.int32)
    bG = p32.shape[-1] // G
    nGh = nk * bG
    if variant == "nods":
        s_lo = s_ref[:, :bG]
        s_hi = s_ref[:, bG:2*bG]
    elif variant in ("wherechain", "bcast", "bcast16", "mxubcast"):
        def grp(base):
            acc = None
            for kk in range(nkh):
                sl = s_ref[:, base + kk * bG : base + (kk + 1) * bG]
                m = (k == kk).astype(sl.dtype)
                acc = sl * m if acc is None else acc + sl * m
            return acc
        s_lo = grp(0)
        s_hi = grp(nkh * bG)
    else:
        s_lo = s_ref[:, pl.ds(k * bG, bG)]
        s_hi = s_ref[:, pl.ds(nGh + k * bG, bG)]
    lo32 = ((p32 & 15) ^ 8) - 8
    hi32 = p32 >> 4
    if variant == "norep":
        lo = lo32.astype(hh.dtype)
        hi = hi32.astype(hh.dtype)
    elif variant == "perchan":
        lo = (lo32.astype(jnp.float32) * s_lo[:, :1]).astype(hh.dtype)
        hi = (hi32.astype(jnp.float32) * s_hi[:, :1]).astype(hh.dtype)
    elif variant == "bcast":
        def rep(s):
            b = jax.lax.broadcast_in_dim(s, (s.shape[0], s.shape[1], G), (0, 1))
            return b.reshape(s.shape[0], s.shape[1] * G)
        lo = (lo32.astype(jnp.float32) * rep(s_lo)).astype(hh.dtype)
        hi = (hi32.astype(jnp.float32) * rep(s_hi)).astype(hh.dtype)
    elif variant == "mxubcast":
        def rep(s):
            bGl, bDl = s.shape[1], s.shape[1] * G
            lane_group = jax.lax.broadcasted_iota(jnp.int32, (bGl, bDl), 1) // G
            row = jax.lax.broadcasted_iota(jnp.int32, (bGl, bDl), 0)
            E = (lane_group == row).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                s.astype(jnp.bfloat16), E, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        lo = (lo32.astype(jnp.bfloat16) * rep(s_lo)).astype(hh.dtype)
        hi = (hi32.astype(jnp.bfloat16) * rep(s_hi)).astype(hh.dtype)
    elif variant == "bcast16":
        def rep(s):
            b = jax.lax.broadcast_in_dim(s, (s.shape[0], s.shape[1], G), (0, 1))
            return b.reshape(s.shape[0], s.shape[1] * G)
        lo = (lo32.astype(jnp.bfloat16) * rep(s_lo).astype(jnp.bfloat16)).astype(hh.dtype)
        hi = (hi32.astype(jnp.bfloat16) * rep(s_hi).astype(jnp.bfloat16)).astype(hh.dtype)
    else:
        lo = (lo32.astype(jnp.float32) * jnp.repeat(s_lo, G, axis=1)).astype(hh.dtype)
        hi = (hi32.astype(jnp.float32) * jnp.repeat(s_hi, G, axis=1)).astype(hh.dtype)
    acc_ref[:] += jax.lax.dot_general(hh, lo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(hhi_ref[:], hi, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    @pl.when(k == nk - 1)
    def _(): o_ref[:] = acc_ref[:].astype(o_ref.dtype)

f = pl.pallas_call(
    kern,
    grid=(O // bO, nkh),
    in_specs=[
        pl.BlockSpec((B, bDp), lambda j, k: (0, k)),
        pl.BlockSpec((B, bDp), lambda j, k: (0, k + nkh)),
        pl.BlockSpec((bO, bDp), lambda j, k: (j, k)),
        pl.BlockSpec((bO, nG), lambda j, k: (j, 0)),
    ],
    out_specs=pl.BlockSpec((B, bO), lambda j, k: (0, j)),
    out_shape=jax.ShapeDtypeStruct((B, O), jnp.bfloat16),
    scratch_shapes=[pltpu.VMEM((B, bO), jnp.float32)],
    compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
)
try:
    import time
    out = np.asarray(f(h, h, q4, gs))
    print(f"{variant}: compiled+ran, out[0,:3]={out[0,:3]}")
    if variant in ("full", "wherechain", "bcast", "bcast16", "mxubcast"):
        q32 = q4.astype(jnp.int32)
        lo = (((q32 & 15) ^ 8) - 8).astype(jnp.float32)
        hi = (q32 >> 4).astype(jnp.float32)
        w = jnp.concatenate([lo, hi], axis=-1) * jnp.repeat(gs, G, axis=-1)
        want = np.asarray((h.astype(jnp.float32) @ w.T))
        err = np.abs(out.astype(np.float32) - want).max() / np.abs(want).max()
        print(f"{variant}: relerr={err:.2e}")
    # time it: slope vs a double-size call would be ideal; here per-call is
    # fine for RELATIVE comparison across variants (same shape, same launch)
    g = jax.jit(lambda a, b, c, d: f(a, b, c, d) + 0.0)
    np.asarray(g(h, h, q4, gs))
    t0 = time.perf_counter()
    for _ in range(50):
        r = g(h, h, q4, gs)
    np.asarray(r)
    per = (time.perf_counter() - t0) / 50
    raw = O * Dp
    print(f"{variant}: {per*1e3:.3f} ms/call -> {raw/per/1e9:.0f} GB/s raw incl. overhead")
except Exception as e:
    print(f"{variant}: FAIL {type(e).__name__}: {str(e)[:200]}")
