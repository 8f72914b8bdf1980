"""Isolate Mosaic support for the int4 kernel's scale ops on this backend."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def tryk(name, kern, out_shape, *args):
    try:
        r = pl.pallas_call(kern, out_shape=out_shape)(*args)
        print(f"{name}: OK {np.asarray(r).ravel()[:4]}")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}")

x = jnp.arange(512 * 16, dtype=jnp.float32).reshape(512, 16) * 0.01
big = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128) * 0.01

# 1) pltpu.repeat along lanes
def k_rep(x_ref, o_ref):
    o_ref[:] = pltpu.repeat(x_ref[:], 128, 1)
tryk("repeat_lanes_16x128", k_rep, jax.ShapeDtypeStruct((512, 2048), jnp.float32), x)

# 2) static lane slice (16 of 128) then repeat
def k_slice_rep(x_ref, o_ref):
    s = x_ref[:, :16]
    o_ref[:] = pltpu.repeat(s, 128, 1)
tryk("static_slice16_repeat", k_slice_rep, jax.ShapeDtypeStruct((512, 2048), jnp.float32), big)

# 3) dynamic lane slice at 16-granularity
def k_dyn(x_ref, o_ref):
    i = pl.program_id(0) if False else 1
    s = x_ref[:, pl.ds(i * 16, 16)]
    o_ref[:] = s * 2.0
tryk("dyn_lane_slice16", k_dyn, jax.ShapeDtypeStruct((512, 16), jnp.float32), big)

# 4) jnp.repeat (lowered?) along lanes
def k_jrep(x_ref, o_ref):
    o_ref[:] = jnp.repeat(x_ref[:], 128, axis=1)
tryk("jnp_repeat_lanes", k_jrep, jax.ShapeDtypeStruct((512, 2048), jnp.float32), x)

# 5) sublane repeat
xt = jnp.arange(16 * 512, dtype=jnp.float32).reshape(16, 512) * 0.01
def k_rep0(x_ref, o_ref):
    o_ref[:] = pltpu.repeat(x_ref[:], 8, 0)
tryk("repeat_sublanes_8x", k_rep0, jax.ShapeDtypeStruct((128, 512), jnp.float32), xt)

# 6) broadcast a [N,1]-style sublane scale: reshape trick via broadcast_in_dim
def k_bcast(x_ref, o_ref):
    s = x_ref[:]  # [16, 512]
    b = jax.lax.broadcast_in_dim(s, (16, 8, 512), (0, 2))  # [16,8,512]
    o_ref[:] = b.reshape(128, 512)
tryk("bcast_reshape_sublane", k_bcast, jax.ShapeDtypeStruct((128, 512), jnp.float32), xt)
