"""Probe: int8xint8 MXU matmul vs bf16 vs the int8-dequant path at PREFILL shapes.

DESIGN.md rejected W8A8 at decode shapes (HBM-bound; no win). Prefill is
compute-bound at 93-94% MXU (xplane profile), and v5e's MXU peaks at 2x the
bf16 rate for int8xint8 -> int32. This measures whether XLA actually reaches
that at the 7B prefill shapes the POPE shared-prefix path runs:
  qkv    [B,4096] x [4096,12288]
  gateup [B,4096] x [4096,22016]
  down   [B,11008] x [11008,4096]
for B in {64 (suffix bucket), 640 (image row bucket)}.

Tunnel trap: block_until_ready is a no-op here; every timing forces a host
transfer of a scalar that depends on the whole chain.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30


def timed(fn, *args):
    out = fn(*args)  # compile
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    s = float(np.asarray(out))
    dt = (time.perf_counter() - t0) / ITERS
    return dt, s


def main():
    key = jax.random.PRNGKey(0)
    shapes = [
        ("qkv", 4096, 12288),
        ("gateup", 4096, 22016),
        ("down", 11008, 4096),
    ]
    for B in (64, 640):
        for name, D, O in shapes:
            kx, kw, key = jax.random.split(key, 3)
            x_bf16 = jax.random.normal(kx, (B, D), jnp.bfloat16)
            w_bf16 = jax.random.normal(kw, (D, O), jnp.bfloat16)
            w_i8 = jax.device_put(
                np.random.randint(-127, 127, (D, O), dtype=np.int8))
            w_scale = jax.device_put(
                np.random.rand(O).astype(np.float32) * 0.01)

            @jax.jit
            def f_bf16(x, w):
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                return jnp.sum(y * 1e-6)

            @jax.jit
            def f_dequant(x, w, s):
                wd = w.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)[None, :]
                y = jnp.dot(x, wd, preferred_element_type=jnp.float32)
                return jnp.sum(y * 1e-6)

            @jax.jit
            def f_w8a8(x, w, s):
                amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                               keepdims=True)
                a_scale = amax / 127.0
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / a_scale), -127, 127
                ).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    xq, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32) * a_scale * s[None, :]
                return jnp.sum(y * 1e-6)

            @jax.jit
            def f_int8_raw(xq, w):
                acc = jax.lax.dot_general(
                    xq, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return jnp.sum(acc) * 0

            xq_fixed = jax.device_put(
                np.random.randint(-127, 127, (B, D), dtype=np.int8))

            t_bf, _ = timed(f_bf16, x_bf16, w_bf16)
            t_dq, _ = timed(f_dequant, x_bf16, w_i8, w_scale)
            t_w8, _ = timed(f_w8a8, x_bf16, w_i8, w_scale)
            t_raw, _ = timed(f_int8_raw, xq_fixed, w_i8)
            flops = 2 * B * D * O
            print(
                f"B={B:4d} {name:6s} bf16 {t_bf*1e3:7.3f}ms"
                f" ({flops/t_bf/1e12:5.1f} TF)  dequant {t_dq*1e3:7.3f}ms"
                f" ({flops/t_dq/1e12:5.1f} TF)  w8a8 {t_w8*1e3:7.3f}ms"
                f" ({flops/t_w8/1e12:5.1f} TF)  int8raw {t_raw*1e3:7.3f}ms"
                f" ({flops/t_raw/1e12:5.1f} TOP)"
            )


if __name__ == "__main__":
    main()
