"""Probe 2: full 32-layer 7B matmul stack at prefill shapes — dequant vs W8A8.

Mimics what the engine's prefill scan actually runs per layer (qkv, gateup,
silu-mul glue, down) with stacked [L, ...] int8 weights under lax.scan, so
per-call overhead amortizes like the real model. Compares:
  - dequant: int8 weights -> bf16 (current prefill path for the down stack;
    the streaming Pallas kernel measured equal-or-better for qkv/gateup)
  - w8a8: dynamic per-row activation quant -> int8xint8 MXU -> fused scale
B = 2560 (GB=4 grouped image rows) and 640 (one image row).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

L, D, QKV_O, GU_O, FF = 4, 4096, 12288, 22016, 11008
ITERS = 5


def run(B, mode):
    rng = np.random.default_rng(0)
    w_qkv = jax.device_put(rng.integers(-127, 127, (L, D, QKV_O), dtype=np.int8))
    s_qkv = jax.device_put((rng.random((L, QKV_O)) * .01).astype(np.float32))
    w_gu = jax.device_put(rng.integers(-127, 127, (L, D, GU_O), dtype=np.int8))
    s_gu = jax.device_put((rng.random((L, GU_O)) * .01).astype(np.float32))
    w_dn = jax.device_put(rng.integers(-127, 127, (L, FF, D), dtype=np.int8))
    s_dn = jax.device_put((rng.random((L, D)) * .01).astype(np.float32))
    x0 = jax.device_put(rng.standard_normal((B, D)).astype(np.float32) * .05)

    def mm_dq(x, w, s):
        wd = w.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)[None, :]
        return jnp.dot(x.astype(jnp.bfloat16), wd,
                       preferred_element_type=jnp.float32)

    def mm_w8(x, w, s):
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True) + 1e-8
        a_scale = amax / 127.0
        xq = jnp.clip(jnp.round(x / a_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * a_scale * s[None, :]

    mm = mm_dq if mode == "dequant" else mm_w8

    import sys
    print(f"compiling B={B} {mode}...", flush=True)

    @jax.jit
    def stack(x, w_qkv, s_qkv, w_gu, s_gu, w_dn, s_dn):
        def layer(x, ws):
            wq, sq, wg, sg, wd, sd = ws
            qkv = mm(x, wq, sq)
            x = x + qkv[:, :D] * 1e-3
            gu = mm(x, wg, sg)
            g, u = gu[:, :FF], gu[:, FF:]
            h = jax.nn.silu(g) * u
            dn = mm(h, wd, sd)
            x = x + dn * 1e-3
            return x, ()
        x, _ = jax.lax.scan(layer, x, (w_qkv, s_qkv, w_gu, s_gu, w_dn, s_dn))
        return jnp.sum(x * 1e-6)

    args = (x0, w_qkv, s_qkv, w_gu, s_gu, w_dn, s_dn)
    _ = float(np.asarray(stack(*args)))
    print("compiled; timing...", flush=True)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = stack(*args)
    _ = float(np.asarray(out))
    dt = (time.perf_counter() - t0) / ITERS
    flops = 2 * B * L * (D * QKV_O + D * GU_O + FF * D)
    print(f"B={B:5d} {mode:8s} {dt*1e3:8.2f}ms  {flops/dt/1e12:6.1f} TF/s"
          f"  ({dt/L*1e3:6.3f} ms/layer)")


def main():
    import sys
    if len(sys.argv) > 2:
        run(int(sys.argv[1]), sys.argv[2])
        return
    for B in (640, 2560):
        for mode in ("dequant", "w8a8"):
            run(B, mode)


if __name__ == "__main__":
    main()
