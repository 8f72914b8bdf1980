"""Probe: which int8-KV decode-attention formulation does XLA fuse?

Times a 32-layer scan of decode attention at 7B grouped shapes for:
  bf16      — baseline bf16 cache reads
  deq       — dequantize the cache slice then bf16 einsum (models/llama
              _read_kv formulation; suspect: materializes a bf16 copy)
  fold      — einsum against the int8 cache directly (convert-in-dot) and
              fold the per-(pos,head) scales into the [B,K,g,S] logits /
              the probs row — no [B,S,K,Dh]-sized elementwise anywhere

Run on the real chip: python scripts/probe_kvq_fusion.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B, Smax, K, Dh, L = 18, 704, 32, 128, 32
g = 1  # kv-group (7B MHA)
NEG_INF = -1e30


def mk_inputs(rng):
    # generate ON DEVICE — host arrays this size would take minutes to ship
    # over the axon tunnel
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    shape = (L, B, Smax, K, Dh)

    @jax.jit
    def build():
        k_bf = jax.random.normal(keys[0], shape, jnp.bfloat16)
        v_bf = jax.random.normal(keys[1], shape, jnp.bfloat16)
        ks = jax.random.uniform(
            keys[2], (L, B, Smax, K, 1), jnp.float32, 0.01, 0.03
        )
        k_i8 = jax.random.randint(keys[3], shape, -127, 127, jnp.int8)
        v_i8 = jax.random.randint(keys[4], shape, -127, 127, jnp.int8)
        q = jax.random.normal(keys[5], (B, 1, K * g, Dh), jnp.bfloat16)
        return k_bf, v_bf, k_i8, v_i8, ks, q

    k_bf, v_bf, k_i8, v_i8, ks, q = build()
    lengths = jnp.full((B,), Smax - 2, jnp.int32)
    return k_bf, v_bf, k_i8, v_i8, ks, q, lengths


def attn_core(logits, lengths, probs_scale, v, vdt):
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1, Smax), 3)
    logits = jnp.where(pos <= lengths[:, None, None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if probs_scale is not None:
        probs = probs * probs_scale
    out = jnp.einsum(
        "bkgs,bskd->bkgd", probs.astype(vdt), v,
        preferred_element_type=jnp.float32,
    )
    return out


def run_variant(name, fn, args_dev):
    jfn = jax.jit(fn)
    out = jfn(*args_dev)
    np.asarray(out)  # force
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jfn(*args_dev)
        _ = float(np.asarray(out.reshape(-1)[0]))  # dependent host fetch
        times.append(time.perf_counter() - t0)
    print(f"{name}: min {min(times)*1e3:.2f} ms  med {sorted(times)[2]*1e3:.2f} ms")
    return min(times)


def main():
    rng = np.random.default_rng(0)
    k_bf, v_bf, k_i8, v_i8, ks, q, lengths = mk_inputs(rng)
    scale = 1.0 / (Dh ** 0.5)

    def bf16_step(k_full, v_full, q, lengths):
        def body(acc, li):
            kc = jax.lax.dynamic_index_in_dim(k_full, li, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(v_full, li, 0, keepdims=False)
            qr = q.astype(kc.dtype).reshape(B, K, g, Dh)
            logits = jnp.einsum(
                "bkgd,bskd->bkgs", qr, kc, preferred_element_type=jnp.float32
            ) * scale
            out = attn_core(logits, lengths, None, vc, vc.dtype)
            return acc + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(L))
        return acc

    def deq_step(k_full, ks_full, v_full, vs_full, q, lengths):
        def body(acc, li):
            kc = jax.lax.dynamic_index_in_dim(k_full, li, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(v_full, li, 0, keepdims=False)
            ksc = jax.lax.dynamic_index_in_dim(ks_full, li, 0, keepdims=False)
            vsc = jax.lax.dynamic_index_in_dim(vs_full, li, 0, keepdims=False)
            kd = (kc.astype(jnp.float32) * ksc).astype(jnp.bfloat16)
            vd = (vc.astype(jnp.float32) * vsc).astype(jnp.bfloat16)
            qr = q.astype(kd.dtype).reshape(B, K, g, Dh)
            logits = jnp.einsum(
                "bkgd,bskd->bkgs", qr, kd, preferred_element_type=jnp.float32
            ) * scale
            out = attn_core(logits, lengths, None, vd, vd.dtype)
            return acc + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(L))
        return acc

    def fold_step(k_full, ks_full, v_full, vs_full, q, lengths):
        def body(acc, li):
            kc = jax.lax.dynamic_index_in_dim(k_full, li, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(v_full, li, 0, keepdims=False)
            ksc = jax.lax.dynamic_index_in_dim(ks_full, li, 0, keepdims=False)
            vsc = jax.lax.dynamic_index_in_dim(vs_full, li, 0, keepdims=False)
            qr = q.reshape(B, K, g, Dh)
            # convert-in-dot: int8 operand straight into the einsum
            logits = jnp.einsum(
                "bkgd,bskd->bkgs", qr.astype(jnp.float32),
                kc.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            # fold per-(pos,head) scales on the small logits tensor
            logits = logits * (ksc[..., 0].transpose(0, 2, 1)[:, :, None, :] * scale)
            # fold v scales into the probs row
            ps = vsc[..., 0].transpose(0, 2, 1)[:, :, None, :]  # [B,K,1,S]
            out = attn_core(logits, lengths, ps, vc.astype(jnp.float32), jnp.float32)
            return acc + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(L))
        return acc

    def fold16_step(k_full, ks_full, v_full, vs_full, q, lengths):
        def body(acc, li):
            kc = jax.lax.dynamic_index_in_dim(k_full, li, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(v_full, li, 0, keepdims=False)
            ksc = jax.lax.dynamic_index_in_dim(ks_full, li, 0, keepdims=False)
            vsc = jax.lax.dynamic_index_in_dim(vs_full, li, 0, keepdims=False)
            qr = q.reshape(B, K, g, Dh)
            logits = jnp.einsum(
                "bkgd,bskd->bkgs", qr, kc.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            logits = logits * (ksc[..., 0].transpose(0, 2, 1)[:, :, None, :] * scale)
            ps = vsc[..., 0].transpose(0, 2, 1)[:, :, None, :]
            out = attn_core(logits, lengths, ps, vc.astype(jnp.bfloat16),
                            jnp.bfloat16)
            return acc + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(L))
        return acc

    def qint8_step(k_full, ks_full, v_full, vs_full, q, lengths):
        def body(acc, li):
            kc = jax.lax.dynamic_index_in_dim(k_full, li, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(v_full, li, 0, keepdims=False)
            ksc = jax.lax.dynamic_index_in_dim(ks_full, li, 0, keepdims=False)
            vsc = jax.lax.dynamic_index_in_dim(vs_full, li, 0, keepdims=False)
            qr = q.reshape(B, K, g, Dh).astype(jnp.float32)
            qa = jnp.max(jnp.abs(qr), axis=-1, keepdims=True) / 127.0
            qi = jnp.clip(jnp.round(qr / jnp.maximum(qa, 1e-9)), -127, 127
                          ).astype(jnp.int8)
            li32 = jax.lax.dot_general(
                qi, kc, (((3,), (3,)), ((0, 1), (0, 2))),
                preferred_element_type=jnp.int32,
            )  # [B,K,g,S]
            logits = li32.astype(jnp.float32) * (
                qa * ksc[..., 0].transpose(0, 2, 1)[:, :, None, :] * scale
            )
            ps = vsc[..., 0].transpose(0, 2, 1)[:, :, None, :]
            out = attn_core(logits, lengths, ps, vc.astype(jnp.bfloat16),
                            jnp.bfloat16)
            return acc + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(L))
        return acc

    cache_gb = 2 * L * B * Smax * K * Dh
    print(f"bf16 cache bytes/step: {cache_gb*2/1e9:.2f} GB; int8: {cache_gb/1e9:.2f} GB (+scales)")
    t_bf = run_variant("bf16  ", bf16_step, (k_bf, v_bf, q, lengths))
    t_dq = run_variant("deq   ", deq_step, (k_i8, ks, v_i8, ks, q, lengths))
    t_fd = run_variant("fold32", fold_step, (k_i8, ks, v_i8, ks, q, lengths))
    t_f16 = run_variant("fold16", fold16_step, (k_i8, ks, v_i8, ks, q, lengths))
    t_q8 = run_variant("qint8 ", qint8_step, (k_i8, ks, v_i8, ks, q, lengths))
    print(f"deq/bf16 {t_dq/t_bf:.2f}  fold32/bf16 {t_fd/t_bf:.2f}  "
          f"fold16/bf16 {t_f16/t_bf:.2f}  qint8/bf16 {t_q8/t_bf:.2f}")


if __name__ == "__main__":
    main()
