"""Attention op tests: XLA reference vs naive oracle, Pallas flash kernel
(interpret mode on CPU) vs XLA, decode attention masking."""

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.ops.attention import (
    decode_attention,
    flash_attention_tpu,
    mha_xla,
)


def _naive(q, k, v, causal):
    B, Sq, H, Dh = q.shape
    K = k.shape[2]
    g = H // K
    out = np.zeros_like(q)
    for b in range(B):
        for h in range(H):
            s = (q[b, :, h] @ k[b, :, h // g].T) / np.sqrt(Dh)
            if causal:
                mask = np.tril(np.ones((Sq, k.shape[1]), bool))
                s = np.where(mask, s, -1e30)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b, :, h] = p @ v[b, :, h // g]
    return out


def test_mha_xla_vs_naive_causal_gqa():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 8, 4, 16)).astype(np.float32)
    k = rng.normal(size=(2, 8, 2, 16)).astype(np.float32)
    v = rng.normal(size=(2, 8, 2, 16)).astype(np.float32)
    out = np.asarray(mha_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True))
    np.testing.assert_allclose(out, _naive(q, k, v, True), atol=1e-5)


def test_mha_xla_bidirectional():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(1, 5, 2, 8)).astype(np.float32)
    k = rng.normal(size=(1, 5, 2, 8)).astype(np.float32)
    v = rng.normal(size=(1, 5, 2, 8)).astype(np.float32)
    out = np.asarray(mha_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=False))
    np.testing.assert_allclose(out, _naive(q, k, v, False), atol=1e-5)


def test_flash_matches_xla_interpret():
    rng = np.random.default_rng(2)
    B, S, H, K, Dh = 2, 256, 4, 2, 128
    q = rng.normal(size=(B, S, H, Dh)).astype(np.float32)
    k = rng.normal(size=(B, S, K, Dh)).astype(np.float32)
    v = rng.normal(size=(B, S, K, Dh)).astype(np.float32)
    ref = np.asarray(mha_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True))
    out = np.asarray(
        flash_attention_tpu(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), block_q=128, block_k=128, interpret=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_decode_attention_respects_lengths():
    rng = np.random.default_rng(3)
    B, Smax, H, K, Dh = 2, 16, 4, 2, 8
    kc = rng.normal(size=(B, Smax, K, Dh)).astype(np.float32)
    vc = rng.normal(size=(B, Smax, K, Dh)).astype(np.float32)
    q = rng.normal(size=(B, 1, H, Dh)).astype(np.float32)
    lengths = np.array([5, 9], np.int32)
    out = np.asarray(decode_attention(jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(lengths)))
    for b in range(B):
        n = lengths[b] + 1
        ref = _naive(q[b : b + 1], kc[b : b + 1, :n], vc[b : b + 1, :n], causal=False)
        np.testing.assert_allclose(out[b], ref[0], atol=1e-5)


def test_decode_unaffected_by_garbage_beyond_length():
    rng = np.random.default_rng(4)
    B, Smax, H, K, Dh = 1, 8, 2, 2, 4
    kc = rng.normal(size=(B, Smax, K, Dh)).astype(np.float32)
    vc = rng.normal(size=(B, Smax, K, Dh)).astype(np.float32)
    q = rng.normal(size=(B, 1, H, Dh)).astype(np.float32)
    lengths = jnp.asarray([3], jnp.int32)
    out1 = decode_attention(jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), lengths)
    kc2, vc2 = kc.copy(), vc.copy()
    kc2[:, 4:] = 999.0
    vc2[:, 4:] = -999.0
    out2 = decode_attention(jnp.asarray(q), jnp.asarray(kc2), jnp.asarray(vc2), lengths)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
