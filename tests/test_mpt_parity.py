"""MPT (alibi) decoder parity vs HF torch MptForCausalLM and cache
consistency. Covers the reference's MPT stack capability
(experiments/llava/model/language_model/mpt/)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from llava_align_tpu.models import mpt
from llava_align_tpu.models.mpt import MptConfig, alibi_slopes
from llava_align_tpu.utils.hf_convert import convert_mpt

CFG = MptConfig.tiny(vocab_size=256)


@pytest.fixture(scope="module")
def models():
    from transformers import MptConfig as HFCfg
    from transformers import MptForCausalLM

    torch.manual_seed(0)
    hf = MptForCausalLM(
        HFCfg(
            vocab_size=CFG.vocab_size,
            d_model=CFG.d_model,
            n_layers=CFG.n_layers,
            n_heads=CFG.n_heads,
            max_seq_len=CFG.max_seq_len,
            attn_config={"attn_impl": "eager", "alibi": True, "alibi_bias_max": 8},
        )
    ).eval()
    params = convert_mpt({k: v.detach() for k, v in hf.state_dict().items()}, CFG)
    return hf, params


def _ours(params, ids):
    ids = np.asarray(ids)
    emb = mpt.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1], dtype=jnp.int32), ids.shape)
    hidden, _ = mpt.forward(params, CFG, emb, pos)
    return np.asarray(mpt.logits_from_hidden(params, hidden))


def test_alibi_slopes_match_hf():
    from transformers.models.mpt.modeling_mpt import build_mpt_alibi_tensor

    for n in (4, 6, 16):
        hf_alibi = build_mpt_alibi_tensor(n, 8).numpy()  # [n, 1, seq]
        # hf bias at key j: slope * (j - S + 1); slope = diff of adjacent keys
        hf_slopes = hf_alibi[:, 0, -1] - hf_alibi[:, 0, -2]
        np.testing.assert_allclose(alibi_slopes(n), hf_slopes, rtol=1e-6)


def test_logits_match_hf(models):
    hf, params = models
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, (2, 19))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    ours = _ours(params, ids)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_incremental_decode_consistent(models):
    _, params = models
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, (1, 10))
    full = _ours(params, ids)

    emb = mpt.embed_tokens(params, jnp.asarray(ids))
    cache = mpt.init_cache(CFG, 1, 24)
    h, cache = mpt.forward(
        params, CFG, emb[:, :6], jnp.arange(6, dtype=jnp.int32)[None],
        cache, jnp.zeros((1,), jnp.int32),
    )
    outs = [np.asarray(mpt.logits_from_hidden(params, h[:, -1]))[0]]
    for t in range(6, 10):
        h, cache = mpt.forward(
            params, CFG, emb[:, t : t + 1], jnp.full((1, 1), t, jnp.int32),
            cache, jnp.full((1,), t, jnp.int32),
        )
        outs.append(np.asarray(mpt.logits_from_hidden(params, h[:, 0]))[0])
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o, full[0, 5 + i], atol=3e-4, rtol=1e-3)


def test_multiquery_self_consistent():
    """MQA variant (reference mpt/attention.py:204 MultiQueryAttention):
    cache decode == full forward."""
    import jax

    cfg = MptConfig.tiny(vocab_size=128, multiquery=True)
    params = mpt.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 128, (1, 8))
    emb = mpt.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(8, dtype=jnp.int32)[None]
    full_h, _ = mpt.forward(params, cfg, emb, pos)
    full = np.asarray(mpt.logits_from_hidden(params, full_h))

    cache = mpt.init_cache(cfg, 1, 16)
    h, cache = mpt.forward(params, cfg, emb[:, :7], pos[:, :7], cache, jnp.zeros((1,), jnp.int32))
    h2, cache = mpt.forward(
        params, cfg, emb[:, 7:8], pos[:, 7:8], cache, jnp.full((1,), 7, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(mpt.logits_from_hidden(params, h2[:, 0]))[0], full[0, 7], atol=1e-4
    )
