"""LLaMA decoder numerical parity vs HF torch (fp32, tiny random model) and
KV-cache consistency. This is the per-layer diff harness SURVEY.md §7 calls
for (hard part 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from llava_align_tpu.config import LlamaConfig
from llava_align_tpu.models import llama
from llava_align_tpu.utils.hf_convert import convert_llama

CFG = LlamaConfig.tiny(vocab_size=128)


@pytest.fixture(scope="module")
def hf_and_jax():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFLlamaConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        rms_norm_eps=CFG.rms_norm_eps,
        rope_theta=CFG.rope_theta,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach() for k, v in model.state_dict().items()}
    params = convert_llama(sd, CFG)
    return model, params


def _hf_logits(model, ids):
    with torch.no_grad():
        return model(torch.tensor(ids)).logits.numpy()


def _jax_logits(params, ids):
    ids = np.asarray(ids)
    embeds = llama.embed_tokens(params, jnp.asarray(ids))
    positions = jnp.broadcast_to(jnp.arange(ids.shape[1], dtype=jnp.int32), ids.shape)
    hidden, _ = llama.forward(params, CFG, embeds, positions, attn_impl="xla")
    return np.asarray(llama.logits_from_hidden(params, hidden))


def test_logits_match_hf(hf_and_jax):
    model, params = hf_and_jax
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, (2, 17))
    ours = _jax_logits(params, ids)
    theirs = _hf_logits(model, ids)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)


def test_incremental_decode_matches_full_forward(hf_and_jax):
    _, params = hf_and_jax
    rng = np.random.default_rng(1)
    S, EXTRA, MAX = 9, 4, 32
    ids = rng.integers(0, CFG.vocab_size, (1, S + EXTRA))

    full = _jax_logits(params, ids)

    # prefill first S tokens into a cache, then decode one token at a time
    cache = llama.init_cache(CFG, batch=1, max_len=MAX)
    embeds = llama.embed_tokens(params, jnp.asarray(ids[:, :S]))
    positions = jnp.arange(S, dtype=jnp.int32)[None]
    hidden, cache = llama.forward(
        params, CFG, embeds, positions, cache, jnp.zeros((1,), jnp.int32), attn_impl="xla"
    )
    step_logits = [np.asarray(llama.logits_from_hidden(params, hidden[:, -1]))]

    for t in range(S, S + EXTRA):
        emb = llama.embed_tokens(params, jnp.asarray(ids[:, t : t + 1]))
        pos = jnp.full((1, 1), t, jnp.int32)
        hidden, cache = llama.forward(
            params, CFG, emb, pos, cache, jnp.full((1,), t, jnp.int32), attn_impl="xla"
        )
        step_logits.append(np.asarray(llama.logits_from_hidden(params, hidden[:, -1])))

    for i, sl in enumerate(step_logits):
        np.testing.assert_allclose(sl[0], full[0, S - 1 + i], atol=2e-4, rtol=1e-4)


def test_branch_packed_cache_rows_independent(hf_and_jax):
    """Two rows with different lengths in one packed cache must produce the
    same logits as two separate single-row runs — the property the packed
    VDD branch axis relies on."""
    _, params = hf_and_jax
    rng = np.random.default_rng(2)
    MAX = 32
    len_a, len_b = 11, 6
    ids_a = rng.integers(0, CFG.vocab_size, len_a)
    ids_b = rng.integers(0, CFG.vocab_size, len_b)

    # packed: right-pad row b to len_a
    packed = np.zeros((2, len_a), np.int64)
    packed[0] = ids_a
    packed[1, :len_b] = ids_b
    embeds = llama.embed_tokens(params, jnp.asarray(packed))
    positions = jnp.broadcast_to(jnp.arange(len_a, dtype=jnp.int32), (2, len_a))
    cache = llama.init_cache(CFG, batch=2, max_len=MAX)
    hidden, cache = llama.forward(
        params, CFG, embeds, positions, cache, jnp.zeros((2,), jnp.int32), attn_impl="xla"
    )
    lengths = jnp.asarray([len_a, len_b], jnp.int32)
    last = llama.last_token_logits(params, hidden, lengths - 1)

    # decode one shared token for both rows at their own offsets
    tok = int(rng.integers(0, CFG.vocab_size))
    emb = llama.embed_tokens(params, jnp.full((2, 1), tok, jnp.int32))
    hidden2, cache = llama.forward(
        params, CFG, emb, lengths[:, None], cache, lengths, attn_impl="xla"
    )
    dec = np.asarray(llama.logits_from_hidden(params, hidden2[:, 0]))

    # oracle: row b alone
    solo = _jax_logits(params, ids_b[None])
    np.testing.assert_allclose(np.asarray(last)[1], solo[0, -1], atol=1e-4)
    solo2 = _jax_logits(params, np.concatenate([ids_b, [tok]])[None])
    np.testing.assert_allclose(dec[1], solo2[0, -1], atol=1e-4)
    # row a unaffected
    solo_a = _jax_logits(params, np.concatenate([ids_a, [tok]])[None])
    np.testing.assert_allclose(dec[0], solo_a[0, -1], atol=1e-4)
