"""T5/Flan-T5 encoder-decoder parity vs HF torch (blip2_t5 backend,
reference lavis/models/blip2_models/modeling_t5.py capability)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from llava_align_tpu.models import t5
from llava_align_tpu.models.t5 import T5Config
from llava_align_tpu.utils.hf_convert import convert_t5

CFG = T5Config.tiny(vocab_size=128)


@pytest.fixture(scope="module")
def models():
    from transformers import T5Config as HFCfg
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(
        HFCfg(
            vocab_size=CFG.vocab_size,
            d_model=CFG.d_model,
            d_kv=CFG.d_kv,
            num_heads=CFG.num_heads,
            d_ff=CFG.d_ff,
            num_layers=CFG.num_layers,
            num_decoder_layers=CFG.num_decoder_layers,
            relative_attention_num_buckets=CFG.relative_attention_num_buckets,
            relative_attention_max_distance=CFG.relative_attention_max_distance,
            feed_forward_proj="gated-gelu",
            tie_word_embeddings=False,
            dropout_rate=0.0,
            decoder_start_token_id=0,
            eos_token_id=1,
            pad_token_id=0,
        )
    ).eval()
    params = convert_t5({k: v.detach() for k, v in hf.state_dict().items()}, CFG)
    return hf, params


def test_seq2seq_logits_match_hf(models):
    hf, params = models
    rng = np.random.default_rng(0)
    enc_ids = rng.integers(3, 120, (2, 140))  # > max_distance to hit log buckets
    dec_ids = rng.integers(3, 120, (2, 7))
    enc_mask = np.ones((2, 140), np.int64)
    enc_mask[1, 100:] = 0
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(enc_ids),
            attention_mask=torch.tensor(enc_mask),
            decoder_input_ids=torch.tensor(dec_ids),
        ).logits.numpy()
    enc_embeds = t5.embed_tokens(params, jnp.asarray(enc_ids))
    enc_hidden = t5.encode(params, CFG, enc_embeds, jnp.asarray(enc_mask))
    ours = np.asarray(
        t5.decode(params, CFG, jnp.asarray(dec_ids), enc_hidden, jnp.asarray(enc_mask))
    )
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_encoder_accepts_inputs_embeds(models):
    """BLIP-2 feeds the encoder a [query-embeds; token-embeds] stream."""
    hf, params = models
    rng = np.random.default_rng(1)
    embeds = rng.normal(size=(1, 9, CFG.d_model)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf.encoder(inputs_embeds=torch.tensor(embeds)).last_hidden_state.numpy()
    ours = np.asarray(t5.encode(params, CFG, jnp.asarray(embeds)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_incremental_decode_matches_full(models):
    """KV-cache decode_step must reproduce the full-decoder logits at every
    position (the reference's past_key_values path, modeling_t5.py)."""
    _, params = models
    rng = np.random.default_rng(3)
    enc_ids = rng.integers(3, 120, (2, 15))
    enc_mask = np.ones((2, 15), np.int64)
    enc_mask[1, 10:] = 0
    enc_hidden = t5.encode(
        params, CFG, t5.embed_tokens(params, jnp.asarray(enc_ids)), jnp.asarray(enc_mask)
    )
    dec_ids = np.concatenate(
        [np.zeros((2, 1), np.int64), rng.integers(3, 120, (2, 5))], axis=1
    )
    full = np.asarray(
        t5.decode(params, CFG, jnp.asarray(dec_ids), enc_hidden, jnp.asarray(enc_mask))
    )  # [2, 6, V]

    cache = t5.init_self_cache(CFG, 2, dec_ids.shape[1])
    cross = t5.precompute_cross_kv(params, CFG, enc_hidden)
    for t in range(dec_ids.shape[1]):
        logits, cache = t5.decode_step(
            params, CFG, jnp.asarray(dec_ids[:, t], jnp.int32),
            jnp.asarray(t, jnp.int32), cache, cross, jnp.asarray(enc_mask),
        )
        np.testing.assert_allclose(
            np.asarray(logits), full[:, t], atol=5e-5, rtol=1e-4
        )


def test_greedy_generate_matches_hf(models):
    hf, params = models
    rng = np.random.default_rng(2)
    enc_ids = rng.integers(3, 120, (2, 12))
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(enc_ids), max_new_tokens=6, do_sample=False,
            num_beams=1,
        ).numpy()
    enc_hidden = t5.encode(params, CFG, t5.embed_tokens(params, jnp.asarray(enc_ids)))
    ours = t5.generate_greedy(
        params, CFG, enc_hidden, max_new_tokens=6,
        decoder_start_token_id=hf.config.decoder_start_token_id,
        eos_token_id=hf.config.eos_token_id,
    )
    eos = hf.config.eos_token_id
    for b in range(2):
        ref_row = ref[b, 1:].tolist()  # drop decoder_start
        n = len(ours[b])
        assert ours[b] == ref_row[:n], (ours[b], ref_row)
        if n < len(ref_row):  # we stopped at eos; HF must have too
            assert ref_row[n] == eos
