"""Beam search token-exact vs HF transformers generate(num_beams=K).

The reference's BLIP-2 path generates with HF beam search
(blip2_vicuna_instruct.py:245 num_beams=5); these tests pin our on-device
beam loop to HF's semantics (do_sample=False, early_stopping=False,
length_penalty) on shared tiny-llama weights.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_align_tpu.config import GenerationConfig, LlamaConfig
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import llama
from llava_align_tpu.utils.hf_convert import convert_llama

VOCAB = 61
EOS = 2


class _TextAdapter:
    """Text-only llama adapter for beam tests (no vision)."""

    def __init__(self, cfg):
        self.cfg = cfg

    num_image_tokens = 0
    image_size = 8
    vision_dtype = jnp.float32

    @property
    def num_kv_heads(self):
        return self.cfg.num_kv_heads

    def branch_token_ids(self, ids, kind):
        return [int(t) for t in ids]

    def encode_images(self, params, images):
        return jnp.zeros((1, 1, self.cfg.hidden_size), jnp.float32)

    def splice_embeds(self, params, tokens, tok_g, img_g, is_img, feats):
        emb = llama.embed_tokens(params, tokens)
        return jnp.take_along_axis(emb, tok_g[..., None], axis=1)

    def embed_tokens(self, params, ids):
        return llama.embed_tokens(params, ids)

    def init_cache(self, batch, max_len):
        return llama.init_cache(self.cfg, batch, max_len)

    def forward(self, params, embeds, positions, cache, offsets, *, attn_impl,
                max_seq_len, cache_row_offset=0, tp_mesh=None):
        return llama.forward(
            params, self.cfg, embeds, positions, cache, offsets,
            attn_impl=attn_impl, cache_row_offset=cache_row_offset,
        )

    def logits(self, params, hidden):
        return llama.logits_from_hidden(params, hidden)


@pytest.fixture(scope="module")
def models():
    from transformers import LlamaConfig as HFCfg
    from transformers import LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=48, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=12, dtype=jnp.float32,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(
        HFCfg(
            vocab_size=VOCAB, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            head_dim=12, bos_token_id=1, eos_token_id=EOS, pad_token_id=0,
            attn_implementation="eager",
        )
    ).eval()
    params = convert_llama({k: v.detach() for k, v in hf.state_dict().items()}, cfg)
    return hf, cfg, params


def _hf_beam(hf, ids, num_beams, max_new, length_penalty=1.0):
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]), num_beams=num_beams,
            max_new_tokens=max_new, do_sample=False, early_stopping=False,
            length_penalty=length_penalty, num_return_sequences=1,
        )
    row = out[0, len(ids):].tolist()
    return row[: row.index(EOS)] if EOS in row else row  # pads only follow eos


def _ours_beam(cfg, params, ids, num_beams, max_new, length_penalty=1.0):
    gen = GenerationConfig(
        max_new_tokens=max_new, do_sample=False, eos_token_id=EOS, pad_token_id=0,
    )
    eng = DecodeEngine(
        params, cfg, gen, adapter=_TextAdapter(cfg), attn_impl="xla", bucket=8
    )
    out = eng.generate_beam(
        ids, num_beams=num_beams, length_penalty=length_penalty
    )
    toks = out.token_ids
    return [t for t in toks if t != EOS]


@pytest.mark.parametrize("seed,num_beams,max_new", [
    (0, 3, 8), (1, 3, 8), (2, 5, 6), (3, 2, 10), (4, 4, 12),
])
def test_beam_matches_hf(models, seed, num_beams, max_new):
    hf, cfg, params = models
    rng = np.random.default_rng(seed)
    ids = [1] + rng.integers(3, VOCAB, size=5).tolist()
    want = _hf_beam(hf, ids, num_beams, max_new)
    got = _ours_beam(cfg, params, ids, num_beams, max_new)
    assert got == want, (got, want)


@pytest.mark.parametrize("lp", [0.5, 2.0])
def test_beam_length_penalty_matches_hf(models, lp):
    hf, cfg, params = models
    rng = np.random.default_rng(7)
    ids = [1] + rng.integers(3, VOCAB, size=4).tolist()
    want = _hf_beam(hf, ids, 4, 10, length_penalty=lp)
    got = _ours_beam(cfg, params, ids, 4, 10, length_penalty=lp)
    assert got == want, (got, want)


def test_beam_rejects_contrastive_branches(models):
    _, cfg, params = models
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=EOS, use_dd=True,
    )
    eng = DecodeEngine(
        params, cfg, gen, adapter=_TextAdapter(cfg), attn_impl="xla", bucket=8
    )
    with pytest.raises(ValueError):
        eng.generate_beam([1, 5, 6], num_beams=2)


def test_beam_min_new_tokens_matches_hf(models):
    """min_new_tokens masks eos (LAVIS captioning min_length capability;
    HF MinNewTokensLengthLogitsProcessor semantics)."""
    hf, cfg, params = models
    rng = np.random.default_rng(11)
    ids = [1] + rng.integers(3, VOCAB, size=4).tolist()
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]), num_beams=3, max_new_tokens=8,
            do_sample=False, early_stopping=False, min_new_tokens=5,
        )
    row = out[0, len(ids):].tolist()
    want = row[: row.index(EOS)] if EOS in row else row

    gen = GenerationConfig(max_new_tokens=8, do_sample=False, eos_token_id=EOS, pad_token_id=0)
    eng = DecodeEngine(params, cfg, gen, adapter=_TextAdapter(cfg), attn_impl="xla", bucket=8)
    got = [t for t in eng.generate_beam(ids, num_beams=3, min_new_tokens=5).token_ids if t != EOS]
    assert got == want, (got, want)
    assert len(got) >= 5
