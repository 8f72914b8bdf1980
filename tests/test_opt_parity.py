"""OPT decoder parity vs HF torch (the blip2_opt LLM backend,
reference lavis/models/blip2_models/modeling_opt.py capability)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from llava_align_tpu.models import opt
from llava_align_tpu.models.opt import OptConfig
from llava_align_tpu.utils.hf_convert import convert_opt

CFG = OptConfig.tiny(vocab_size=256)


@pytest.fixture(scope="module")
def models():
    from transformers import OPTConfig as HFCfg
    from transformers import OPTForCausalLM

    torch.manual_seed(0)
    hf = OPTForCausalLM(
        HFCfg(
            vocab_size=CFG.vocab_size,
            hidden_size=CFG.hidden_size,
            num_hidden_layers=CFG.num_layers,
            num_attention_heads=CFG.num_heads,
            ffn_dim=CFG.ffn_dim,
            max_position_embeddings=CFG.max_position_embeddings,
            do_layer_norm_before=True,
            attn_implementation="eager",
        )
    ).eval()
    params = convert_opt({k: v.detach() for k, v in hf.state_dict().items()}, CFG)
    return hf, params


def _ours(params, ids):
    ids = np.asarray(ids)
    emb = opt.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1], dtype=jnp.int32), ids.shape)
    hidden, _ = opt.forward(params, CFG, emb, pos)
    return np.asarray(opt.logits_from_hidden(params, hidden))


def test_logits_match_hf(models):
    hf, params = models
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, (2, 15))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(_ours(params, ids), ref, atol=3e-4, rtol=1e-3)


def test_incremental_decode_consistent(models):
    _, params = models
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, (1, 9))
    full = _ours(params, ids)
    emb = opt.embed_tokens(params, jnp.asarray(ids))
    cache = opt.init_cache(CFG, 1, 16)
    h, cache = opt.forward(
        params, CFG, emb[:, :5], jnp.arange(5, dtype=jnp.int32)[None],
        cache, jnp.zeros((1,), jnp.int32),
    )
    outs = [np.asarray(opt.logits_from_hidden(params, h[:, -1]))[0]]
    for t in range(5, 9):
        h, cache = opt.forward(
            params, CFG, emb[:, t : t + 1], jnp.full((1, 1), t, jnp.int32),
            cache, jnp.full((1,), t, jnp.int32),
        )
        outs.append(np.asarray(opt.logits_from_hidden(params, h[:, 0]))[0])
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o, full[0, 4 + i], atol=3e-4, rtol=1e-3)
