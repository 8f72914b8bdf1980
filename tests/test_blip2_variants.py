"""BLIP-2 OPT / T5 variant smoke tests (query-only Q-Former + alt backends)."""

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.config import GenerationConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding.adapters import Blip2OptAdapter
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import blip2
from llava_align_tpu.models.blip2 import Blip2OptConfig, Blip2T5Config


def test_blip2_opt_engine_vcd():
    cfg = Blip2OptConfig.tiny(vocab_size=256)
    params = blip2.init_opt(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28), jnp.float32)
    feats = blip2.encode_image_queries(params, cfg, imgs)
    feats_cd = blip2.encode_image_queries(params, cfg, imgs * 0.2)
    ids = [IMAGE_TOKEN_INDEX, 2, 40, 50]  # OPT bos=2 then prompt
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=10**6,
        use_cd=True, cd_alpha=1.0, cd_beta=0.1,
    )
    eng = DecodeEngine(params, cfg, gen, adapter=Blip2OptAdapter(cfg), attn_impl="xla", bucket=8)
    out = eng.generate(
        ids, None, precomputed_feats=np.concatenate([np.asarray(feats), np.asarray(feats_cd)], 0)
    )
    assert len(out.token_ids) == 4
    out2 = eng.generate(
        ids, None, precomputed_feats=np.concatenate([np.asarray(feats), np.asarray(feats_cd)], 0)
    )
    assert out.token_ids == out2.token_ids  # deterministic greedy


def test_blip2_t5_generate():
    cfg = Blip2T5Config.tiny(vocab_size=128)
    params = blip2.init_t5(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28), jnp.float32)
    prompts = [[5, 6, 7], [8, 9]]
    outs = blip2.t5_generate(
        params, cfg, imgs, prompts, max_new_tokens=4,
        decoder_start_token_id=0, eos_token_id=1,
    )
    assert len(outs) == 2
    assert all(len(o) <= 4 for o in outs)


def test_query_features_shape():
    cfg = Blip2OptConfig.tiny()
    params = blip2.init_opt(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 28, 28), jnp.float32)
    feats = blip2.encode_image_queries(params, cfg, imgs)
    assert feats.shape == (3, cfg.num_query_tokens, cfg.text.hidden_size)
