"""LLaVA-MPT engine smoke: dual-branch VDD decode runs and is deterministic."""

import jax
import numpy as np

from llava_align_tpu.config import GenerationConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding.adapters import LlavaMptAdapter
from llava_align_tpu.decoding.engine import DecodeEngine
from llava_align_tpu.models import llava_mpt
from llava_align_tpu.models.llava_mpt import LlavaMptConfig


def test_llava_mpt_engine_vdd():
    cfg = LlavaMptConfig.tiny(vocab_size=128)
    params = llava_mpt.init(jax.random.PRNGKey(0), cfg)
    H = cfg.vision.image_size
    image = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, H, H)))
    ids = [1, 40, IMAGE_TOKEN_INDEX, 50, 60]
    gen = GenerationConfig(
        max_new_tokens=4, do_sample=False, eos_token_id=10**6,
        use_dd=True, use_dd_unk=True, cd_alpha=1.0, cd_beta=0.1,
    )
    eng = DecodeEngine(params, cfg, gen, adapter=LlavaMptAdapter(cfg), attn_impl="xla", bucket=8)
    a = eng.generate(ids, image)
    b = eng.generate(ids, image)
    assert a.token_ids == b.token_ids
    assert len(a.token_ids) == 4
    # dropping the image changes the distribution
    c = eng.generate([1, 40, 50, 60], None)
    assert isinstance(c.token_ids, list)
