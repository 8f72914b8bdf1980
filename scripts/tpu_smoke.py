"""Smoke every model family's decode path on the current device (tiny
configs). Run on a real TPU to validate Mosaic/XLA lowering end to end.

    python scripts/tpu_smoke.py [family ...]   # default: all
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.config import GenerationConfig, LlavaConfig
from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.decoding.adapters import (
    Blip2OptAdapter,
    InstructBlipAdapter,
    LlavaMptAdapter,
    QwenVLAdapter,
)
from llava_align_tpu.decoding.engine import DecodeEngine


def smoke_llava():
    from llava_align_tpu.models import llava

    cfg = LlavaConfig.tiny(vocab_size=256)
    params = llava.init(jax.random.PRNGKey(0), cfg)
    H = cfg.vision.image_size
    gen = GenerationConfig(max_new_tokens=3, do_sample=False, eos_token_id=10**6,
                           use_dd=True, use_dd_unk=True)
    out = DecodeEngine(params, cfg, gen, bucket=16).generate(
        [1, 5, IMAGE_TOKEN_INDEX, 7], np.zeros((3, H, H), np.float32)
    )
    return out.token_ids


def smoke_llava_mpt():
    from llava_align_tpu.models import llava_mpt
    from llava_align_tpu.models.llava_mpt import LlavaMptConfig

    cfg = LlavaMptConfig.tiny()
    params = llava_mpt.init(jax.random.PRNGKey(2), cfg)
    H = cfg.vision.image_size
    gen = GenerationConfig(max_new_tokens=3, do_sample=False, eos_token_id=10**6,
                           use_dd=True, use_dd_unk=True)
    out = DecodeEngine(params, cfg, gen, adapter=LlavaMptAdapter(cfg), bucket=16).generate(
        [1, 5, IMAGE_TOKEN_INDEX, 7], np.zeros((3, H, H), np.float32)
    )
    return out.token_ids


def smoke_qwen():
    from llava_align_tpu.models import qwen_vl
    from llava_align_tpu.models.qwen_vl import QwenVLConfig

    cfg = QwenVLConfig.tiny()
    params = qwen_vl.init(jax.random.PRNGKey(0), cfg)
    ids = [10, 20] + qwen_vl.make_image_span_ids(cfg) + [30, 40]
    sent, _ = qwen_vl.sentinelize_span(ids, cfg)
    img = np.zeros((3, cfg.vision.image_size, cfg.vision.image_size), np.float32)
    gen = GenerationConfig(max_new_tokens=3, do_sample=False, eos_token_id=2, use_cd=True)
    out = DecodeEngine(params, cfg, gen, adapter=QwenVLAdapter(cfg), bucket=16).generate(sent, img)
    return out.token_ids


def smoke_instructblip():
    from llava_align_tpu.models import instructblip
    from llava_align_tpu.models.instructblip import InstructBlipConfig

    cfg = InstructBlipConfig.tiny()
    params = instructblip.init(jax.random.PRNGKey(1), cfg)
    feats = instructblip.encode(
        params, cfg, jnp.zeros((1, 3, 28, 28), jnp.float32), jnp.asarray([[5, 6]], jnp.int32)
    )
    gen = GenerationConfig(max_new_tokens=3, do_sample=False, eos_token_id=2)
    out = DecodeEngine(params, cfg, gen, adapter=InstructBlipAdapter(cfg), bucket=16).generate(
        [IMAGE_TOKEN_INDEX, 1, 7, 8], None, precomputed_feats=np.asarray(feats)
    )
    return out.token_ids


def smoke_blip2_opt():
    from llava_align_tpu.models import blip2
    from llava_align_tpu.models.blip2 import Blip2OptConfig

    cfg = Blip2OptConfig.tiny()
    params = blip2.init_opt(jax.random.PRNGKey(3), cfg)
    f = blip2.encode_image_queries(params, cfg, jnp.zeros((1, 3, 28, 28), jnp.float32))
    gen = GenerationConfig(max_new_tokens=3, do_sample=False, eos_token_id=10**6)
    out = DecodeEngine(params, cfg, gen, adapter=Blip2OptAdapter(cfg), bucket=16).generate(
        [IMAGE_TOKEN_INDEX, 2, 30], None, precomputed_feats=np.asarray(f)
    )
    return out.token_ids


def smoke_blip2_t5():
    from llava_align_tpu.models import blip2
    from llava_align_tpu.models.blip2 import Blip2T5Config

    cfg = Blip2T5Config.tiny()
    params = blip2.init_t5(jax.random.PRNGKey(4), cfg)
    return blip2.t5_generate(
        params, cfg, jnp.zeros((1, 3, 28, 28), jnp.float32), [[5, 6, 7]], max_new_tokens=3
    )


SMOKES = {
    "llava": smoke_llava,
    "llava_mpt": smoke_llava_mpt,
    "qwen": smoke_qwen,
    "instructblip": smoke_instructblip,
    "blip2_opt": smoke_blip2_opt,
    "blip2_t5": smoke_blip2_t5,
}

if __name__ == "__main__":
    wanted = sys.argv[1:] or list(SMOKES)
    print("device:", jax.devices()[0])
    for name in wanted:
        print(f"{name}: {SMOKES[name]()}", flush=True)
    print("ALL OK")
