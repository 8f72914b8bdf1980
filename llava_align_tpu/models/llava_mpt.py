"""LLaVA-MPT: CLIP tower + projector + MPT decoder.

Capability parity: reference experiments/llava/model/language_model/
llava_mpt.py (LlavaMPTForCausalLM): the multimodal splice/projector machinery
is identical to LLaVA-LLaMA; only the language backbone differs (alibi MPT).
Use decoding.adapters.LlavaMptAdapter with the engine.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax

from llava_align_tpu.config import ClipVisionConfig
from llava_align_tpu.models import clip_vit, mpt, projector
from llava_align_tpu.models.mpt import MptConfig

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlavaMptConfig:
    text: MptConfig = dataclasses.field(default_factory=MptConfig)
    vision: ClipVisionConfig = dataclasses.field(default_factory=ClipVisionConfig)
    mm_projector_type: str = "mlp2x_gelu"
    mm_use_im_start_end: bool = False

    @property
    def num_image_tokens(self) -> int:
        return self.vision.num_patches

    @staticmethod
    def tiny(vocab_size: int = 256) -> "LlavaMptConfig":
        return LlavaMptConfig(
            text=MptConfig.tiny(vocab_size), vision=ClipVisionConfig.tiny()
        )


def init(rng: jax.Array, cfg: LlavaMptConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "mpt": mpt.init(k1, cfg.text),
        "vision": clip_vit.init(k2, cfg.vision),
        "projector": projector.init(
            k3, cfg.mm_projector_type, cfg.vision.hidden_size, cfg.text.d_model,
            cfg.text.dtype,
        ),
    }
