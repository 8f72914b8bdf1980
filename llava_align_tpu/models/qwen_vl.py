"""Qwen-VL: QwenVisionConfig ViT+Resampler visual encoder + Qwen decoder with
in-band image spans.

Parity: reference experiments/Qwen_VL/modeling_qwen.py QWenModel.forward
image-span handling (:555-577): the token stream carries
[image_start_id, 256 span tokens, image_end_id]; the 256 positions between the
framing tokens are replaced by Resampler output embeddings. The framing tokens
stay as ordinary embeddings.

TPU-first: spans are located host-side (`sentinelize_span`) and converted to
the generic splice-plan sentinel, so the device-side path is the same single
gather+select used by LLaVA (models/llava.splice_embeds).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax

from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.models import qwen, qwen_vit
from llava_align_tpu.models.qwen import QwenConfig
from llava_align_tpu.models.qwen_vit import QwenVisionConfig

Params = Dict[str, Any]

# Qwen-VL special token ids (config.json visual.image_start_id = 151857;
# end = start+1, pad = start+2 per modeling_qwen.py:555-565)
DEFAULT_IMAGE_START_ID = 151857


@dataclasses.dataclass(frozen=True)
class QwenVLConfig:
    text: QwenConfig = dataclasses.field(default_factory=QwenConfig)
    vision: QwenVisionConfig = dataclasses.field(default_factory=QwenVisionConfig)
    image_start_id: int = DEFAULT_IMAGE_START_ID

    @property
    def image_end_id(self) -> int:
        return self.image_start_id + 1

    @property
    def image_pad_id(self) -> int:
        return self.image_start_id + 2

    @staticmethod
    def qwen_vl_7b() -> "QwenVLConfig":
        return QwenVLConfig()

    @staticmethod
    def tiny(vocab_size: int = 512) -> "QwenVLConfig":
        text = QwenConfig.tiny(vocab_size)
        vision = dataclasses.replace(QwenVisionConfig.tiny(), output_dim=text.hidden_size)
        return QwenVLConfig(text=text, vision=vision, image_start_id=vocab_size - 5)


def init(rng: jax.Array, cfg: QwenVLConfig) -> Params:
    k1, k2 = jax.random.split(rng)
    return {"qwen": qwen.init(k1, cfg.text), "visual": qwen_vit.init(k2, cfg.vision)}


def sentinelize_span(
    input_ids: Sequence[int], cfg: QwenVLConfig
) -> Tuple[List[int], int]:
    """Collapse each [start, ...span..., end] image block into
    [start, IMAGE_TOKEN_INDEX, end]; the splice plan re-expands the sentinel
    to n_queries feature slots. Returns (ids, num_images)."""
    out: List[int] = []
    n_images = 0
    i = 0
    ids = [int(t) for t in input_ids]
    while i < len(ids):
        t = ids[i]
        if t == cfg.image_start_id:
            try:
                j = ids.index(cfg.image_end_id, i + 1)
            except ValueError:
                raise ValueError("unterminated image span in input_ids")
            out.append(cfg.image_start_id)
            out.append(IMAGE_TOKEN_INDEX)
            out.append(cfg.image_end_id)
            n_images += 1
            i = j + 1
        else:
            out.append(t)
            i += 1
    return out, n_images


def make_image_span_ids(cfg: QwenVLConfig) -> List[int]:
    """Token block the tokenizer would emit for '<img>…</img>' with the path
    bytes padded to n_queries (modeling_qwen.py:555-565). For tensor-fed
    images the span content is irrelevant — pads suffice."""
    return (
        [cfg.image_start_id]
        + [cfg.image_pad_id] * cfg.vision.n_queries
        + [cfg.image_end_id]
    )


def encode_images(params: Params, cfg: QwenVLConfig, images: jax.Array) -> jax.Array:
    return qwen_vit.forward(params["visual"], cfg.vision, images).astype(cfg.text.dtype)
