"""Image/text processors, registered by name.

Capability parity: reference lavis/processors/blip_processors.py:105-185 —
blip_image_eval (resize + normalize), blip_image_train (random resized crop +
horizontal flip; RandAugment capability reduced to the flip/crop core), and
blip_caption text processor (prompt prefix + word-count truncation).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from llava_align_tpu.framework.registry import registry
from llava_align_tpu.ops.image import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD


def _normalize(arr_hwc: np.ndarray, mean, std) -> np.ndarray:
    x = arr_hwc.astype(np.float32) / 255.0
    x = (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return x.transpose(2, 0, 1)


@registry.register_processor("blip_image_eval")
class BlipImageEvalProcessor:
    def __init__(self, image_size: int = 224, mean=OPENAI_CLIP_MEAN, std=OPENAI_CLIP_STD):
        self.image_size = image_size
        self.mean, self.std = mean, std

    def __call__(self, pil_img) -> np.ndarray:
        from PIL import Image

        img = pil_img.convert("RGB").resize(
            (self.image_size, self.image_size), resample=Image.BICUBIC
        )
        return _normalize(np.asarray(img), self.mean, self.std)


@registry.register_processor("blip_image_train")
class BlipImageTrainProcessor:
    """Random resized crop (scale 0.5-1.0) + horizontal flip + normalize."""

    def __init__(
        self,
        image_size: int = 224,
        min_scale: float = 0.5,
        max_scale: float = 1.0,
        mean=OPENAI_CLIP_MEAN,
        std=OPENAI_CLIP_STD,
        seed: Optional[int] = None,
    ):
        self.image_size = image_size
        self.min_scale, self.max_scale = min_scale, max_scale
        self.mean, self.std = mean, std
        self.rng = np.random.default_rng(seed)

    def __call__(self, pil_img) -> np.ndarray:
        from PIL import Image

        img = pil_img.convert("RGB")
        w, h = img.size
        scale = self.rng.uniform(self.min_scale, self.max_scale)
        cw, ch = max(1, int(w * scale)), max(1, int(h * scale))
        x0 = int(self.rng.integers(0, w - cw + 1))
        y0 = int(self.rng.integers(0, h - ch + 1))
        img = img.crop((x0, y0, x0 + cw, y0 + ch)).resize(
            (self.image_size, self.image_size), resample=Image.BICUBIC
        )
        if self.rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return _normalize(np.asarray(img), self.mean, self.std)


@registry.register_processor("blip_caption")
class BlipCaptionProcessor:
    def __init__(self, prompt: str = "", max_words: int = 50):
        self.prompt = prompt
        self.max_words = max_words

    def __call__(self, caption: str) -> str:
        words = caption.split(" ")
        if len(words) > self.max_words:
            caption = " ".join(words[: self.max_words])
        return self.prompt + caption
