"""Image/text processors, registered by name.

Capability parity: reference lavis/processors/blip_processors.py:105-185 —
blip_image_eval (resize + normalize), blip_image_train (random resized crop +
horizontal flip + 2-op RandAugment at magnitude 5, the full reference train
transform), and blip_caption text processor (prompt prefix + word-count
truncation). RandAugment itself is oracle-pinned to the reference module in
tests/test_randaugment.py.
"""

from __future__ import annotations

import re
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
    """Random resized crop (area scale + 3/4..4/3 aspect, torchvision
    semantics) + horizontal flip + 2-op RandAugment (M=5, the 10-op blip
    subset) + normalize — the reference train transform
    (blip_processors.py:110-138)."""

    def __init__(
        self,
        image_size: int = 224,
        min_scale: float = 0.5,
        max_scale: float = 1.0,
        mean=OPENAI_CLIP_MEAN,
        std=OPENAI_CLIP_STD,
        seed: Optional[int] = None,
    ):
        from llava_align_tpu.framework.randaugment import (
            BLIP_TRAIN_AUGS, RandomAugment,
        )

        self.image_size = image_size
        self.min_scale, self.max_scale = min_scale, max_scale
        self.mean, self.std = mean, std
        self.rng = np.random.default_rng(seed)
        self.randaug = RandomAugment(
            2, 5, augs=list(BLIP_TRAIN_AUGS), rng=self.rng
        )

    def _random_resized_crop(self, img):
        """torchvision RandomResizedCrop: 10 tries of (area, log-ratio)
        sampling, center-crop fallback."""
        from PIL import Image

        w, h = img.size
        area = w * h
        for _ in range(10):
            target = area * self.rng.uniform(self.min_scale, self.max_scale)
            ratio = float(np.exp(self.rng.uniform(np.log(3 / 4), np.log(4 / 3))))
            cw = int(round(np.sqrt(target * ratio)))
            ch = int(round(np.sqrt(target / ratio)))
            if 0 < cw <= w and 0 < ch <= h:
                x0 = int(self.rng.integers(0, w - cw + 1))
                y0 = int(self.rng.integers(0, h - ch + 1))
                return img.crop((x0, y0, x0 + cw, y0 + ch)).resize(
                    (self.image_size, self.image_size), resample=Image.BICUBIC
                )
        # torchvision fallback: center crop clamped to the ratio range
        min_ratio, max_ratio = 3 / 4, 4 / 3
        in_ratio = w / h
        if in_ratio < min_ratio:
            cw = w
            ch = int(round(cw / min_ratio))
        elif in_ratio > max_ratio:
            ch = h
            cw = int(round(ch * max_ratio))
        else:
            cw, ch = w, h
        x0, y0 = (w - cw) // 2, (h - ch) // 2
        return img.crop((x0, y0, x0 + cw, y0 + ch)).resize(
            (self.image_size, self.image_size), resample=Image.BICUBIC
        )

    def __call__(self, pil_img) -> np.ndarray:
        from PIL import Image

        img = self._random_resized_crop(pil_img.convert("RGB"))
        if self.rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        arr = self.randaug(np.asarray(img))
        return _normalize(arr, self.mean, self.std)


@registry.register_processor("blip_caption")
class BlipCaptionProcessor:
    """Caption text processor (reference blip_processors.py:30-68
    BlipCaptionProcessor): prompt + pre_caption — lowercase, the punctuation
    class [.!"()*#:;~] replaced with SPACE, whitespace runs collapsed,
    strip, then truncate to max_words."""

    def __init__(self, prompt: str = "", max_words: int = 50):
        self.prompt = prompt
        self.max_words = max_words

    def __call__(self, caption: str) -> str:
        caption = re.sub(r'([.!"()*#:;~])', " ", caption.lower())
        caption = re.sub(r"\s{2,}", " ", caption)
        caption = caption.rstrip("\n").strip(" ")
        words = caption.split(" ")
        if len(words) > self.max_words:
            caption = " ".join(words[: self.max_words])
        return self.prompt + caption


@registry.register_processor("blip_question")
class BlipQuestionProcessor:
    """Question text processor (reference blip_processors.py:71-102
    pre_question): lowercase, the punctuation class [.!"()*#:;~] DELETED
    (not spaced — unlike pre_caption), rstrip, truncate to max_words."""

    def __init__(self, max_words: int = 50):
        self.max_words = max_words

    def __call__(self, question: str) -> str:
        question = re.sub(r'([.!"()*#:;~])', "", question.lower())
        question = question.rstrip(" ")
        words = question.split(" ")
        if len(words) > self.max_words:
            question = " ".join(words[: self.max_words])
        return question


@registry.register_processor("alpro_video_eval")
class AlproVideoEvalProcessor:
    """Video eval processor (reference lavis/processors/alpro_processors.py
    AlproVideoEvalProcessor: uniformly sample n_frms, resize, CLIP-normalize
    → [3, T, H, W]). The reference decodes videos with decord (not installed
    here); this processor decodes real video FILES through OpenCV's
    VideoCapture (ffmpeg-backed), and also consumes a directory of frame
    images, a list of PIL images, or a [T, H, W, 3] uint8/float array
    (pre-extracted .npy frames)."""

    def __init__(self, image_size: int = 224, n_frms: int = 8,
                 mean=OPENAI_CLIP_MEAN, std=OPENAI_CLIP_STD):
        self.image_size = image_size
        self.n_frms = n_frms
        self.mean = mean
        self.std = std

    def _frame(self, pil_img) -> np.ndarray:
        from PIL import Image

        img = pil_img.convert("RGB").resize(
            (self.image_size, self.image_size), resample=Image.BICUBIC
        )
        return _normalize(np.asarray(img), self.mean, self.std)  # [3, H, W]

    def _decode_video_file(self, path: str):
        """cv2.VideoCapture decode with uniform n_frms sampling — the
        reference's decord load_video semantics (alpro_processors.py) on
        the ffmpeg backend OpenCV ships."""
        import cv2
        from PIL import Image

        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise ValueError(f"cannot open video file {path}")
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        frames = []
        if total > 0:
            idx = set(
                np.linspace(0, total - 1, self.n_frms).round().astype(int).tolist()
            )
            i = 0
            while True:
                ret, f = cap.read()
                if not ret:
                    break
                if i in idx:
                    frames.append(Image.fromarray(cv2.cvtColor(f, cv2.COLOR_BGR2RGB)))
                i += 1
        else:  # container without a frame count: read all, sample after
            while True:
                ret, f = cap.read()
                if not ret:
                    break
                frames.append(Image.fromarray(cv2.cvtColor(f, cv2.COLOR_BGR2RGB)))
        cap.release()
        return frames

    def __call__(self, video) -> np.ndarray:
        import os

        from PIL import Image

        if isinstance(video, str) and os.path.isfile(video):  # real video file
            frames = self._decode_video_file(video)
        elif isinstance(video, str):  # directory of frame images
            files = sorted(
                os.path.join(video, f) for f in os.listdir(video)
                if f.lower().endswith((".jpg", ".jpeg", ".png"))
            )
            frames = [Image.open(f) for f in files]
        elif isinstance(video, np.ndarray):  # [T, H, W, 3]
            frames = [Image.fromarray(np.asarray(f, np.uint8)) for f in video]
        else:  # sequence of PIL images
            frames = list(video)
        if not frames:
            raise ValueError("empty video input")
        # uniform temporal sampling to n_frms (alpro_processors.py load_video)
        idx = np.linspace(0, len(frames) - 1, self.n_frms).round().astype(int)
        arr = np.stack([self._frame(frames[i]) for i in idx])  # [T, 3, H, W]
        return arr.transpose(1, 0, 2, 3)  # [3, T, H, W]
