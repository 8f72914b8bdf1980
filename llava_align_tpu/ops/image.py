"""CLIP image preprocessing.

Two paths with identical semantics:

* `clip_preprocess_pil` — host-side PIL resize/crop matching HF's
  CLIPImageProcessor bit-for-bit (the parity path; the reference calls
  `image_processor.preprocess`, e.g. llava_calibrate.py:149).
* `clip_preprocess_jax` — fully on-device jitted resize + crop + normalize for
  TPU-resident pipelines (bench / serving hot path). Uses XLA's antialiased
  bicubic resize; numerically close to PIL but not bit-identical.

`expand2square` implements the 'pad' aspect-ratio mode
(reference experiments/llava/mm_utils.py:152-163).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def expand2square(pil_img, background_color: Tuple[int, int, int]):
    """Pad a PIL image to a square with the given background color,
    centering the original (reference mm_utils.py:152-163)."""
    from PIL import Image

    width, height = pil_img.size
    if width == height:
        return pil_img
    side = max(width, height)
    result = Image.new(pil_img.mode, (side, side), background_color)
    result.paste(pil_img, ((side - width) // 2, (side - height) // 2))
    return result


def clip_preprocess_pil(
    pil_img,
    image_size: int = 336,
    image_aspect_ratio: Optional[str] = None,
    mean: Sequence[float] = OPENAI_CLIP_MEAN,
    std: Sequence[float] = OPENAI_CLIP_STD,
) -> np.ndarray:
    """PIL → normalized CHW float32, matching HF CLIPImageProcessor:
    resize shortest edge (bicubic) → center crop → rescale 1/255 → normalize.

    With image_aspect_ratio='pad', first expand to a square filled with the
    CLIP mean color (reference mm_utils.py:166-173).
    """
    from PIL import Image

    img = pil_img.convert("RGB")
    if image_aspect_ratio == "pad":
        bg = tuple(int(x * 255) for x in mean)
        img = expand2square(img, bg)

    # resize shortest edge to image_size, preserving aspect ratio
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    new_short = image_size
    # int() TRUNCATION, not round: HF get_resize_output_image_size computes
    # int(size * long / short) (transformers/image_transforms.py) — round()
    # resizes 500x333 to 505 where HF produces 504, shifting the crop window
    new_long = int(image_size * long / short)
    new_w, new_h = (new_short, new_long) if w <= h else (new_long, new_short)
    img = img.resize((new_w, new_h), resample=Image.BICUBIC)

    # center crop to image_size x image_size
    left = (new_w - image_size) // 2
    top = (new_h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))

    arr = np.asarray(img, dtype=np.float32) / 255.0  # HWC
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return arr.transpose(2, 0, 1)  # CHW


def qwen_preprocess_pil(
    pil_img,
    image_size: int = 448,
    mean: Sequence[float] = OPENAI_CLIP_MEAN,
    std: Sequence[float] = OPENAI_CLIP_STD,
) -> np.ndarray:
    """Qwen-VL's image transform: direct (aspect-destroying) bicubic resize to
    image_size x image_size + CLIP normalize (reference Qwen_VL/visual.py:352-361).
    Returns CHW float32."""
    from PIL import Image

    img = pil_img.convert("RGB").resize((image_size, image_size), resample=Image.BICUBIC)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return arr.transpose(2, 0, 1)


def clip_resize_pil_uint8(
    pil_img,
    image_size: int = 336,
    image_aspect_ratio: Optional[str] = None,
    mean: Sequence[float] = OPENAI_CLIP_MEAN,
) -> np.ndarray:
    """PIL → uint8 CHW, the resize/crop half of clip_preprocess_pil with
    normalization deferred to the device (normalize_device). Shipping uint8
    pixels is 4x less host→device traffic than normalized f32 and skips the
    host-side float cast — identical math end-to-end because normalization
    is exact in f32 on device."""
    from PIL import Image

    img = pil_img.convert("RGB")
    if image_aspect_ratio == "pad":
        bg = tuple(int(x * 255) for x in mean)
        img = expand2square(img, bg)
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    new_short = image_size
    # int() TRUNCATION, not round: HF get_resize_output_image_size computes
    # int(size * long / short) (transformers/image_transforms.py) — round()
    # resizes 500x333 to 505 where HF produces 504, shifting the crop window
    new_long = int(image_size * long / short)
    new_w, new_h = (new_short, new_long) if w <= h else (new_long, new_short)
    img = img.resize((new_w, new_h), resample=Image.BICUBIC)
    left = (new_w - image_size) // 2
    top = (new_h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    return np.asarray(img, dtype=np.uint8).transpose(2, 0, 1)


def normalize_host(u8: np.ndarray) -> np.ndarray:
    """Host-side counterpart of normalize_device for uint8 CHW pixels
    (mixed-dtype batches fall back to one float array)."""
    x = u8.astype(np.float32) / 255.0
    m = np.asarray(OPENAI_CLIP_MEAN, np.float32).reshape(3, 1, 1)
    s = np.asarray(OPENAI_CLIP_STD, np.float32).reshape(3, 1, 1)
    return (x - m) / s


def normalize_device(
    images: jax.Array,
    dtype,
    mean: Sequence[float] = OPENAI_CLIP_MEAN,
    std: Sequence[float] = OPENAI_CLIP_STD,
) -> jax.Array:
    """Jit-side image ingest: uint8 raw pixels [..., 3, H, W] → /255 →
    CLIP-normalize → dtype; float inputs are already normalized and only
    cast. All three model families (CLIP-ViT, EVA-ViT, Qwen ViT) use the
    OpenAI CLIP mean/std."""
    if jnp.issubdtype(images.dtype, jnp.integer):
        x = images.astype(jnp.float32) / 255.0
        shape = (1,) * (x.ndim - 3) + (3, 1, 1)
        m = jnp.asarray(mean, jnp.float32).reshape(shape)
        s = jnp.asarray(std, jnp.float32).reshape(shape)
        return ((x - m) / s).astype(dtype)
    return images.astype(dtype)


@functools.partial(jax.jit, static_argnames=("image_size",))
def clip_normalize(
    image_01: jax.Array,
    image_size: int = 336,
) -> jax.Array:
    """Normalize an already-resized [0,1] image. Accepts HWC or CHW; returns CHW."""
    x = image_01
    if x.shape[-1] == 3:
        x = jnp.moveaxis(x, -1, -3)
    mean = jnp.asarray(OPENAI_CLIP_MEAN, x.dtype).reshape(3, 1, 1)
    std = jnp.asarray(OPENAI_CLIP_STD, x.dtype).reshape(3, 1, 1)
    return (x - mean) / std


@functools.partial(jax.jit, static_argnames=("image_size", "pad_to_square"))
def clip_preprocess_jax(
    image_uint8: jax.Array,
    image_size: int = 336,
    pad_to_square: bool = True,
) -> jax.Array:
    """Fully on-device preprocess: uint8 HWC → normalized CHW float32.

    pad_to_square=True reproduces the 'pad' aspect mode: pad with the CLIP
    mean color so resize needs no crop afterwards. Compiles once per input
    (H, W) — callers should bucket camera sizes if they vary wildly.
    """
    x = image_uint8.astype(jnp.float32) / 255.0  # HWC in [0,1]
    h, w = x.shape[0], x.shape[1]
    mean = jnp.asarray(OPENAI_CLIP_MEAN, jnp.float32)

    if pad_to_square:
        side = max(h, w)
        top, left = (side - h) // 2, (side - w) // 2
        canvas = jnp.broadcast_to(mean, (side, side, 3))
        x = jax.lax.dynamic_update_slice(canvas, x, (top, left, 0))
        x = jax.image.resize(x, (image_size, image_size, 3), method="bicubic", antialias=True)
    else:
        # resize shortest edge then center crop
        if h <= w:
            # int() truncation = HF get_resize_output_image_size (see
            # clip_preprocess_pil)
            nh, nw = image_size, int(image_size * w / h)
        else:
            nh, nw = int(image_size * h / w), image_size
        x = jax.image.resize(x, (nh, nw, 3), method="bicubic", antialias=True)
        top, left = (nh - image_size) // 2, (nw - image_size) // 2
        x = jax.lax.dynamic_slice(x, (top, left, 0), (image_size, image_size, 3))

    x = jnp.clip(x, 0.0, 1.0)
    return clip_normalize(x, image_size)
