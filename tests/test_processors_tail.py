"""Processor-registry tail: alpro_video_train, blip2_image_train,
clip_image_{train,eval}, gpt_dialogue, gpt_video_ft, blip_diffusion_*.

Oracles: the reference VideoRandomAugment and GPT processors are loaded
read-only (gpt_processors.py via additive stubs, instantiated around the
GPT2Tokenizer download with __new__ + a shared mock tokenizer) and compared
head-to-head. Image processors are pinned by spec properties (shapes,
normalization algebra, aspect-preserving resize) since torchvision is not
in this image.
"""

import os
import sys

import numpy as np
import pytest
import torch

from llava_align_tpu.framework import processors as proc_mod
from llava_align_tpu.framework import randaugment as ra
from llava_align_tpu.framework.registry import registry

from stub_utils import load_by_path, stub_module

REF_RA_PATH = "/root/reference/experiments/lavis/processors/randaugment.py"
REF_GPT_PATH = "/root/reference/experiments/lavis/processors/gpt_processors.py"

VIDEO_AUGS = ["Identity", "AutoContrast", "Brightness", "Sharpness",
              "Equalize", "ShearX", "ShearY", "TranslateX", "TranslateY",
              "Rotate"]


def test_all_reference_processors_registered():
    # the reference's processor registrations (lavis/processors/*.py)
    for name in (
        "blip_image_train", "blip_image_eval", "blip_caption", "blip_question",
        "blip2_image_train", "clip_image_train", "clip_image_eval",
        "alpro_video_train", "alpro_video_eval", "gpt_dialogue", "gpt_video_ft",
        "blip_diffusion_inp_image_train", "blip_diffusion_inp_image_eval",
        "blip_diffusion_tgt_image_train",
    ):
        assert registry.get_processor_class(name) is not None, name


@pytest.fixture(scope="module")
def ref_ra():
    return load_by_path("ref_randaugment_tail", REF_RA_PATH)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(4, 40, 48, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:40, 0:48]
    grad = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    return np.clip(base // 2 + grad[None, ..., None] // 2, 0, 235).astype(np.uint8)


def test_video_randaugment_matches_reference_schedule(ref_ra, frames):
    """Same global seed → same (without-replacement) op draw, same gates,
    same per-frame arg draws; pixel match within the cv2 fixed-point slack
    the image-op oracle tests established."""
    for seed in range(6):
        ours_aug = ra.VideoRandomAugment(2, 5, augs=list(VIDEO_AUGS))
        ref_aug = ref_ra.VideoRandomAugment(2, 5, augs=list(VIDEO_AUGS))
        np.random.seed(seed)
        ours = ours_aug(frames.copy())
        np.random.seed(seed)
        theirs = ref_aug(torch.tensor(frames.copy())).numpy()
        assert ours.shape == theirs.shape == frames.shape
        diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
        # two stacked warps compound the cv2 fixed-point edge rounding, so a
        # handful of border pixels can diverge further than the single-op
        # bound — gate on the bulk distribution instead
        assert (diff <= 1).mean() > 0.97, (seed, (diff > 1).mean())
        assert (diff <= 6).mean() > 0.999, (seed, (diff > 6).mean())
        assert diff.max() <= 48, (seed, diff.max())


def test_video_randaugment_ops_shared_across_frames():
    """All frames of one clip get the same op schedule: with a
    deterministic-output op pair the frames transform identically."""
    img = np.random.default_rng(3).integers(0, 256, (3, 16, 16, 3), dtype=np.uint8)
    clip = np.stack([img[0]] * 3)
    aug = ra.VideoRandomAugment(
        2, 5, augs=["AutoContrast", "Equalize"], rng=np.random.default_rng(5)
    )
    out = aug(clip)
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[1], out[2])


# ---------------------------------------------------------------------------
# image processor tail
# ---------------------------------------------------------------------------


def _pil(arr):
    from PIL import Image

    return Image.fromarray(arr)


def test_blip2_image_train_shape_and_no_randaugment():
    rng = np.random.default_rng(1)
    img = _pil(rng.integers(0, 256, (400, 380, 3), dtype=np.uint8))
    cls = registry.get_processor_class("blip2_image_train")
    p = cls(image_size=64, seed=3)
    out = p(img)
    assert out.shape == (3, 64, 64)
    # deterministic under seed
    out2 = cls(image_size=64, seed=3)(img)
    np.testing.assert_array_equal(out, out2)
    # default size is the reference's 364 (blip_processors.py:199)
    assert cls().image_size == 364


def test_clip_image_train_no_flip_and_tight_scale():
    """clip_image_train crops 90-100% of area and never flips: with a
    left-right gradient image, the output's columns must remain increasing."""
    grad = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None], (64, 1, 3))
    cls = registry.get_processor_class("clip_image_train")
    p = cls(image_size=32, seed=0)
    assert (p.min_scale, p.max_scale) == (0.9, 1.0)
    for _ in range(8):
        out = p(_pil(grad))  # [3, 32, 32]
        col_means = out[0].mean(axis=0)
        assert col_means[-1] > col_means[0]  # unflipped gradient


def test_clip_image_eval_aspect_preserving():
    """Resize short edge + center crop (reference clip_processors.py:62-96):
    a 2:1-wide gradient image keeps its center, unlike blip_image_eval's
    square resize which squashes the full range in."""
    grad = np.tile(np.linspace(0, 255, 128, dtype=np.uint8)[None, :, None], (64, 1, 3))
    clip_eval = registry.get_processor_class("clip_image_eval")(image_size=32)
    out = clip_eval(_pil(grad))
    assert out.shape == (3, 32, 32)
    # center crop of the wide gradient: edges of the ramp are cut off →
    # narrower value range than the blip square-resize
    blip_eval = registry.get_processor_class("blip_image_eval")(image_size=32)
    blip_out = blip_eval(_pil(grad))
    assert out[0].max() - out[0].min() < blip_out[0].max() - blip_out[0].min()


def test_clip_image_eval_matches_manual_composition():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (50, 100, 3), dtype=np.uint8)
    from PIL import Image

    p = registry.get_processor_class("clip_image_eval")(image_size=32)
    got = p(_pil(arr))
    resized = _pil(arr).resize((64, 32), resample=Image.BICUBIC)  # short=50→32
    want = resized.crop((16, 0, 48, 32))
    want = proc_mod._normalize(np.asarray(want), p.mean, p.std)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_blip_diffusion_processors():
    rng = np.random.default_rng(4)
    img = _pil(rng.integers(0, 256, (80, 60, 3), dtype=np.uint8))
    inp_train = registry.get_processor_class("blip_diffusion_inp_image_train")
    inp_eval = registry.get_processor_class("blip_diffusion_inp_image_eval")
    assert inp_train is inp_eval  # registered under both names (reference :17-18)
    out = inp_train(image_size=32)(img)
    assert out.shape == (3, 32, 32)

    tgt_cls = registry.get_processor_class("blip_diffusion_tgt_image_train")
    assert tgt_cls().image_size == 512
    black = _pil(np.zeros((40, 40, 3), np.uint8))
    white = _pil(np.full((40, 40, 3), 255, np.uint8))
    t = tgt_cls(image_size=16)
    np.testing.assert_allclose(t(black), -1.0, atol=1e-6)  # [0,1]→[-1,1]
    np.testing.assert_allclose(t(white), 1.0, atol=1e-6)


def test_alpro_video_train_shapes_and_determinism(frames):
    cls = registry.get_processor_class("alpro_video_train")
    p1 = cls(image_size=32, n_frms=4, seed=9)
    p2 = cls(image_size=32, n_frms=4, seed=9)
    a = p1(frames)
    b = p2(frames)
    assert a.shape == (3, 4, 32, 32)
    np.testing.assert_array_equal(a, b)


def test_alpro_headtail_sampling_property():
    """headtail (reference data_utils.py:39-42): n/2 sorted indices from the
    first half, n/2 sorted from the second half."""
    cls = registry.get_processor_class("alpro_video_train")
    p = cls(image_size=16, n_frms=6, seed=1)
    for _ in range(10):
        idx = p._headtail_indices(20)
        head, tail = idx[:3], idx[3:]
        assert (head < 10).all() and (tail >= 10).all()
        assert (np.diff(head) > 0).all() and (np.diff(tail) > 0).all()


# ---------------------------------------------------------------------------
# GPT processors vs the reference module
# ---------------------------------------------------------------------------


class MockGPT2Tokenizer:
    """Deterministic stand-in for GPT2Tokenizer (offline image). Shared by
    ours and the reference oracle so token streams are comparable."""

    SPECIAL = {"<bos>": 1, "<eos>": 2, "<speaker1>": 3, "<speaker2>": 4,
               "<cap>": 5, "<video>": 6, "<pad>": 0}

    pad_token_id = 0

    def convert_tokens_to_ids(self, tokens):
        if isinstance(tokens, str):
            return self.SPECIAL[tokens]
        return [self.SPECIAL[t] for t in tokens]

    def encode(self, text):
        return [10 + (sum(map(ord, w)) % 53) for w in text.split()]


@pytest.fixture(scope="module")
def ref_gpt():
    stub_module("lavis")
    stub_module("lavis.common")
    stub_module("lavis.processors")

    class _Reg:
        @staticmethod
        def register_processor(name):
            return lambda cls: cls

        @staticmethod
        def get(name, default=None):
            return default

    mod = stub_module("lavis.common.registry", registry=_Reg())
    # additive extension: an earlier test file may have registered its own
    # registry object (stub_module only fills MISSING attributes) — make
    # sure whatever object is there carries the members gpt_processors uses
    reg = mod.registry
    for attr in ("register_processor", "get"):
        if not hasattr(reg, attr):
            setattr(reg, attr, getattr(_Reg, attr))
    stub_module("lavis.processors.base_processor", BaseProcessor=object)
    stub_module("lavis.processors.randaugment", RandomAugment=ra.RandomAugment)

    class _OC:
        @staticmethod
        def create():
            return {}

    stub_module("omegaconf", OmegaConf=_OC)
    tv = stub_module("torchvision")
    transforms = stub_module("torchvision.transforms")
    stub_module(
        "torchvision.transforms.functional",
        InterpolationMode=type("IM", (), {"BICUBIC": 3}),
    )
    if not hasattr(tv, "transforms"):
        tv.transforms = transforms
    for attr in ("Compose", "RandomResizedCrop", "ToTensor", "Normalize",
                 "Resize", "CenterCrop", "RandomHorizontalFlip"):
        if not hasattr(transforms, attr):
            setattr(transforms, attr, lambda *a, **k: None)
    return load_by_path("ref_gpt_processors", REF_GPT_PATH)


ANN = {
    "caption": "a man is cooking",
    "summary": "cooking video",
    "question": "what is he doing now",
    "answer": "he stirs the pot",
    "dialog": [
        {"question": "who is there", "answer": "a man"},
        {"question": "where is he", "answer": "kitchen"},
        {"question": "is it day", "answer": "yes it is"},
        {"question": "what color shirt", "answer": "blue"},
    ],
}


def test_gpt_dialogue_matches_reference(ref_gpt):
    tok = MockGPT2Tokenizer()
    RefCls = ref_gpt.GPTDialogueProcessor
    ref_proc = RefCls.__new__(RefCls)  # skip the gpt2 download in __init__
    ref_proc.max_turns = 3
    ref_proc.use_caption = True
    ref_proc.tokenizer = tok

    ours = proc_mod.GPTDialogueProcessor(max_turns=3, use_caption=True, tokenizer=tok)

    want = ref_proc(ANN)
    got = ours(ANN)
    for key in ("input_ids", "token_type_ids", "labels"):
        np.testing.assert_array_equal(got[key], want[key].numpy(), err_msg=key)

    # no-caption mode
    ref_proc.use_caption = False
    ours_nc = proc_mod.GPTDialogueProcessor(max_turns=3, use_caption=False, tokenizer=tok)
    np.testing.assert_array_equal(
        ours_nc(ANN)["input_ids"], ref_proc(ANN)["input_ids"].numpy()
    )


def test_gpt_dialogue_padding_and_mask(ref_gpt):
    tok = MockGPT2Tokenizer()
    ours = proc_mod.GPTDialogueProcessor(tokenizer=tok)
    seqs = [np.asarray([5, 6, 7]), np.asarray([8, 9])]
    padded = ours.padding(seqs)
    want = torch.nn.utils.rnn.pad_sequence(
        [torch.tensor(s) for s in seqs], batch_first=True,
        padding_value=tok.pad_token_id,
    ).numpy()
    np.testing.assert_array_equal(padded, want)
    np.testing.assert_array_equal(
        ours.get_attention_mask(padded), padded != tok.pad_token_id
    )


def test_gpt_video_ft_matches_reference(ref_gpt, tmp_path):
    rng = np.random.default_rng(7)
    os.makedirs(tmp_path / "i3d_rgb")
    os.makedirs(tmp_path / "vggish")
    np.save(tmp_path / "i3d_rgb" / "vid1.npy", rng.normal(size=(9, 5)).astype(np.float32))
    np.save(tmp_path / "vggish" / "vid1.npy", rng.normal(size=(7, 3)).astype(np.float32))

    tok = MockGPT2Tokenizer()
    RefCls = ref_gpt.GPTVideoFeatureProcessor
    ref_proc = RefCls.__new__(RefCls)
    ref_proc.visual_ft = ["i3d_rgb"]
    ref_proc.audio_ft = ["vggish"]
    ref_proc.tokenizer = tok

    ours = proc_mod.GPTVideoFeatureProcessor(
        visual_ft=["i3d_rgb"], audio_ft=["vggish"], tokenizer=tok
    )
    want = ref_proc(str(tmp_path), "vid1")
    got = ours(str(tmp_path), "vid1")
    assert got["video_fts"].shape == (7, 8)  # min_len=7, 5+3 features
    np.testing.assert_allclose(got["video_fts"], want["video_fts"].numpy(), rtol=1e-6)
    np.testing.assert_array_equal(
        got["token_type_ids"], want["token_type_ids"].numpy()
    )

    # padding + attention mask parity (reference :134-140)
    seqs = [got["video_fts"], got["video_fts"][:3]]
    padded = ours.padding(seqs)
    want_pad = torch.nn.utils.rnn.pad_sequence(
        [torch.tensor(s) for s in seqs], batch_first=True, padding_value=1.0
    ).numpy()
    np.testing.assert_allclose(padded, want_pad, rtol=1e-6)
    np.testing.assert_array_equal(
        ours.get_attention_mask(padded),
        (torch.sum(torch.tensor(padded) != 1, dim=2) != 0).numpy(),
    )
