"""CLIP contrastive model + BPE tokenizer parity.

Oracles: HF CLIPModel (structurally identical to the reference's open_clip
CLIP for the OpenAI ViT variants: QuickGELU, EOT-argmax pooling) for the
model math; the reference clip_models/tokenizer.py SimpleTokenizer (loaded
read-only with an ftfy identity stub — exact for ASCII) for the tokenizer,
using the reference's own bpe_simple_vocab_16e6.txt.gz.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_align_tpu.models import clip as clip_mod
from llava_align_tpu.models.clip import ClipConfig
from llava_align_tpu.models.clip_tokenizer import ClipTokenizer

V = 64


@pytest.fixture(scope="module")
def clip_models():
    from transformers import CLIPConfig as HfClipConfig, CLIPModel
    from llava_align_tpu.utils.hf_convert import convert_clip_full

    cfg = ClipConfig.tiny(vocab_size=V)
    hf_cfg = HfClipConfig(
        text_config={
            "vocab_size": V, "hidden_size": cfg.text.width,
            "num_hidden_layers": cfg.text.num_layers,
            "num_attention_heads": cfg.text.num_heads,
            "intermediate_size": 4 * cfg.text.width,
            "max_position_embeddings": cfg.text.context_length,
            "hidden_act": "quick_gelu", "attention_dropout": 0.0,
            "layer_norm_eps": 1e-5, "eos_token_id": V - 1,
        },
        vision_config={
            "image_size": cfg.vision.image_size, "patch_size": cfg.vision.patch_size,
            "hidden_size": cfg.vision.hidden_size,
            "num_hidden_layers": cfg.vision.num_layers,
            "num_attention_heads": cfg.vision.num_heads,
            "intermediate_size": cfg.vision.intermediate_size,
            "hidden_act": "quick_gelu", "attention_dropout": 0.0,
            "layer_norm_eps": 1e-5,
        },
        projection_dim=cfg.embed_dim,
    )
    torch.manual_seed(0)
    hf = CLIPModel(hf_cfg).eval()
    params = convert_clip_full({k: v.detach() for k, v in hf.state_dict().items()}, cfg)
    return hf, cfg, params


def _text_ids(rng, b, s):
    """ids whose argmax is the EOT (=V-1) position, as CLIP pooling expects."""
    ids = rng.integers(1, V - 1, (b, s))
    for i in range(b):
        ids[i, rng.integers(s // 2, s)] = V - 1
    return ids


def test_encode_image_matches_hf(clip_models):
    hf, cfg, params = clip_models
    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = hf.get_image_features(pixel_values=torch.tensor(px)).numpy()
    got = np.asarray(clip_mod.encode_image(params, cfg, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_encode_text_matches_hf(clip_models):
    hf, cfg, params = clip_models
    rng = np.random.default_rng(1)
    ids = _text_ids(rng, 3, 10)
    with torch.no_grad():
        want = hf.get_text_features(input_ids=torch.tensor(ids)).numpy()
    got = np.asarray(clip_mod.encode_text(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_contrastive_loss_and_logits(clip_models):
    hf, cfg, params = clip_models
    rng = np.random.default_rng(2)
    px = rng.normal(size=(4, 3, 32, 32)).astype(np.float32)
    ids = _text_ids(rng, 4, 10)
    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(px),
            return_loss=True,
        )
    got = clip_mod.contrastive_loss(params, cfg, jnp.asarray(px), jnp.asarray(ids))
    np.testing.assert_allclose(float(got["loss"]), float(out.loss), atol=2e-4, rtol=1e-3)


def test_zero_shot_classifier_and_predict(clip_models):
    _, cfg, params = clip_models
    rng = np.random.default_rng(3)

    def fake_tokenize(texts):
        out = np.zeros((len(texts), 10), np.int64)
        for i, t in enumerate(texts):
            h = abs(hash(t))
            out[i, :5] = [(h >> (4 * j)) % (V - 2) + 1 for j in range(5)]
            out[i, 5] = V - 1
        return out

    classnames = ["cat", "dog", "bird"]
    clf = clip_mod.zero_shot_classifier(
        params, cfg, classnames, clip_mod.DEFAULT_PROMPT_TEMPLATES, fake_tokenize
    )
    assert clf.shape == (cfg.embed_dim, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(clf), axis=0), 1.0, atol=1e-5)
    px = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    logits = clip_mod.zero_shot_predict(params, cfg, jnp.asarray(px), clf)
    assert logits.shape == (2, 3)
    sims, sims_t = clip_mod.compute_sim_matrix(
        params, cfg, jnp.asarray(px), jnp.asarray(_text_ids(rng, 3, 10))
    )
    assert sims.shape == (2, 3) and sims_t.shape == (3, 2)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_tokenizer():
    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda t: t  # identity — exact for ASCII inputs
    sys.modules.setdefault("ftfy", ftfy)
    spec = importlib.util.spec_from_file_location(
        "ref_clip_tokenizer",
        "/root/reference/experiments/lavis/models/clip_models/tokenizer.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_clip_tokenizer"] = mod
    spec.loader.exec_module(mod)
    return mod


SAMPLES = [
    "a photo of a cat.",
    "Hello, World!  Multiple   spaces",
    "it's a dog's life — isn't it?",
    "numbers 123 and 456,789 mixed with text",
    "A LOUD SENTENCE about nothing much at all, repeated words words words",
    "hyphenated-words and under_scores plus 50% off!",
]


def test_tokenizer_matches_reference_bpe(ref_tokenizer):
    tok = ClipTokenizer()
    for s in SAMPLES:
        want = ref_tokenizer._tokenizer.encode(s)
        got = tok.encode(s)
        assert got == want, s
        # round trip
        assert tok.decode(got) == ref_tokenizer._tokenizer.decode(want)


def test_tokenize_fixed_context_matches_reference(ref_tokenizer):
    tok = ClipTokenizer()
    want = ref_tokenizer.tokenize(SAMPLES, context_length=20).numpy()
    got = tok.tokenize(SAMPLES, context_length=20)
    np.testing.assert_array_equal(got, want)
    # long input exercises the no-EOT-restore truncation path
    long = " ".join(["extremely"] * 40)
    np.testing.assert_array_equal(
        tok.tokenize([long], context_length=12),
        ref_tokenizer.tokenize([long], context_length=12).numpy(),
    )


def test_zoo_registers_clip():
    import llava_align_tpu  # noqa: F401
    from llava_align_tpu.framework.registry import registry

    for arch in ("clip", "clip_feature_extractor"):
        assert registry.get_model_class(arch) is not None, arch
