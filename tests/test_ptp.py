"""Prompt-to-prompt controller oracle: models/ptp vs the reference
ptp_utils.py executed head-to-head (loaded read-only with additive stubs for
diffusers/IPython, which the reference imports but this math never touches).

Covers the mapper builders (word indices, replacement/refinement mappers,
equalizer, time-word alphas), the three edit controllers' attention math over
multi-step multi-layer schedules, AttentionStore averaging, and LocalBlend.
"""

import importlib.util
import sys

import numpy as np
import pytest
import torch

from stub_utils import load_by_path, stub_module

from llava_align_tpu.models import ptp

REF_PATH = "/root/reference/experiments/lavis/models/blip_diffusion_models/ptp_utils.py"


@pytest.fixture(scope="module")
def ref():
    class _CrossAttention:  # never instantiated by the controller math
        pass

    stub_module("diffusers")
    stub_module("diffusers.models")
    stub_module("diffusers.models.cross_attention", CrossAttention=_CrossAttention)
    stub_module("IPython")
    stub_module("IPython.display", display=lambda *a, **k: None)
    return load_by_path("ref_ptp_utils", REF_PATH)


class MockTokenizer:
    """HF-protocol mock: encode -> [bos, *pieces, eos]; decode single piece.
    Words > 4 chars split into two pieces, the continuation '#'-prefixed
    (exercises ptp_utils.py:472's strip('#'))."""

    def __init__(self):
        self.tok2id = {"<bos>": 0, "<eos>": 1}
        self.id2tok = {0: "<bos>", 1: "<eos>"}

    def _pieces(self, word):
        return [word[:3], "##" + word[3:]] if len(word) > 4 else [word]

    def _id(self, piece):
        if piece not in self.tok2id:
            i = len(self.tok2id)
            self.tok2id[piece] = i
            self.id2tok[i] = piece
        return self.tok2id[piece]

    def encode(self, text):
        ids = [0]
        for w in text.split(" "):
            ids.extend(self._id(p) for p in self._pieces(w))
        ids.append(1)
        return ids

    def decode(self, ids):
        return "".join(self.id2tok[int(i)] for i in ids)


PROMPTS_SWAP = ["a fluffy cat sitting", "a fluffy dog sitting"]
PROMPTS_REFINE = ["a cat sitting", "a very fluffy cat sitting quietly"]


@pytest.fixture(scope="module")
def tok():
    return MockTokenizer()


def test_get_word_inds_matches(ref, tok):
    for text in ["a fluffy cat sitting", "the elephant juggles watermelon"]:
        for wp in [0, 1, 2, "cat", "fluffy", "absent"]:
            ours = ptp.get_word_inds(text, wp, tok)
            theirs = ref.get_word_inds(text, wp, tok)
            np.testing.assert_array_equal(ours, np.asarray(theirs))


def test_replacement_mapper_matches(ref, tok):
    ours = ptp.get_replacement_mapper(PROMPTS_SWAP, tok)
    theirs = ref.get_replacement_mapper(PROMPTS_SWAP, tok).numpy()
    np.testing.assert_allclose(ours, theirs)
    with pytest.raises(ValueError):
        ptp.get_replacement_mapper_(PROMPTS_REFINE[0], PROMPTS_REFINE[1], tok)


def test_refinement_mapper_matches(ref, tok):
    m_ours, a_ours = ptp.get_refinement_mapper(PROMPTS_REFINE, tok)
    m_ref, a_ref = ref.get_refinement_mapper(PROMPTS_REFINE, tok)
    np.testing.assert_array_equal(m_ours, m_ref.numpy())
    np.testing.assert_array_equal(a_ours, a_ref.numpy())


def test_equalizer_and_time_alpha_match(ref, tok):
    e_ours = ptp.get_equalizer("a fluffy cat", "fluffy", (2.0,), tok)
    e_ref = ref.get_equalizer("a fluffy cat", "fluffy", (2.0,), tok).numpy()
    np.testing.assert_allclose(e_ours, e_ref)
    # subject-token insertion path
    e_ours2 = ptp.get_equalizer("a cat", "cat", (0.5,), tok, num_subject_token=3)
    e_ref2 = ref.get_equalizer("a cat", "cat", (0.5,), tok, num_subject_token=3).numpy()
    np.testing.assert_allclose(e_ours2, e_ref2)

    for steps in (0.4, (0.2, 0.8), {"default_": 0.8, "fluffy": (0.0, 0.4)}):
        a_ours = ptp.get_time_words_attention_alpha(PROMPTS_SWAP, 10, steps, tok)
        a_ref = ref.get_time_words_attention_alpha(
            PROMPTS_SWAP, 10, steps, tok, # noqa
        ).numpy()
        np.testing.assert_allclose(a_ours, a_ref)


def _torch_controller(ref, kind, prompts, tok, **kw):
    cls = {"replace": ref.AttentionReplace, "refine": ref.AttentionRefine,
           "reweight": ref.AttentionReweight}[kind]
    return cls(prompts, 4, 0.8, 0.6, tokenizer=tok, device="cpu", **kw)


def _our_controller(kind, prompts, tok, **kw):
    cls = {"replace": ptp.AttentionReplace, "refine": ptp.AttentionRefine,
           "reweight": ptp.AttentionReweight}[kind]
    return cls(prompts, 4, 0.8, 0.6, tokenizer=tok, **kw)


@pytest.mark.parametrize("kind", ["replace", "reweight"])
def test_edit_controllers_match_over_schedule(ref, tok, kind):
    """Drive both controllers through 4 steps x 3 layers of mixed cross/self
    attention at two resolutions; every returned map must match, as must the
    averaged stores."""
    prompts = PROMPTS_SWAP
    kw_ref, kw_ours = {}, {}
    if kind == "reweight":
        eq = ptp.get_equalizer(prompts[1], "dog", (2.0,), tok)
        kw_ref = {"equalizer": torch.from_numpy(eq)}
        kw_ours = {"equalizer": eq}
    ctrl_ref = _torch_controller(ref, kind, prompts, tok, **kw_ref)
    ctrl_ours = _our_controller(kind, prompts, tok, **kw_ours)
    ctrl_ref.num_att_layers = 3
    ptp.register_attention_control(ctrl_ours, 3)

    rng = np.random.default_rng(0)
    B, heads = len(prompts), 2
    layers = [  # (is_cross, positions, tokens)
        (True, 16 * 16, 77),
        (False, 16 * 16, 16 * 16),
        (False, 33 * 33, 33 * 33),  # > 16^2: passthrough; > 32^2: not stored
    ]
    for _step in range(4):
        for is_cross, p, t in layers:
            attn = rng.random((2 * B * heads, p, t)).astype(np.float32)
            out_ours = ctrl_ours(attn.copy(), is_cross, "up")
            out_ref = ctrl_ref(torch.from_numpy(attn.copy()), is_cross, "up").numpy()
            np.testing.assert_allclose(out_ours, out_ref, rtol=1e-5, atol=1e-6)
    assert ctrl_ours.cur_step == ctrl_ref.cur_step == 4
    avg_ours = ctrl_ours.get_average_attention()
    avg_ref = ctrl_ref.get_average_attention()
    for key in avg_ours:
        assert len(avg_ours[key]) == len(avg_ref[key])
        for a, b in zip(avg_ours[key], avg_ref[key]):
            np.testing.assert_allclose(a, b.numpy(), rtol=1e-5, atol=1e-6)


def test_refine_controller_matches(ref, tok):
    prompts = PROMPTS_REFINE
    ctrl_ref = _torch_controller(ref, "refine", prompts, tok)
    ctrl_ours = _our_controller("refine", prompts, tok)
    ctrl_ref.num_att_layers = 1
    ptp.register_attention_control(ctrl_ours, 1)
    rng = np.random.default_rng(1)
    attn = rng.random((2 * 2 * 2, 64, 77)).astype(np.float32)
    out_ours = ctrl_ours(attn.copy(), True, "down")
    out_ref = ctrl_ref(torch.from_numpy(attn.copy()), True, "down").numpy()
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-5, atol=1e-6)


def test_attention_store_matches(ref):
    st_ours, st_ref = ptp.AttentionStore(), ref.AttentionStore()
    st_ours.num_att_layers = st_ref.num_att_layers = 2
    rng = np.random.default_rng(2)
    for _ in range(3):
        for is_cross, p in ((True, 256), (False, 1089)):
            attn = rng.random((4, p, 77)).astype(np.float32)
            np.testing.assert_allclose(
                st_ours(attn.copy(), is_cross, "mid"),
                st_ref(torch.from_numpy(attn.copy()), is_cross, "mid").numpy(),
            )
    a, b = st_ours.get_average_attention(), st_ref.get_average_attention()
    for key in a:
        for x, y in zip(a[key], b[key]):
            np.testing.assert_allclose(x, y.numpy(), rtol=1e-6)
    # >32^2 maps are skipped by both
    assert len(a["mid_self"]) == len(b["mid_self"]) == 0


def test_local_blend_matches(ref, tok):
    prompts = PROMPTS_SWAP
    lb_ours = ptp.LocalBlend(prompts, ["cat", "dog"], tok)
    lb_ref = ref.LocalBlend(prompts, ["cat", "dog"], tok, device="cpu")
    rng = np.random.default_rng(3)
    heads = 2
    store = {
        "down_cross": [rng.random((len(prompts) * heads, 256, 77)).astype(np.float32)
                       for _ in range(4)],
        "up_cross": [rng.random((len(prompts) * heads, 256, 77)).astype(np.float32)
                     for _ in range(3)],
    }
    store_t = {k: [torch.from_numpy(m) for m in v] for k, v in store.items()}
    x_t = rng.random((2, 4, 32, 32)).astype(np.float32)
    out_ours = lb_ours(x_t.copy(), store)
    out_ref = lb_ref(torch.from_numpy(x_t.copy()), store_t).numpy()
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-5, atol=1e-6)


def test_attention_with_hook_applies_controller(tok):
    """The processor seam: hooked attention == plain softmax attention with
    the controller's edit applied to the probs (reference
    P2PCrossAttnProcessor's one-line change, :554-556)."""
    prompts = PROMPTS_SWAP
    ctrl = _our_controller("replace", prompts, tok)
    ptp.register_attention_control(ctrl, 1)
    rng = np.random.default_rng(4)
    Bh = 2 * 2 * 2
    q = rng.random((Bh, 16, 8)).astype(np.float32)
    k = rng.random((Bh, 77, 8)).astype(np.float32)
    v = rng.random((Bh, 77, 8)).astype(np.float32)
    hook = ptp.make_attn_hook(ctrl, "mid")
    out = ptp.attention_with_hook(q, k, v, hook, is_cross=True)
    # manual: probs -> controller -> @v
    ctrl2 = _our_controller("replace", prompts, tok)
    ptp.register_attention_control(ctrl2, 1)
    scale = 1.0 / np.sqrt(8)
    s = np.einsum("bsd,btd->bst", q, k) * scale
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    p = ctrl2(p, True, "mid")
    np.testing.assert_allclose(out, np.einsum("bst,btd->bsd", p, v), rtol=1e-6)
    # None controller = passthrough
    out2 = ptp.attention_with_hook(q, k, v, ptp.make_attn_hook(None, "mid"), True)
    assert out2.shape == out.shape
