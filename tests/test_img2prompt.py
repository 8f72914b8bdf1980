"""Img2Prompt-VQA: prompt-construction string parity vs the reference class
methods (loaded read-only with a spacy stub, methods invoked on a bare
instance) + pipeline smoke on tiny models.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch  # noqa: F401 — keeps transformers imports happy for the ref module

import jax
import jax.numpy as jnp

from llava_align_tpu.models import img2prompt
from llava_align_tpu.models.img2prompt import Img2PromptConfig

V = 64


from tests.stub_utils import stub_module as _stub  # noqa: E402


@pytest.fixture(scope="module")
def ref_mod():
    class _Registry:
        @staticmethod
        def register_model(name):
            return lambda cls: cls

    _stub("spacy", load=lambda *a, **k: None)
    for name in ("lavis", "lavis.common", "lavis.models", "lavis.models.blip_models"):
        if name not in sys.modules:
            _stub(name)
    _stub("lavis.common.dist_utils", download_cached_file=lambda *a, **k: None)
    _stub("lavis.common.registry", registry=_Registry)
    _stub("lavis.models.base_model", BaseModel=torch.nn.Module)
    _stub(
        "lavis.models.blip_models.blip_image_text_matching",
        compute_gradcam=lambda *a, **k: None,
    )
    spec = importlib.util.spec_from_file_location(
        "ref_img2prompt",
        "/root/reference/experiments/lavis/models/img2prompt_models/img2prompt_vqa.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_img2prompt"] = mod
    spec.loader.exec_module(mod)
    return mod


def _bare(ref_mod):
    return object.__new__(ref_mod.Img2PromptVQA)


CAPTIONS = [
    "a dog sitting on a red couch",
    "a small brown dog on furniture",
    "the couch holds a sleeping animal",
    "a living room with a dog",
]
ANSWERS = ["dog.", "couch.", "red.", "yes."]
ANS_TO_CAP = {"dog": [0, 1, 3], "couch": [0, 2], "red": [0], "yes": [0]}
QUESTIONS = ["what animal is this?", "where is the dog?", "is there a dog?"]


def test_context_prompt_matches_reference(ref_mod):
    m = _bare(ref_mod)
    samples = {
        "ans_to_cap_dict": dict(ANS_TO_CAP),
        "captions": [list(CAPTIONS)],
        "answers": list(ANSWERS),
    }
    want = ref_mod.Img2PromptVQA.create_context_prompt(m, samples, num_caps_per_img=3)
    got = img2prompt.create_context_prompt(
        CAPTIONS, ANSWERS, ANS_TO_CAP, num_caps_per_img=3
    )
    assert got == want


def test_task_prompt_matches_reference(ref_mod):
    m = _bare(ref_mod)
    samples = {"questions": list(QUESTIONS), "answers": list(ANSWERS)}
    want = ref_mod.Img2PromptVQA.create_task_prompt(
        m, samples, question_type="neural", num_question_per_img=5
    )
    got = img2prompt.create_task_prompt(
        QUESTIONS, ANSWERS, question_type="neural", num_question_per_img=5
    )
    assert got == want
    # zero questions → empty prompt, both sides
    assert img2prompt.create_task_prompt(QUESTIONS, ANSWERS, num_question_per_img=0) == \
        ref_mod.Img2PromptVQA.create_task_prompt(
            m, {"questions": QUESTIONS, "answers": ANSWERS}, num_question_per_img=0
        )


def test_full_prompt_matches_reference(ref_mod):
    m = _bare(ref_mod)
    samples = {
        "ans_to_cap_dict": dict(ANS_TO_CAP),
        "captions": [list(CAPTIONS)],
        "answers": list(ANSWERS),
        "questions": list(QUESTIONS),
        "text_input": ["what color is the couch?"],
    }
    want = ref_mod.Img2PromptVQA.prompts_construction(
        m, samples, question_type="neural", num_caps_per_img=3,
        num_question_per_img=4,
    )
    got = img2prompt.prompts_construction(
        "what color is the couch?", CAPTIONS, QUESTIONS, ANSWERS, ANS_TO_CAP,
        question_type="neural", num_caps_per_img=3, num_question_per_img=4,
    )
    assert got == want


def test_answer_extraction_shapes_and_contexts():
    contexts, answers, ans_to_cap = img2prompt.answer_extraction(
        CAPTIONS, num_question_generation=5
    )
    assert answers[-1] == "yes."
    assert contexts[-1].startswith("answer: yes.  context: ")
    assert len(contexts) == len(answers) <= 6
    # the most frequent token ('dog') ranks first
    assert answers[0] == "dog."
    assert set(ans_to_cap["dog"]) == {0, 1, 3}
    # every context embeds the concatenated captions
    joined = "".join(CAPTIONS)
    assert all(joined in c for c in contexts)


def test_pipeline_smoke_tiny():
    cfg = Img2PromptConfig.tiny(vocab_size=V)
    params = img2prompt.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b = 1
    pixels = rng.normal(size=(b, 3, 32, 32)).astype(np.float32)
    q_ids = rng.integers(1, V, (b, 5))
    q_mask = np.ones((b, 5), np.int64)

    gradcams = img2prompt.forward_itm(
        params, cfg, jnp.asarray(pixels), jnp.asarray(q_ids), jnp.asarray(q_mask)
    )
    assert gradcams.shape == (b, cfg.itm.vision.num_patches)

    caps = img2prompt.forward_cap(
        params, cfg, jnp.asarray(pixels), gradcams, [2, 5],
        jax.random.PRNGKey(1), num_captions=3, num_patches=2,
        cap_max_length=5, itm_threshold=0.0, max_rounds=3,
    )
    assert len(caps) == b and len(caps[0]) <= 3
    # threshold 1.1 rejects everything
    none = img2prompt.forward_cap(
        params, cfg, jnp.asarray(pixels), gradcams, [2, 5],
        jax.random.PRNGKey(1), num_captions=2, num_patches=2,
        cap_max_length=5, itm_threshold=1.1, max_rounds=2,
    )
    assert all(len(c) == 0 for c in none)

    cap_texts = [" ".join(str(t) for t in row) for row in caps[0]] or ["a dog"]
    contexts, answers, a2c = img2prompt.answer_extraction(cap_texts)
    ids = np.full((len(contexts), 8), 3, np.int64)
    mask = np.ones_like(ids)
    qs = img2prompt.forward_qa_generation(
        params["qg"], cfg.qg, jnp.asarray(ids), jnp.asarray(mask),
        max_length=4, batch=2,
    )
    assert len(qs) == len(contexts)
    q_texts = [" ".join(str(t) for t in row) for row in qs]
    prompt = img2prompt.prompts_construction(
        "what is this?", cap_texts, q_texts, answers, a2c,
        num_caps_per_img=2, num_question_per_img=2,
    )
    assert prompt.startswith("Please reason the answer")
    assert prompt.endswith("\nAnswer:")


def test_zoo_registers_composites():
    import llava_align_tpu  # noqa: F401
    from llava_align_tpu.framework.registry import registry

    for arch in ("pnp_vqa", "img2prompt_vqa"):
        assert registry.get_model_class(arch) is not None, arch
