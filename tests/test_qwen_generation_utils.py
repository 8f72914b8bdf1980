"""make_context parity vs the reference implementation (loaded read-only as
oracle) with a mock chatml tokenizer."""

import importlib.util
import sys

import pytest


class ChatmlMockTok:
    im_start_id = 1001
    im_end_id = 1002
    IMAGE_ST = ()

    def encode(self, text, allowed_special=None):
        return [ord(c) for c in text]

    def decode(self, ids, errors="replace"):
        out = []
        for t in ids:
            if t == self.im_start_id:
                out.append("<|im_start|>")
            elif t == self.im_end_id:
                out.append("<|im_end|>")
            else:
                out.append(chr(t))
        return "".join(out)


@pytest.fixture(scope="module")
def ref_mod():
    spec = importlib.util.spec_from_file_location(
        "ref_qwen_gen", "/root/reference/experiments/Qwen_VL/qwen_generation_utils.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_qwen_gen"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_make_context_matches_reference(ref_mod):
    from llava_align_tpu.models.qwen_generation_utils import make_context

    tok = ChatmlMockTok()
    cases = [
        dict(query="hello", history=[], system="You are helpful."),
        dict(query="q2", history=[("q1", "a1")], system="sys"),
        dict(query="q3", history=[("q1", "a1"), ("q2", "a2")], system=""),
    ]
    for kw in cases:
        ref_text, ref_tokens = ref_mod.make_context(tok, **kw, chat_format="chatml")
        our_text, our_tokens = make_context(tok, **kw, chat_format="chatml")
        assert our_text == ref_text, kw
        assert our_tokens == ref_tokens, kw


def test_decode_tokens_trims_eod():
    from llava_align_tpu.models.qwen_generation_utils import decode_tokens

    tok = ChatmlMockTok()
    ids = [ord(c) for c in "Yes."] + [tok.im_end_id] + [ord("x")]
    assert decode_tokens(ids, tok) == "Yes."


def test_pad_batch_left():
    from llava_align_tpu.models.qwen_generation_utils import pad_batch

    ids, mask = pad_batch([[1, 2, 3], [4]], pad_id=0, padding_side="left")
    assert ids == [[1, 2, 3], [0, 0, 4]]
    assert mask == [[1, 1, 1], [0, 0, 1]]


def test_stop_words_ids():
    from llava_align_tpu.models.qwen_generation_utils import stop_words_ids

    tok = ChatmlMockTok()
    assert stop_words_ids(tok) == [[1002], [1001]]
