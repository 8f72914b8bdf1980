"""tokenizer_image_token parity (reference mm_utils.py:185-204)."""

import numpy as np

from llava_align_tpu.constants import IMAGE_TOKEN_INDEX
from llava_align_tpu.tokenization import (
    get_model_name_from_path,
    keyword_token_ids,
    tokenizer_image_token,
)


class MockTok:
    """LLaMA-style mock: BOS=1 prepended to every call, then one id per char."""

    bos_token_id = 1

    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = [self.bos_token_id] + [ord(c) for c in text]
        return r


class MockTokNoBos(MockTok):
    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = [ord(c) for c in text]
        return r


def _reference_impl(prompt, tokenizer, image_token_index=IMAGE_TOKEN_INDEX):
    """Direct transcription of the reference algorithm (mm_utils.py:185-204)
    used as the test oracle."""
    prompt_chunks = [tokenizer(chunk).input_ids for chunk in prompt.split("<image>")]

    def insert_separator(X, sep):
        return [ele for sublist in zip(X, [sep] * len(X)) for ele in sublist][:-1]

    input_ids = []
    offset = 0
    if (
        len(prompt_chunks) > 0
        and len(prompt_chunks[0]) > 0
        and prompt_chunks[0][0] == tokenizer.bos_token_id
    ):
        offset = 1
        input_ids.append(prompt_chunks[0][0])
    for x in insert_separator(prompt_chunks, [image_token_index] * (offset + 1)):
        input_ids.extend(x[offset:])
    return input_ids


def test_matches_reference_with_bos():
    tok = MockTok()
    for prompt in [
        "<image>\nIs there a dog?",
        "hello <image> world",
        "no image here",
        "<image>a<image>b",
        "<image>",
    ]:
        assert tokenizer_image_token(prompt, tok) == _reference_impl(prompt, tok), prompt


def test_matches_reference_without_bos():
    tok = MockTokNoBos()
    for prompt in ["<image>\nquestion", "a<image>b", "plain"]:
        assert tokenizer_image_token(prompt, tok) == _reference_impl(prompt, tok), prompt


def test_sentinel_position():
    tok = MockTok()
    ids = tokenizer_image_token("ab<image>cd", tok)
    assert ids == [1, ord("a"), ord("b"), IMAGE_TOKEN_INDEX, ord("c"), ord("d")]


def test_return_np():
    tok = MockTok()
    out = tokenizer_image_token("<image>x", tok, return_tensors="np")
    assert isinstance(out, np.ndarray) and out.dtype == np.int64


def test_model_name_from_path():
    assert get_model_name_from_path("/a/b/llava-v1.5-7b/") == "llava-v1.5-7b"
    assert get_model_name_from_path("/a/run1/checkpoint-500") == "run1_checkpoint-500"


def test_keyword_token_ids_strips_bos():
    tok = MockTok()
    ids = keyword_token_ids(["</s>"], tok)
    assert ids == [[ord(c) for c in "</s>"]]
