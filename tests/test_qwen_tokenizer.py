"""Native QwenTokenizer parity vs the real `tiktoken.Encoding` oracle.

The reference QWenTokenizer (Qwen_VL/tokenization_qwen.py) is a thin wrapper
over tiktoken plus image-span surgery. These tests build a tiktoken.Encoding
from the SAME rank table / pattern / special tokens and require our pure-
Python BPE to match token-for-token on a corpus (unicode, contractions,
numbers, whitespace runs, chatml), then check the <img> span expand/contract
layout and the make_context integration end-to-end offline.
"""

import os
import tempfile

import pytest

tiktoken = pytest.importorskip("tiktoken")

from llava_align_tpu.models.qwen_tokenizer import (
    IMG_TOKEN_SPAN,
    PAT_STR,
    QwenTokenizer,
    SPECIAL_TOKENS,
    bpe_encode,
)


def _make_ranks():
    """Deterministic toy rank table: all 256 bytes + stacked merges (each
    merge's two halves already exist, as in a real trained BPE)."""
    ranks = {bytes([i]): i for i in range(256)}
    merges = [
        b"th", b"he", b"in", b"er", b"an", b" t", b" a", b"re", b"on", b"es",
        b"the", b" th", b" the", b"ing", b"er ", b"and", b" and", b"ion",
        b"<|", b"|>", b"im", b"_s", b"art", b"nd", b"at", b"or", b"en",
        b"is", b"it", b"al", b"ou", b" is", b" of", b"of", b"to", b" to",
        b"  ", b"\n\n", b"st", b" st", b"ar", b"te", b"ed", b" ed",
        b"ans", b"wer", b"Answer", b"Ans", b"swer",
    ]
    r = 256
    for m in merges:
        if m not in ranks:
            ranks[m] = r
            r += 1
    return ranks


@pytest.fixture(scope="module")
def pair():
    ranks = _make_ranks()
    ours = QwenTokenizer(mergeable_ranks=ranks)
    oracle = tiktoken.Encoding(
        "test", pat_str=PAT_STR, mergeable_ranks=ranks,
        special_tokens=ours.special_tokens,
    )
    return ours, oracle


CORPUS = [
    "Is there a dog in the image? Answer:",
    "the theater is in there, and the thing",
    "  leading   spaces\n\nand newlines\n",
    "don't it's we're I'll they'd I'm you've",
    "numbers 123 456789 3.14",
    "punct!!! ... --- ??? (a) [b] {c}",
    "unicode: café naïve 你好世界 ☃",
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n",
    "<|endoftext|>",
    "mixed <|extra_0|> and <|extra_204|> extras",
    "",
    " ",
    "\n",
]


def test_encode_matches_tiktoken(pair):
    ours, oracle = pair
    for text in CORPUS:
        got = ours.encode(text)
        want = oracle.encode(text, allowed_special="all")
        assert got == want, (text, got, want)


def test_decode_roundtrip(pair):
    ours, oracle = pair
    for text in CORPUS:
        ids = ours.encode(text)
        assert ours.decode(ids) == oracle.decode(ids)
        assert ours.decode(ids) == text


def test_bpe_single_bytes(pair):
    ours, _ = pair
    for b in (b"\x00", b"z", b"\xff"):
        assert bpe_encode(ours.mergeable_ranks, b) == [ours.mergeable_ranks[b]]


def test_img_span_layout(pair):
    ours, _ = pair
    url = "coco/val2014/img_42.jpg"
    ids = ours.encode(f"Picture 1:<img>{url}</img>\nwhat is this?")
    s, e = ids.index(ours.img_start_id), ids.index(ours.img_end_id)
    span = ids[s + 1 : e]
    assert len(span) == IMG_TOKEN_SPAN  # fixed layout, tokenization_qwen.py:51
    url_bytes = url.encode("utf-8")
    # one id per path byte (id == byte value), then <imgpad> padding
    assert span[: len(url_bytes)] == list(url_bytes)
    assert all(t == ours.img_pad_id for t in span[len(url_bytes) :])


def test_img_span_decode_contracts(pair):
    ours, _ = pair
    text = "a photo <img>x/y.png</img> end"
    ids = ours.encode(text)
    assert ours.decode(ids) == text
    # skip_special_tokens drops the tags and the byte-id path survives as text
    assert "x/y.png" in ours.decode(ids, skip_special_tokens=True)


def test_img_span_too_long_raises(pair):
    ours, _ = pair
    with pytest.raises(ValueError):
        ours.encode("<img>" + "a" * (IMG_TOKEN_SPAN + 1) + "</img>")
    with pytest.raises(ValueError):
        ours.encode("<img>unclosed")


def test_special_ids_layout(pair):
    """Special ids start at len(ranks) in SPECIAL_TOKENS + IMAGE_ST order
    (tokenization_qwen.py:141-146)."""
    ours, _ = pair
    base = len(ours.mergeable_ranks)
    assert ours.eod_id == base
    assert ours.im_start_id == base + 1
    assert ours.im_end_id == base + 2
    assert len(SPECIAL_TOKENS) == 3 + 205
    assert ours.img_start_id == base + 208 + 6
    assert ours.img_pad_id == ours.img_end_id + 1


def test_vocab_file_roundtrip(pair, tmp_path):
    ours, _ = pair
    path = os.path.join(tmp_path, "qwen.tiktoken")
    ours.save_vocabulary(path)
    reloaded = QwenTokenizer(path)
    text = CORPUS[0]
    assert reloaded.encode(text) == ours.encode(text)


def test_make_context_offline(pair):
    """make_context runs on the native tokenizer with byte-real ids — the
    offline end-to-end the round-1 mock could not provide."""
    from llava_align_tpu.models.qwen_generation_utils import make_context

    ours, oracle = pair
    raw, ids = make_context(
        ours, "Is there a dog? Answer:", system="You are a helpful assistant."
    )
    im_start, im_end, nl = ours.im_start_id, ours.im_end_id, ours.encode("\n")
    assert ids[0] == im_start
    assert ids.count(im_start) == 3  # system, user, assistant
    # byte parity of the full rendered prompt vs the tiktoken oracle
    assert ids == oracle.encode(raw, allowed_special="all")
