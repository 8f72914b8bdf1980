"""Native C++ IO runtime: jsonl mmap index + threaded prefetcher."""

import json

import pytest

from llava_align_tpu.framework.native import (
    NativeJsonl,
    NativePrefetcher,
    load_library,
)

pytestmark = pytest.mark.skipif(load_library() is None, reason="g++ unavailable")


def test_jsonl_index_random_access(tmp_path):
    p = tmp_path / "d.jsonl"
    with open(p, "w") as f:
        for i in range(100):
            f.write(json.dumps({"question_id": i, "text": "x" * (i % 7)}) + "\n")
        f.write("\n")  # trailing blank line ignored
    ds = NativeJsonl(str(p))
    assert len(ds) == 100
    assert ds[57]["question_id"] == 57
    assert ds[0]["question_id"] == 0
    assert ds[99]["question_id"] == 99
    rows = list(ds)
    assert [r["question_id"] for r in rows] == list(range(100))
    ds.close()


def test_jsonl_long_lines(tmp_path):
    p = tmp_path / "big.jsonl"
    big = {"question_id": 0, "payload": "y" * 200_000}
    with open(p, "w") as f:
        f.write(json.dumps(big) + "\n")
    ds = NativeJsonl(str(p))
    assert ds[0]["payload"] == big["payload"]


def test_prefetcher_roundtrip(tmp_path):
    files = []
    for i in range(8):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(bytes([i]) * (1000 + i))
        files.append(str(p))
    pf = NativePrefetcher(num_threads=3)
    tickets = [pf.submit(f) for f in files]
    for i, t in enumerate(tickets):
        data = pf.take(t)
        assert data == bytes([i]) * (1000 + i)
    pf.close()


def test_prefetcher_missing_file_empty(tmp_path):
    pf = NativePrefetcher(num_threads=1)
    t = pf.submit(str(tmp_path / "nope.bin"))
    assert pf.take(t) == b""
