"""Dataset/prefetch loader, processors, dist helpers."""

import json

import numpy as np
from PIL import Image

from llava_align_tpu.framework.data import JsonlDataset, PrefetchLoader
from llava_align_tpu.framework.processors import (
    BlipCaptionProcessor,
    BlipImageEvalProcessor,
    BlipImageTrainProcessor,
)
from llava_align_tpu.framework.registry import registry
from llava_align_tpu.parallel.dist import (
    get_rank,
    get_world_size,
    is_main_process,
    main_process,
    shard_questions,
)


def test_jsonl_dataset(tmp_path):
    p = tmp_path / "d.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"i": i}) + "\n")
    ds = JsonlDataset(str(p), transform=lambda r: r["i"] * 2)
    assert len(ds) == 5 and ds[2] == 4


def test_json_list_dataset(tmp_path):
    p = tmp_path / "d.json"
    p.write_text(json.dumps([{"i": 1}, {"i": 2}]))
    ds = JsonlDataset(str(p))
    assert len(ds) == 2 and ds[1]["i"] == 2


def test_prefetch_loader_order_and_batching(tmp_path):
    p = tmp_path / "d.jsonl"
    with open(p, "w") as f:
        for i in range(23):
            f.write(json.dumps({"i": i}) + "\n")
    ds = JsonlDataset(str(p), transform=lambda r: r["i"])
    loader = PrefetchLoader(ds, batch_size=4, num_workers=3, prefetch=2)
    flat = [x for b in loader for x in b]
    assert flat == list(range(23))
    assert len(loader) == 6


def test_prefetch_loader_propagates_errors(tmp_path):
    p = tmp_path / "d.jsonl"
    with open(p, "w") as f:
        for i in range(4):
            f.write(json.dumps({"i": i}) + "\n")

    def boom(r):
        if r["i"] == 2:
            raise ValueError("bad sample")
        return r["i"]

    ds = JsonlDataset(str(p), transform=boom)
    loader = PrefetchLoader(ds, batch_size=1, num_workers=2)
    import pytest

    with pytest.raises(ValueError):
        list(loader)


def test_prefetch_loader_workers_exit_when_iterator_abandoned(tmp_path):
    """Runner.train_epoch islices the loader every inner epoch; abandoning
    the generator mid-iteration must release the worker threads (they used
    to spin in cond.wait forever once the prefetch window filled)."""
    import itertools
    import threading
    import time

    p = tmp_path / "d.jsonl"
    with open(p, "w") as f:
        for i in range(100):
            f.write(json.dumps({"i": i}) + "\n")
    ds = JsonlDataset(str(p), transform=lambda r: r["i"])
    before = threading.active_count()
    for _ in range(3):  # each abandoned iteration must not accumulate threads
        loader = PrefetchLoader(ds, batch_size=2, num_workers=2, prefetch=2)
        got = list(itertools.islice(iter(loader), 3))
        assert [x for b in got for x in b] == list(range(6))
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_caption_and_question_text_processors():
    """pre_caption/pre_question parity (reference blip_processors.py:49-102):
    lowercase; the punct class [.!"()*#:;~] goes to SPACE in captions but is
    DELETED in questions; whitespace collapse; max_words truncation."""
    from llava_align_tpu.framework.processors import BlipQuestionProcessor

    cap = BlipCaptionProcessor()
    assert cap("A Dog sitting.") == "a dog sitting"
    assert cap('Two cats: "asleep" (on a mat)!') == "two cats asleep on a mat"
    q = BlipQuestionProcessor()
    assert q('What is this: a "dog"?') == "what is this a dog?"
    assert q("Is it red?  ") == "is it red?"
    assert registry.get_processor_class("blip_question") is BlipQuestionProcessor


def test_processors_shapes_and_registry():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (100, 150, 3), dtype=np.uint8)
    )
    ev = BlipImageEvalProcessor(image_size=32)
    assert ev(img).shape == (3, 32, 32)
    tr = BlipImageTrainProcessor(image_size=32, seed=0)
    assert tr(img).shape == (3, 32, 32)
    cap = BlipCaptionProcessor(prompt="a photo of ", max_words=3)
    assert cap("one two three four five") == "a photo of one two three"
    assert registry.get_processor_class("blip_image_eval") is BlipImageEvalProcessor


def test_dist_helpers_single_process():
    assert get_world_size() == 1
    assert get_rank() == 0
    assert is_main_process()

    calls = []

    @main_process
    def record(x):
        calls.append(x)
        return x

    assert record(1) == 1 and calls == [1]
    qs = list(range(10))
    assert shard_questions(qs) == qs
    assert shard_questions(qs, 3, 1) == [4, 5, 6, 7]


def test_get_chunk_out_of_range_semantics():
    """User-typed out-of-range chunk indices raise (reference
    MME/run_llava.py:41 IndexError); rank-derived --dist auto indices get an
    empty shard so the merge barrier never hangs."""
    import pytest

    from llava_align_tpu.runners.common import get_chunk

    lst = list(range(6))
    assert get_chunk(lst, 4, 2) == [4, 5]  # 3 ceil-chunks of 2
    with pytest.raises(IndexError):
        get_chunk(lst, 4, 3)
    assert get_chunk(lst, 4, 3, allow_out_of_range=True) == []


def test_merge_chunk_files_raises_on_missing_part(tmp_path):
    """Every rank writes its part eagerly (AnswerFile opens before the
    loop), so a missing part means a failed rank — the merge must not
    silently produce a truncated answers file."""
    import pytest

    from llava_align_tpu.runners.common import merge_chunk_files

    target = tmp_path / "ans.jsonl"
    (tmp_path / "ans.rank0-of-2.jsonl").write_text('{"a": 1}\n')
    with pytest.raises(FileNotFoundError, match="rank1"):
        merge_chunk_files(str(target), 2)
    (tmp_path / "ans.rank1-of-2.jsonl").write_text("")  # empty shard is fine
    merge_chunk_files(str(target), 2)
    assert target.read_text() == '{"a": 1}\n'
