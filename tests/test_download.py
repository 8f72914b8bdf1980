"""Offline-safe dataset download layer (framework/download.py).

Parity target: the reference's lavis/datasets/download_scripts/* (manifest
URLs/md5s are copied verbatim — they are the spec). All tests run fully
offline via an injected opener; network failure paths are exercised with a
raising opener.
"""

import hashlib
import io
import json
import os
import zipfile

import pytest

from llava_align_tpu.framework import download as dl


class FakeResponse(io.BytesIO):
    def __init__(self, data, status=200):
        super().__init__(data)
        self.status = status

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def make_opener(data: bytes, log=None):
    def opener(req, timeout=None):
        if log is not None:
            log.append(req)
        rng = req.headers.get("Range")
        if rng:
            start = int(rng.split("=")[1].rstrip("-"))
            return FakeResponse(data[start:], status=206)
        return FakeResponse(data)

    return opener


def test_manifest_covers_all_reference_scripts():
    """Every reference download script's dataset has manifest entries."""
    ref_dir = "/root/reference/experiments/lavis/datasets/download_scripts"
    names = {f[len("download_"):-3] for f in os.listdir(ref_dir)
             if f.startswith("download_") and f.endswith(".py")}
    have = set(dl.datasets())
    mapping = {"coco": "coco", "gqa": "gqa", "vg": "vg", "msvd": "msvd",
               "didemo": "didemo", "nocaps": "nocaps", "sbu": "sbu",
               "flickr": "flickr30k", "msrvtt": "msrvtt"}
    for script, ds in mapping.items():
        assert script in names  # the reference really ships it
        assert ds in have, ds
    assert "conceptual_captions" in have  # DownloadConceptualCaptions/


def test_fetch_file_and_resume(tmp_path):
    data = bytes(range(256)) * 100
    log = []
    dest = str(tmp_path / "a" / "file.bin")
    out = dl.fetch_file("http://x/file.bin", dest, _opener=make_opener(data, log))
    assert out == dest and open(dest, "rb").read() == data
    # existing file: no network call
    n = len(log)
    dl.fetch_file("http://x/file.bin", dest, _opener=make_opener(data, log))
    assert len(log) == n

    # partial file resumes with a Range request
    dest2 = str(tmp_path / "b.bin")
    with open(dest2 + ".part", "wb") as f:
        f.write(data[:1000])
    log2 = []
    dl.fetch_file("http://x/b.bin", dest2, _opener=make_opener(data, log2))
    assert log2[0].headers.get("Range") == "bytes=1000-"
    assert open(dest2, "rb").read() == data


def test_fetch_offline_raises_and_keeps_partial(tmp_path):
    def dead(req, timeout=None):
        raise OSError("no route to host")

    dest = str(tmp_path / "c.bin")
    with pytest.raises(dl.DownloadUnavailable, match="no route"):
        dl.fetch_file("http://x/c.bin", dest, _opener=dead)
    assert not os.path.exists(dest)


def _zip_bytes(names):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for n in names:
            z.writestr(n, f"content of {n}")
    return buf.getvalue()


def test_download_entry_archive_md5_and_extract(tmp_path):
    data = _zip_bytes(["val2014/img1.jpg", "val2014/img2.jpg"])
    entry = dl.DownloadEntry(
        "cocotest", "val", "http://x/val.zip", md5=hashlib.md5(data).hexdigest(),
        storage="images",
    )
    out = dl.download_entry(entry, str(tmp_path), _opener=make_opener(data))
    assert out == str(tmp_path / "cocotest" / "images")
    assert os.path.exists(tmp_path / "cocotest" / "images" / "val2014" / "img1.jpg")
    # archive removed after extraction (reference cleanup_dir behavior)
    assert not os.path.exists(tmp_path / "cocotest" / "download" / "val.zip")


def test_download_entry_md5_mismatch(tmp_path):
    data = _zip_bytes(["a.txt"])
    entry = dl.DownloadEntry("d", "x", "http://x/a.zip", md5="0" * 32)
    with pytest.raises(dl.DownloadUnavailable, match="md5 mismatch"):
        dl.download_entry(entry, str(tmp_path), _opener=make_opener(data))
    # corrupt file removed so a retry refetches
    assert not os.path.exists(tmp_path / "d" / "download" / "a.zip")


def test_manual_entries_raise_with_instructions(tmp_path):
    (flickr,) = dl.entries_for("flickr30k")
    with pytest.raises(dl.ManualDownloadRequired, match="Kaggle"):
        dl.download_entry(flickr, str(tmp_path))
    # url_override bypasses the manual flow
    data = _zip_bytes(["flickr30k_images/1.jpg"])
    out = dl.download_entry(
        flickr, str(tmp_path), url_override="http://mirror/flickr.zip",
        _opener=make_opener(data),
    )
    assert out is None or isinstance(out, str)


def test_download_dataset_skips_manual_and_dry_run(tmp_path):
    res = dl.download_dataset("msrvtt", str(tmp_path))
    assert all(str(v).startswith("MANUAL:") for v in res.values())
    # dry run touches nothing
    res2 = dl.download_dataset("coco", str(tmp_path), dry_run=True)
    assert set(res2) == {"train2014", "val2014", "test2014", "test2015"}
    assert all(v is None for v in res2.values())
    assert not os.path.exists(tmp_path / "coco")
    with pytest.raises(KeyError):
        dl.download_dataset("nope", str(tmp_path))


def test_per_image_json_fetches_images(tmp_path):
    """per_image_json entries fetch the source list AND loop the per-image
    downloads (the reference nocaps/sbu loops + the CC TSV streamer) —
    dead links tolerated, existing files skipped."""
    ann = json.dumps({"images": [
        {"coco_url": "http://img/a.jpg", "file_name": "a.jpg"},
        {"coco_url": "http://img/b.jpg", "file_name": "b.jpg"},
        {"coco_url": "http://dead/c.jpg", "file_name": "c.jpg"},
    ]}).encode()
    payload = b"IMAGEBYTES"

    def opener(req, timeout=None):
        url = req.full_url
        if url.endswith("nocaps_val_image_info.json"):
            return FakeResponse(ann)
        if "dead" in url:
            raise OSError("404")
        return FakeResponse(payload)

    (entry,) = [e for e in dl.entries_for("nocaps") if e.name == "val_ann"]
    out = dl.download_entry(entry, str(tmp_path), _opener=opener)
    assert out == str(tmp_path / "nocaps" / "val")
    assert (tmp_path / "nocaps" / "val" / "a.jpg").read_bytes() == payload
    assert (tmp_path / "nocaps" / "val" / "b.jpg").exists()
    assert not (tmp_path / "nocaps" / "val" / "c.jpg").exists()  # dead link
    # resume: second call skips existing images
    stats = dl.fetch_image_list(
        str(tmp_path / "nocaps" / "download" / "nocaps_val_image_info.json"),
        str(tmp_path / "nocaps" / "val"), _opener=opener,
    )
    assert stats == {"fetched": 0, "skipped": 2, "failed": 1}


def test_iter_image_list_tsv_and_sbu(tmp_path):
    tsv = tmp_path / "cc.tsv"
    tsv.write_text("a caption\thttp://x/1.jpg\nanother\thttp://x/2.jpg\n")
    rows = list(dl.iter_image_list(str(tsv)))
    assert rows == [("http://x/1.jpg", "00000000.jpg"),
                    ("http://x/2.jpg", "00000001.jpg")]
    sbu = tmp_path / "sbu.json"
    sbu.write_text(json.dumps([
        {"url": "http://s/aa.jpg", "image": "sub/aa.jpg"},
        {"caption": "no url"},
    ]))
    rows = list(dl.iter_image_list(str(sbu)))
    assert rows == [("http://s/aa.jpg", "aa.jpg")]


def test_builder_cites_download_entries(tmp_path):
    """VERDICT r2 #7 'done' condition: builders cite a download entry per
    dataset."""
    from llava_align_tpu.framework.datasets import CaptionBuilder

    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(
        [{"image": "i.jpg", "caption": "a cat", "image_id": 0}]
    ))
    b = CaptionBuilder(
        {"train": {"ann_paths": [str(ann)], "vis_root": str(tmp_path)}},
        dataset="coco",
    )
    entries = b.download_entries()
    assert len(entries) == 4
    assert all(e.dataset == "coco" for e in entries)
    assert b.download(str(tmp_path), dry_run=True)
    # no dataset key -> download refuses, entries empty
    b2 = CaptionBuilder({"train": {"ann_paths": [str(ann)]}})
    assert b2.download_entries() == []
    with pytest.raises(ValueError):
        b2.download(str(tmp_path))
