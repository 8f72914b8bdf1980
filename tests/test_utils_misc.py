"""Utility coverage: logits comparison, phase timers, build_logger."""

import logging

import numpy as np

from llava_align_tpu.framework.logger import build_logger
from llava_align_tpu.utils.parity_check import compare_logits
from llava_align_tpu.utils.profiling import PhaseTimer, trace


def test_compare_logits_reports():
    a = np.array([1.0, 5.0, 2.0, 0.1])
    b = np.array([1.0, 5.0, 2.0, 0.1]) + 1e-6
    r = compare_logits(a, b, top_k=3)
    assert r["top1_match"] and r["top3_overlap"] == 3
    assert r["max_abs_diff"] < 1e-5

    c = np.array([5.0, 1.0, 2.0, 0.1])
    r2 = compare_logits(a, c, top_k=2)
    assert not r2["top1_match"]


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("prefill", sync=False):
        pass
    with t.phase("prefill", sync=False):
        pass
    with t.phase("decode", sync=False):
        pass
    rep = t.report()
    assert rep["prefill"]["count"] == 2
    assert rep["decode"]["count"] == 1
    assert rep["prefill"]["total_s"] >= 0


def test_trace_noop():
    with trace(None):
        x = 1
    assert x == 1


def test_build_logger(tmp_path):
    lg = build_logger("test_lg", "t.log", log_dir=str(tmp_path))
    lg.info("hello world")
    for h in lg.handlers:
        h.flush()
    files = list(tmp_path.iterdir())
    assert files and "hello world" in files[0].read_text()
