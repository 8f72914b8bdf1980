"""ctypes bindings for the native IO runtime (native/jsonl_loader.cpp):
mmap jsonl line indexing + a threaded file prefetcher.

The .so builds on first use with g++ and is cached next to the source. All
consumers degrade gracefully to pure-python when the toolchain is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, List, Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "jsonl_loader.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libjsonl_loader.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True,
        )
        return _SO
    except (OSError, subprocess.CalledProcessError):
        return None


def load_library():
    """Returns the ctypes lib or None when unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        so = _build()
        if so is None:
            _lib = False
            return None
        lib = ctypes.CDLL(so)
        lib.jsonl_open.restype = ctypes.c_void_p
        lib.jsonl_open.argtypes = [ctypes.c_char_p]
        lib.jsonl_num_lines.restype = ctypes.c_int64
        lib.jsonl_num_lines.argtypes = [ctypes.c_void_p]
        lib.jsonl_get_line.restype = ctypes.c_int64
        lib.jsonl_get_line.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.jsonl_close.argtypes = [ctypes.c_void_p]
        lib.prefetcher_create.restype = ctypes.c_void_p
        lib.prefetcher_create.argtypes = [ctypes.c_int]
        lib.prefetcher_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p]
        lib.prefetcher_wait_size.restype = ctypes.c_int64
        lib.prefetcher_wait_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.prefetcher_take.restype = ctypes.c_int64
        lib.prefetcher_take.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class NativeJsonl:
    """Indexed jsonl reader: O(1) random line access over an mmap, no Python
    materialization of the file."""

    def __init__(self, path: str):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader unavailable (g++ missing?)")
        self._lib = lib
        self._h = lib.jsonl_open(os.path.expanduser(path).encode())
        if not self._h:
            raise FileNotFoundError(path)

    def __len__(self) -> int:
        return int(self._lib.jsonl_num_lines(self._h))

    def line(self, i: int) -> bytes:
        buf = ctypes.create_string_buffer(1 << 16)
        n = self._lib.jsonl_get_line(self._h, i, buf, len(buf))
        if n < -0:
            if n < 0:  # buffer too small; -n is the needed size
                buf = ctypes.create_string_buffer(-n)
                n = self._lib.jsonl_get_line(self._h, i, buf, len(buf))
        if n < 0:
            raise IndexError(i)
        return buf.raw[:n]

    def __getitem__(self, i: int):
        import json

        return json.loads(self.line(i))

    def __iter__(self) -> Iterator[dict]:
        for i in range(len(self)):
            yield self[i]

    def close(self):
        if self._h:
            self._lib.jsonl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativePrefetcher:
    """Background-thread file reader: submit paths, take bytes by ticket."""

    def __init__(self, num_threads: int = 4):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._h = lib.prefetcher_create(num_threads)
        self._next = 0

    def submit(self, path: str) -> int:
        t = self._next
        self._next += 1
        self._lib.prefetcher_submit(self._h, t, os.path.expanduser(path).encode())
        return t

    def take(self, ticket: int) -> bytes:
        size = self._lib.prefetcher_wait_size(self._h, ticket)
        buf = ctypes.create_string_buffer(max(int(size), 1))
        n = self._lib.prefetcher_take(self._h, ticket, buf, len(buf))
        if n < 0:
            raise KeyError(ticket)
        return buf.raw[:n]

    def close(self):
        if self._h:
            self._lib.prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
