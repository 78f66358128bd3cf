"""Native (C++) ETL kernels, loaded via ctypes.

Builds ``libesrecsys_native.so`` from ``cooccur.cc`` on first import (g++,
cached next to the source). Every consumer has a pure-Python fallback, so a
missing toolchain degrades gracefully — import errors here must never break
the framework.

Exposes:
  * :class:`NativeCoocAccumulator` — hash-map co-occurrence accumulator
    (window + pair modes), the C++ replacement for the reference's PySpark
    executor loops (make_cooccurrence.py:33-55, make_dice.py:41-54).
  * :func:`decode_b64_lines` — batched base64 line decoding for the
    pb.b64.bz2 record codec.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Iterator, List, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cooccur.cc")
_SRC_TEXT = os.path.join(_DIR, "text.cc")
_LIB = os.path.join(_DIR, "libesrecsys_native.so")
_LOCK = threading.Lock()
_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC, _SRC_TEXT]
    log.info("building native library: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _LOCK:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < max(
                os.path.getmtime(_SRC), os.path.getmtime(_SRC_TEXT)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.cooc_new.restype = ctypes.c_void_p
        lib.cooc_free.argtypes = [ctypes.c_void_p]
        lib.cooc_add_window.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.cooc_add_pairs.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.cooc_num_entries.argtypes = [ctypes.c_void_p]
        lib.cooc_num_entries.restype = ctypes.c_int64
        lib.cooc_export.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.b64_decode_lines.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.b64_decode_lines.restype = ctypes.c_int64
        lib.wiki_tokenize.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.wiki_tokenize.restype = ctypes.c_int64
        _lib = lib
        return lib


class NativeCoocAccumulator:
    """C++ co-occurrence accumulator. Raises on construction if the native
    library can't be built/loaded — callers fall back to Python."""

    def __init__(self) -> None:
        self._lib = _load()
        self._handle = self._lib.cooc_new()

    def __del__(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.cooc_free(self._handle)
            self._handle = None

    def add_window(self, ids: Sequence[int], window: int) -> None:
        arr = np.ascontiguousarray(ids, np.int64)
        self._lib.cooc_add_window(self._handle, arr, len(arr), window)

    def add_pairs(self, ids: Sequence[int]) -> None:
        arr = np.ascontiguousarray(ids, np.int64)
        self._lib.cooc_add_pairs(self._handle, arr, len(arr))

    def export(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(rows, others, counts) sorted by (row, other)."""
        n = self._lib.cooc_num_entries(self._handle)
        rows = np.empty(n, np.int64)
        others = np.empty(n, np.int64)
        counts = np.empty(n, np.float64)
        if n:
            self._lib.cooc_export(self._handle, rows, others, counts)
        return rows, others, counts


def decode_b64_lines(data: bytes) -> Iterator[bytes]:
    """Decode newline-separated base64 lines in one native call."""
    lib = _load()
    max_lines = data.count(b"\n") + 1
    out = np.empty(max(1, len(data) * 3 // 4 + 4), np.uint8)
    offsets = np.empty(max(1, max_lines), np.int64)
    n = lib.b64_decode_lines(data, len(data), out, offsets, max_lines)
    if n < 0:
        raise ValueError(f"malformed base64 at line {-n - 1}")
    buf = out.tobytes()
    start = 0
    for i in range(n):
        end = int(offsets[i])
        yield buf[start:end]
        start = end


def tokenize(text: str) -> List[str]:
    """Native tokenizer — byte-for-byte the reference semantics
    ([t.lower() for t in re.split(separators, text) if t],
    token_dictionary.py:22,34-37), ~30x the pure-Python rate.

    ASCII is lowercased in C++; tokens containing non-ASCII bytes are
    flagged and lowercased by Python's str.lower() so Unicode case behavior
    matches exactly. Raises if the native library is unavailable — use
    :func:`esrecsys_tpu.data.vocab.simple_tokenize` as the fallback.
    """
    lib = _load()
    data = text.encode("utf-8")
    n = len(data)
    out = np.empty(max(1, n), np.uint8)
    flags = np.empty(max(1, n // 2 + 1), np.uint8)
    out_len = np.zeros(1, np.int64)
    ntok = lib.wiki_tokenize(data, n, out, out.shape[0], flags, flags.shape[0], out_len)
    if ntok < 0:  # cannot happen with the sizing above, but be safe
        raise ValueError("wiki_tokenize buffer overflow")
    if ntok == 0:
        return []
    # ONE decode + ONE split (both C-speed); only flagged (non-ASCII) tokens
    # take the per-token str.lower() path.
    toks = out[: int(out_len[0])].tobytes().decode("utf-8").split("\n")
    f = flags[:ntok]
    if f.any():
        for i in np.nonzero(f)[0]:
            toks[i] = toks[i].lower()
    return toks
