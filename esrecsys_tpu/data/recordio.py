"""Line-oriented record IO: one base64(payload) per line inside a compressed stream.

This is the reference's universal storage convention (``*.pb.b64.bz2`` files,
directories of ``part-NNNNN.bz2`` shards) — writer at
reference wikipedia/xml2proto.py:100-122 / token_dictionary.py:27-32, reader at
wikipedia/ioutil.py:45-62. We keep the format for artifact compatibility and add:

  * gzip (``.gz``) and uncompressed variants — libbz2 headers aren't available
    for the native path, and gzip decodes faster;
  * a proto-agnostic API (bytes in / bytes out, with proto helpers on top);
  * a sharded writer with deterministic part naming;
  * an optional C++ fast path for the base64+parse hot loop
    (:mod:`esrecsys_tpu.native`), falling back to pure Python.
"""

from __future__ import annotations

import base64
import bz2
import glob as glob_lib
import gzip
import os
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, TypeVar

import numpy as np

T = TypeVar("T")


def _open_read(path: str):
    if path.endswith(".bz2"):
        return bz2.open(path, "rb")
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def _open_write(path: str):
    if path.endswith(".bz2"):
        return bz2.open(path, "wb")
    if path.endswith(".gz"):
        return gzip.open(path, "wb", compresslevel=5)
    return open(path, "wb")


def write_records(path: str, payloads: Iterable[bytes]) -> int:
    """Write raw payloads as base64 lines. Returns the record count."""
    n = 0
    with _open_write(path) as f:
        for payload in payloads:
            f.write(base64.b64encode(payload))
            f.write(b"\n")
            n += 1
    return n


def read_records(path: str, native: bool = True) -> Iterator[bytes]:
    """Yield raw payloads from one file.

    With ``native=True`` the whole (decompressed) file is base64-decoded in
    one C++ call (:mod:`esrecsys_tpu.native`) instead of per-line in Python;
    falls back transparently when the native library is unavailable.
    """
    if native:
        try:
            from esrecsys_tpu.native import decode_b64_lines

            with _open_read(path) as f:
                data = f.read()
            # materialize before yielding so a malformed file can fall back
            # to the per-line decoder without duplicating records
            payloads = list(decode_b64_lines(data))
            yield from payloads
            return
        except ImportError:
            pass
        except ValueError:
            pass  # malformed base64 → re-read with the per-line decoder
    with _open_read(path) as f:
        for line in f:
            yield base64.b64decode(line[:-1])


def read_protos(pattern: str, proto_cls, skip_corrupt: bool = False) -> Iterator:
    """Parse every record matching a glob into ``proto_cls`` messages.

    ``skip_corrupt`` mirrors the reference's Spark DecodeError filtering
    (ioutil.py:27-38): corrupt records are dropped instead of raising.
    """
    from google.protobuf.message import DecodeError

    for path in sorted(glob_lib.glob(pattern)):
        for payload in read_records(path):
            msg = proto_cls()
            try:
                msg.ParseFromString(payload)
            except DecodeError:
                if skip_corrupt:
                    continue
                raise
            yield msg


def write_protos(path: str, messages: Iterable) -> int:
    return write_records(path, (m.SerializeToString() for m in messages))


class ShardedWriter:
    """Write records into ``part-NNNNN.<ext>`` shards of bounded size.

    Mirrors the reference's 1000-pages-per-shard convention
    (xml2proto.py:89-124) with a context-manager API.
    """

    def __init__(self, output_dir: str, records_per_shard: int = 1000, ext: str = "bz2"):
        self.output_dir = output_dir
        self.records_per_shard = records_per_shard
        self.ext = ext
        self._shard = -1
        self._in_shard = 0
        self._file = None
        self.total = 0
        os.makedirs(output_dir, exist_ok=True)

    def _roll(self) -> None:
        if self._file is not None:
            self._file.close()
        self._shard += 1
        self._in_shard = 0
        path = os.path.join(self.output_dir, f"part-{self._shard:05d}.{self.ext}")
        self._file = _open_write(path)

    def write(self, payload: bytes) -> None:
        if self._file is None or self._in_shard >= self.records_per_shard:
            self._roll()
        self._file.write(base64.b64encode(payload))
        self._file.write(b"\n")
        self._in_shard += 1
        self.total += 1

    def write_proto(self, msg) -> None:
        self.write(msg.SerializeToString())

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self) -> "ShardedWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def proto_stream(
    pattern: str,
    proto_cls,
    shuffle_files: bool = False,
    repeat: bool = False,
    seed: int = 0,
) -> Iterator:
    """Stream protos from a glob, optionally shuffling file order per epoch.

    Infinite-repeat + file shuffle reproduces the reference's
    ``proto_generator`` (ioutil.py:45-62) without global RNG mutation.
    """
    files = sorted(glob_lib.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no files match {pattern}")
    # multi-host: each process streams only its slice of the shards
    # (identity on a single process; lazy import keeps this module jax-free
    # for host-side tools)
    from esrecsys_tpu.core.mesh import process_local_files

    files = process_local_files(files)
    rng = np.random.default_rng(seed)
    while True:
        order = rng.permutation(len(files)) if shuffle_files else np.arange(len(files))
        for i in order:
            yield from read_protos(files[i], proto_cls)
        if not repeat:
            return


def shuffled(
    it: Iterator[T], buffer_size: int, seed: int = 0
) -> Iterator[T]:
    """Streaming buffer shuffle (reservoir-style, constant memory).

    Replaces the reference's fill-then-drain shuffle (ioutil.py:65-71,
    cooccurrence_matrix.py:80-87), which stalls the pipeline while refilling;
    this one swaps one item per yield.
    """
    rng = np.random.default_rng(seed)
    buf: List[T] = []
    for item in it:
        if len(buf) < buffer_size:
            buf.append(item)
            continue
        j = int(rng.integers(0, buffer_size))
        buf[j], item = item, buf[j]
        yield item
    for j in rng.permutation(len(buf)):
        yield buf[j]
