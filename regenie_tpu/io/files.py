"""File primitives: gz-transparent IO and table helpers.

TPU-era equivalent of the reference's `src/Files.{hpp,cpp}` (Boost
iostreams gz streams + string_split/find_col helpers).
"""

from __future__ import annotations

import gzip
import io
import os
import re
from typing import IO, Iterator, List


def open_read(path: str) -> IO[str]:
    """Open a text file, transparently handling .gz (Files.hpp:36-100)."""
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="utf-8")
    return open(path, "r", encoding="utf-8")


def open_write(path: str, gz: bool = False, parallel_gz: bool = False) -> IO[str]:
    # multi-host: every host computes identical gathered results; only
    # the output host renders files (host-0 merge, parallel/dist.py)
    from ..parallel.dist import _NullSink, is_output_host

    if not is_output_host():
        return _NullSink()
    if gz or path.endswith(".gz"):
        if not path.endswith(".gz"):
            path += ".gz"
        if parallel_gz:
            w = ParallelGzipWriter.maybe(path)
            if w is not None:
                return w
        return io.TextIOWrapper(gzip.open(path, "wb", compresslevel=6), encoding="utf-8")
    return open(path, "w", encoding="utf-8")


class ParallelGzipWriter:
    """Text-mode .gz writer backed by the native multi-member deflate
    (gzip_compress_members, native/decoder.cpp): buffered text flushes
    as independently-deflated gzip members, OpenMP over ~1MB pieces.
    The output is a standard multi-member gzip stream (RFC 1952 §2.2)
    every reader concatenates; single-threaded zlib (~50MB/s, what the
    reference's Boost gzip pays too) comes off the hot sumstat path."""

    FLUSH_AT = 8 << 20

    def __init__(self, path: str, lib):
        self._fh = open(path, "wb")
        self._lib = lib
        self._buf = bytearray()

    @staticmethod
    def maybe(path: str) -> "ParallelGzipWriter | None":
        from .native import get_lib

        lib = get_lib()
        if lib is None or not hasattr(lib, "gzip_compress_members"):
            return None
        return ParallelGzipWriter(path, lib)

    def write(self, s: str) -> int:
        self._buf += s.encode("utf-8")
        if len(self._buf) >= self.FLUSH_AT:
            self._flush_members()
        return len(s)

    def _flush_members(self):
        import numpy as np

        if not self._buf:
            return
        data = np.frombuffer(bytes(self._buf), np.uint8)
        self._buf.clear()
        cap = len(data) + len(data) // 500 + 4096
        out = np.empty(cap, np.uint8)
        n = self._lib.gzip_compress_members(
            data.ctypes.data, len(data), 6, 1 << 20, out.ctypes.data, cap
        )
        if n < 0:  # native failure: fall back to a plain member
            self._fh.write(gzip.compress(bytes(data), compresslevel=6))
            return
        self._fh.write(out[:n].tobytes())

    def flush(self):
        self._flush_members()
        self._fh.flush()

    def close(self):
        self._flush_members()
        self._fh.close()

    @property
    def closed(self):
        return self._fh.closed

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


_SPLIT_RE = re.compile(r"[ \t]+")


def string_split(line: str) -> List[str]:
    """Split on spaces/tabs, like reference string_split(line, "\\t ")."""
    return [t for t in _SPLIT_RE.split(line.strip("\r\n")) if t]


def iter_lines(path: str) -> Iterator[List[str]]:
    with open_read(path) as fh:
        for line in fh:
            toks = string_split(line)
            if toks:
                yield toks


def file_exists(path: str) -> bool:
    return os.path.isfile(path)
