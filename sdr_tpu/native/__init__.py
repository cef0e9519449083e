"""ctypes bindings for the native stream runtime (libsdr_stream.so).

Builds on demand with the bundled Makefile; degrades gracefully (pure-Python
fallback paths in sdr_tpu.io.stream / cli) when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsdr_stream.so")
_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(_SO)
    lib.sdr_reader_create.restype = ctypes.c_void_p
    lib.sdr_reader_create.argtypes = [ctypes.c_int, ctypes.c_uint64,
                                      ctypes.c_uint64]
    lib.sdr_reader_next.restype = ctypes.c_int
    lib.sdr_reader_next.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.sdr_reader_blocks_read.restype = ctypes.c_uint64
    lib.sdr_reader_blocks_read.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "sdr_reader_tail"):  # absent in pre-built old .so
        lib.sdr_reader_tail.restype = ctypes.c_uint64
        lib.sdr_reader_tail.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.sdr_reader_destroy.argtypes = [ctypes.c_void_p]
    lib.sdr_writer_create.restype = ctypes.c_void_p
    lib.sdr_writer_create.argtypes = [ctypes.c_int, ctypes.c_uint64]
    lib.sdr_writer_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_uint64]
    lib.sdr_writer_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class BlockReader:
    """Native threaded block reader with bounded-ring backpressure
    (reference rf_thread + queue, src/project.cpp:48-80)."""

    def __init__(self, fd: int, block_bytes: int, capacity: int = 3):
        lib = _load()
        if lib is None:
            raise RuntimeError("native stream runtime unavailable")
        self._lib = lib
        self._block_bytes = block_bytes
        self._h = lib.sdr_reader_create(fd, block_bytes, capacity)
        self._buf = ctypes.create_string_buffer(block_bytes)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        rc = self._lib.sdr_reader_next(self._h, self._buf)
        if rc != 0:
            raise StopIteration
        return np.frombuffer(self._buf.raw, dtype=np.uint8).copy()

    @property
    def blocks_read(self) -> int:
        return self._lib.sdr_reader_blocks_read(self._h)

    def tail(self) -> np.ndarray:
        """Partial final block left at EOF (empty if none / old .so)."""
        if not self._h or not hasattr(self._lib, "sdr_reader_tail"):
            return np.zeros(0, np.uint8)
        n = self._lib.sdr_reader_tail(self._h, self._buf)
        return np.frombuffer(self._buf.raw[:n], dtype=np.uint8).copy()

    def close(self):
        if self._h:
            self._lib.sdr_reader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class BlockWriter:
    """Native threaded byte writer: enqueue and return, drain off-thread."""

    def __init__(self, fd: int, capacity: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native stream runtime unavailable")
        self._lib = lib
        self._h = lib.sdr_writer_create(fd, capacity)

    def push(self, data: bytes | np.ndarray):
        if isinstance(data, np.ndarray):
            data = data.tobytes()
        self._lib.sdr_writer_push(self._h, data, len(data))

    write = push  # file-like sink interface (cli._audio_sink)

    def close(self):
        if self._h:
            self._lib.sdr_writer_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
