"""ctypes bindings for the native (C++) components.

The shared library is built on demand with the bundled Makefile; every
native entry point has a pure-Python fallback, so the package works without
a compiler — the native path is a performance/runtime-parity feature
(the reference's equivalent native pieces are tiktoken's Rust BPE and the
Triton/numba kernels).
"""

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libwhisper_at_bpe.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.bpe_create.restype = ctypes.c_void_p
            lib.bpe_create.argtypes = [ctypes.c_char_p]
            lib.bpe_destroy.argtypes = [ctypes.c_void_p]
            lib.bpe_num_ranks.restype = ctypes.c_int32
            lib.bpe_num_ranks.argtypes = [ctypes.c_void_p]
            lib.bpe_encode_piece.restype = ctypes.c_int32
            lib.bpe_encode_piece.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
            ]
            _lib = lib
        except OSError:
            _build_failed = True
        return _lib


class NativeBPE:
    """Native BPE merge engine over a tiktoken rank file, or None if the
    toolchain/library is unavailable (callers fall back to Python)."""

    def __init__(self, ranks_path: str):
        lib = _ensure_built()
        if lib is None:
            raise RuntimeError("native BPE library unavailable")
        self._lib = lib
        self._handle = lib.bpe_create(ranks_path.encode())
        if not self._handle:
            raise RuntimeError(f"failed to load ranks from {ranks_path}")
        self._out = (ctypes.c_int32 * 512)()

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.bpe_destroy(self._handle)
            self._handle = None

    @property
    def num_ranks(self) -> int:
        return int(self._lib.bpe_num_ranks(self._handle))

    def encode_piece(self, piece: bytes) -> Optional[List[int]]:
        buf = (ctypes.c_uint8 * len(piece)).from_buffer_copy(piece)
        n = self._lib.bpe_encode_piece(
            self._handle, buf, len(piece), self._out, len(self._out)
        )
        if n < 0:
            return None
        return list(self._out[:n])


def native_bpe(ranks_path: str) -> Optional[NativeBPE]:
    try:
        return NativeBPE(ranks_path)
    except (RuntimeError, OSError):
        return None
