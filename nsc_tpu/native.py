"""Loader for the native C runtime components (SURVEY.md §3 #8 native ruling).

Compiles native/bitpack.c with the system compiler on first use (pybind11 is
not available here; ctypes is the binding layer), caches the .so next to the
source, and exposes numpy-friendly wrappers. Every entry point has a pure
numpy fallback (nsc_tpu/bitstream.py) — `available()` reports which path is
active, and tests assert byte-identical output between the two.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRCS = [
    os.path.join(os.path.dirname(__file__), "..", "native", "bitpack.c"),
    os.path.join(os.path.dirname(__file__), "..", "native", "entropy.c"),
]
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native", "libnscbitpack.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    srcs = [os.path.abspath(p) for p in _SRCS]
    out = os.path.abspath(_LIB_PATH)
    if not all(os.path.exists(p) for p in srcs):
        return False
    if os.path.exists(out) and os.path.getmtime(out) >= max(
        os.path.getmtime(p) for p in srcs
    ):
        return True
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", out, *srcs],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _compile():
            return None
        try:
            lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
        except OSError:
            return None
        for name, restype, argtypes in [
            ("nsc_pack_frames", ctypes.c_long,
             [ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
              ctypes.c_void_p]),
            ("nsc_unpack_frames", ctypes.c_long,
             [ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
              ctypes.c_int, ctypes.c_void_p]),
            ("nsc_ac_encode_plane", ctypes.c_long,
             [ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_long,
              ctypes.c_long, ctypes.c_void_p, ctypes.c_long]),
            ("nsc_ac_decode_plane", ctypes.c_long,
             [ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
              ctypes.c_long, ctypes.c_long, ctypes.c_void_p]),
        ]:
            fn = getattr(lib, name)
            fn.restype = restype
            fn.argtypes = argtypes
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def pack_frames(indices: np.ndarray, bits: int) -> Optional[bytes]:
    """(frames, n_q) int32 -> book-major byte-aligned planes; None if the
    native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    idx = np.ascontiguousarray(indices, dtype=np.int32)
    frames, n_q = idx.shape
    per = (frames * bits + 7) // 8
    out = np.empty(n_q * per, np.uint8)
    n = lib.nsc_pack_frames(
        idx.ctypes.data, frames, n_q, bits, out.ctypes.data
    )
    if n < 0:
        return None
    return out.tobytes()


def unpack_frames(
    payload: bytes, num_frames: int, n_q: int, bits: int
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(payload, np.uint8)
    idx = np.empty((num_frames, n_q), np.int32)
    n = lib.nsc_unpack_frames(
        buf.ctypes.data, len(buf), num_frames, n_q, bits, idx.ctypes.data
    )
    if n < 0:
        return None
    return idx


def ac_encode_plane(
    symbols: np.ndarray, k: int, rebuild: int, rescale_at: int
) -> Optional[bytes]:
    """Adaptive arithmetic coding of one plane (byte-identical to
    nsc_tpu.entropy.encode_plane); None if the native library is missing."""
    lib = _load()
    if lib is None:
        return None
    syms = np.ascontiguousarray(symbols, dtype=np.int32)
    # worst case: coded size can exceed the fixed-width bound only by the
    # model-adaptation overhead; 4 bytes/symbol + slack is a generous cap
    out = np.empty(syms.size * 4 + 64, np.uint8)
    n = lib.nsc_ac_encode_plane(
        syms.ctypes.data, syms.size, k, rebuild, rescale_at,
        out.ctypes.data, out.size,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def ac_decode_plane(
    data: bytes, n: int, k: int, rebuild: int, rescale_at: int
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(n, np.int32)
    r = lib.nsc_ac_decode_plane(
        buf.ctypes.data, buf.size, n, k, rebuild, rescale_at,
        out.ctypes.data,
    )
    if r < 0:
        return None
    return out
