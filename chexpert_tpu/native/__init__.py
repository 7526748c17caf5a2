"""Native (C++/libjpeg) decode path with transparent build + PIL fallback.

decode_gray(path, min_edge_hint) -> np.uint8 (H, W), or None when the
native library is unavailable (missing toolchain / libjpeg) — callers fall
back to PIL. The library builds lazily on first use into
chexpert_tpu/native/_decode.so.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "_decode.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    src = os.path.join(_HERE, "decode.cc")
    for cc in ("g++", "cc", "gcc"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", _SO, src, "-ljpeg"],
                capture_output=True, timeout=120,
            )
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_SO) and not _build():
                _failed = True
                return None
            lib = ctypes.CDLL(_SO)
            lib.decode_jpeg_gray.restype = ctypes.c_int
            lib.decode_jpeg_gray.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            _failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def decode_gray(path: str, min_edge_hint: int = 0) -> Optional[np.ndarray]:
    """Decode a JPEG to uint8 (H, W) grayscale; None if native unavailable.

    min_edge_hint enables DCT-domain downscaling: the decoded min edge stays
    >= hint but may be 1/2, 1/4 or 1/8 of the source.
    """
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    # thread-local reusable output buffer, grown on demand
    tl = _tls
    out = getattr(tl, "buf", None)
    if out is None:
        out = tl.buf = np.empty((4 * 1024 * 1024,), np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    while True:
        rc = lib.decode_jpeg_gray(
            buf, len(buf),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
            ctypes.byref(w), ctypes.byref(h), int(min_edge_hint),
        )
        if rc == 2 and out.size < 256 * 1024 * 1024:  # buffer too small: grow
            out = tl.buf = np.empty((out.size * 4,), np.uint8)
            continue
        break
    if rc != 0:
        raise ValueError(f"native JPEG decode failed (rc={rc}) for {path}")
    return out[: w.value * h.value].reshape(h.value, w.value).copy()


_tls = threading.local()
