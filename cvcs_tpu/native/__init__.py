"""ctypes bindings for the native C++ scene decoder / prefetcher.

Builds lazily with the repo Makefile (g++ + libpng, both baked into the
image) the first time it is requested; all callers must tolerate
``load() is None`` and fall back to PIL — the native tier is a performance
feature (SURVEY §3.1 I/O hot spot), not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB = _DIR / "libtile_reader.so"
_handle = None
_build_failed = False


def build() -> bool:
    """Compile the shared library; returns success."""
    global _build_failed
    try:
        subprocess.run(["make", "-s", "-C", str(_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB.exists()
    except Exception:
        _build_failed = True
        return False


def load():
    """The loaded CDLL, building on first use; None if unavailable."""
    global _handle
    if _handle is not None:
        return _handle
    if _build_failed:
        return None
    if not _LIB.exists() and not build():
        return None
    lib = ctypes.CDLL(str(_LIB))
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.tr_png_info.argtypes = [ctypes.c_char_p, u32p, u32p, u32p]
    lib.tr_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, u32p, u32p, u32p]
    lib.tr_take.argtypes = lib.tr_decode_png.argtypes
    lib.tr_prefetch.argtypes = [ctypes.c_char_p]
    lib.tr_prefetch.restype = None
    lib.tr_cache_size.restype = ctypes.c_int64
    enc_args = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint32,
                ctypes.c_uint32, ctypes.c_uint32]
    lib.tr_encode_png.argtypes = enc_args
    lib.tr_write_async.argtypes = enc_args
    lib.tr_write_async.restype = None
    lib.tr_flush_writes.restype = ctypes.c_int64
    _handle = lib
    return _handle


def _fetch(fn, lib, path: str) -> np.ndarray | None:
    p = str(path).encode()
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    c = ctypes.c_uint32()
    if lib.tr_png_info(p, ctypes.byref(w), ctypes.byref(h),
                       ctypes.byref(c)) != 0:
        return None
    buf = np.empty((h.value, w.value, c.value), np.uint8)
    rc = fn(p, buf.ctypes.data_as(ctypes.c_void_p), buf.nbytes,
            ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
    if rc != 0:
        return None
    return buf[..., 0] if c.value == 1 else buf


def decode_png(path) -> np.ndarray | None:
    """Decode a PNG to (H, W, C) or (H, W) uint8; None on failure."""
    lib = load()
    if lib is None:
        return None
    return _fetch(lib.tr_decode_png, lib, path)


def prefetch(path) -> None:
    """Queue a background decode (no-op without the native lib)."""
    lib = load()
    if lib is not None:
        lib.tr_prefetch(str(path).encode())


def take(path) -> np.ndarray | None:
    """Blocking fetch of a (possibly prefetched) PNG; decodes inline on a
    cold miss."""
    lib = load()
    if lib is None:
        return None
    return _fetch(lib.tr_take, lib, path)


def _as_hwc(arr: np.ndarray) -> np.ndarray:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def write_png(path, arr: np.ndarray) -> bool:
    """Synchronous native PNG write of (H, W[, C]) uint8; False -> caller
    falls back to PIL."""
    lib = load()
    if lib is None:
        return False
    arr = _as_hwc(arr)
    h, w, c = arr.shape
    rc = lib.tr_encode_png(str(path).encode(),
                           arr.ctypes.data_as(ctypes.c_void_p), w, h, c)
    return rc == 0


def write_png_async(path, arr: np.ndarray) -> bool:
    """Queue a background PNG write (the C++ writer thread copies the
    buffer). Call :func:`flush_writes` before relying on the files."""
    lib = load()
    if lib is None:
        return False
    arr = _as_hwc(arr)
    h, w, c = arr.shape
    lib.tr_write_async(str(path).encode(),
                       arr.ctypes.data_as(ctypes.c_void_p), w, h, c)
    return True


def flush_writes() -> int:
    """Block until queued writes land; returns the number of failures."""
    lib = load()
    if lib is None:
        return 0
    return int(lib.tr_flush_writes())
