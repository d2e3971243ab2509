"""ctypes bindings for the native C++ scene decoder / prefetcher.

Builds lazily with the repo Makefile (g++ + libpng + libtiff, all baked
into the image) the first time it is requested; all callers must tolerate
``load() is None`` and fall back to PIL — the native tier is a performance
feature (SURVEY §3.1 I/O hot spot), not a correctness dependency.

Formats: PNG and TIFF (the reference's color masks are ``.tif``, reference
``dataset.py:217``, and real GID15 NirRGB scenes ship as TIFF). Dispatch is
by extension inside the C ABI (``tr_info`` / ``tr_decode`` / the
prefetcher); unsupported sub-formats are rejected up front and the caller
falls back to PIL.
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
    lib.tr_tiff_info.argtypes = lib.tr_png_info.argtypes
    lib.tr_info.argtypes = lib.tr_png_info.argtypes
    lib.tr_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, u32p, u32p, u32p]
    lib.tr_decode_tiff.argtypes = lib.tr_decode_png.argtypes
    lib.tr_decode.argtypes = lib.tr_decode_png.argtypes
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


def _fetch(fn, info_fn, path: str) -> np.ndarray | None:
    # the info probe rejects unsupported sub-formats (palette, 16-bit,
    # YCbCr/JPEG, ...) before any buffer allocation or prefetch decode
    p = str(path).encode()
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    c = ctypes.c_uint32()
    if info_fn(p, ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)) != 0:
        return None
    buf = np.empty((h.value, w.value, c.value), np.uint8)
    rc = fn(p, buf.ctypes.data_as(ctypes.c_void_p), buf.nbytes,
            ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
    if rc != 0:
        return None
    return buf[..., 0] if c.value == 1 else buf


def decode(path) -> np.ndarray | None:
    """Decode a PNG or TIFF (extension-dispatched) to (H, W, C) or (H, W)
    uint8; None on failure (caller falls back to PIL)."""
    lib = load()
    if lib is None:
        return None
    return _fetch(lib.tr_decode, lib.tr_info, path)


# Per-format entry points (same strict contracts, no extension dispatch).
def decode_png(path) -> np.ndarray | None:
    """Decode a PNG to (H, W, C) or (H, W) uint8; None on failure."""
    lib = load()
    if lib is None:
        return None
    return _fetch(lib.tr_decode_png, lib.tr_png_info, path)


def decode_tiff(path) -> np.ndarray | None:
    """Decode a TIFF to (H, W, C) or (H, W) uint8; None on failure."""
    lib = load()
    if lib is None:
        return None
    return _fetch(lib.tr_decode_tiff, lib.tr_tiff_info, path)


def prefetch(path) -> None:
    """Queue a background decode (no-op without the native lib)."""
    lib = load()
    if lib is not None:
        lib.tr_prefetch(str(path).encode())


def take(path) -> np.ndarray | None:
    """Blocking fetch of a (possibly prefetched) PNG/TIFF; decodes inline
    on a cold miss."""
    lib = load()
    if lib is None:
        return None
    return _fetch(lib.tr_take, lib.tr_info, path)


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
