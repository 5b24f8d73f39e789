"""ctypes bindings for the native C++ batch decoder (native/stacker_io.cpp).

Replaces the reference's OpenCV-imgcodecs + Rayon decode fan-out
(src/utils.rs:111-144) with a libjpeg/libpng thread pool writing into a
single batched staging buffer.  Falls back transparently to the PIL
path in utils.io when the shared library has not been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

from ..errors import NotEnoughFilesError, StackerIoError

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libstacker_io.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_failed = True
        return None
    lib.stacker_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.stacker_probe.restype = ctypes.c_int
    lib.stacker_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.stacker_decode_batch.restype = ctypes.c_int
    lib.stacker_rgb_to_gray.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.stacker_rgb_to_gray.restype = None
    if hasattr(lib, "stacker_decode_batch16"):  # absent in pre-r3 builds
        lib.stacker_decode_batch16.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.stacker_decode_batch16.restype = ctypes.c_int
    if hasattr(lib, "stacker_write_png16"):  # absent in pre-r3 builds
        lib.stacker_write_png16.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.stacker_write_png16.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _get_lib() is not None


def probe(path) -> Tuple[int, int]:
    """Return (height, width) of an image file without full decode."""
    lib = _get_lib()
    if lib is None:
        raise StackerIoError("native loader not built (make -C native)")
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    rc = lib.stacker_probe(str(path).encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise StackerIoError(f"probe failed for {path} (code {rc})")
    return int(h.value), int(w.value)


def load_frames_native(
    files: Sequence, num_threads: int = 0
) -> np.ndarray:
    """Decode files into one [N,H,W,3] uint8 RGB tensor with the native
    thread-pool decoder.  All frames must match frame 0's size."""
    files = [str(f) for f in files]
    if not files:
        raise NotEnoughFilesError()
    h, w = probe(files[0])
    n = len(files)
    out = np.empty((n, h, w, 3), dtype=np.uint8)
    statuses = (ctypes.c_int * n)()
    c_paths = (ctypes.c_char_p * n)(*[f.encode() for f in files])
    lib = _get_lib()
    failures = lib.stacker_decode_batch(
        c_paths,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        num_threads,
        statuses,
    )
    if failures:
        bad = [
            f"{files[i]} (code {statuses[i]})"
            for i in range(n)
            if statuses[i] != 0
        ]
        raise StackerIoError("decode failures: " + "; ".join(bad))
    return out


def available16() -> bool:
    lib = _get_lib()
    return lib is not None and hasattr(lib, "stacker_decode_batch16")


def load_frames_native16(
    files: Sequence, num_threads: int = 0
) -> np.ndarray:
    """Full-depth decode into one [N,H,W,3] uint16 RGB tensor: 16-bit
    PNG/TIFF at native depth, 8-bit sources expanded x257."""
    files = [str(f) for f in files]
    if not files:
        raise NotEnoughFilesError()
    if not available16():
        raise StackerIoError(
            "native 16-bit decoder not built (make -C native)"
        )
    h, w = probe(files[0])
    n = len(files)
    out = np.empty((n, h, w, 3), dtype=np.uint16)
    statuses = (ctypes.c_int * n)()
    c_paths = (ctypes.c_char_p * n)(*[f.encode() for f in files])
    lib = _get_lib()
    failures = lib.stacker_decode_batch16(
        c_paths,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        h,
        w,
        num_threads,
        statuses,
    )
    if failures:
        bad = [
            f"{files[i]} (code {statuses[i]})"
            for i in range(n)
            if statuses[i] != 0
        ]
        raise StackerIoError("decode failures: " + "; ".join(bad))
    return out


def write_png16_native(path, rgb16: np.ndarray) -> None:
    """Encode a [H,W,3] uint16 array as a 16-bit RGB PNG (libpng)."""
    lib = _get_lib()
    if lib is None or not hasattr(lib, "stacker_write_png16"):
        raise StackerIoError(
            "native writer not built (make -C native)"
        )
    rgb16 = np.ascontiguousarray(rgb16, dtype=np.uint16)
    if rgb16.ndim != 3 or rgb16.shape[2] != 3:
        raise StackerIoError(
            f"write_png16 needs [H,W,3] uint16, got {rgb16.shape}"
        )
    rc = lib.stacker_write_png16(
        str(path).encode(),
        rgb16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        rgb16.shape[0],
        rgb16.shape[1],
    )
    if rc != 0:
        raise StackerIoError(f"write failed for {path} (code {rc})")


def rgb_to_gray_native(rgb: np.ndarray, num_threads: int = 0) -> np.ndarray:
    """Fixed-point grayscale on host via the native library (bit-exact
    with ops.color.rgb_to_gray_u8)."""
    lib = _get_lib()
    if lib is None:
        raise StackerIoError("native loader not built (make -C native)")
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    out = np.empty(rgb.shape[:-1], dtype=np.uint8)
    lib.stacker_rgb_to_gray(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.size,
        num_threads,
    )
    return out
