"""ctypes binding for the native host-prep library (native/ffrnet_host.cpp).

Provides the C++ fast path for the reference's Python data transforms
(decode -> BGR -> bicubic resize -> flip -> [-1, 1] normalize,
data/dataset.py:126-161): `prep_batch` takes decoded uint8 RGB images,
`decode_prep_batch` takes raw JPEG bytes and does everything natively on a
thread pool. Builds the .so on demand with the system toolchain; callers
fall back to the PIL path when unavailable (`is_available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libffrnet_host.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # always invoke make (timestamp-based, cheap) so source edits to
        # ffrnet_host.cpp are never shadowed by a stale binary; an exclusive
        # flock serializes concurrent builders (multi-process startup would
        # otherwise dlopen a half-written .so)
        try:
            import fcntl

            with open(os.path.join(_NATIVE_DIR, ".build.lock"), "w") as lock:
                fcntl.flock(lock, fcntl.LOCK_EX)
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               capture_output=True, check=True, timeout=120)
        except Exception:
            if not os.path.exists(_SO_PATH):
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.ffrnet_prep_batch.restype = ctypes.c_int
        lib.ffrnet_prep_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p]
        lib.ffrnet_decode_prep_batch.restype = ctypes.c_int
        lib.ffrnet_decode_prep_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p]
        try:  # v2 uint8-output twins (normalize-on-device upload path)
            lib.ffrnet_prep_batch_u8.restype = ctypes.c_int
            lib.ffrnet_prep_batch_u8.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_char_p]
            lib.ffrnet_decode_prep_batch_u8.restype = ctypes.c_int
            lib.ffrnet_decode_prep_batch_u8.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_char_p]
        except AttributeError:  # stale v1 .so
            pass
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def has_u8() -> bool:
    """True when the loaded library exposes the v2 uint8-output entry
    points (normalize-on-device upload path)."""
    lib = _load()
    return lib is not None and hasattr(lib, "ffrnet_prep_batch_u8")


def prep_batch(images: Sequence[np.ndarray], out_hw=(112, 112), *,
               bgr: bool = True,
               flips: Optional[Sequence[bool]] = None,
               out_u8: bool = False) -> np.ndarray:
    """uint8 RGB HWC images (any sizes) -> NHWC batch: float32 in [-1, 1],
    or the quantized uint8 pixels with out_u8=True (normalize on device —
    same values after (x/255 - 0.5)/0.5)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    n = len(images)
    oh, ow = out_hw
    images = [np.ascontiguousarray(img, dtype=np.uint8) for img in images]
    for i, img in enumerate(images):
        # enforce the native contract host-side: prep_one reads h*w*3
        # bytes, so a grayscale/RGBA array would read past its allocation
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(
                f"images[{i}] must be HWC with 3 channels, got {img.shape}")
    ptrs = (ctypes.c_void_p * n)(
        *[img.ctypes.data_as(ctypes.c_void_p).value for img in images])
    hs = (ctypes.c_int * n)(*[img.shape[0] for img in images])
    ws = (ctypes.c_int * n)(*[img.shape[1] for img in images])
    flip_buf = bytes(bytearray(
        [1 if (flips is not None and flips[i]) else 0 for i in range(n)]))
    if out_u8:
        if not has_u8():
            raise RuntimeError("native library lacks the uint8 entry points")
        out = np.empty((n, oh, ow, 3), np.uint8)
        rc = lib.ffrnet_prep_batch_u8(
            ptrs, hs, ws, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            oh, ow, 1 if bgr else 0, flip_buf)
    else:
        out = np.empty((n, oh, ow, 3), np.float32)
        rc = lib.ffrnet_prep_batch(
            ptrs, hs, ws, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            oh, ow, 1 if bgr else 0, flip_buf)
    if rc != 0:
        raise RuntimeError(f"ffrnet_prep_batch failed: {rc}")
    return out


def decode_prep_batch(jpeg_buffers: Sequence[bytes], out_hw=(112, 112), *,
                      bgr: bool = True,
                      flips: Optional[Sequence[bool]] = None,
                      strict: bool = False,
                      out_u8: bool = False) -> np.ndarray:
    """Raw JPEG buffers -> NHWC batch: float32 in [-1, 1], or quantized
    uint8 pixels with out_u8=True (normalize on device). Failed decodes
    come back as zero images; strict=True raises on ANY failure (default
    raises only when every decode fails)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    n = len(jpeg_buffers)
    oh, ow = out_hw
    bufs = [np.frombuffer(b, dtype=np.uint8) for b in jpeg_buffers]
    ptrs = (ctypes.c_void_p * n)(
        *[b.ctypes.data_as(ctypes.c_void_p).value for b in bufs])
    lens = (ctypes.c_size_t * n)(*[len(b) for b in bufs])
    flip_buf = bytes(bytearray(
        [1 if (flips is not None and flips[i]) else 0 for i in range(n)]))
    if out_u8:
        if not has_u8():
            raise RuntimeError("native library lacks the uint8 entry points")
        out = np.empty((n, oh, ow, 3), np.uint8)
        failures = lib.ffrnet_decode_prep_batch_u8(
            ptrs, lens, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            oh, ow, 1 if bgr else 0, flip_buf)
    else:
        out = np.empty((n, oh, ow, 3), np.float32)
        failures = lib.ffrnet_decode_prep_batch(
            ptrs, lens, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            oh, ow, 1 if bgr else 0, flip_buf)
    if failures and (strict or failures == n) and n > 0:
        raise RuntimeError(f"{failures}/{n} JPEG decodes failed")
    return out
