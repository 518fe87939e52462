"""ctypes bindings for the native batch-assembly library (fastbatch.cpp).

Falls back to numpy transparently when the shared library isn't built; build
with ``python -m semireward_tpu.data._native.build``.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libfastbatch.so")


def _load():
    global _LIB
    if _LIB is None and os.path.exists(_SO):
        lib = ctypes.CDLL(_SO)
        lib.gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int]
        lib.crop_pad_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
        try:
            lib.has_jpeg.restype = ctypes.c_int
            lib.decode_jpeg_files.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
        except AttributeError:
            pass  # pre-round-5 .so without the decode entry points
        _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def gather_rows(src: np.ndarray, idx: np.ndarray,
                n_threads: int = 4) -> np.ndarray:
    """dst[i] = src[idx[i]] — threaded memcpy when the lib is built."""
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    if lib is None or not src.flags.c_contiguous:
        return src[idx]
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:]))
    dst = np.empty((len(idx),) + src.shape[1:], src.dtype)
    lib.gather_rows(src.ctypes.data, idx.ctypes.data, len(idx), row_bytes,
                    dst.ctypes.data, n_threads)
    return dst


def jpeg_available() -> bool:
    """True when the .so was built with libjpeg (decode_jpeg_files live)."""
    lib = _load()
    return bool(lib is not None and hasattr(lib, "has_jpeg")
                and lib.has_jpeg())


def decode_jpeg_files(paths, target: int,
                      n_threads: int = 4) -> "tuple[np.ndarray, np.ndarray]":
    """Batched JPEG read+decode+resize to (target, target, 3) u8 via
    libjpeg-turbo scale-on-decode (fastbatch.cpp). Returns (batch, status);
    status[i] != 0 marks a failed decode the caller must redo (PIL path).
    Raises RuntimeError when the library lacks JPEG support — gate on
    ``jpeg_available()``."""
    lib = _load()
    if lib is None or not jpeg_available():
        raise RuntimeError("libfastbatch.so built without libjpeg")
    n = len(paths)
    enc = [os.fspath(p).encode() for p in paths]
    ptrs = (ctypes.c_char_p * n)(*enc)
    dst = np.empty((n, target, target, 3), np.uint8)
    status = np.zeros(n, np.int32)
    lib.decode_jpeg_files(ptrs, n, target, dst.ctypes.data, n_threads,
                          status.ctypes.data)
    return dst, status


def crop_pad_f32(waves, starts, T: int, n_threads: int = 4) -> np.ndarray:
    """Batched crop/zero-pad of variable-length float32 waveforms."""
    lib = _load()
    n = len(waves)
    if lib is None:
        out = np.zeros((n, T), np.float32)
        for i, w in enumerate(waves):
            s = int(starts[i])
            seg = w[s:s + T]
            out[i, :len(seg)] = seg
        return out
    waves = [np.ascontiguousarray(w, np.float32) for w in waves]
    ptrs = (ctypes.c_void_p * n)(*[w.ctypes.data for w in waves])
    lens = np.asarray([len(w) for w in waves], np.int64)
    starts = np.ascontiguousarray(starts, np.int64)
    dst = np.empty((n, T), np.float32)
    lib.crop_pad_f32(ptrs, lens.ctypes.data, starts.ctypes.data, n, T,
                     dst.ctypes.data, n_threads)
    return dst
