"""Native (C) host-side runtime ops, loaded via ctypes.

The reference's only native code lives in vendored CUDA kernels (SURVEY.md
§2); this library covers the *host* hot paths of the video pipelines —
per-frame resize/preprocess and the similarity driver's distance matrix —
with a threaded C implementation.  Built on first use with the system cc
(``python -m maua_style_tpu.native.build`` to prebuild); every caller has a
numpy fallback, so the framework runs without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmaua_native.so")
_SRC = os.path.join(_DIR, "resize.c")

_lib = None
_tried = False


def build(verbose: bool = False) -> str | None:
    """Compile the native library; returns the .so path or None."""
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC, "-lpthread", "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
        return _SO
    except Exception as e:
        if verbose:
            print(f"native build failed: {e}", file=sys.stderr)
        return None


def get_lib():
    """The loaded native library, or None (numpy fallbacks take over)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if build() is None:
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.resize_bilinear_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ]
        lib.caffe_preprocess_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
        ]
        lib.caffe_deprocess_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)
        ]
        lib.chi2_distance_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double)
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _fptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def resize_bilinear_native(
    x: np.ndarray, oh: int, ow: int, scale_factor: float | None = None, n_threads: int | None = None
) -> np.ndarray | None:
    """(..., H, W, C) f32 -> (..., oh, ow, C), or None if the lib is absent."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    flat = x.reshape(-1, h, w, c)
    out = np.empty((flat.shape[0], oh, ow, c), np.float32)
    inv = (1.0 / scale_factor) if (scale_factor is not None and scale_factor > 0) else -1.0
    nt = n_threads or min(os.cpu_count() or 4, 16)
    for i in range(flat.shape[0]):
        lib.resize_bilinear_f32(
            _fptr(flat[i], ctypes.c_float), h, w, c,
            _fptr(out[i], ctypes.c_float), oh, ow, inv, inv, nt,
        )
    return out.reshape(*lead, oh, ow, c)


def caffe_preprocess_native(rgb_u8: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    out = np.empty(rgb_u8.shape, np.float32)
    lib.caffe_preprocess_u8(_fptr(rgb_u8, ctypes.c_uint8), rgb_u8.size // 3, _fptr(out, ctypes.c_float))
    return out


def chi2_matrix_native(hists: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    hists = np.ascontiguousarray(hists.reshape(len(hists), -1), np.float64)
    n, d = hists.shape
    out = np.empty((n, n), np.float64)
    lib.chi2_distance_matrix(_fptr(hists, ctypes.c_double), n, d, _fptr(out, ctypes.c_double))
    return out


__all__ = ["build", "get_lib", "resize_bilinear_native", "caffe_preprocess_native", "chi2_matrix_native"]
