"""ctypes bindings to the native host-side kernels (native/uivr_native.cpp).

Auto-builds with g++ on first import if the shared library is missing; every
entry point has a pure-Python fallback, so the package works without a
toolchain.  Native wins: alias-table construction is O(N) C++ instead of a
Python loop (2M-texel HDR envmaps: seconds -> milliseconds); EXR ZIP
pre/post filters for large reference image sets.
"""
from __future__ import annotations

import ctypes
import subprocess
from os.path import dirname, isfile, join

import numpy as np

_LIB_PATH = join(dirname(__file__), "libuivr_native.so")
_SRC = join(dirname(dirname(dirname(__file__))), "native", "uivr_native.cpp")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not isfile(_LIB_PATH) and isfile(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", _LIB_PATH], check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not isfile(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.build_alias_table.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
        lib.exr_zip_predict.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.exr_zip_unpredict.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.hdr_decode_scanlines.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
        lib.hdr_decode_scanlines.restype = ctypes.c_int
        _lib = lib
        return lib
    except OSError:
        return None


def available() -> bool:
    return _load() is not None


def build_alias_table(pmf: np.ndarray):
    """(alias (N,) i32, prob (N,) f32) for a float64 pmf; None if native
    unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    pmf = np.ascontiguousarray(pmf, np.float64)
    n = pmf.size
    alias = np.empty(n, np.int32)
    prob = np.empty(n, np.float32)
    lib.build_alias_table(
        pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        alias.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return alias, prob


def exr_zip_predict(data: bytes):
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    dst = np.empty_like(src)
    lib.exr_zip_predict(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), src.size,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return dst.tobytes()


def exr_zip_unpredict(data: bytes):
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    dst = np.empty_like(src)
    lib.exr_zip_unpredict(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), src.size,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return dst.tobytes()


def hdr_decode_scanlines(payload: bytes, W: int, H: int):
    """Decode Radiance RGBE scanlines into an (H, W, 4) uint8 array;
    None if the native library is unavailable or the input is malformed
    (caller falls back to the Python reader)."""
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(payload, np.uint8)
    out = np.empty((H, W, 4), np.uint8)
    rc = lib.hdr_decode_scanlines(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), src.size,
        W, H, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None
