"""ctypes bindings for the native host runtime (native/libw2e_native.so).

Builds lazily with make on first use; every entry point has a pure-Python
fallback so the framework runs without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libw2e_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.w2e_kmeans_fit.restype = ctypes.c_int
    lib.w2e_kmeans_fit.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
    lib.w2e_kmeans_assign.restype = None
    lib.w2e_kmeans_assign.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    lib.w2e_bpe_new.restype = ctypes.c_void_p
    lib.w2e_bpe_new.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.w2e_bpe_free.argtypes = [ctypes.c_void_p]
    lib.w2e_bpe_sot.restype = ctypes.c_int32
    lib.w2e_bpe_sot.argtypes = [ctypes.c_void_p]
    lib.w2e_bpe_eot.restype = ctypes.c_int32
    lib.w2e_bpe_eot.argtypes = [ctypes.c_void_p]
    lib.w2e_bpe_encode.restype = ctypes.c_int32
    lib.w2e_bpe_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int32),
                                   ctypes.c_int32]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def kmeans_fit_native(data: np.ndarray, k: int, *, max_iters: int = 100,
                      seed: int = 42):
    """Multithreaded k-means. Returns (centers (k,d), n_iters) or None if
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.float32)
    n, d = data.shape
    centers = np.empty((k, d), np.float32)
    iters = lib.w2e_kmeans_fit(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d, k,
        max_iters, seed,
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), None)
    if iters < 0:
        return None
    return centers, iters


class NativeBPE:
    """C++ CLIP BPE tokenizer (id-compatible with SimpleTokenizer)."""

    def __init__(self, merges_text: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        data = merges_text.encode("utf-8")
        self._h = lib.w2e_bpe_new(data, len(data))
        self.sot = lib.w2e_bpe_sot(self._h)
        self.eot = lib.w2e_bpe_eot(self._h)

    def encode(self, text: str) -> list[int]:
        out = (ctypes.c_int32 * 512)()
        n = self._lib.w2e_bpe_encode(self._h, text.encode("utf-8"), out, 512)
        return list(out[:n])

    def __del__(self):
        try:
            self._lib.w2e_bpe_free(self._h)
        except Exception:
            pass


def kmeans_assign_native(data: np.ndarray, centers: np.ndarray):
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.float32)
    centers = np.ascontiguousarray(centers, dtype=np.float32)
    n, d = data.shape
    ids = np.empty((n,), np.int32)
    lib.w2e_kmeans_assign(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d,
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        centers.shape[0], ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return ids
