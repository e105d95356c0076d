"""ctypes bindings for the native C++ bag loader (native/dmlt_io.cpp).

Compiled on demand with g++ into a cached shared object; every entry point
has a numpy fallback with identical semantics, so the framework runs without
a toolchain (``DMLT_NO_NATIVE=1`` forces the fallback)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_lib_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "dmlt_io.cpp")


def _build_dir() -> str:
    d = os.environ.get("DMLT_NATIVE_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache", "dmlt"))
    os.makedirs(d, exist_ok=True)
    return d


def _load_library():
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        if os.environ.get("DMLT_NO_NATIVE") or not os.path.exists(_SRC):
            return None
        try:
            with open(_SRC, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()[:16]
            so_path = os.path.join(_build_dir(), f"dmlt_io_{digest}.so")
            if not os.path.exists(so_path):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", so_path, _SRC, "-lpthread"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so_path)
            lib.dmlt_load_bag.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64]
            lib.dmlt_load_bag.restype = ctypes.c_int
            lib.dmlt_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int]
            lib.dmlt_load_batch.restype = ctypes.c_int
            lib.dmlt_pack_open.argtypes = [ctypes.c_char_p]
            lib.dmlt_pack_open.restype = ctypes.c_int64
            lib.dmlt_pack_feat_dim.argtypes = [ctypes.c_int64]
            lib.dmlt_pack_feat_dim.restype = ctypes.c_int64
            lib.dmlt_pack_rows.argtypes = [ctypes.c_int64, ctypes.c_char_p]
            lib.dmlt_pack_rows.restype = ctypes.c_int64
            lib.dmlt_pack_get.argtypes = [
                ctypes.c_int64, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64]
            lib.dmlt_pack_get.restype = ctypes.c_int
            lib.dmlt_pack_batch.argtypes = [
                ctypes.c_int64, ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
            lib.dmlt_pack_batch.restype = ctypes.c_int
            lib.dmlt_pack_close.argtypes = [ctypes.c_int64]
            lib.dmlt_pack_close.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load_library() is not None


def _numpy_load_bag(path: str, fixdim: int, feat_dim: int) -> np.ndarray:
    feats = np.load(path).astype(np.float32)
    out = np.zeros((fixdim, feat_dim), dtype=np.float32)
    n = min(feats.shape[0], fixdim)
    out[:n] = feats[:n]
    return out


def load_bag(path: str, fixdim: int, feat_dim: int) -> np.ndarray:
    """Load one .npy bag, zero-padded/truncated to [fixdim, feat_dim]."""
    lib = _load_library()
    if lib is None:
        return _numpy_load_bag(path, fixdim, feat_dim)
    out = np.zeros((fixdim, feat_dim), dtype=np.float32)
    rc = lib.dmlt_load_bag(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fixdim, feat_dim)
    if rc != 0:
        return _numpy_load_bag(path, fixdim, feat_dim)
    return out


def load_bag_batch(paths, fixdim: int, feat_dim: int,
                   n_threads: int = 8) -> np.ndarray:
    """Load a batch of .npy bags in parallel -> [len(paths), fixdim, feat_dim]."""
    lib = _load_library()
    n = len(paths)
    if lib is None:
        return np.stack([_numpy_load_bag(p, fixdim, feat_dim) for p in paths])
    out = np.zeros((n, fixdim, feat_dim), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.dmlt_load_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fixdim, feat_dim, n_threads)
    if rc != 0:
        return np.stack([_numpy_load_bag(p, fixdim, feat_dim) for p in paths])
    return out


# ---- packed shards (.dmltpack; format + fallback in data/packing.py) ----

def pack_open(path: str):
    """Open a packed shard via the C++ mmap reader.  Returns an opaque
    handle, or None when the native library is unavailable or the open
    fails (callers fall back to packing.NumpyPackReader)."""
    lib = _load_library()
    if lib is None:
        return None
    h = lib.dmlt_pack_open(path.encode())
    return int(h) if h >= 0 else None


def pack_feat_dim(handle) -> int:
    return int(_load_library().dmlt_pack_feat_dim(handle))


def pack_rows(handle, name: str) -> int:
    """True (unpadded) row count of a bag, -1 if absent."""
    return int(_load_library().dmlt_pack_rows(handle, name.encode()))


def pack_get(handle, name: str, fixdim: int, feat_dim: int):
    """One packed bag zero-padded/truncated to [fixdim, feat_dim]; None on
    a missing name / feat_dim mismatch."""
    lib = _load_library()
    out = np.zeros((fixdim, feat_dim), dtype=np.float32)
    rc = lib.dmlt_pack_get(
        handle, name.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), fixdim, feat_dim)
    return out if rc == 0 else None


def pack_batch(handle, names, fixdim: int, feat_dim: int,
               n_threads: int = 8):
    """Threaded batch gather -> [len(names), fixdim, feat_dim]; None if any
    name is missing (caller resolves per-bag for the precise error)."""
    lib = _load_library()
    n = len(names)
    out = np.zeros((n, fixdim, feat_dim), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[s.encode() for s in names])
    rc = lib.dmlt_pack_batch(
        handle, arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fixdim, feat_dim, n_threads)
    return out if rc == 0 else None


def pack_close(handle) -> None:
    lib = _load_library()
    if lib is not None:
        lib.dmlt_pack_close(handle)
