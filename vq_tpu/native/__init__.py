"""ctypes loader for the native C++ reference-kernel library.

Replaces the reference's Rust↔C FFI layer (src/core/hsdlib_ffi.rs): compiles
``hsd.cpp`` on first use with g++ (-O3 -march=native), caches the shared
object keyed by a source hash, and exposes typed wrappers. Failure to build
degrades gracefully: :func:`available` returns False and callers (parity
tests, bench baseline) skip — mirroring the reference's optional ``simd``
feature whose absence falls back to scalar Rust (src/core/distance.rs:69-83).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

from vq_tpu.errors import NativeLibraryError

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hsd.cpp")
_CACHE_DIR = os.path.join(_HERE, "_cache")

_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[str] = None


def _build_and_load() -> ctypes.CDLL:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_CACHE_DIR, f"libhsd-{digest}.so")
    if not os.path.exists(so_path):
        os.makedirs(_CACHE_DIR, exist_ok=True)
        tmp = so_path + ".tmp"
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
            "-o", tmp, _SRC, "-lpthread",
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise NativeLibraryError(
                f"g++ failed building hsd kernels: {proc.stderr[-500:]}"
            )
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)

    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    st = ctypes.c_size_t

    for name in ("hsd_sqeuclidean_f32", "hsd_manhattan_f32", "hsd_dot_f32",
                 "hsd_cosine_sim_f32"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_float
        fn.argtypes = [f32p, f32p, st]
    lib.hsd_get_backend.restype = ctypes.c_char_p
    lib.hsd_get_backend.argtypes = []
    lib.hsd_sqeuclidean_batch_f32.restype = None
    lib.hsd_sqeuclidean_batch_f32.argtypes = [f32p, f32p, f32p, st, st, st]
    lib.hsd_pq_encode_f32.restype = None
    lib.hsd_pq_encode_f32.argtypes = [f32p, f32p, u8p, st, st, st, st,
                                      ctypes.c_int]
    lib.hsd_assign_f32.restype = None
    lib.hsd_assign_f32.argtypes = [f32p, f32p, i32p, st, st, st, ctypes.c_int]
    return lib


def _get() -> ctypes.CDLL:
    global _lib, _load_error
    if _lib is None:
        if _load_error is not None:
            raise NativeLibraryError(_load_error)
        try:
            _lib = _build_and_load()
        except Exception as e:  # noqa: BLE001 — record and re-raise typed
            _load_error = str(e)
            raise NativeLibraryError(_load_error) from e
    return _lib


def available() -> bool:
    """True if the native library builds/loads on this machine."""
    try:
        _get()
        return True
    except NativeLibraryError:
        return False


def get_native_backend() -> str:
    """Backend name string (reference: src/core/hsdlib_ffi.rs:144-155)."""
    return _get().hsd_get_backend().decode()


def _f32c(x) -> np.ndarray:
    return np.ascontiguousarray(x, dtype=np.float32)


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def sqeuclidean(a, b) -> float:
    a, b = _f32c(a), _f32c(b)
    assert a.shape == b.shape and a.ndim == 1
    return float(_get().hsd_sqeuclidean_f32(
        _ptr(a, ctypes.c_float), _ptr(b, ctypes.c_float), a.size
    ))


def manhattan(a, b) -> float:
    a, b = _f32c(a), _f32c(b)
    return float(_get().hsd_manhattan_f32(
        _ptr(a, ctypes.c_float), _ptr(b, ctypes.c_float), a.size
    ))


def dot(a, b) -> float:
    a, b = _f32c(a), _f32c(b)
    return float(_get().hsd_dot_f32(
        _ptr(a, ctypes.c_float), _ptr(b, ctypes.c_float), a.size
    ))


def cosine_similarity(a, b) -> float:
    a, b = _f32c(a), _f32c(b)
    return float(_get().hsd_cosine_sim_f32(
        _ptr(a, ctypes.c_float), _ptr(b, ctypes.c_float), a.size
    ))


def sqeuclidean_batch(x, c) -> np.ndarray:
    x, c = _f32c(x), _f32c(c)
    n, d = x.shape
    k = c.shape[0]
    out = np.empty((n, k), dtype=np.float32)
    _get().hsd_sqeuclidean_batch_f32(
        _ptr(x, ctypes.c_float), _ptr(c, ctypes.c_float),
        _ptr(out, ctypes.c_float), n, k, d,
    )
    return out


def pq_encode(x, codebooks, num_threads: int = 0) -> np.ndarray:
    """CPU PQ encode: x [n, m*s], codebooks [m, k, s] -> codes [n, m] u8."""
    x = _f32c(x)
    cb = _f32c(codebooks)
    n = x.shape[0]
    m, k, s = cb.shape
    assert x.shape[1] == m * s and k <= 256
    codes = np.empty((n, m), dtype=np.uint8)
    _get().hsd_pq_encode_f32(
        _ptr(x, ctypes.c_float), _ptr(cb, ctypes.c_float),
        _ptr(codes, ctypes.c_uint8), n, m, k, s, num_threads,
    )
    return codes


def assign(x, centroids, num_threads: int = 0) -> np.ndarray:
    """CPU nearest-centroid assignment: x [n, d], c [k, d] -> [n] int32."""
    x = _f32c(x)
    c = _f32c(centroids)
    n, d = x.shape
    k = c.shape[0]
    codes = np.empty((n,), dtype=np.int32)
    _get().hsd_assign_f32(
        _ptr(x, ctypes.c_float), _ptr(c, ctypes.c_float),
        _ptr(codes, ctypes.c_int32), n, k, d, num_threads,
    )
    return codes
