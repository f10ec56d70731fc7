"""pyvq — drop-in compatibility shim over vq_tpu.

The reference library ships Python bindings as a ``pyvq`` extension module
(reference: pyvq/src/lib.rs:40-49, typed surface in pyvq/pyvq.pyi). This
package provides the same module name, classes, signatures, dtypes, and
exception behavior on top of vq_tpu, so code written against the reference
runs unchanged on TPU:

* ``BinaryQuantizer(threshold, low=0, high=1)`` — f32 in, u8 out.
* ``ScalarQuantizer(min, max, levels=256)`` — f32 in, u8 out; ``step`` getter.
* ``ProductQuantizer(training_data, num_subspaces, num_centroids,
  max_iters=10, distance=None, seed=42)`` — ``quantize`` returns f16 centroid
  values like the reference (pyvq/src/pq.rs:96-107); true code-index APIs are
  available on the underlying ``vq_tpu`` classes.
* ``TSVQ(training_data, max_depth, distance=None)`` — f16 quantize.
* ``Distance`` with the 4 static factories + ``compute``.
* ``get_simd_backend()`` — backend introspection string.

Inputs may be numpy or JAX arrays; outputs are numpy (like the reference's
PyO3 layer, which returns numpy arrays). Errors raise ``ValueError`` exactly
like PyO3's VqError mapping (pyvq/src/pq.rs:86) — vq_tpu's typed errors are
ValueError subclasses.
"""

from __future__ import annotations

import numpy as np

import vq_tpu
from vq_tpu import Distance, get_simd_backend  # noqa: F401  (re-exports)

__all__ = [
    "BinaryQuantizer",
    "ScalarQuantizer",
    "ProductQuantizer",
    "TSVQ",
    "Distance",
    "get_simd_backend",
]


def _np(x, dtype):
    return np.asarray(x, dtype=dtype)


class BinaryQuantizer:
    """Reference-compatible BQ (pyvq/src/bq.rs)."""

    def __init__(self, threshold: float, low: int = 0, high: int = 1):
        self._q = vq_tpu.BinaryQuantizer(threshold, low, high)

    def quantize(self, values) -> np.ndarray:
        return _np(self._q.quantize(np.asarray(values, np.float32)), np.uint8)

    def dequantize(self, codes) -> np.ndarray:
        return _np(self._q.dequantize(np.asarray(codes, np.uint8)), np.float32)

    @property
    def threshold(self) -> float:
        return self._q.threshold

    @property
    def low(self) -> int:
        return self._q.low

    @property
    def high(self) -> int:
        return self._q.high

    def __repr__(self) -> str:
        return (
            f"BinaryQuantizer(threshold={self.threshold}, low={self.low}, "
            f"high={self.high})"
        )


class ScalarQuantizer:
    """Reference-compatible SQ (pyvq/src/sq.rs)."""

    def __init__(self, min: float, max: float, levels: int = 256):
        self._q = vq_tpu.ScalarQuantizer(min, max, levels)

    def quantize(self, values) -> np.ndarray:
        return _np(self._q.quantize(np.asarray(values, np.float32)), np.uint8)

    def dequantize(self, codes) -> np.ndarray:
        return _np(self._q.dequantize(np.asarray(codes, np.uint8)), np.float32)

    @property
    def min(self) -> float:
        return self._q.min

    @property
    def max(self) -> float:
        return self._q.max

    @property
    def levels(self) -> int:
        return self._q.levels

    @property
    def step(self) -> float:
        return self._q.step

    def __repr__(self) -> str:
        return (
            f"ScalarQuantizer(min={self.min}, max={self.max}, "
            f"levels={self.levels})"
        )


class ProductQuantizer:
    """Reference-compatible PQ (pyvq/src/pq.rs:48-127).

    ``quantize`` emits the selected centroids' values as float16 (the
    reference's storage format); ``dequantize`` casts back to f32.
    """

    def __init__(
        self,
        training_data,
        num_subspaces: int,
        num_centroids: int,
        max_iters: int = 10,
        distance=None,
        seed: int = 42,
    ):
        self._q = vq_tpu.ProductQuantizer(
            np.asarray(training_data, np.float32),
            num_subspaces=num_subspaces,
            num_centroids=num_centroids,
            max_iters=max_iters,
            distance=distance,
            seed=seed,
        )

    def quantize(self, vector) -> np.ndarray:
        return _np(self._q.quantize(np.asarray(vector, np.float32)), np.float16)

    def dequantize(self, codes) -> np.ndarray:
        return _np(self._q.dequantize(np.asarray(codes, np.float16)), np.float32)

    @property
    def num_subspaces(self) -> int:
        return self._q.num_subspaces

    @property
    def sub_dim(self) -> int:
        return self._q.sub_dim

    @property
    def dim(self) -> int:
        return self._q.dim

    def __repr__(self) -> str:
        return (
            f"ProductQuantizer(num_subspaces={self.num_subspaces}, "
            f"sub_dim={self.sub_dim}, dim={self.dim})"
        )


class TSVQ:
    """Reference-compatible TSVQ (pyvq/src/tsvq.rs:42-121)."""

    def __init__(self, training_data, max_depth: int, distance=None):
        self._q = vq_tpu.TSVQ(
            np.asarray(training_data, np.float32),
            max_depth=max_depth,
            distance=distance,
        )

    def quantize(self, vector) -> np.ndarray:
        return _np(self._q.quantize(np.asarray(vector, np.float32)), np.float16)

    def dequantize(self, codes) -> np.ndarray:
        return _np(self._q.dequantize(np.asarray(codes, np.float16)), np.float32)

    @property
    def dim(self) -> int:
        return self._q.dim

    def __repr__(self) -> str:
        return f"TSVQ(dim={self.dim}, max_depth={self._q.max_depth})"
