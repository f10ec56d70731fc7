"""Unified quantizer interface — the reference's ``Quantizer`` trait, batch-first.

The reference trait (src/core/quantizer.rs:29-63) is one-vector-at-a-time:
``quantize(&[f32]) -> QuantizedOutput`` / ``dequantize``. On TPU a single
vector wastes the machine, so every vq_tpu quantizer is batch-first: methods
accept ``[d]`` or ``[n, d]`` (and for elementwise quantizers any shape) and
return outputs with matching leading shape. The 1-D case behaves exactly like
the reference so pyvq-style code ports directly.
"""

from __future__ import annotations

import abc

import jax.numpy as jnp
import numpy as np

from vq_tpu.errors import DimensionMismatch, EmptyInput, InvalidParameter


class Quantizer(abc.ABC):
    """Abstract quantizer: ``quantize`` to a compact representation and
    ``dequantize`` back to f32 (reference: src/core/quantizer.rs:29-63)."""

    @abc.abstractmethod
    def quantize(self, x):
        """Quantize f32 input to this scheme's compact representation."""

    @abc.abstractmethod
    def dequantize(self, q):
        """Reconstruct f32 values from the compact representation."""

    def transform(self, x):
        """sklearn-style alias: the most compact encoding this quantizer
        has (code indices where they exist, else the quantized form)."""
        encode = getattr(self, "encode", None)
        return encode(x) if encode is not None else self.quantize(x)

    def fit_transform(self, x):
        """Encode ``x`` with this (already-fitted) quantizer.

        The reference lists ``fit_transform`` as an unimplemented roadmap
        item (reference ROADMAP.md §3); here every quantizer trains in its
        constructor, so ``Quantizer(data, ...).fit_transform(data)`` is the
        one-liner: fit on construction, transform here.
        """
        return self.transform(x)


def require_finite_scalar(value: float, parameter: str) -> float:
    """Validate a finite float parameter (reference pattern: src/sq.rs:63-75,
    src/bq.rs:55-61)."""
    value = float(value)
    if not np.isfinite(value):
        raise InvalidParameter(parameter, "must be finite (not NaN or infinite)")
    return value


def as_batch_f32(x, *, allow_any_rank: bool = False):
    """Coerce input to a f32 jnp array, returning ``(array_2d, was_1d)``.

    For vector quantizers (PQ/TSVQ) input must be ``[d]`` or ``[n, d]``; with
    ``allow_any_rank`` (elementwise BQ/SQ) any shape passes through unchanged.
    """
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating) and not jnp.issubdtype(
        x.dtype, jnp.integer
    ):
        raise InvalidParameter("x", f"expected numeric input, got dtype {x.dtype}")
    x = x.astype(jnp.float32)
    if allow_any_rank:
        return x, False
    if x.ndim == 1:
        return x[None, :], True
    if x.ndim == 2:
        return x, False
    raise InvalidParameter("x", f"expected [d] or [n, d] input, got {x.ndim}-D")


_HALF_DTYPES = (jnp.float16, jnp.bfloat16)


def as_batch_compute(x, *, allow_any_rank: bool = False):
    """Like :func:`as_batch_f32` but keeps half-precision inputs half.

    The TPU-native analog of the reference's ``Vector<f16>``
    (src/core/vector.rs:12-71): an f16/bf16 corpus stays half-width in HBM
    end to end; compute paths upcast tiles to f32 in VMEM, so scores (and
    therefore codes) are identical to feeding the same values as f32.
    Everything else (ints, f64) is coerced to f32 as before.
    """
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating) and not jnp.issubdtype(
        x.dtype, jnp.integer
    ):
        raise InvalidParameter("x", f"expected numeric input, got dtype {x.dtype}")
    if x.dtype not in _HALF_DTYPES:
        x = x.astype(jnp.float32)
    if allow_any_rank:
        return x, False
    if x.ndim == 1:
        return x[None, :], True
    if x.ndim == 2:
        return x, False
    raise InvalidParameter("x", f"expected [d] or [n, d] input, got {x.ndim}-D")


def check_training_matrix(data) -> jnp.ndarray:
    """Validate a 2-D non-empty training matrix, coercing to f32.

    Mirrors the reference ctors' empty/uniform-dimension validation
    (src/pq.rs:91-104, src/tsvq.rs:196-210). Ragged Python lists raise
    :class:`DimensionMismatch` like the reference's per-row check.
    """
    if isinstance(data, (list, tuple)):
        lens = {len(row) for row in data}
        if len(data) == 0:
            raise EmptyInput("training data must not be empty")
        if len(lens) > 1:
            first = len(data[0])
            other = next(l for l in lens if l != first)
            raise DimensionMismatch(expected=first, found=other)
    arr = jnp.asarray(data, dtype=jnp.float32)
    if arr.ndim != 2:
        raise InvalidParameter(
            "training_data", f"must be a 2-D [n, d] matrix, got {arr.ndim}-D"
        )
    if arr.shape[0] == 0 or arr.shape[1] == 0:
        raise EmptyInput("training data must not be empty")
    return arr
