"""Scalar quantization — uniform affine quantizer over ``[min, max]``.

Behavioral parity with the reference (src/sq.rs):

* ``step = (max - min) / (levels - 1)`` (src/sq.rs:94).
* Encode: clamp to ``[min, max]``, then ``round((x - min) / step)`` with
  round-half-away-from-zero (Rust ``f32::round``), capped at ``levels - 1``
  (src/sq.rs:123-127). After clamping the argument is non-negative so
  half-away == ``floor(t + 0.5)``, which is what we compute (``jnp.round``
  would round half-to-even and diverge at exact midpoints).
* Decode: ``min + idx * step`` with **no clamping** — out-of-range codes
  extrapolate beyond ``max`` exactly like the reference (src/sq.rs:146-151).
* Constructor validates finite ``min``/``max``, ``max > min``, and
  ``2 <= levels <= 256`` (src/sq.rs:63-93).

Batch-first: any input shape quantizes elementwise on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vq_tpu.errors import InvalidParameter
from vq_tpu.models.base import Quantizer, as_batch_f32, require_finite_scalar

__all__ = ["ScalarQuantizer"]


@jax.jit
def _sq_quantize(x, lo, hi, step, max_idx):
    clamped = jnp.clip(x, lo, hi)
    # floor(t + 0.5) == round-half-away-from-zero for t >= 0 (Rust .round()).
    idx = jnp.floor((clamped - lo) / step + 0.5)
    idx = jnp.minimum(idx, max_idx)
    return idx.astype(jnp.uint8)


@jax.jit
def _sq_dequantize(codes, lo, step):
    return lo + codes.astype(jnp.float32) * step


class ScalarQuantizer(Quantizer):
    """Uniform scalar quantizer (reference: src/sq.rs:63-152), batch-first.

    See also :class:`PerDimScalarQuantizer` for per-dimension ranges (lower
    MSE on real data whose dimensions have different scales).

    >>> import numpy as np
    >>> sq = ScalarQuantizer(0.0, 1.0, levels=256)
    >>> sq.quantize(np.array([0.0, 0.25, 1.0], np.float32)).tolist()
    [0, 64, 255]
    >>> sq.dequantize(np.array([0, 255], np.uint8)).tolist()
    [0.0, 1.0]
    >>> round(sq.step, 6)
    0.003922
    """

    def __init__(self, min: float, max: float, levels: int = 256):
        lo = require_finite_scalar(min, "min")
        hi = require_finite_scalar(max, "max")
        if hi <= lo:
            raise InvalidParameter("max", "must be greater than min")
        levels = int(levels)
        if levels < 2:
            raise InvalidParameter("levels", "must be at least 2")
        if levels > 256:
            raise InvalidParameter("levels", "must be no more than 256 to fit in u8")
        self._min = lo
        self._max = hi
        self._levels = levels
        self._step = (hi - lo) / (levels - 1)

    @property
    def min(self) -> float:
        return self._min

    @property
    def max(self) -> float:
        return self._max

    @property
    def levels(self) -> int:
        return self._levels

    @property
    def step(self) -> float:
        return self._step

    def quantize(self, x) -> jnp.ndarray:
        x, _ = as_batch_f32(x, allow_any_rank=True)
        return _sq_quantize(
            x,
            jnp.float32(self._min),
            jnp.float32(self._max),
            jnp.float32(self._step),
            jnp.float32(self._levels - 1),
        )

    def dequantize(self, codes) -> jnp.ndarray:
        codes = jnp.asarray(codes)
        return _sq_dequantize(
            codes.astype(jnp.uint8), jnp.float32(self._min), jnp.float32(self._step)
        )

    def __repr__(self) -> str:
        return (
            f"ScalarQuantizer(min={self._min}, max={self._max}, "
            f"levels={self._levels})"
        )


@jax.jit
def _sq_quantize_perdim(x, lo, hi, step, max_idx):
    clamped = jnp.clip(x, lo, hi)
    idx = jnp.floor((clamped - lo) / step + 0.5)
    idx = jnp.minimum(idx, max_idx)
    return idx.astype(jnp.uint8)


@jax.jit
def _sq_dequantize_perdim(codes, lo, step):
    return lo + codes.astype(jnp.float32) * step


class PerDimScalarQuantizer(Quantizer):
    """Scalar quantizer with per-dimension ranges (the faiss-SQ8 style).

    Beyond the reference (whose SQ uses one global [min, max]): each of the
    ``d`` dimensions gets its own affine range, fitted from data with
    :meth:`from_data` or given explicitly. Same u8 codes and encode/decode
    rounding semantics as :class:`ScalarQuantizer`, applied per column.
    """

    def __init__(self, mins, maxs, levels: int = 256):
        lo = jnp.asarray(mins, jnp.float32)
        hi = jnp.asarray(maxs, jnp.float32)
        if lo.ndim != 1 or lo.shape != hi.shape:
            raise InvalidParameter(
                "mins/maxs", "must be 1-D arrays of equal length"
            )
        if not bool(jnp.isfinite(lo).all() & jnp.isfinite(hi).all()):
            raise InvalidParameter("mins/maxs", "must be finite")
        if bool((hi <= lo).any()):
            raise InvalidParameter("maxs", "every max must exceed its min")
        levels = int(levels)
        if not 2 <= levels <= 256:
            raise InvalidParameter("levels", "must be in [2, 256]")
        self._lo = lo
        self._hi = hi
        self._levels = levels
        self._step = (hi - lo) / (levels - 1)

    @classmethod
    def from_data(cls, data, levels: int = 256) -> "PerDimScalarQuantizer":
        """Fit per-dimension [min, max] from a data sample.

        Dimensions with zero range get a tiny symmetric pad so the range
        stays valid (their reconstruction is exact either way).
        """
        x = jnp.asarray(data, jnp.float32)
        if x.ndim != 2 or x.shape[0] == 0:
            raise InvalidParameter("data", "expected a non-empty [n, d] matrix")
        lo = jnp.min(x, axis=0)
        hi = jnp.max(x, axis=0)
        degenerate = hi <= lo
        pad = jnp.where(degenerate, jnp.maximum(jnp.abs(lo) * 1e-6, 1e-6), 0.0)
        return cls(lo - pad, hi + pad, levels)

    @property
    def dim(self) -> int:
        return int(self._lo.shape[0])

    @property
    def mins(self) -> jnp.ndarray:
        return self._lo

    @property
    def maxs(self) -> jnp.ndarray:
        return self._hi

    @property
    def levels(self) -> int:
        return self._levels

    @property
    def steps(self) -> jnp.ndarray:
        return self._step

    def quantize(self, x) -> jnp.ndarray:
        x = jnp.asarray(x, jnp.float32)
        if x.shape[-1] != self.dim:
            from vq_tpu.errors import DimensionMismatch

            raise DimensionMismatch(expected=self.dim, found=x.shape[-1])
        return _sq_quantize_perdim(
            x, self._lo, self._hi, self._step,
            jnp.float32(self._levels - 1),
        )

    def dequantize(self, codes) -> jnp.ndarray:
        codes = jnp.asarray(codes).astype(jnp.uint8)
        return _sq_dequantize_perdim(codes, self._lo, self._step)

    def __repr__(self) -> str:
        return f"PerDimScalarQuantizer(dim={self.dim}, levels={self._levels})"
