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
    """Uniform scalar quantizer (reference: src/sq.rs:63-152), batch-first."""

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
