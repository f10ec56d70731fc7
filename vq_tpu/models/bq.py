"""Binary quantization — thresholding plus TPU-native sign-bit packing.

The reference's ``BinaryQuantizer`` (src/bq.rs) stores one *byte* per element
(threshold -> ``low``/``high`` u8), so its "binary" quantizer only reaches the
4x compression of SQ (noted at reference README.md:39). vq_tpu provides:

* :class:`BinaryQuantizer` — exact behavioral parity with the reference:
  ``x >= threshold -> high`` else ``low`` (NaN compares false -> ``low``,
  cf. reference tests/integration_tests.rs:477-489); dequantize maps
  ``code >= high -> float(high)`` else ``float(low)`` (src/bq.rs:107-118).
* Bit-packing (:func:`pack_bits` / :func:`unpack_bits`): 32 sign bits per
  uint32 lane for true 32x compression, plus :func:`hamming_distance` via
  ``lax.population_count`` for packed-domain search. This is the TPU-native
  capability the north star requires beyond the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.errors import InvalidParameter
from vq_tpu.models.base import Quantizer, as_batch_f32, require_finite_scalar

__all__ = [
    "BinaryQuantizer",
    "pack_bits",
    "unpack_bits",
    "packed_width",
    "hamming_distance",
]


@functools.partial(jax.jit, static_argnames=())
def _bq_quantize(x, threshold, low, high):
    # NaN >= threshold is False, so NaN maps to `low` exactly like the
    # reference's `if x >= self.threshold` (src/bq.rs:94-105).
    return jnp.where(x >= threshold, high, low).astype(jnp.uint8)


@jax.jit
def _bq_dequantize(codes, low, high):
    # reference: src/bq.rs:107-118 — code >= high -> high as f32, else low.
    return jnp.where(codes >= high, high, low).astype(jnp.float32)


class BinaryQuantizer(Quantizer):
    """Threshold quantizer (reference: src/bq.rs:55-118), batch-first.

    ``quantize`` accepts any-shaped f32 input and returns u8 codes of the same
    shape; ``dequantize`` inverts to f32. Construction validates a finite
    threshold and ``low < high`` (src/bq.rs:55-73).

    >>> import numpy as np
    >>> bq = BinaryQuantizer(0.5, low=0, high=1)
    >>> bq.quantize(np.array([0.1, 0.5, 0.9], np.float32)).tolist()
    [0, 1, 1]
    >>> bq.dequantize(np.array([0, 1], np.uint8)).tolist()
    [0.0, 1.0]
    """

    def __init__(self, threshold: float, low: int = 0, high: int = 1):
        threshold = require_finite_scalar(threshold, "threshold")
        low, high = int(low), int(high)
        for name, v in (("low", low), ("high", high)):
            if not 0 <= v <= 255:
                raise InvalidParameter(name, "must fit in u8 (0-255)")
        if low >= high:
            raise InvalidParameter("low/high", "low must be less than high")
        self._threshold = threshold
        self._low = low
        self._high = high

    @property
    def threshold(self) -> float:
        return self._threshold

    @property
    def low(self) -> int:
        return self._low

    @property
    def high(self) -> int:
        return self._high

    def quantize(self, x) -> jnp.ndarray:
        x, _ = as_batch_f32(x, allow_any_rank=True)
        return _bq_quantize(
            x,
            jnp.float32(self._threshold),
            jnp.uint8(self._low),
            jnp.uint8(self._high),
        )

    def dequantize(self, codes) -> jnp.ndarray:
        codes = jnp.asarray(codes)
        if codes.dtype != jnp.uint8:
            codes = codes.astype(jnp.uint8)
        return _bq_dequantize(codes, jnp.uint8(self._low), jnp.uint8(self._high))

    def quantize_packed(self, x) -> jnp.ndarray:
        """Quantize and pack sign bits into uint32 words (32x compression)."""
        x, _ = as_batch_f32(x, allow_any_rank=False)
        return pack_bits(x >= self._threshold)

    def dequantize_packed(self, packed, dim: int) -> jnp.ndarray:
        """Reconstruct f32 ``low``/``high`` values from packed bits."""
        bits = unpack_bits(packed, dim)
        return jnp.where(bits, float(self._high), float(self._low)).astype(
            jnp.float32
        )

    def __repr__(self) -> str:
        return (
            f"BinaryQuantizer(threshold={self._threshold}, "
            f"low={self._low}, high={self._high})"
        )


def packed_width(dim: int) -> int:
    """Number of uint32 words needed to hold ``dim`` bits."""
    return (dim + 31) // 32


@functools.partial(jax.jit, static_argnames=("dim",))
def _pack_bits_jit(bits: jnp.ndarray, dim: int) -> jnp.ndarray:
    n = bits.shape[0]
    words = packed_width(dim)
    padded = jnp.zeros((n, words * 32), dtype=jnp.uint32)
    padded = padded.at[:, :dim].set(bits.astype(jnp.uint32))
    lanes = padded.reshape(n, words, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(lanes << shifts, axis=-1, dtype=jnp.uint32)


def pack_bits(bits) -> jnp.ndarray:
    """Pack a boolean ``[n, d]`` matrix into ``[n, ceil(d/32)]`` uint32 words.

    Bit ``j`` of word ``w`` holds element ``w*32 + j`` (little-endian within
    the word). Padding bits are zero.
    """
    bits = jnp.asarray(bits)
    if bits.ndim == 1:
        bits = bits[None, :]
    return _pack_bits_jit(bits.astype(jnp.bool_), bits.shape[1])


@functools.partial(jax.jit, static_argnames=("dim",))
def _unpack_bits_jit(packed: jnp.ndarray, dim: int) -> jnp.ndarray:
    n, words = packed.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    lanes = (packed[:, :, None] >> shifts) & jnp.uint32(1)
    return lanes.reshape(n, words * 32)[:, :dim].astype(jnp.bool_)


def unpack_bits(packed, dim: int) -> jnp.ndarray:
    """Inverse of :func:`pack_bits`: ``[n, words]`` uint32 -> ``[n, dim]`` bool."""
    packed = jnp.asarray(packed, dtype=jnp.uint32)
    if packed.ndim == 1:
        packed = packed[None, :]
    return _unpack_bits_jit(packed, dim)


@jax.jit
def _hamming_jit(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    x = a[:, None, :] ^ b[None, :, :]
    pops = jax.lax.population_count(x)
    return jnp.sum(pops.astype(jnp.int32), axis=-1)


def hamming_distance(a, b) -> jnp.ndarray:
    """All-pairs Hamming distance between packed codes.

    ``a``: ``[n, words]`` uint32, ``b``: ``[m, words]`` uint32 ->
    ``[n, m]`` int32 popcount of XOR. This is the packed-domain search
    primitive (north-star BQ config: sign-pack + Hamming recall check).
    """
    a = jnp.asarray(a, dtype=jnp.uint32)
    b = jnp.asarray(b, dtype=jnp.uint32)
    if a.ndim == 1:
        a = a[None, :]
    if b.ndim == 1:
        b = b[None, :]
    return _hamming_jit(a, b)
