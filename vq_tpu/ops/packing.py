"""Sub-byte PQ code packing (the faiss ``nbits < 8`` IndexPQ analog).

The reference stores one f16 value per dimension (reference src/pq.rs:193-195
— 50% compression); vq_tpu already stores true u8 code indices. For small
codebooks (k <= 16) even a byte per subspace wastes HBM: a 16x16 config
needs only 4 bits per code. These helpers pack ``[n, m]`` code arrays into
``[n, ceil(m * nbits / 8)]`` u8 words (little-endian within each byte) and
unpack them back — both jitted, so an index can keep its corpus packed in
HBM and unpack per scanned block on the VPU (shift/mask only, fused by XLA
into the scan body).

``nbits`` must divide 8 (1, 2, 4, or 8); 8 is the identity layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vq_tpu.errors import InvalidParameter

__all__ = ["pack_codes", "unpack_codes", "bits_for"]

_VALID_NBITS = (1, 2, 4, 8)


def bits_for(num_centroids: int) -> int:
    """Smallest supported code width for a codebook of ``k`` centroids."""
    k = int(num_centroids)
    if k < 1:
        raise InvalidParameter("num_centroids", "must be at least 1")
    for nbits in _VALID_NBITS:
        if k <= (1 << nbits):
            return nbits
    raise InvalidParameter(
        "num_centroids", "packing supports at most 256 centroids (8 bits)"
    )


@functools.partial(jax.jit, static_argnames=("nbits",))
def _pack_jit(codes: jnp.ndarray, nbits: int) -> jnp.ndarray:
    per = 8 // nbits
    n, m = codes.shape
    pad = (-m) % per
    c = jnp.pad(codes.astype(jnp.uint8), ((0, 0), (0, pad)))
    c = c.reshape(n, -1, per)  # [n, B, per]
    shifts = (jnp.arange(per, dtype=jnp.uint8) * nbits)[None, None, :]
    mask = jnp.uint8((1 << nbits) - 1)
    return jnp.bitwise_or.reduce((c & mask) << shifts, axis=-1)


@functools.partial(jax.jit, static_argnames=("nbits", "m"))
def _unpack_jit(packed: jnp.ndarray, nbits: int, m: int) -> jnp.ndarray:
    per = 8 // nbits
    shifts = (jnp.arange(per, dtype=jnp.uint8) * nbits)[None, None, :]
    mask = jnp.uint8((1 << nbits) - 1)
    c = (packed[:, :, None] >> shifts) & mask  # [n, B, per]
    return c.reshape(packed.shape[0], -1)[:, :m]


def pack_codes(codes, nbits: int) -> jnp.ndarray:
    """Pack ``[n, m]`` code indices into ``[n, ceil(m*nbits/8)]`` u8 words.

    Codes must be in ``[0, 2**nbits)``; out-of-range values are truncated to
    the low ``nbits`` bits (matching u8 storage semantics at nbits=8).
    """
    if int(nbits) not in _VALID_NBITS:
        raise InvalidParameter("nbits", "must be 1, 2, 4, or 8")
    codes = jnp.asarray(codes)
    if codes.ndim != 2:
        raise InvalidParameter("codes", f"expected [n, m], got {codes.ndim}-D")
    if int(nbits) == 8:
        return codes.astype(jnp.uint8)
    return _pack_jit(codes, int(nbits))


def unpack_codes(packed, nbits: int, m: int) -> jnp.ndarray:
    """Inverse of :func:`pack_codes` -> ``[n, m]`` u8 code indices."""
    if int(nbits) not in _VALID_NBITS:
        raise InvalidParameter("nbits", "must be 1, 2, 4, or 8")
    packed = jnp.asarray(packed)
    if packed.ndim != 2:
        raise InvalidParameter("packed", f"expected [n, B], got {packed.ndim}-D")
    if int(nbits) == 8:
        return packed.astype(jnp.uint8)
    per = 8 // int(nbits)
    need = -(-int(m) // per)
    if packed.shape[1] != need:
        raise InvalidParameter(
            "packed", f"expected {need} bytes per row for m={m} at "
            f"nbits={nbits}, got {packed.shape[1]}"
        )
    return _unpack_jit(packed.astype(jnp.uint8), int(nbits), int(m))
