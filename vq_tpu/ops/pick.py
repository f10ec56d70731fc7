"""Bit-exact row picks from small tables.

``jnp.take`` with millions of dynamic indices into a SMALL (up to a few
thousand rows) table lowers to a select ladder on TPU costing ~15 ms per
call on the measured chip — it silently dominated TSVQ traversal (124 of
137 ms), PQ/RQ decode, and the RQ residual chains (round 4,
docs/performance.md). The one-hot HIGHEST matmul is ~10× faster and
BIT-exact: the bf16x6 split of an f32 is lossless (24 mantissa bits =
3 × 8) and one-hot rows contribute exact 1.0/0.0 products, so the
substitution never changes a result (verified at 1M on hardware).

Takes from BIG tables (corpus rows, inverted lists) lower to the real
gather path and are fine as ``jnp.take``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pick_rows"]

# Past this table size the one-hot FLOPs (n·rows·d) outgrow the ladder.
_PICK_MAX_ROWS = 4096


def pick_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` for 1-D ``idx``; one-hot HIGHEST on TPU.

    ``table``: ``[rows, d]`` f32; ``idx``: ``[n]`` integer. Falls back
    to ``jnp.take`` off-TPU or for large tables.
    """
    if (
        jax.default_backend() == "tpu"
        and table.ndim == 2
        and table.shape[0] <= _PICK_MAX_ROWS
        and table.dtype == jnp.float32
    ):
        # Clamp out-of-range indices to match jnp.take's default "clip"
        # mode exactly — a raw one_hot would turn an invalid index into
        # a silent all-zero row, diverging from the CPU path.
        idx = jnp.clip(idx, 0, table.shape[0] - 1)
        return jax.lax.dot_general(
            jax.nn.one_hot(idx, table.shape[0], dtype=jnp.float32), table,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return jnp.take(table, idx, axis=0)
