"""Multi-device sharded encoding — embarrassingly parallel over the corpus.

Encode/quantize ops have no cross-row dependence, so scaling them is pure
data parallelism: shard the rows over the mesh's data axis, replicate the
(small) quantizer state, and let every device encode its shard with the
same jitted kernels the single-device path uses. No collectives at all.

These helpers exist so multi-host pipelines don't round-trip through host
memory: input can be a sharded global array (e.g. from
``sharded_synthetic_corpus`` or ``sharded_from_callback``) and the output
codes come back sharded the same way.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vq_tpu.errors import DimensionMismatch
from vq_tpu.parallel.mesh import DATA_AXIS, make_mesh

__all__ = ["sharded_pq_encode", "sharded_quantize"]


def _data_sharded(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def sharded_pq_encode(
    x,
    codebooks,
    *,
    mesh: Optional[Mesh] = None,
    block_rows: int = 2048,
) -> jnp.ndarray:
    """PQ-encode a row-sharded corpus; returns row-sharded ``[n, m]`` codes.

    The codebooks replicate (they are KBs); each device runs the fused
    encode kernel on its shard. ``x`` may be a host array (it will be
    sharded) or an already-sharded global array (left in place).
    """
    if mesh is None:
        mesh = make_mesh()
    cb = jnp.asarray(codebooks, jnp.float32)
    m, k, s = cb.shape
    x = jnp.asarray(x, jnp.float32)
    if x.ndim != 2 or x.shape[1] != m * s:
        raise DimensionMismatch(expected=m * s, found=x.shape[-1])
    x = jax.device_put(x, _data_sharded(mesh, 2))

    from vq_tpu.models.pq import pq_encode_best
    from vq_tpu.ops.distance import Metric

    @jax.jit
    def run(x, cb):
        out = pq_encode_best(x, cb, Metric.SQUARED_EUCLIDEAN, block_rows)
        return jax.lax.with_sharding_constraint(out, _data_sharded(mesh, 2))

    return run(x, cb)


def sharded_quantize(
    quantizer,
    x,
    *,
    mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """Run any quantizer's elementwise ``quantize`` over a sharded corpus.

    Works for BQ/SQ (elementwise): the op is jitted with a data-axis
    sharding constraint so XLA partitions it with zero communication.
    """
    if mesh is None:
        mesh = make_mesh()
    x = jnp.asarray(x, jnp.float32)
    x = jax.device_put(x, _data_sharded(mesh, x.ndim))
    out = quantizer.quantize(x)
    return jax.lax.with_sharding_constraint(out, _data_sharded(mesh, out.ndim))
