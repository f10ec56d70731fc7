"""Distributed OPQ training — every data-touching step sharded.

OPQ alternates (rotate → PQ-train → encode/decode → orthogonal
Procrustes); at corpus scale each step maps onto the existing sharded
machinery:

* rotate: ``x @ R`` with row-sharded ``x`` and a replicated ``[d, d]``
  rotation — GSPMD keeps the product row-sharded, zero collectives.
* PQ train: :func:`vq_tpu.parallel.sharded_pq_train`, warm-started from
  the previous iteration's codebooks (``init_codebooks``).
* encode: :func:`vq_tpu.parallel.sharded_pq_encode` (fused kernel per
  shard, codes stay row-sharded).
* Procrustes: the ``[d, d]`` scatter ``xᵀ·decode(codes)`` contracts over
  the SHARDED row axis — GSPMD inserts the all-reduce (the psum-shaped
  communication of the trainer: codebook/rotation-sized, independent of
  corpus size) — then a replicated SVD.

The reference has no OPQ at all; the single-device analog is
:func:`vq_tpu.models.opq.opq_train` (same alternation, same encode
metric), so quality matches it at equal iteration budgets.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vq_tpu.errors import InvalidParameter
from vq_tpu.models.base import check_training_matrix
from vq_tpu.parallel.encode import sharded_pq_encode
from vq_tpu.parallel.kmeans import sharded_pq_train
from vq_tpu.parallel.mesh import DATA_AXIS, make_mesh

__all__ = ["sharded_opq_train"]


@jax.jit
def _rotate(x, rot):
    # Same default-precision product as the single-device opq_train —
    # row-sharded in, row-sharded out under GSPMD.
    return x @ rot


@jax.jit
def _procrustes_sharded(x, codes, cb):
    """R = U·Vᵀ of xᵀ·decode(codes): the [d, d] scatter contracts over
    the sharded row axis (GSPMD all-reduces it), SVD runs replicated."""
    from vq_tpu.models.pq import pq_decode

    y = pq_decode(codes, cb)  # row-sharded like codes
    m = jax.lax.dot_general(
        x, y, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [d, d] replicated
    u, _, vt = jnp.linalg.svd(m, full_matrices=False)
    return u @ vt


def sharded_opq_train(
    data,
    num_subspaces: int,
    num_centroids: int,
    *,
    opq_iters: int = 10,
    pq_iters: int = 4,
    final_pq_iters: int = 10,
    seed: int = 42,
    mesh: Optional[Mesh] = None,
    block_rows: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Learn ``(rotation [d, d], codebooks [m, k, sub])`` over a corpus
    sharded across the mesh — the distributed analog of
    :func:`vq_tpu.models.opq.opq_train` (same alternation and encode
    metric; the corpus never gathers)."""
    x = check_training_matrix(data)
    n, d = x.shape
    m, k = int(num_subspaces), int(num_centroids)
    if m <= 0 or d % m != 0:
        raise InvalidParameter(
            "num_subspaces", f"dimension ({d}) must be divisible by m"
        )
    if mesh is None:
        mesh = make_mesh()
    x = jax.device_put(
        jnp.asarray(x, jnp.float32),
        NamedSharding(mesh, P(DATA_AXIS, None)),
    )
    rot = jnp.eye(d, dtype=jnp.float32)
    cb = None
    for _ in range(int(opq_iters)):
        xr = _rotate(x, rot)
        cb = sharded_pq_train(
            xr, m, k, max_iters=int(pq_iters), seed=seed, mesh=mesh,
            block_rows=block_rows, init_codebooks=cb,
        ).centroids
        codes = sharded_pq_encode(xr, cb, mesh=mesh)
        rot = _procrustes_sharded(x, codes, cb)

    xr = _rotate(x, rot)
    cb = sharded_pq_train(
        xr, m, k, max_iters=int(final_pq_iters), seed=seed, mesh=mesh,
        block_rows=block_rows, init_codebooks=cb,
    ).centroids
    return rot, cb
