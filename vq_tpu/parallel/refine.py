"""Multi-chip RefineIndex serving — sharded base, replicated refiner.

The base index serves with whatever sharded layout its type already has
(list-sharded IVF buckets, row-sharded flat codes, replicated graph);
the refinement codes are compact by construction (1 B/dim SQ8, m₂ B/vec
residual PQ, 2 B/dim bf16 rows), so they REPLICATE across the mesh and
the re-score runs on the merged ``[Q, fetch]`` candidates — the same
post-merge position a single-device refine occupies. The traced body is
:func:`vq_tpu.refine._build_refine_fn`, the exact function the
single-device ``_search_core`` runs (the sharded path cannot drift from
the parity-tested math).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vq_tpu.errors import (
    DimensionMismatch,
    EmptyInput,
    InvalidData,
    InvalidParameter,
)
from vq_tpu.parallel.mesh import make_mesh
from vq_tpu.refine import RefineIndex, _build_refine_fn

__all__ = ["sharded_refine_search", "sharded_refine_search_core"]


def _base_core(base, fetch: int, mesh: Mesh, **base_params):
    """Dispatch the base index to its sharded ``(fn, arrays)`` core."""
    from vq_tpu.graph import GraphIndex
    from vq_tpu.ivf import IVFPQIndex
    from vq_tpu.ivf_binary import IVFBinaryIndex
    from vq_tpu.ivf_flat import IVFFlatIndex, IVFRQIndex, IVFSQIndex
    from vq_tpu.parallel.flat import sharded_flat_search_core
    from vq_tpu.parallel.graph import sharded_graph_search_core
    from vq_tpu.parallel.ivf import sharded_ivf_search_core
    from vq_tpu.parallel.ivf_scan import sharded_scan_search_core
    from vq_tpu.search import FlatIndex, PQIndex, RQIndex, SQIndex

    if isinstance(base, IVFPQIndex):
        return sharded_ivf_search_core(base, fetch, mesh=mesh, **base_params)
    if isinstance(
        base, (IVFFlatIndex, IVFSQIndex, IVFRQIndex, IVFBinaryIndex)
    ):
        return sharded_scan_search_core(base, fetch, mesh=mesh, **base_params)
    if isinstance(base, GraphIndex):
        return sharded_graph_search_core(base, fetch, mesh=mesh, **base_params)
    if isinstance(base, (FlatIndex, PQIndex, RQIndex, SQIndex)):
        if base_params:
            raise InvalidParameter(
                "base_params",
                f"flat bases take no search params, got {base_params}",
            )
        return sharded_flat_search_core(base, fetch, mesh=mesh)
    raise InvalidParameter(
        "base",
        f"{type(base).__name__} has no sharded serving core",
    )


def sharded_refine_search_core(
    ref: RefineIndex,
    k: int,
    *,
    k_factor: float = 4.0,
    mesh: Optional[Mesh] = None,
    **base_params,
):
    """:meth:`RefineIndex._search_core` over a device mesh: the base
    fetches ``ceil(k_factor * k)`` candidates sharded, the replicated
    refine codes re-score them. Returns a traceable ``(fn, arrays)``
    pair for :meth:`vq_tpu.serving.BatchPipeline.from_core`."""
    if ref._codes is None:
        raise EmptyInput("index is empty — add() vectors first")
    if ref._codes.shape[0] != ref.base.ntotal:
        raise InvalidData(
            "refine codes out of sync with the base index — add "
            "vectors only through RefineIndex.add"
        )
    k = int(k)
    if float(k_factor) < 1.0:
        raise InvalidParameter("k_factor", "must be >= 1")
    if mesh is None:
        mesh = make_mesh()
    fetch = max(k, int(math.ceil(float(k_factor) * k)))
    base_fn, base_arrays = _base_core(ref.base, fetch, mesh, **base_params)

    rec_fn = None
    if ref.residual:
        rec_fn, rec_arrays = ref.base._reconstruct_core()
    # Replicated placements cached per (mesh, codes build) — the other
    # sharded cores' convention; without it every eager call re-ships
    # the full refine code table to all devices.
    cache = getattr(ref, "_replica_cache", None)
    if (
        cache is not None and cache[0] is mesh
        and cache[1] is ref._codes
    ):
        placed = cache[2]
    else:
        rep = NamedSharding(mesh, P())
        placed = (jax.device_put(ref._codes, rep),)
        if ref.residual:
            placed = placed + tuple(
                jax.device_put(a, rep) for a in rec_arrays
            )
        ref._replica_cache = (mesh, ref._codes, placed)
    fn = _build_refine_fn(
        base_fn, len(base_arrays), ref._decode, rec_fn, ref.metric, k
    )
    return fn, tuple(base_arrays) + placed


def sharded_refine_search(
    ref: RefineIndex,
    queries,
    k: int = 10,
    *,
    k_factor: float = 4.0,
    mesh: Optional[Mesh] = None,
    **base_params,
):
    """Eager multi-chip refined search — one call of
    :func:`sharded_refine_search_core`, same ``(ids, values)`` contract
    as :meth:`RefineIndex.search`."""
    q = jnp.asarray(queries, jnp.float32)
    if q.ndim == 1:
        q = q[None, :]
    if q.shape[1] != ref.dim:
        raise DimensionMismatch(expected=ref.dim, found=q.shape[1])
    fn, arrays = sharded_refine_search_core(
        ref, int(k), k_factor=k_factor, mesh=mesh, **base_params
    )
    return fn(q, *arrays)
