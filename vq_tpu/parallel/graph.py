"""Multi-device GraphIndex serving — query-parallel over the mesh.

Beam search is embarrassingly parallel over queries (each query walks
the graph independently), so the multi-chip layout is the transpose of
the list-sharded IVF serving: the index (rows, adjacency, routing
sample) REPLICATES and the query batch shards over the mesh's data
axis. Every step of the search — entry matmul, neighbor gathers,
per-query top-k — partitions cleanly along Q with zero collectives;
GSPMD does it from the sharding annotations alone, and the actual
search logic is :func:`vq_tpu.graph._search_driver`, the same code the
single-device path runs (the sharded path cannot drift from the tested
one).

The replicated placement of the index arrays is cached on the index per
mesh — the broadcast happens once, not per query batch. Replication
costs HBM per chip (rows + graph ≈ n·(d·width + 8·degree) bytes); for
corpora too large to replicate, shard the corpus into independent
GraphIndexes and merge top-k — the flat-serving pattern.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vq_tpu.errors import DimensionMismatch, EmptyInput
from vq_tpu.graph import GraphIndex, _search_driver
from vq_tpu.parallel.mesh import DATA_AXIS, make_mesh

__all__ = ["sharded_graph_search", "sharded_graph_search_core"]


def _replicated_arrays(index: GraphIndex, mesh: Mesh):
    """Replicate the index arrays onto the mesh once; cached per mesh."""
    cache = getattr(index, "_replica_cache", None)
    if cache is not None and cache[0] is mesh:
        return cache[1]
    rep = NamedSharding(mesh, P())
    arrays = tuple(
        jax.device_put(a, rep)
        for a in (
            index._rows, index._sqn, index.graph, index.sample,
            index.entry,
        )
    )
    index._replica_cache = (mesh, arrays)
    return arrays


def sharded_graph_search(
    index: GraphIndex,
    queries,
    k: int = 10,
    *,
    beam: int = 64,
    iters: Optional[int] = None,
    picks_per_iter: int = 8,
    mesh: Optional[Mesh] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Search a replicated :class:`GraphIndex` with the query batch
    sharded over the mesh — identical results to ``index.search``."""
    fn, arrays = sharded_graph_search_core(
        index, int(k), beam=beam, iters=iters,
        picks_per_iter=picks_per_iter, mesh=mesh,
    )
    q = jnp.asarray(queries, jnp.float32)
    if q.ndim == 1:
        q = q[None, :]
    if q.shape[1] != index.dim:
        raise DimensionMismatch(expected=index.dim, found=q.shape[1])
    return fn(q, *arrays)


def sharded_graph_search_core(
    index: GraphIndex,
    k: int,
    *,
    beam: int = 64,
    iters: Optional[int] = None,
    picks_per_iter: int = 8,
    mesh: Optional[Mesh] = None,
):
    """:func:`sharded_graph_search` as a traceable ``(fn, arrays)`` pair
    — feed it to :meth:`vq_tpu.serving.BatchPipeline.from_core` to chain
    many query batches into one sharded dispatch. The index arrays come
    back mesh-replicated (cached on the index per mesh)."""
    if index.ntotal == 0:
        raise EmptyInput("index is empty")
    if mesh is None:
        mesh = make_mesh()
    arrays = _replicated_arrays(index, mesh)
    ndev = mesh.shape[DATA_AXIS]
    qspec = NamedSharding(mesh, P(DATA_AXIS))
    n, k, beam, picks = (
        index.ntotal, int(k), int(beam), int(picks_per_iter)
    )

    def fn(q, rows, sqn, graph, sample, entry):
        Q = q.shape[0]
        pad = (-Q) % ndev
        if pad:
            q = jnp.pad(q, ((0, pad), (0, 0)))
        qsh = jax.lax.with_sharding_constraint(q, qspec)
        ids, dist = _search_driver(
            qsh, rows, sqn, graph, sample, entry, n, k, beam, iters,
            picks,
        )
        return ids[:Q], dist[:Q]

    return fn, arrays
