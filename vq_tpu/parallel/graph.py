"""Multi-device GraphIndex serving — query-parallel over the mesh.

Beam search is embarrassingly parallel over queries (each query walks
the graph independently), so the multi-chip layout is the transpose of
the list-sharded IVF serving: the index (rows, adjacency, routing
sample) REPLICATES and the query batch shards over the mesh's data
axis. Every step of the search — entry matmul, neighbor gathers,
per-query top-k — partitions cleanly along Q with zero collectives;
GSPMD does it from the sharding annotations alone, reusing the exact
single-device jits (the sharded path cannot drift from the tested one).

Replication costs HBM per chip (rows + graph ≈ n·(d·width + 8·degree)
bytes); for corpora too large to replicate, shard the corpus into
independent GraphIndexes and merge top-k — the flat-serving pattern.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vq_tpu.errors import DimensionMismatch, EmptyInput
from vq_tpu.graph import GraphIndex, _entry_select_jit, _graph_search_jit
from vq_tpu.parallel.mesh import DATA_AXIS, make_mesh

__all__ = ["sharded_graph_search"]


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
    if index.ntotal == 0:
        raise EmptyInput("index is empty")
    if mesh is None:
        mesh = make_mesh()
    q = jnp.asarray(queries, jnp.float32)
    if q.ndim == 1:
        q = q[None, :]
    if q.shape[1] != index.dim:
        raise DimensionMismatch(expected=index.dim, found=q.shape[1])
    Q = q.shape[0]
    ndev = mesh.shape[DATA_AXIS]
    pad = (-Q) % ndev
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))

    qsh = jax.device_put(q, NamedSharding(mesh, P(DATA_AXIS)))
    rep = NamedSharding(mesh, P())
    rows = jax.device_put(index._rows, rep)
    sqn = jax.device_put(index._sqn, rep)
    graph = jax.device_put(index.graph, rep)
    sample = jax.device_put(index.sample, rep)
    static_entry = jax.device_put(index.entry, rep)

    L = max(int(beam), int(k))
    B = max(1, int(picks_per_iter))
    T = (
        int(iters) if iters is not None
        else max(4, -(-3 * L // (2 * B)))
    )
    k_eff = min(int(k), index.ntotal)
    e_top = min(8, int(sample.shape[0]))
    near = _entry_select_jit(qsh, rows, sqn, sample, e_top)
    entry = jnp.concatenate(
        [
            near,
            jnp.broadcast_to(
                static_entry[None, :],
                (q.shape[0], static_entry.shape[0]),
            ),
        ],
        axis=1,
    )
    ids, dist = _graph_search_jit(
        qsh, rows, sqn, graph, entry, k_eff, L, T, B
    )
    ids, dist = ids[:Q], dist[:Q]
    if k_eff < k:
        padk = int(k) - k_eff
        ids = jnp.pad(ids, ((0, 0), (0, padk)), constant_values=-1)
        dist = jnp.pad(
            dist, ((0, 0), (0, padk)), constant_values=jnp.inf
        )
    return ids, dist
