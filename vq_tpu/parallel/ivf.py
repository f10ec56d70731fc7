"""Multi-device IVF-PQ search — inverted lists sharded across the mesh.

Serving a corpus too large for one chip's HBM means sharding the bucket
structure itself. The TPU-native layout: each shard owns a contiguous
range of lists — its lists' chunks (vq_tpu.ivf_pool) gather into a
per-shard block of the code pool, sharded over the mesh's data axis; the
coarse centroids, codebooks, and queries replicate (all KB-scale). Per
query:

1. **Coarse scan + probe selection** — replicated: every device computes
   the same ``[Q, nprobe]`` probe set (one small matmul, no collective).
2. **Local probe** — each device scans only the probed lists that live in
   its shard (others are masked to +inf) with the same table-lookup math
   as the single-device path, producing a local top-``k``.
3. **Merge** — one ``all_gather`` of the ``[Q, k]`` local winners
   (k * Q * 8 bytes — tiny, rides ICI) and a final top-k.

Communication is O(devices * Q * k), independent of corpus size — the
accumulate-then-reduce structure of the sharded trainer applied to
serving. Reference has no distributed anything (SURVEY.md §2.3); this is
north-star capability.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vq_tpu.errors import DimensionMismatch
from vq_tpu.ivf_pool import take_list_ids, take_list_payload
from vq_tpu.parallel.ivf_scan import _shard_lists
from vq_tpu.parallel.mesh import DATA_AXIS, make_mesh

__all__ = [
    "sharded_ivf_search", "sharded_ivf_search_core", "shard_buckets"
]


def shard_buckets(index, mesh: Optional[Mesh] = None):
    """Place an index's chunk-pool storage list-sharded on the mesh's
    data axis (shard s owns lists ``[s·L, (s+1)·L)``; its lists' chunks
    gather into a per-shard pool block with block-local chains). Returns
    ``(slot_ids, codes, chains, cap, mesh)`` — the first three sharded
    along axis 0. Cached on the index per (mesh, pool build)."""
    if mesh is None:
        mesh = make_mesh()
    (ids, codes, chains), cap = _shard_lists(mesh, index, ("codes",))
    return ids, codes, chains, cap, mesh


@functools.partial(
    jax.jit,
    static_argnames=(
        "nprobe", "k", "cap", "mesh", "metric", "by_residual"
    ),
)
def _sharded_ivf_search_jit(
    q, coarse, cb, slot_ids, pool_codes, chains, nprobe: int, k: int,
    cap: int, mesh: Mesh, metric: str = "l2", by_residual: bool = True,
):
    """Internally smaller-is-better, like the single-device jit: dot tables
    are negated (plus a replicated ``q.c_probe`` offset for residual-coded
    indexes); the caller negates the merged result back to scores."""
    Q, d = q.shape
    m, kk, s = cb.shape
    nlist = coarse.shape[0]
    nlist_pad = chains.shape[0]
    ndev = mesh.shape[DATA_AXIS]
    shard_lists = nlist_pad // ndev

    # Replicated coarse scan -> global probe set (same on every device).
    cc = jnp.sum(coarse * coarse, axis=-1)
    qc = jax.lax.dot_general(
        q, coarse, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == "dot":
        coarse_scores = -qc
    else:
        coarse_scores = cc[None, :] - 2.0 * qc
    _, probe = jax.lax.top_k(-coarse_scores, nprobe)  # [Q, np]

    if metric == "dot":
        qs = q.reshape(Q, m, s)
        t = jnp.einsum(
            "qms,mks->qmk", qs, cb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        tables = jnp.broadcast_to(-t[:, None], (Q, nprobe, m, kk))
        offset = (
            -jnp.take_along_axis(qc, probe, axis=1)
            if by_residual else jnp.zeros((Q, nprobe), jnp.float32)
        )
    else:
        if by_residual:
            qres = q[:, None, :] - jnp.take(coarse, probe, axis=0)
        else:
            qres = jnp.broadcast_to(q[:, None, :], (Q, nprobe, d))
        qres = qres.reshape(Q, nprobe, m, s)
        cbcb = jnp.sum(cb * cb, axis=-1)
        rc = jnp.einsum(
            "plms,mks->plmk", qres, cb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        rr = jnp.sum(qres * qres, axis=-1)
        tables = rr[..., None] + cbcb[None, None] - 2.0 * rc  # [Q,np,m,kk]
        offset = jnp.zeros((Q, nprobe), jnp.float32)

    def local(ids_shard, codes_shard, chains_shard, probe, tables, offset):
        # chains_shard: [shard_lists, maxc_s] block-local chunk ids into
        # codes_shard [M, CH, m]; list l is global id base + l where
        # base = axis_index * shard_lists.
        base = jax.lax.axis_index(DATA_AXIS) * shard_lists
        local_probe = probe - base  # [Q, np]; out-of-shard -> clamp + mask
        in_shard = (local_probe >= 0) & (local_probe < shard_lists)
        lp = jnp.clip(local_probe, 0, shard_lists - 1)
        codes = take_list_payload(
            codes_shard, chains_shard, lp
        )  # [Q, np, ce, m]
        ids = take_list_ids(ids_shard, chains_shard, lp, cap)  # [Q, np, ce]
        dist = jnp.broadcast_to(
            offset[:, :, None], codes.shape[:3]
        ).astype(jnp.float32)
        for i in range(m):
            dist = dist + jnp.take_along_axis(
                tables[:, :, i, :], codes[..., i].astype(jnp.int32), axis=-1
            )
        valid = in_shard[:, :, None] & (ids >= 0)
        dist = jnp.where(valid, dist, jnp.inf)
        ids = jnp.where(valid, ids, -1)
        neg, pos = jax.lax.top_k(-dist.reshape(Q, -1), k)
        found = jnp.take_along_axis(ids.reshape(Q, -1), pos, axis=1)
        # Merge: gather every device's [Q, k] winners and re-top-k.
        all_d = jax.lax.all_gather(-neg, DATA_AXIS)  # [D, Q, k]
        all_i = jax.lax.all_gather(found, DATA_AXIS)
        cat_d = jnp.moveaxis(all_d, 0, 1).reshape(Q, -1)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(Q, -1)
        neg2, pos2 = jax.lax.top_k(-cat_d, k)
        return jnp.take_along_axis(cat_i, pos2, axis=1), -neg2

    ids, dist = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(), P(), P()
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(slot_ids, pool_codes, chains, probe, tables, offset)
    ids = jnp.where(jnp.isinf(dist), -1, ids)
    return ids, dist


def sharded_ivf_search(
    index,
    queries,
    k: int = 10,
    *,
    nprobe: int = 8,
    mesh: Optional[Mesh] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Search an :class:`~vq_tpu.ivf.IVFPQIndex` with its inverted lists
    sharded over the mesh — O(devices · Q · k) communication, identical
    results to the single-device search.

    Ids of −1 pad out queries with fewer than ``k`` probed candidates.
    For a ``metric="dot"`` index the returned values are inner-product
    scores, descending, padded with ``-inf`` — same contract as
    :meth:`IVFPQIndex.search`.
    """
    fn, arrays = sharded_ivf_search_core(
        index, int(k), nprobe=nprobe, mesh=mesh
    )
    q = jnp.asarray(queries, jnp.float32)
    if q.ndim == 1:
        q = q[None, :]
    if q.shape[1] != index.pq.dim:
        raise DimensionMismatch(expected=index.pq.dim, found=q.shape[1])
    return fn(q, *arrays)


def sharded_ivf_search_core(
    index,
    k: int,
    *,
    nprobe: int = 8,
    mesh: Optional[Mesh] = None,
):
    """:func:`sharded_ivf_search` as a traceable ``(fn, arrays)`` pair —
    the multi-chip analog of :meth:`IVFPQIndex._search_core`. Feed it to
    :meth:`vq_tpu.serving.BatchPipeline.from_core` to chain many query
    batches into one sharded dispatch; the bucket arrays come back
    mesh-placed."""
    from vq_tpu.errors import EmptyInput

    if index._flat_lists is None:
        raise EmptyInput("index is empty — add() vectors first")
    slot_ids, pool_codes, chains, cap, mesh = shard_buckets(index, mesh)
    k = int(k)
    nprobe = min(int(nprobe), index.nlist)
    ce = int(chains.shape[1]) * int(slot_ids.shape[1])
    kk = min(k, nprobe * ce)
    metric = getattr(index, "metric", "l2")
    by_residual = index.by_residual
    coarse, cbs = index.coarse, index.pq.codebooks

    def fn(q, coarse, cbs, bids, bcodes, bchains):
        ids, dist = _sharded_ivf_search_jit(
            q, coarse, cbs, bids, bcodes, bchains, nprobe, kk, cap, mesh,
            metric=metric, by_residual=by_residual,
        )
        if metric == "dot":
            dist = -dist  # back to descending scores; pads become -inf
        return ids, dist

    return fn, (coarse, cbs, slot_ids, pool_codes, chains)
