"""Multi-device IVF-Flat/SQ/RQ/Binary search — lists sharded on the mesh.

The same serving layout as :func:`vq_tpu.parallel.ivf.sharded_ivf_search`
(IVF-PQ), generalized to the whole IVF coding ladder: each shard owns a
contiguous range of lists — its lists' CHUNKS (vq_tpu.ivf_pool) gather
into a per-shard block of the pool, chains relabel to block-local chunk
ids, and the blocks shard along the mesh's data axis while the coarse
centroids / quantizer parameters / queries replicate. Each device scans
only the probed lists that live in its shard (out-of-shard probe slots
masked to +inf) before one ``[Q, k]`` ``all_gather`` + re-top-k merge.
Communication is O(devices · Q · k), independent of corpus size.

The per-probe-rank distance math is literally the single-device code:
:mod:`vq_tpu.ivf_flat` exposes its scan bodies as ``body(pg, pl)``
closures (global ids for replicated arrays, local ids for the bucket
shard), so the sharded path can never drift from the one the parity
tests pin down. Reference has no distributed layer (SURVEY.md §2.3);
this is north-star capability.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vq_tpu.errors import DimensionMismatch, EmptyInput
from vq_tpu.ivf_flat import (
    IVFFlatIndex,
    IVFRQIndex,
    IVFSQIndex,
    _coarse_probe,
    _flat_scan_body,
    _merge_probe_topk,
    _rq_scan_body,
    _sq_scan_body,
)
from vq_tpu.ivf_binary import IVFBinaryIndex, _binary_scan_body
from vq_tpu.parallel.mesh import DATA_AXIS, make_mesh

__all__ = ["sharded_ivf_scan_search", "sharded_scan_search_core"]


def _shard_lists(mesh: Mesh, index, payload_names):
    """Gather each shard's lists' chunks into a contiguous per-shard
    pool block and place everything list-sharded: shard ``s`` owns lists
    ``[s·L, (s+1)·L)`` (``nlist`` padded to a multiple of the data-axis
    size; pad lists are empty), its block holds exactly those lists'
    chunks (padded to the largest shard's count with −1-id chunks), and
    the chains relabel to BLOCK-LOCAL chunk ids so the scan bodies work
    unchanged inside ``shard_map``. Returns ``[ids, *payloads, chains]``
    all sharded along axis 0, plus the static searched cap. Cached on
    the index per (mesh, pool build) — serving loops must not
    re-broadcast the structure every batch."""
    import numpy as np

    pool = index._pool
    cache = getattr(index, "_shard_cache", None)
    if (
        cache is not None
        and cache[0] is mesh
        and cache[1] is pool.slot_ids  # identity = same build
    ):
        return cache[2]
    ndev = mesh.shape[DATA_AXIS]
    nlist = pool.nlist
    nlist_pad = -(-nlist // ndev) * ndev
    L = nlist_pad // ndev
    maxc_s = max(1, -(-pool.cap // pool.ch))
    chains_h = pool._chains_h[:, : pool._chains_h.shape[1]]
    shard_chunks = []  # per shard: list of global chunk ids
    for sdev in range(ndev):
        lo, hi = sdev * L, min((sdev + 1) * L, nlist)
        chunks = []
        for l in range(lo, hi):
            for c in chains_h[l][:maxc_s]:
                if c < 0:
                    break
                chunks.append(int(c))
        shard_chunks.append(chunks)
    M = max(1, max(len(c) for c in shard_chunks))
    perm = np.full((ndev, M), -1, np.int64)
    chains_local = np.full((nlist_pad, maxc_s), -1, np.int32)
    for sdev, chunks in enumerate(shard_chunks):
        perm[sdev, : len(chunks)] = chunks
        pos_of = {c: j for j, c in enumerate(chunks)}
        lo, hi = sdev * L, min((sdev + 1) * L, nlist)
        for l in range(lo, hi):
            for j, c in enumerate(chains_h[l][:maxc_s]):
                if c < 0:
                    break
                chains_local[l, j] = pos_of[int(c)]
    perm_flat = jnp.asarray(perm.reshape(-1))
    alive = (perm_flat >= 0)[:, None]
    safe = jnp.maximum(perm_flat, 0)
    sh = NamedSharding(mesh, P(DATA_AXIS))
    out = [
        jax.device_put(
            jnp.where(alive, jnp.take(pool.slot_ids, safe, axis=0), -1), sh
        )
    ]
    for name in payload_names:
        out.append(
            jax.device_put(jnp.take(pool.data[name], safe, axis=0), sh)
        )
    out.append(jax.device_put(jnp.asarray(chains_local), sh))
    out = (out, pool.cap)
    index._shard_cache = (mesh, pool.slot_ids, out)
    return out


def _local_scan(body_factory, nrep, Q, nprobe, k, shard_lists):
    """shard_map-able local probe + merge, generic over the scan body."""

    def local(probe, *arrs):
        rep, buckets = arrs[:nrep], arrs[nrep:]
        base = jax.lax.axis_index(DATA_AXIS) * shard_lists
        in_shard = (probe >= base) & (probe < base + shard_lists)  # [Q, np]
        lp = jnp.clip(probe - base, 0, shard_lists - 1)
        body = body_factory(*rep, *buckets)

        def rank(xs):
            pg, pl, ins = xs  # [Q] each
            d, ids = body(pg, pl)
            return (
                jnp.where(ins[:, None], d, jnp.inf),
                jnp.where(ins[:, None], ids, -1),
            )

        li, ld = _merge_probe_topk(
            rank, Q, nprobe, k, (probe.T, lp.T, in_shard.T)
        )
        all_d = jax.lax.all_gather(ld, DATA_AXIS)  # [D, Q, k]
        all_i = jax.lax.all_gather(li, DATA_AXIS)
        cat_d = jnp.moveaxis(all_d, 0, 1).reshape(Q, -1)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(Q, -1)
        neg2, pos2 = jax.lax.top_k(-cat_d, k)
        return jnp.take_along_axis(cat_i, pos2, axis=1), -neg2

    return local


def _run(local, mesh, nrep, nbuckets, probe, rep, buckets):
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(),) + (P(),) * nrep + (P(DATA_AXIS),) * nbuckets,
        out_specs=(P(), P()),
        check_vma=False,
    )(probe, *rep, *buckets)


@functools.partial(
    jax.jit, static_argnames=("nprobe", "k", "cap", "metric", "mesh")
)
def _sharded_flat_jit(
    q, coarse, ids, rows, sqn, chains, nprobe, k, cap, metric, mesh
):
    Q = q.shape[0]
    probe, _ = _coarse_probe(q, coarse, nprobe, metric)
    qn2 = jnp.sum(q * q, axis=-1)

    def factory(q_, qn2_, i, r, s, ch_):
        return _flat_scan_body(q_, qn2_, metric, r, s, i, ch_, cap)

    local = _local_scan(
        factory, 2, Q, nprobe, k, chains.shape[0] // mesh.shape[DATA_AXIS]
    )
    return _run(
        local, mesh, 2, 4, probe, (q, qn2), (ids, rows, sqn, chains)
    )


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "k", "cap", "metric", "by_residual", "mesh"),
)
def _sharded_sq_jit(
    q, coarse, lo, step, ids, codes, sqn, chains,
    nprobe, k, cap, metric, by_residual, mesh,
):
    Q = q.shape[0]
    probe, qc = _coarse_probe(q, coarse, nprobe, metric)

    def factory(q_, qc_, coarse_, lo_, step_, i, c, s, ch_):
        return _sq_scan_body(
            q_, qc_, coarse_, lo_, step_, metric, by_residual,
            c, s, i, ch_, cap,
        )

    local = _local_scan(
        factory, 5, Q, nprobe, k, chains.shape[0] // mesh.shape[DATA_AXIS]
    )
    return _run(
        local, mesh, 5, 4, probe, (q, qc, coarse, lo, step),
        (ids, codes, sqn, chains),
    )


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "k", "cap", "metric", "by_residual", "mesh"),
)
def _sharded_rq_jit(
    q, coarse, codebooks, ids, codes, sqn, cross, chains,
    nprobe, k, cap, metric, by_residual, mesh,
):
    Q = q.shape[0]
    probe, qc = _coarse_probe(q, coarse, nprobe, metric)
    qn2 = jnp.sum(q * q, axis=-1)
    cc = jnp.sum(coarse * coarse, axis=-1)
    tables = jnp.einsum(
        "qd,skd->qsk", q, codebooks,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    def factory(q_, qn2_, qc_, cc_, tab_, i, c, s, x, ch_):
        return _rq_scan_body(
            q_, qn2_, qc_, cc_, tab_, metric, by_residual,
            c, s, x, i, ch_, cap,
        )

    local = _local_scan(
        factory, 5, Q, nprobe, k, chains.shape[0] // mesh.shape[DATA_AXIS]
    )
    return _run(
        local, mesh, 5, 5, probe,
        (q, qn2, qc, cc, tables), (ids, codes, sqn, cross, chains),
    )


@functools.partial(
    jax.jit, static_argnames=("nprobe", "k", "cap", "mesh")
)
def _sharded_binary_jit(
    q, qp, coarse, ids, codes, chains, nprobe, k, cap, mesh
):
    Q = q.shape[0]
    probe, _ = _coarse_probe(q, coarse, nprobe, "l2")

    def factory(qp_, i, c, ch_):
        return _binary_scan_body(qp_, c, i, ch_, cap)

    local = _local_scan(
        factory, 1, Q, nprobe, k, chains.shape[0] // mesh.shape[DATA_AXIS]
    )
    return _run(local, mesh, 1, 3, probe, (qp,), (ids, codes, chains))


def sharded_ivf_scan_search(
    index,
    queries,
    k: int = 10,
    *,
    nprobe: int = 8,
    mesh: Optional[Mesh] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Search an :class:`IVFFlatIndex` / :class:`IVFSQIndex` /
    :class:`IVFRQIndex` / :class:`IVFBinaryIndex` with its inverted
    lists sharded over the mesh's
    data axis — same results as ``index.search`` up to EXACT-distance
    ties that straddle shards (the single-device merge prefers earlier
    probe ranks, the cross-shard merge prefers lower device indices;
    distances always agree).

    Same contract as the single-device search: squared-L2 ascending with
    ``inf`` pads for ``metric="l2"``, inner-product scores descending
    with ``-inf`` pads for ``metric="dot"``; ids of −1 mean fewer than
    ``k`` candidates existed in the probed lists.
    """
    fn, arrays = sharded_scan_search_core(
        index, int(k), nprobe=nprobe, mesh=mesh
    )
    q = jnp.asarray(queries, jnp.float32)
    if q.ndim == 1:
        q = q[None, :]
    if q.shape[1] != index.dim:
        raise DimensionMismatch(expected=index.dim, found=q.shape[1])
    return fn(q, *arrays)


def sharded_scan_search_core(
    index,
    k: int,
    *,
    nprobe: int = 8,
    mesh: Optional[Mesh] = None,
):
    """:func:`sharded_ivf_scan_search` as a traceable ``(fn, arrays)``
    pair — the multi-chip analog of the indexes' ``_search_core``. Feed
    it to :meth:`vq_tpu.serving.BatchPipeline.from_core` to chain many
    query batches into one sharded dispatch. The bucket arrays come back
    mesh-placed (cached on the index per bucket build)."""
    if not isinstance(
        index, (IVFFlatIndex, IVFSQIndex, IVFRQIndex, IVFBinaryIndex)
    ):
        raise TypeError(
            "sharded_ivf_scan_search serves IVFFlatIndex / IVFSQIndex / "
            f"IVFRQIndex / IVFBinaryIndex; got {type(index).__name__} "
            "(use sharded_ivf_search for IVFPQIndex)"
        )
    if index._flat_lists is None:
        raise EmptyInput("index is empty — add() vectors first")
    if mesh is None:
        mesh = make_mesh()
    k = int(k)
    nprobe = min(int(nprobe), index.nlist)
    metric = index.metric
    coarse = index.coarse

    if isinstance(index, IVFFlatIndex):
        sharded, cap = _shard_lists(mesh, index, ("rows", "sqn"))
        kk = min(k, nprobe * int(sharded[-1].shape[1]) * index._pool.ch)

        def scan(q, ids, rows, sqn, chains):
            return _sharded_flat_jit(
                q, coarse, ids, rows, sqn, chains,
                nprobe, kk, cap, metric, mesh,
            )

    elif isinstance(index, IVFSQIndex):
        sharded, cap = _shard_lists(mesh, index, ("codes", "sqn"))
        kk = min(k, nprobe * int(sharded[-1].shape[1]) * index._pool.ch)
        lo, step, by_res = index.sq.mins, index.sq.steps, index.by_residual

        def scan(q, ids, codes, sqn, chains):
            return _sharded_sq_jit(
                q, coarse, lo, step, ids, codes, sqn, chains,
                nprobe, kk, cap, metric, by_res, mesh,
            )

    elif isinstance(index, IVFRQIndex):
        sharded, cap = _shard_lists(
            mesh, index, ("codes", "sqn", "cross")
        )
        kk = min(k, nprobe * int(sharded[-1].shape[1]) * index._pool.ch)
        cbs, by_res = index.rq.codebooks, index.by_residual

        def scan(q, ids, codes, sqn, cross, chains):
            return _sharded_rq_jit(
                q, coarse, cbs, ids, codes, sqn, cross, chains,
                nprobe, kk, cap, metric, by_res, mesh,
            )

    else:  # IVFBinaryIndex — guarded above
        sharded, cap = _shard_lists(mesh, index, ("codes",))
        kk = min(k, nprobe * int(sharded[-1].shape[1]) * index._pool.ch)
        bq = index.bq

        def scan(q, ids, codes, chains):
            qp = bq.quantize_packed(q)
            return _sharded_binary_jit(
                q, qp, coarse, ids, codes, chains, nprobe, kk, cap, mesh
            )

    def fn(q, *arrs):
        out_i, out_d = scan(q, *arrs)
        out_i = jnp.where(jnp.isinf(out_d), -1, out_i)
        if out_i.shape[1] < k:  # pool smaller than k: pad the contract
            pad = k - out_i.shape[1]
            out_i = jnp.pad(out_i, ((0, 0), (0, pad)), constant_values=-1)
            out_d = jnp.pad(
                out_d, ((0, 0), (0, pad)), constant_values=jnp.inf
            )
        if metric == "dot":
            out_d = -out_d  # back to descending scores; pads become -inf
        return out_i, out_d

    return fn, tuple(sharded)
