"""Multi-device IVF-Flat/SQ/RQ/Binary search — lists sharded on the mesh.

The same serving layout as :func:`vq_tpu.parallel.ivf.sharded_ivf_search`
(IVF-PQ), generalized to the whole IVF coding ladder: bucket arrays are
sharded along the ``nlist`` axis, the coarse centroids / quantizer
parameters / queries replicate, and each device scans only the probed
lists that live in its shard (out-of-shard probe slots masked to +inf)
before one ``[Q, k]`` ``all_gather`` + re-top-k merge. Communication is
O(devices · Q · k), independent of corpus size.

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


def _shard_lists(mesh: Mesh, index, ids, *payloads):
    """Pad ``nlist`` to a multiple of the data-axis size and place every
    bucket array list-sharded. Pad lists are empty (ids −1). The sharded
    placement is cached on the index per (mesh, bucket build) — serving
    loops must not re-broadcast the whole bucket structure every batch."""
    cache = getattr(index, "_shard_cache", None)
    if (
        cache is not None
        and cache[0] is mesh
        and cache[1] is ids  # _build_buckets caches; identity = same build
    ):
        return cache[2]
    ndev = mesh.shape[DATA_AXIS]
    nlist = jnp.asarray(ids).shape[0]
    pad = (-nlist) % ndev
    out = []
    for pos, arr in enumerate((ids, *payloads)):
        arr = jnp.asarray(arr)
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
            arr = jnp.pad(
                arr, widths, constant_values=-1 if pos == 0 else 0
            )
        out.append(jax.device_put(arr, NamedSharding(mesh, P(DATA_AXIS))))
    index._shard_cache = (mesh, ids, out)
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
    jax.jit, static_argnames=("nprobe", "k", "metric", "mesh")
)
def _sharded_flat_jit(q, coarse, rows, sqn, ids, nprobe, k, metric, mesh):
    Q = q.shape[0]
    probe, _ = _coarse_probe(q, coarse, nprobe, metric)
    qn2 = jnp.sum(q * q, axis=-1)
    def factory(q_, qn2_, r, s, i):
        return _flat_scan_body(q_, qn2_, metric, r, s, i)

    local = _local_scan(
        factory, 2, Q, nprobe, k, ids.shape[0] // mesh.shape[DATA_AXIS]
    )
    return _run(local, mesh, 2, 3, probe, (q, qn2), (rows, sqn, ids))


@functools.partial(
    jax.jit, static_argnames=("nprobe", "k", "metric", "by_residual", "mesh")
)
def _sharded_sq_jit(
    q, coarse, lo, step, codes, sqn, ids, nprobe, k, metric, by_residual, mesh
):
    Q = q.shape[0]
    probe, qc = _coarse_probe(q, coarse, nprobe, metric)

    def factory(q_, qc_, coarse_, lo_, step_, c, s, i):
        return _sq_scan_body(
            q_, qc_, coarse_, lo_, step_, metric, by_residual, c, s, i
        )

    local = _local_scan(
        factory, 5, Q, nprobe, k, ids.shape[0] // mesh.shape[DATA_AXIS]
    )
    return _run(
        local, mesh, 5, 3, probe, (q, qc, coarse, lo, step), (codes, sqn, ids)
    )


@functools.partial(
    jax.jit, static_argnames=("nprobe", "k", "metric", "by_residual", "mesh")
)
def _sharded_rq_jit(
    q, coarse, codebooks, codes, sqn, cross, ids,
    nprobe, k, metric, by_residual, mesh,
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

    def factory(q_, qn2_, qc_, cc_, tab_, c, s, x, i):
        return _rq_scan_body(
            q_, qn2_, qc_, cc_, tab_, metric, by_residual, c, s, x, i
        )

    local = _local_scan(
        factory, 5, Q, nprobe, k, ids.shape[0] // mesh.shape[DATA_AXIS]
    )
    return _run(
        local, mesh, 5, 4, probe,
        (q, qn2, qc, cc, tables), (codes, sqn, cross, ids),
    )


@functools.partial(
    jax.jit, static_argnames=("nprobe", "k", "mesh")
)
def _sharded_binary_jit(q, qp, coarse, codes, ids, nprobe, k, mesh):
    Q = q.shape[0]
    probe, _ = _coarse_probe(q, coarse, nprobe, "l2")

    def factory(qp_, c, i):
        return _binary_scan_body(qp_, c, i)

    local = _local_scan(
        factory, 1, Q, nprobe, k, ids.shape[0] // mesh.shape[DATA_AXIS]
    )
    return _run(local, mesh, 1, 2, probe, (qp,), (codes, ids))


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
    buckets = index._build_buckets()
    k = int(k)
    nprobe = min(int(nprobe), index.nlist)
    pool = nprobe * int(buckets["ids"].shape[1])
    kk = min(k, pool)
    metric = index.metric
    coarse = index.coarse

    if isinstance(index, IVFFlatIndex):
        sharded = _shard_lists(
            mesh, index, buckets["ids"], buckets["rows"], buckets["sqn"]
        )

        def scan(q, ids, rows, sqn):
            return _sharded_flat_jit(
                q, coarse, rows, sqn, ids, nprobe, kk, metric, mesh
            )

    elif isinstance(index, IVFSQIndex):
        sharded = _shard_lists(
            mesh, index, buckets["ids"], buckets["codes"], buckets["sqn"]
        )
        lo, step, by_res = index.sq.mins, index.sq.steps, index.by_residual

        def scan(q, ids, codes, sqn):
            return _sharded_sq_jit(
                q, coarse, lo, step, codes, sqn, ids,
                nprobe, kk, metric, by_res, mesh,
            )

    elif isinstance(index, IVFRQIndex):
        sharded = _shard_lists(
            mesh, index, buckets["ids"], buckets["codes"], buckets["sqn"],
            buckets["cross"],
        )
        cbs, by_res = index.rq.codebooks, index.by_residual

        def scan(q, ids, codes, sqn, cross):
            return _sharded_rq_jit(
                q, coarse, cbs, codes, sqn, cross, ids,
                nprobe, kk, metric, by_res, mesh,
            )

    else:  # IVFBinaryIndex — guarded above
        sharded = _shard_lists(
            mesh, index, buckets["ids"], buckets["codes"]
        )
        bq = index.bq

        def scan(q, ids, codes):
            qp = bq.quantize_packed(q)
            return _sharded_binary_jit(
                q, qp, coarse, codes, ids, nprobe, kk, mesh
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
