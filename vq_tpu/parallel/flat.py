"""Multi-device flat search — index rows sharded across the mesh.

The flat indexes (:class:`~vq_tpu.search.PQIndex`,
:class:`~vq_tpu.search.SQIndex`, :class:`~vq_tpu.search.RQIndex`) scan
their whole corpus per query; when
the corpus outgrows one chip's HBM — or one chip's scan rate — the
TPU-native layout shards the **row axis** of the stored codes over the
mesh's data axis while queries and lookup tables (KB-scale) replicate:

1. **Local scan** — each device runs the exact single-device blockwise
   scan jit over its row shard (same math, same tie behavior), producing a
   local top-``k`` in shard-local coordinates.
2. **Merge** — one ``all_gather`` of the ``[Q, k]`` local winners (tiny,
   rides ICI) and a final top-k, after offsetting local ids to global.

Communication is O(devices * Q * k), independent of corpus size — the
same accumulate-then-reduce shape as the sharded trainer and the sharded
IVF search. The reference has no distributed anything (SURVEY.md §2.3);
this is north-star capability.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vq_tpu.errors import DimensionMismatch, EmptyInput, InvalidParameter
from vq_tpu.parallel.mesh import DATA_AXIS, make_mesh

__all__ = ["sharded_flat_search", "sharded_flat_search_core"]


def _shard_layout(n: int, ndev: int, chunk: int):
    """Rows-per-device and padded totals for a row-sharded corpus."""
    shard = -(-n // ndev)
    chunk_eff = min(int(chunk), shard)
    shard_pad = -(-shard // chunk_eff) * chunk_eff
    return shard_pad, chunk_eff


def _merge_topk(local_ids, local_d, k: int):
    """all_gather each device's [Q, k] winners and re-top-k (ascending)."""
    Q = local_ids.shape[0]
    all_d = jax.lax.all_gather(local_d, DATA_AXIS)  # [D, Q, k]
    all_i = jax.lax.all_gather(local_ids, DATA_AXIS)
    cat_d = jnp.moveaxis(all_d, 0, 1).reshape(Q, -1)
    cat_i = jnp.moveaxis(all_i, 0, 1).reshape(Q, -1)
    neg, pos = jax.lax.top_k(-cat_d, k)
    return jnp.take_along_axis(cat_i, pos, axis=1), -neg


@functools.partial(
    jax.jit,
    static_argnames=("k", "mesh", "metric", "pack_bits", "chunk"),
)
def _sharded_pq_search_jit(
    tables, cb_sqn, qn, codes, nvalid, k: int, mesh: Mesh, metric,
    pack_bits: int, chunk: int,
):
    from vq_tpu.models.pq import _adc_search_chunked_jit

    shard_pad = codes.shape[0] // mesh.shape[DATA_AXIS]

    def local(codes_shard):
        base = jax.lax.axis_index(DATA_AXIS) * shard_pad
        local_n = jnp.clip(nvalid - base, 0, shard_pad)
        chunks = codes_shard.reshape(-1, chunk, codes_shard.shape[1])
        ids, d = _adc_search_chunked_jit(
            tables, cb_sqn, qn, chunks, local_n, metric, k, pack_bits
        )
        gids = jnp.where(ids >= 0, base + ids, -1)
        return _merge_topk(gids, d, k)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS),),
        out_specs=(P(), P()),
        check_vma=False,
    )(codes)


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "metric", "chunk")
)
def _sharded_rq_search_jit(
    tables, qn2, codes, row_sqn, nvalid, k: int, mesh: Mesh, metric: str,
    chunk: int,
):
    from vq_tpu.search import _rq_scan_jit

    shard_pad = codes.shape[0] // mesh.shape[DATA_AXIS]

    def local(codes_shard, sqn_shard):
        base = jax.lax.axis_index(DATA_AXIS) * shard_pad
        local_n = jnp.clip(nvalid - base, 0, shard_pad)
        code_chunks = codes_shard.reshape(-1, chunk, codes_shard.shape[1])
        sqn_chunks = sqn_shard.reshape(-1, chunk)
        ids, d, _ = _rq_scan_jit(
            tables, qn2, code_chunks, sqn_chunks, local_n,
            jnp.float32(jnp.inf), metric, k,
        )
        gids = jnp.where(ids >= 0, base + ids, -1)
        return _merge_topk(gids, d, k)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )(codes, row_sqn)


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "metric", "chunk")
)
def _sharded_flatrows_search_jit(
    q, rows, row_sqn, nvalid, k: int, mesh: Mesh, metric: str, chunk: int
):
    from vq_tpu.search import _flat_scan_jit

    shard_pad = rows.shape[0] // mesh.shape[DATA_AXIS]

    def local(rows_shard, sqn_shard):
        base = jax.lax.axis_index(DATA_AXIS) * shard_pad
        local_n = jnp.clip(nvalid - base, 0, shard_pad)
        row_chunks = rows_shard.reshape(-1, chunk, rows_shard.shape[1])
        sqn_chunks = sqn_shard.reshape(-1, chunk)
        ids, d, _ = _flat_scan_jit(
            q, row_chunks, sqn_chunks, local_n,
            jnp.float32(jnp.inf), metric, k,
        )
        gids = jnp.where(ids >= 0, base + ids, -1)
        return _merge_topk(gids, d, k)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )(rows, row_sqn)


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "metric", "chunk", "pack_bits")
)
def _sharded_sq_search_jit(
    q, lo, step, codes, row_sqn, nvalid, k: int, mesh: Mesh, metric: str,
    chunk: int, pack_bits: int = 8,
):
    from vq_tpu.search import _sq_scan_jit

    shard_pad = codes.shape[0] // mesh.shape[DATA_AXIS]

    def local(codes_shard, sqn_shard):
        base = jax.lax.axis_index(DATA_AXIS) * shard_pad
        local_n = jnp.clip(nvalid - base, 0, shard_pad)
        code_chunks = codes_shard.reshape(-1, chunk, codes_shard.shape[1])
        sqn_chunks = sqn_shard.reshape(-1, chunk)
        ids, d, _ = _sq_scan_jit(
            q, lo, step, code_chunks, sqn_chunks, local_n,
            jnp.float32(jnp.inf), metric, k, pack_bits,
        )
        gids = jnp.where(ids >= 0, base + ids, -1)
        return _merge_topk(gids, d, k)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )(codes, row_sqn)



def sharded_flat_search(
    index,
    queries,
    k: int = 10,
    *,
    mesh: Optional[Mesh] = None,
    chunk: int = 262_144,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Search a flat index with its rows sharded over the mesh.

    Accepts a :class:`~vq_tpu.search.FlatIndex`,
    :class:`~vq_tpu.search.PQIndex` (packed or not),
    :class:`~vq_tpu.search.SQIndex`, or
    :class:`~vq_tpu.search.RQIndex`; returns the same ``(ids, values)``
    contract as the index's own ``search`` — ascending distances, or
    descending scores for ``metric="dot"`` — with identical results to
    the single-device scan. Ids of −1 pad out corpora smaller than
    ``k``. Exact rerank is a single-device post-step (gathering raw rows
    across shards would defeat the sharding); run
    ``index.search(..., rerank=R)`` when the corpus fits one device.
    """
    from vq_tpu.models.base import as_batch_f32
    from vq_tpu.search import FlatIndex, PQIndex, RQIndex, SQIndex

    # Validate BEFORE the core pads + places the corpus on the mesh —
    # a wrong-dim query must not cost a multi-hundred-MB transfer.
    if not isinstance(index, (FlatIndex, PQIndex, RQIndex, SQIndex)):
        raise InvalidParameter(
            "index",
            "sharded_flat_search supports FlatIndex, PQIndex, RQIndex, "
            "and SQIndex",
        )
    q2d, _ = as_batch_f32(queries)
    if q2d.shape[1] != index.dim:
        raise DimensionMismatch(expected=index.dim, found=q2d.shape[1])
    fn, arrays = sharded_flat_search_core(
        index, int(k), mesh=mesh, chunk=chunk
    )
    return fn(q2d, *arrays)


def sharded_flat_search_core(
    index,
    k: int,
    *,
    mesh: Optional[Mesh] = None,
    chunk: int = 262_144,
):
    """:func:`sharded_flat_search` as a traceable ``(fn, arrays)`` pair
    — the multi-chip analog of the indexes' ``_search_core``. The code
    rows come back mesh-placed; feed the pair to
    :meth:`vq_tpu.serving.BatchPipeline.from_core` to chain many query
    batches into one sharded dispatch. Per-query work (ADC tables, query
    norms) traces inside ``fn`` so the whole search is one program."""
    from vq_tpu.search import FlatIndex, PQIndex, RQIndex, SQIndex

    if not isinstance(index, (FlatIndex, PQIndex, RQIndex, SQIndex)):
        raise InvalidParameter(
            "index",
            "sharded_flat_search supports FlatIndex, PQIndex, RQIndex, "
            "and SQIndex",
        )
    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.shape[DATA_AXIS]
    n = index.ntotal
    if n == 0:
        raise EmptyInput("index is empty — add() vectors first")
    k = min(int(k), n)
    row_spec = NamedSharding(mesh, P(DATA_AXIS))
    shard_pad, chunk_eff = _shard_layout(n, ndev, chunk)
    pad = ndev * shard_pad - n
    nv = jnp.int32(n)

    if isinstance(index, PQIndex):
        from vq_tpu.models.pq import _adc_tables_jit

        metric = index.pq._metric
        pack_bits = int(index.pack_bits)
        codes = index._codes
        codes = (
            codes.astype(jnp.uint8) if pack_bits < 8
            else codes.astype(jnp.int32)
        )
        codes = jax.device_put(
            jnp.pad(codes, ((0, pad), (0, 0))), row_spec
        )

        # Quantizer params ride as ARGUMENTS (the _search_core / ivf-core
        # convention): jit-closure constants re-embed + recompile on
        # every pipeline rebuild.
        def fn(q, codes, cb):
            tables = _adc_tables_jit(q, cb, metric)
            cb_sqn = jnp.sum(cb * cb, axis=-1)
            qn = jnp.sqrt(jnp.sum(q * q, axis=-1))
            return _sharded_pq_search_jit(
                tables, cb_sqn, qn, codes, nv, k, mesh, metric,
                pack_bits, chunk_eff,
            )

        return fn, (codes, index.pq.codebooks)

    if isinstance(index, FlatIndex):
        metric = index.metric
        if metric == "manhattan":
            # [Q, chunk, d] broadcast per block
            shard_pad, chunk_eff = _shard_layout(n, ndev, min(chunk, 8_192))
            pad = ndev * shard_pad - n
        rows = jax.device_put(
            jnp.pad(index._rows, ((0, pad), (0, 0))), row_spec
        )
        row_sqn = jax.device_put(
            jnp.pad(index._row_sqn, (0, pad)), row_spec
        )

        def fn(q, rows, row_sqn):
            ids, d = _sharded_flatrows_search_jit(
                q, rows, row_sqn, nv, k, mesh, metric, chunk_eff
            )
            return (ids, -d) if metric == "dot" else (ids, d)

        return fn, (rows, row_sqn)

    codes = jax.device_put(
        jnp.pad(index._codes, ((0, pad), (0, 0))), row_spec
    )
    row_sqn = jax.device_put(
        jnp.pad(index._row_sqn, (0, pad)), row_spec
    )
    metric = index.metric

    if isinstance(index, RQIndex):
        from vq_tpu.search import _rq_tables_jit

        def fn(q, codes, row_sqn, cbs):
            tables = _rq_tables_jit(q, cbs, metric)
            qn2 = jnp.sum(q * q, axis=-1)
            ids, d = _sharded_rq_search_jit(
                tables, qn2, codes, row_sqn, nv, k, mesh, metric,
                chunk_eff,
            )
            return (ids, -d) if metric == "dot" else (ids, d)

        return fn, (codes, row_sqn, index.rq.codebooks)

    # SQIndex
    pack_bits = int(index.pack_bits)

    def fn(q, codes, row_sqn, lo, step):
        ids, d = _sharded_sq_search_jit(
            q, lo, step, codes, row_sqn, nv, k, mesh, metric,
            chunk_eff, pack_bits,
        )
        return (ids, -d) if metric == "dot" else (ids, d)

    return fn, (codes, row_sqn, index.sq.mins, index.sq.steps)
