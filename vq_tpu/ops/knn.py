"""Exact k-nearest-neighbor graph construction.

A standard corpus-level building block (clustering, dedup, graph-ANN
seeding, recall ground truth) with no reference counterpart. Built the
TPU way: the corpus scans itself through the same blockwise MXU scan as
:class:`~vq_tpu.search.FlatIndex`, one query tile at a time, so the
working set is ``[query_batch, chunk]`` regardless of n — an n x n
distance matrix never materializes (at n=1M it would be 4 TB).

Cost is the exact-scan O(n²d) — on one chip the 1M x 128 graph is
~2.2 min of MXU time at the measured flat-scan rate (~3000 QPS at
Q=128). For approximate graphs at larger n, search an IVF index instead.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vq_tpu.errors import InvalidParameter

__all__ = ["knn_graph"]


def knn_graph(
    data,
    k: int = 10,
    *,
    metric: str = "squared_euclidean",
    include_self: bool = False,
    query_batch: int = 1024,
    chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN graph over ``data`` rows.

    Returns ``(ids [n, k] int32, values [n, k])`` — ascending distances
    (or descending scores for ``metric="dot"``). ``include_self=False``
    (default) removes each row's self-match; with ``dot`` or duplicate
    rows the self-match is identified by id, not by value. ``ids`` of -1
    pad rows when fewer than k neighbors exist (n <= k).
    """
    from vq_tpu.search import FlatIndex

    x = jnp.asarray(data, jnp.float32)
    if x.ndim != 2 or x.shape[0] == 0:
        raise InvalidParameter("data", "expected a non-empty [n, d] array")
    k = int(k)
    if k < 1:
        raise InvalidParameter("k", "must be >= 1")
    n = x.shape[0]
    idx = FlatIndex.from_data(x, metric=metric)
    # fetch one extra so dropping the self-match still leaves k
    fetch = min(k + (0 if include_self else 1), n)
    qb = max(1, min(int(query_batch), n))

    out_ids, out_vals = [], []
    for start in range(0, n, qb):
        stop = min(start + qb, n)
        q = x[start:stop]
        if stop - start < qb:  # pad the tail tile to the compiled shape
            q = jnp.pad(q, ((0, qb - (stop - start)), (0, 0)))
        ids, vals = idx.search(q, k=fetch, chunk=chunk)
        ids, vals = ids[: stop - start], vals[: stop - start]
        if not include_self:
            rows = jnp.arange(start, stop, dtype=jnp.int32)[:, None]
            self_hit = ids == rows
            worst = -jnp.inf if metric == "dot" else jnp.inf
            vals = jnp.where(self_hit, worst, vals)
            ids = jnp.where(self_hit, -1, ids)
            key = -vals if metric == "dot" else vals
            order = jnp.argsort(key, axis=1, stable=True)[:, :k]
            ids = jnp.take_along_axis(ids, order, axis=1)
            vals = jnp.take_along_axis(vals, order, axis=1)
        ids, vals = ids[:, :k], vals[:, :k]
        if ids.shape[1] < k:  # n <= k: pad out the contract
            pad = k - ids.shape[1]
            worst = -jnp.inf if metric == "dot" else jnp.inf
            ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=worst)
        out_ids.append(ids)
        out_vals.append(vals)
    return jnp.concatenate(out_ids), jnp.concatenate(out_vals)
