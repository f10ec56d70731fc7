"""GraphIndex: TPU-native navigating-graph ANN search (Vamana/DiskANN
family — the faiss ``IndexHNSW`` role).

Graph methods are usually written as pointer-chasing with dynamic
visited sets — the least TPU-shaped code imaginable. This module keeps
the *math* of Vamana (alpha-pruned navigable graph + best-first beam
search) but restructures both phases as fixed-shape dataflow:

**Build** (:meth:`GraphIndex.build`):

1. k-NN candidates per node — exact (:func:`vq_tpu.ops.knn.knn_graph`,
   one MXU scan) for small corpora, IVF-assisted for large ones (the
   corpus queries its own :class:`~vq_tpu.ivf_flat.IVFFlatIndex`; the
   probe kernel does the heavy lifting).
2. **Alpha-pruning (robust prune)**, vectorized: for a chunk of nodes,
   gather the ``[C, R0, d]`` candidate vectors, form the ``[C, R0, R0]``
   candidate-pairwise distances with one batched matmul, then run the
   greedy dominance scan as a ``lax.fori_loop`` over the R0 ranks with
   ``[C, R0]`` boolean state — the classic sequential prune, applied to
   every node in the chunk at once. A candidate ``v`` is pruned when a
   kept closer candidate ``u`` has ``alpha * d(u, v) <= d(p, v)``.
3. Reverse edges via the same sort+scatter bucket packing the IVF
   indexes use (no host round-trip); the final adjacency is
   ``[n, 2*degree]`` = forward ∪ reverse, −1-padded.

**Search** (:meth:`GraphIndex.search`): batched best-first beam search,
one jit, no data-dependent shapes: a ``[Q, L]`` candidate pool, a
``[Q, T*B]`` visited list, and T fixed expansion steps. Each step picks
the best B unvisited pool entries (top-k over a masked pool), gathers
their ``[Q, B*deg]`` neighbor ids, computes distances with one batched
matmul, and merges via sort-based dedup (``jnp.lexsort`` by (id, d),
mask adjacent duplicates, re-top-L). Every query in the batch walks the
graph simultaneously; per-step work is a few hundred lanes per query, so
the whole beam search is latency- not bandwidth-bound — the regime graphs
win in.

No reference counterpart (the reference has no index layer); the faiss
analog is ``IndexHNSWFlat``. L2 metric (graph navigability is defined by
the build metric; for cosine, L2-normalize first — see
``NormalizeTransform``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.errors import (
    DimensionMismatch,
    EmptyInput,
    InvalidData,
    InvalidParameter,
)
from vq_tpu.utils.serialize import _from_npz, _to_npz

__all__ = ["GraphIndex"]

_STORE_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


# ---------------------------------------------------------------------------
# Build: vectorized robust prune
# ---------------------------------------------------------------------------


@jax.jit
def _augment_candidates_chunk(
    node_rows: jnp.ndarray,  # [C, d] f32
    node_ids: jnp.ndarray,  # [C] int32
    knn_ids: jnp.ndarray,  # [C, R0] int32, -1 pad
    knn_d: jnp.ndarray,  # [C, R0] f32
    rand_ids: jnp.ndarray,  # [C, Rr] int32
    rand_rows: jnp.ndarray,  # [C, Rr, d] f32
):
    """Merge k-NN candidates with random long-range candidates, sorted by
    distance with duplicates (and the node itself) masked out.

    A pure k-NN graph over clustered data is DISCONNECTED — every
    neighbor of every node sits inside the node's own cluster and beam
    search can never leave the entry's basin. Random candidates give the
    alpha-prune long edges to choose from: a faraway candidate ``v`` has
    ``d(u, v) ≈ d(p, v)`` for every kept near-``p`` ``u``, so with
    ``alpha > 1`` it is never dominated and at least one shortcut per
    node survives — the small-world wiring NSW/Vamana rely on.
    """
    rn = jnp.sum(rand_rows * rand_rows, axis=-1)
    qy = jnp.einsum(
        "cd,crd->cr", node_rows, rand_rows,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    nn2 = jnp.sum(node_rows * node_rows, axis=-1)
    rd = jnp.maximum(nn2[:, None] - 2.0 * qy + rn, 0.0)
    # −1 pads carry row-0's rows (callers gather with max(id, 0)) and
    # would otherwise enter the sort with a FINITE distance — ahead of
    # real neighbors — and survive the underfull fast path downstream
    # (review round 3: remove_ids could wipe a survivor's adjacency when
    # row 0 was closer than its real neighbors).
    rd = jnp.where(
        (rand_ids == node_ids[:, None]) | (rand_ids < 0), jnp.inf, rd
    )

    cat_i = jnp.concatenate([knn_ids, rand_ids], axis=1)
    cat_d = jnp.concatenate([knn_d, rd], axis=1)
    order = jnp.argsort(cat_d, axis=1)
    si = jnp.take_along_axis(cat_i, order, axis=1)
    sd = jnp.take_along_axis(cat_d, order, axis=1)
    # Mask later copies of duplicate ids (M is small: O(M²) compare).
    M = si.shape[1]
    eq = si[:, None, :] == si[:, :, None]  # [C, j, i]
    earlier = (
        jnp.arange(M)[None, :] < jnp.arange(M)[:, None]
    )  # [j, i]: i < j
    dup = jnp.any(eq & earlier[None], axis=-1) & (si >= 0)
    sd = jnp.where(dup, jnp.inf, sd)
    si = jnp.where(dup | jnp.isinf(sd), -1, si)
    return si, sd


@functools.partial(jax.jit, static_argnames=("R",))
def _robust_prune_chunk(
    node_rows: jnp.ndarray,  # [C, d] f32
    cand_ids: jnp.ndarray,  # [C, R0] int32 ascending-by-distance, -1 pad
    cand_d: jnp.ndarray,  # [C, R0] f32 d(p, cand), inf at pads
    cand_rows: jnp.ndarray,  # [C, R0, d] f32
    alpha: jnp.ndarray,  # [] f32
    R: int,
):
    """Vamana robust prune for a chunk of nodes at once -> [C, R] ids.

    Kept edges are the greedy alpha-dominant set; if fewer than R
    survive, backfills with the nearest pruned candidates (standard
    practice — a full graph navigates better than a sparse one).
    """
    C, R0 = cand_ids.shape
    valid = cand_ids >= 0

    # Candidate-pairwise squared distances [C, R0, R0] (one batched matmul).
    cc = jnp.sum(cand_rows * cand_rows, axis=-1)  # [C, R0]
    dots = jnp.einsum(
        "crd,csd->crs", cand_rows, cand_rows,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    pd = jnp.maximum(cc[:, :, None] - 2.0 * dots + cc[:, None, :], 0.0)

    ranks = jnp.arange(R0)

    def step(j, state):
        pruned, keep = state
        active = (~pruned[:, j]) & valid[:, j]  # [C]
        keep = keep.at[:, j].set(active)
        # u = candidate j dominates v when alpha*d(u,v) <= d(p,v).
        dom = (alpha * pd[:, j, :] <= cand_d) & (ranks[None, :] > j)
        pruned = pruned | (dom & active[:, None])
        return pruned, keep

    pruned0 = ~valid
    keep0 = jnp.zeros((C, R0), bool)
    _, keep = jax.lax.fori_loop(0, R0, step, (pruned0, keep0))

    # Kept first (distance order), then pruned (distance order), pads last.
    priority = jnp.where(keep, ranks[None, :], ranks[None, :] + R0)
    priority = jnp.where(valid, priority, 3 * R0)
    order = jnp.argsort(priority, axis=1)[:, :R]
    out = jnp.take_along_axis(cand_ids, order, axis=1)
    out_ok = jnp.take_along_axis(valid, order, axis=1)
    return jnp.where(out_ok, out, -1)


@functools.partial(jax.jit, static_argnames=("R", "R_far", "C"))
def _prune_all_jit(x, cand_ids, cand_d, rand_all, a2, R: int, R_far: int, C: int):
    """Augment + robust-prune every node in one dispatch: lax.scan over
    node chunks of ``C`` (per-chunk shapes stay VMEM/compile-friendly),
    returning the ``[n, R + R_far]`` forward adjacency."""
    n = x.shape[0]
    pad = (-n) % C
    ids_p = jnp.pad(cand_ids, ((0, pad), (0, 0)), constant_values=-1)
    d_p = jnp.pad(cand_d, ((0, pad), (0, 0)), constant_values=jnp.inf)
    rand_p = jnp.pad(rand_all, ((0, pad), (0, 0)), constant_values=-1)
    node_p = jnp.pad(x, ((0, pad), (0, 0)))
    nid_p = jnp.pad(
        jnp.arange(n, dtype=jnp.int32), (0, pad), constant_values=-1
    )
    nb = (n + pad) // C

    def body(_, xs):
        node_c, nid_c, ids_c, d_c, rand_c = xs
        ids_c, d_c = _augment_candidates_chunk(
            node_c, nid_c, ids_c, d_c, rand_c,
            jnp.take(x, jnp.maximum(rand_c, 0), axis=0),
        )
        rows_c = jnp.take(x, jnp.maximum(ids_c, 0), axis=0)
        out = _robust_prune_chunk(node_c, ids_c, d_c, rows_c, a2, R)
        if R_far:
            far = jnp.where(
                rand_c[:, :R_far] == nid_c[:, None], -1, rand_c[:, :R_far]
            )
            out = jnp.concatenate([out, far], axis=1)
        return None, out

    _, fwd = jax.lax.scan(
        body,
        None,
        (
            node_p.reshape(nb, C, -1),
            nid_p.reshape(nb, C),
            ids_p.reshape(nb, C, -1),
            d_p.reshape(nb, C, -1),
            rand_p.reshape(nb, C, -1),
        ),
    )
    return fwd.reshape(nb * C, -1)[:n]


@jax.jit
def _ids_dist_jit(node_rows, ids, gathered_rows):
    """Squared-L2 of each node to its gathered candidate rows
    (``[C, d]`` × ``[C, M, d]`` → ``[C, M]``), ``inf`` at −1 ids."""
    rn = jnp.sum(gathered_rows * gathered_rows, axis=-1)
    qy = jnp.einsum(
        "cd,cmd->cm", node_rows, gathered_rows,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    nn = jnp.sum(node_rows * node_rows, axis=-1)
    d = jnp.maximum(nn[:, None] - 2.0 * qy + rn, 0.0)
    return jnp.where(ids >= 0, d, jnp.inf)


def _reverse_edges(fwd: jnp.ndarray, n: int, cap: int) -> jnp.ndarray:
    """[n, R] forward edges -> [n, cap] reverse edges (who points at me),
    via the shared sort+scatter bucket packing (device-resident)."""
    from vq_tpu.ivf_flat import _pack_buckets_jit

    R = fwd.shape[1]
    src = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, R)
    ).reshape(-1)
    dst = fwd.reshape(-1)
    # Route -1 (pad) edges to a scratch bucket n, sliced off below.
    lists = jnp.where(dst >= 0, dst, n)
    (packed,), _ = _pack_buckets_jit(
        lists, (src[:, None],), n + 1, cap
    )
    # Bucket payload order is stable by flat edge index; ids come from the
    # packed "ids" slot of the same call — but we want the src payload.
    rev = packed[:n, :, 0]
    counts = jnp.bincount(lists, length=n + 1)[:n]
    pos = jnp.arange(cap)[None, :]
    return jnp.where(pos < counts[:, None], rev, -1)


# ---------------------------------------------------------------------------
# Search: batched best-first beam
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("e_top",))
def _entry_select_jit(q, rows, sqn, sample, e_top: int):
    """Per-query entry points: brute-force the sampled routing set (one
    [Q, S] matmul) and take the nearest ``e_top`` — a flattened HNSW
    hierarchy. With S ~ thousands the sample covers every basin of a
    clustered corpus, so beam search starts next to the answer instead
    of routing across the whole graph through shortcut edges."""
    srows = jnp.take(rows, sample, axis=0).astype(jnp.float32)
    qy = jax.lax.dot_general(
        q, srows, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = jnp.take(sqn, sample)[None, :] - 2.0 * qy  # + qn² (argmin-invariant)
    _, pos = jax.lax.top_k(-d, e_top)
    return jnp.take(sample, pos)  # [Q, e_top]


@functools.partial(jax.jit, static_argnames=("k", "L", "T", "B"))
def _graph_search_jit(
    q: jnp.ndarray,  # [Q, d] f32
    rows: jnp.ndarray,  # [n, d] stored width
    sqn: jnp.ndarray,  # [n] f32 stored-row norms
    graph: jnp.ndarray,  # [n, deg] int32, -1 pad
    entry: jnp.ndarray,  # [Q, e] int32 per-query entry ids
    k: int,
    L: int,
    T: int,
    B: int,
):
    Q, d = q.shape
    deg = graph.shape[1]
    qn2 = jnp.sum(q * q, axis=-1)  # [Q]

    def dist_to(ids):  # [Q, M] -> [Q, M] squared-L2, inf at -1
        r = jnp.take(rows, jnp.maximum(ids, 0), axis=0).astype(
            jnp.float32
        )  # [Q, M, d]
        qy = jnp.einsum(
            "qd,qmd->qm", q, r,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dd = qn2[:, None] - 2.0 * qy + jnp.take(
            sqn, jnp.maximum(ids, 0), axis=0
        )
        return jnp.where(ids >= 0, jnp.maximum(dd, 0.0), jnp.inf)

    # Entry set deduped ONCE (lexsort by (id, d), keep best copy). The
    # pool then stays duplicate-free by invariant: each step masks new
    # neighbors already in the pool, already visited, or repeated within
    # the step — pure elementwise compares (no per-step sort, which
    # dominated the device profile of the sort-based formulation).
    e = min(entry.shape[1], L)
    pool_i = jnp.full((Q, L), -1, jnp.int32)
    pool_i = pool_i.at[:, :e].set(entry[:, :e])
    pool_d = dist_to(pool_i)
    order = jnp.lexsort((pool_d, pool_i), axis=1)
    si = jnp.take_along_axis(pool_i, order, axis=1)
    sd = jnp.take_along_axis(pool_d, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((Q, 1), bool), (si[:, 1:] == si[:, :-1])], axis=1
    ) & (si >= 0)
    neg, pos = jax.lax.top_k(-jnp.where(dup, jnp.inf, sd), L)
    pool_i = jnp.take_along_axis(jnp.where(dup, -1, si), pos, axis=1)
    pool_d = -neg
    visited = jnp.full((Q, T * B), -1, jnp.int32)

    BD = B * deg
    tri = (
        jnp.arange(BD)[None, :] < jnp.arange(BD)[:, None]
    )  # [j, i]: i earlier than j

    def step(carry, t):
        pool_i, pool_d, visited = carry
        seen = jnp.any(
            pool_i[:, :, None] == visited[:, None, :], axis=-1
        )  # [Q, L]
        open_d = jnp.where(seen | (pool_i < 0), jnp.inf, pool_d)
        _, sel = jax.lax.top_k(-open_d, B)  # [Q, B] pool positions
        picked = jnp.take_along_axis(pool_i, sel, axis=1)  # [Q, B]
        picked_open = jnp.take_along_axis(open_d, sel, axis=1) < jnp.inf
        picked = jnp.where(picked_open, picked, -1)
        visited = jax.lax.dynamic_update_slice(
            visited, picked, (0, t * B)
        )
        nbrs = jnp.take(
            graph, jnp.maximum(picked, 0), axis=0
        )  # [Q, B, deg]
        nbrs = jnp.where(
            picked_open[:, :, None], nbrs, -1
        ).reshape(Q, BD)
        # Mask already-known ids before they enter the pool.
        in_pool = jnp.any(
            nbrs[:, :, None] == pool_i[:, None, :], axis=-1
        )
        in_vis = jnp.any(
            nbrs[:, :, None] == visited[:, None, :], axis=-1
        )
        dup_new = jnp.any(
            (nbrs[:, :, None] == nbrs[:, None, :]) & tri[None], axis=-1
        )
        fresh = ~(in_pool | in_vis | dup_new) & (nbrs >= 0)
        nd = jnp.where(fresh, dist_to(nbrs), jnp.inf)
        nbrs = jnp.where(fresh, nbrs, -1)
        cat_d = jnp.concatenate([pool_d, nd], axis=1)
        cat_i = jnp.concatenate([pool_i, nbrs], axis=1)
        neg, pos = jax.lax.top_k(-cat_d, L)
        return (
            jnp.take_along_axis(cat_i, pos, axis=1), -neg, visited
        ), None

    (pool_i, pool_d, _), _ = jax.lax.scan(
        step, (pool_i, pool_d, visited), jnp.arange(T)
    )
    neg, pos = jax.lax.top_k(-pool_d, k)
    return jnp.take_along_axis(pool_i, pos, axis=1), -neg


def _search_driver(
    q, rows, sqn, graph, sample, static_entry, ntotal: int,
    k: int, beam: int, iters, picks_per_iter: int,
):
    """Shared entry-select + beam-search wrapper (parameter resolution,
    per-query entries, k-padding). Used by both :meth:`GraphIndex.search`
    and the query-sharded multi-chip path so their behavior cannot
    drift — the arrays may carry any placement/sharding."""
    L = max(beam, k)
    B = max(1, min(picks_per_iter, L))  # top_k(B) runs on an [Q, L] pool
    T = int(iters) if iters is not None else max(4, -(-3 * L // (2 * B)))
    k_eff = min(k, ntotal)
    e_top = min(8, int(sample.shape[0]))
    near = _entry_select_jit(
        q, rows, sqn, sample, e_top
    )  # [Q, e_top] basin-covering entries
    entry = jnp.concatenate(
        [
            near,
            jnp.broadcast_to(
                static_entry[None, :], (q.shape[0], static_entry.shape[0])
            ),
        ],
        axis=1,
    )
    ids, dist = _graph_search_jit(
        q, rows, sqn, graph, entry, k_eff, L, T, B
    )
    if k_eff < k:
        pad = k - k_eff
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        dist = jnp.pad(dist, ((0, 0), (0, pad)), constant_values=jnp.inf)
    return ids, dist


@jax.jit
def _concentration_stat_jit(srows: jnp.ndarray) -> jnp.ndarray:
    """Mean 1-NN / mean pairwise Euclidean distance within a row sample.

    The cluster-concentration statistic behind the build-time regime
    guardrail: on concentrated well-separated clusters every sample
    point's 1-NN is a same-cluster row (tiny distance) while the mean
    pairwise distance is dominated by cluster separation (huge).
    Measured 0.06-0.16 on tight-cluster corpora (noise 0.15, 16-1000
    clusters, d 32-128) vs 0.36-0.48 on the smooth benchmark regime
    (noise 1.0) and >= 0.50 on unstructured data. Chosen over the
    1-NN/10-NN ratio the round-3 verdict sketched because that one goes
    blind whenever the sample holds >= 10 rows per cluster (both
    quantiles land intra-cluster: 0.80 tight AND smooth at 100
    clusters). Self-distance excluded.
    """
    S = srows.shape[0]
    sq = jnp.sum(srows * srows, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (srows @ srows.T)
    d2 = jnp.maximum(d2, 0.0)
    d2 = d2.at[jnp.arange(S), jnp.arange(S)].set(jnp.inf)
    d1 = jnp.sqrt(jnp.min(d2, axis=1))  # 1-NN within the sample
    dmean = jnp.sum(jnp.where(jnp.isinf(d2), 0.0, jnp.sqrt(
        jnp.where(jnp.isinf(d2), 0.0, d2)
    ))) / (S * (S - 1))
    return jnp.mean(d1) / jnp.maximum(dmean, 1e-30)


# Warn below this ratio (log-midpoint between the worst measured
# tight-cluster value 0.163 and the best smooth value 0.361, with margin
# for sampling noise).
_CONCENTRATION_WARN = 0.25
# Statistic is too noisy / the regime question moot below this size.
_CONCENTRATION_MIN_ROWS = 10_000


class GraphIndex:
    """Navigable-graph ANN index (Vamana-style build, batched beam
    search). Build once with :meth:`build`; no incremental ``add`` —
    graph quality comes from the global prune (rebuild to grow, or use
    an IVF index for append-heavy workloads).

    ``regime_warning`` (set by :meth:`build`, persisted by
    :meth:`save`) is non-None when the corpus showed heavy cluster
    concentration at build time — the documented failure regime where
    beam search cannot recover the exact k-NN inside near-equidistant
    clusters (recall@10 0.570 on the tight benchmark corpus vs 0.976
    smooth, docs/performance.md) and an IVF index is the right tool.
    """

    def __init__(
        self,
        rows,
        graph,
        entry,
        *,
        sample=None,
        store_dtype: str = "float32",
        alpha: float = 1.2,
        regime_warning: Optional[str] = None,
    ):
        self._rows = jnp.asarray(rows)
        self.graph = jnp.asarray(graph, jnp.int32)
        self.entry = jnp.asarray(entry, jnp.int32).reshape(-1)
        self.sample = (
            jnp.asarray(sample, jnp.int32).reshape(-1)
            if sample is not None else self.entry
        )
        self.store_dtype = store_dtype
        self.alpha = float(alpha)
        self.regime_warning = regime_warning or None
        self._sqn = jnp.sum(
            self._rows.astype(jnp.float32) ** 2, axis=-1
        )

    # -- construction -------------------------------------------------------
    @classmethod
    def build(
        cls,
        data,
        *,
        degree: int = 32,
        alpha: float = 1.2,
        knn_k: Optional[int] = None,
        store_dtype: str = "float32",
        exact_threshold: int = 200_000,
        prune_chunk: int = 1024,
        seed: int = 0,
    ) -> "GraphIndex":
        """Build the pruned graph over ``data`` ([n, d] f32).

        ``degree`` bounds forward edges per node (adjacency is
        ``2*degree`` wide after the reverse-edge union); ``alpha > 1``
        keeps longer-range shortcut edges (Vamana's robustness knob);
        ``knn_k`` is the candidate count per node (default
        ``2*degree``). Corpora larger than ``exact_threshold`` generate
        candidates through a temporary IVF-Flat index instead of the
        exact O(n²) scan.
        """
        x = jnp.asarray(data, jnp.float32)
        if x.ndim != 2 or x.shape[0] == 0:
            raise InvalidParameter("data", "expected a non-empty [n, d] array")
        n, d = x.shape
        degree = int(degree)
        if degree < 1:
            raise InvalidParameter("degree", "must be >= 1")
        if alpha < 1.0:
            raise InvalidParameter("alpha", "must be >= 1.0")
        if store_dtype not in _STORE_DTYPES:
            raise InvalidParameter(
                "store_dtype",
                "must be 'float32', 'bfloat16', or 'float16'",
            )
        R0 = int(knn_k) if knn_k is not None else min(2 * degree, n - 1)
        R0 = max(min(R0, n - 1), 1)
        R = min(degree, R0)

        # GRAPH_BUILD_PHASES=1: per-phase wall prints with forced
        # completion (data-dependent readback — block_until_ready lies
        # through the tunnel). Diagnostic only; off by default.
        import os as _os
        import time as _time

        _phases = _os.environ.get("GRAPH_BUILD_PHASES") == "1"

        def _tick(label, probe=None):
            if not _phases:
                return
            if probe is not None:
                float(jnp.sum(jnp.float32(jnp.ravel(probe)[:8])))
            t = _time.perf_counter()
            print(f"  build phase [{label}]: {t - _tick.t0:.1f} s",
                  flush=True)
            _tick.t0 = t

        _tick.t0 = _time.perf_counter()

        cand_ids, cand_d = cls._candidates(x, R0, exact_threshold, seed)
        _tick("candidates (ivf train+add+sweep)", cand_ids)

        # Random long-range candidates (small-world shortcuts — see
        # _augment_candidates_chunk). Seeded, a quarter of the k-NN count.
        Rr = max(4, R0 // 4)
        rand_all = jax.random.randint(
            jax.random.PRNGKey(int(seed) + 1), (n, Rr), 0, n,
            dtype=jnp.int32,
        )
        # RESERVED long edges: when clusters are tight relative to their
        # separation, every near candidate survives the alpha test (no
        # kept point is within d(p,v)/alpha of another) and the degree
        # budget fills with intra-cluster edges before any shortcut —
        # at which point beam search can never leave the entry's basin
        # (observed: recall 0.005 at 1M rows / 1000 tight clusters).
        # So a slice of the budget is unconditionally random (Kleinberg
        # small-world wiring) instead of prune-contested. At least one
        # pruned near edge always remains (tiny degrees skip shortcuts).
        if R >= 3 and n > R0 + 1:
            R_far = min(max(2, R // 8), Rr, R - 1)
        else:
            R_far = 0
        R_near = R - R_far

        # Vectorized prune over all nodes as ONE jit: a lax.scan over
        # node chunks (977 separate dispatches + per-chunk host readbacks
        # cost ~150 s of a 1M build through the tunnel; one dispatch
        # costs device time only). The dominance test runs in the
        # squared-L2 domain, so standard Vamana alpha semantics
        # (alpha * d(u,v) <= d(p,v)) need alpha².
        C = min(int(prune_chunk), n)
        a2 = jnp.float32(float(alpha) ** 2)
        fwd = _prune_all_jit(
            x, cand_ids, cand_d, rand_all, a2, R_near, R_far, C
        )
        _tick("prune", fwd)
        rev = _reverse_edges(fwd, n, R)
        graph = jnp.concatenate([fwd, rev], axis=1)  # [n, 2R]
        _tick("reverse+concat", graph)

        # Entry points: the medoid plus a few seeded random rows — with
        # the shortcut edges one connected entry suffices, the extras are
        # cheap insurance on multi-modal data.
        mean = jnp.mean(x, axis=0, keepdims=True)
        medoid = jnp.argmin(
            jnp.sum((x - mean) ** 2, axis=-1)
        ).astype(jnp.int32)
        extra = jax.random.randint(
            jax.random.PRNGKey(int(seed) + 2), (min(15, n),), 0, n,
            dtype=jnp.int32,
        )
        entry = jnp.concatenate([medoid[None], extra])
        # Routing sample (flattened hierarchy — see _entry_select_jit):
        # seeded permutation so large corpora get basin-covering entries.
        S = min(4096, n)
        sample = jax.random.permutation(
            jax.random.PRNGKey(int(seed) + 3), n
        )[:S].astype(jnp.int32)

        # Regime guardrail (round-2/3 verdict weak #7): a graph index on
        # heavily concentrated clusters silently caps recall@10 well
        # below IVF's (the beam cannot scan a near-equidistant cluster),
        # so measure cluster concentration on the routing sample and
        # attach a warning the user actually sees.
        regime_warning = None
        if n >= _CONCENTRATION_MIN_ROWS:
            srows = jnp.take(
                x, sample[: min(2048, S)], axis=0
            ).astype(jnp.float32)
            ratio = float(_concentration_stat_jit(srows))
            if ratio < _CONCENTRATION_WARN:
                regime_warning = (
                    f"corpus shows heavy cluster concentration "
                    f"(sample mean 1-NN / mean pairwise distance ratio "
                    f"{ratio:.2f} < {_CONCENTRATION_WARN}): graph beam "
                    "search cannot recover the exact k-NN inside "
                    "near-equidistant clusters and recall@k will "
                    "silently degrade (docs/performance.md, GraphIndex "
                    "regime guidance). An IVF index (e.g. "
                    f"index_factory(d, 'IVF{max(int(n ** 0.5), 1)},"
                    "Flat')) scans whole clusters exactly and is the "
                    "right tool for this distribution."
                )
                import warnings

                warnings.warn(regime_warning, RuntimeWarning, stacklevel=2)
        return cls(
            x.astype(_STORE_DTYPES[store_dtype]), graph,
            entry, sample=sample, store_dtype=store_dtype, alpha=alpha,
            regime_warning=regime_warning,
        )

    @staticmethod
    def _candidates(x, R0, exact_threshold, seed):
        from vq_tpu.ops.knn import knn_graph

        n = x.shape[0]
        if n <= int(exact_threshold):
            return knn_graph(x, k=R0)
        # IVF-assisted candidates: the corpus queries its own coarse
        # partition (probe kernel on TPU); recall of the candidate set is
        # bounded by nprobe but the prune only needs good-enough locality.
        from vq_tpu.ivf_flat import IVFFlatIndex

        nlist = max(64, int(np.sqrt(n)) * 2)
        # Random subsample for coarse training — a head slice would see
        # only the head's distribution on source-/cluster-ordered data.
        ns = min(n, 200_000)
        sample = jnp.take(
            x,
            jax.random.permutation(
                jax.random.PRNGKey(int(seed) + 11), n
            )[:ns],
            axis=0,
        )
        import os as _os
        import time as _time

        _phases = _os.environ.get("GRAPH_BUILD_PHASES") == "1"
        _t0 = _time.perf_counter()

        idx = IVFFlatIndex.train(
            sample, nlist, max_iters=8, seed=seed,
            store_dtype="bfloat16",
        )
        if _phases:
            float(jnp.sum(idx.coarse[:1]))
            print(f"  build phase [ivf train]: "
                  f"{_time.perf_counter() - _t0:.1f} s", flush=True)
            _t0 = _time.perf_counter()
        idx.add(x)
        if _phases:
            print(f"  build phase [ivf add]: "
                  f"{_time.perf_counter() - _t0:.1f} s", flush=True)
        # One dispatch for the whole candidate sweep: scan the search
        # core over query batches inside a single jit (the serving
        # BatchPipeline pattern). The round-4 per-batch host loop was
        # ~123 eager search calls x the ~29 ms tunnel RPC — the bulk of
        # the 1M build's 147-167 s wall time was dispatch, not device.
        # Query-batch size capped so the fused probe's scalar-prefetch
        # operand (one chunk id per query x probe x chain position)
        # fits the ~1 MB SMEM budget — 8192 queries overflowed it on
        # chunk-pool chains (round 5) and would silently demote the
        # sweep to the XLA scan.
        from vq_tpu.ivf_flat import _PROBE_PREFETCH_BUDGET_BYTES

        maxc = idx._pool.chains_search().shape[1]
        qb = min(8192, max(256, _PROBE_PREFETCH_BUDGET_BYTES
                           // (8 * maxc * 4) // 256 * 256))
        fn, arrays = idx._search_core(R0 + 1, nprobe=8)
        n_pad = -(-n // qb) * qb
        d_ = x.shape[1]

        @functools.partial(jax.jit, static_argnames=())
        def all_batches(xp, *arrs):
            def step(_, q):
                ids, vals = fn(q, *arrs)
                return None, (ids, vals)

            _, (ids, vals) = jax.lax.scan(
                step, None, xp.reshape(n_pad // qb, qb, d_)
            )
            return ids.reshape(n_pad, -1), vals.reshape(n_pad, -1)

        ids, vals = all_batches(
            jnp.pad(x, ((0, n_pad - n), (0, 0))), *arrays
        )

        @jax.jit
        def drop_self(ids, vals):
            rows_ids = jnp.arange(ids.shape[0], dtype=jnp.int32)[:, None]
            keep = jnp.where(ids == rows_ids, jnp.inf, vals)
            order = jnp.argsort(keep, axis=1)[:, :R0]
            return (
                jnp.take_along_axis(ids, order, axis=1),
                jnp.take_along_axis(keep, order, axis=1),
            )

        out_i, out_d = drop_self(ids[:n], vals[:n])
        return out_i, out_d

    # -- queries ------------------------------------------------------------
    @property
    def ntotal(self) -> int:
        return int(self._rows.shape[0])

    @property
    def dim(self) -> int:
        return int(self._rows.shape[1])

    @property
    def degree(self) -> int:
        return int(self.graph.shape[1])

    def search(
        self,
        queries,
        k: int = 10,
        *,
        beam: int = 64,
        iters: Optional[int] = None,
        picks_per_iter: int = 8,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k ``(ids, squared-L2)`` by batched beam search.

        ``beam`` (L) is the candidate-pool width — the recall knob;
        ``iters`` is the number of expansion steps (default
        ``ceil(1.5 * beam / picks_per_iter)``, enough to visit ~1.5L
        nodes); ``picks_per_iter`` (B) trades sequential steps for wider
        per-step expansion. The search is step-latency-bound on TPU
        (halving row bytes changes nothing), so at fixed visit budget
        larger B is strictly faster — measured at 1M×128, beam 64:
        B=4/T=24 → 25.6 ms/batch, B=8/T=12 → 24.1, B=16/T=6 → **18.5 ms
        (6.9k QPS) at slightly better recall** (wider frontiers explore
        more). B=8 is the default as the safe middle at small beams."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=q.shape[1])
        fn, arrays = self._search_core(
            int(k), beam=beam, iters=iters, picks_per_iter=picks_per_iter
        )
        return fn(q, *arrays)

    def _search_core(
        self,
        k: int,
        *,
        beam: int = 64,
        iters: Optional[int] = None,
        picks_per_iter: int = 8,
    ):
        """The search as ``(fn, arrays)`` with ``fn(q, *arrays)`` fully
        traceable — :meth:`search` is one eager call of it and
        :class:`vq_tpu.serving.BatchPipeline` scans it over many query
        batches in one dispatch."""
        if self.ntotal == 0:
            raise EmptyInput("index is empty")
        n, k, beam, picks = self.ntotal, int(k), int(beam), int(picks_per_iter)

        def fn(q, rows, sqn, graph, sample, entry):
            return _search_driver(
                q, rows, sqn, graph, sample, entry, n, k, beam, iters, picks
            )

        return fn, (
            self._rows, self._sqn, self.graph, self.sample, self.entry
        )

    def reconstruct(self, ids) -> jnp.ndarray:
        return jnp.take(
            self._rows, jnp.asarray(ids, jnp.int32), axis=0
        ).astype(jnp.float32)

    def search_and_reconstruct(self, queries, k: int = 10, **kw):
        """Search plus the stored rows of every hit — ``(ids, values,
        vectors [Q, k, d])``; padded ``-1`` ids yield zero rows."""
        from vq_tpu.search import _search_and_reconstruct

        return _search_and_reconstruct(self, queries, k, **kw)

    def add(self, vectors, *, ef: int = 128, chunk: int = 1024) -> None:
        """Incremental insertion (the faiss-HNSW ``add`` contract).

        Each new point beam-searches the EXISTING graph for candidates
        (``ef`` is the candidate-search beam — the efConstruction
        analog), merges in exact intra-batch neighbors, alpha-prunes the
        union to its forward edges, and back-links into its chosen
        neighbors' adjacency lists (re-pruned on overflow, never grown).
        Batched TPU dataflow: all new points search at once, prune/
        re-prune run over ``chunk``-row slabs of the same vectorized
        kernels the builder uses. The routing sample absorbs a
        proportional slice of new ids so entry selection can reach new
        regions. Quality matches HNSW's incremental regime — bulk loads
        are still better served by :meth:`build` (global candidate sets).
        """
        x = jnp.asarray(vectors, jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.ndim != 2 or x.shape[0] == 0:
            raise InvalidParameter(
                "vectors", "expected a non-empty [n, d] batch"
            )
        if x.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x.shape[1])
        n0, B = self.ntotal, int(x.shape[0])
        W = int(self.graph.shape[1])
        a2 = jnp.float32(self.alpha ** 2)

        # Candidates from the existing graph (one batched beam search).
        k_old = min(W, n0)
        ids_old, d_old = self.search(
            x, k=k_old, beam=max(int(ef), k_old)
        )

        # Exact intra-batch neighbors, offset into the new id range.
        if B >= 2:
            from vq_tpu.ops.knn import knn_graph

            Rb = min(W, B - 1)
            ib_ids, _ = knn_graph(x, k=Rb)
            ib_ids = jnp.where(ib_ids >= 0, ib_ids + n0, -1)
        else:
            ib_ids = jnp.full((B, 0), -1, jnp.int32)

        rows_all = jnp.concatenate(
            [self._rows, x.astype(_STORE_DTYPES[self.store_dtype])]
        )
        new_ids = jnp.arange(n0, n0 + B, dtype=jnp.int32)

        # Merge + prune per chunk (the builder's kernels, combined rows).
        fwd_parts = []
        for s in range(0, B, int(chunk)):
            e = min(s + int(chunk), B)
            si, sd = _augment_candidates_chunk(
                x[s:e], new_ids[s:e], ids_old[s:e], d_old[s:e],
                ib_ids[s:e],
                jnp.take(
                    rows_all, jnp.maximum(ib_ids[s:e], 0), axis=0
                ).astype(jnp.float32),
            )
            cand_rows = jnp.take(
                rows_all, jnp.maximum(si, 0), axis=0
            ).astype(jnp.float32)
            fwd_parts.append(
                _robust_prune_chunk(x[s:e], si, sd, cand_rows, a2, W)
            )
        fwd_new = jnp.concatenate(fwd_parts)  # [B, W]

        graph_all = jnp.concatenate([self.graph, fwd_new])

        # Backlinks: group (new -> v) edges by v, cap W per node, then
        # re-prune each affected node's adjacency ∪ backlinks to width W.
        fwd_np = np.asarray(fwd_new)
        src = np.repeat(np.arange(n0, n0 + B, dtype=np.int32), W)
        dst = fwd_np.reshape(-1)
        ok = dst >= 0
        src, dst = src[ok], dst[ok]
        if dst.size:
            # Group by target node with each group ORDERED BY DISTANCE —
            # the per-node cap below must keep the nearest backlink
            # sources, not the lowest batch ids (HNSW selects shrink
            # candidates by distance).
            ed = np.empty(dst.size, np.float32)
            for s in range(0, dst.size, 262_144):
                e = min(s + 262_144, dst.size)
                a = jnp.take(
                    rows_all, jnp.asarray(src[s:e]), axis=0
                ).astype(jnp.float32)
                b = jnp.take(
                    rows_all, jnp.asarray(dst[s:e]), axis=0
                ).astype(jnp.float32)
                ed[s:e] = np.asarray(jnp.sum((a - b) ** 2, axis=-1))
            order = np.lexsort((ed, dst))
            src, dst = src[order], dst[order]
            vs, starts, counts = np.unique(
                dst, return_index=True, return_counts=True
            )
            A = vs.shape[0]
            group = np.repeat(np.arange(A), counts)
            posn = np.arange(dst.size) - np.repeat(starts, counts)
            sel = posn < W  # cap backlinks per node at the list width
            back = np.full((A, W), -1, np.int32)
            back[group[sel], posn[sel]] = src[sel]
            vs_j = jnp.asarray(vs, jnp.int32)
            back_j = jnp.asarray(back)
            for s in range(0, A, int(chunk)):
                e = min(s + int(chunk), A)
                node_rows = jnp.take(rows_all, vs_j[s:e], axis=0).astype(
                    jnp.float32
                )
                adj = jnp.take(graph_all, vs_j[s:e], axis=0)
                adj_rows = jnp.take(
                    rows_all, jnp.maximum(adj, 0), axis=0
                ).astype(jnp.float32)
                adj_d = _ids_dist_jit(node_rows, adj, adj_rows)
                si, sd = _augment_candidates_chunk(
                    node_rows, vs_j[s:e], adj, adj_d, back_j[s:e],
                    jnp.take(
                        rows_all, jnp.maximum(back_j[s:e], 0), axis=0
                    ).astype(jnp.float32),
                )
                # Only OVERFLOWING lists go through the dominance prune:
                # re-pruning an underfull list could evict the reserved
                # small-world shortcut edges the build set aside (their
                # backfill ranks last by distance). Underfull lists keep
                # the whole union, nearest-first.
                cand_rows = jnp.take(
                    rows_all, jnp.maximum(si, 0), axis=0
                ).astype(jnp.float32)
                pruned = _robust_prune_chunk(
                    node_rows, si, sd, cand_rows, a2, W
                )
                overflow = jnp.sum(si >= 0, axis=1) > W
                out = jnp.where(overflow[:, None], pruned, si[:, :W])
                graph_all = graph_all.at[vs_j[s:e]].set(out)

        # Routing sample: fold in a proportional slice of new ids (the
        # flattened hierarchy must cover new basins), capped at 4096.
        S_cap = 4096
        take = min(B, max(1, int(np.ceil(S_cap * B / (n0 + B)))))
        picks = jax.random.permutation(
            jax.random.PRNGKey(n0 + B), B
        )[:take].astype(jnp.int32) + n0
        sample = jnp.concatenate([self.sample, picks])
        if sample.shape[0] > S_cap:
            keep = jax.random.permutation(
                jax.random.PRNGKey(n0), sample.shape[0]
            )[:S_cap]
            sample = jnp.take(sample, keep)

        self._rows = rows_all
        self.graph = graph_all
        self.sample = sample
        # Norms from the STORED-width rows (matching __init__/load) —
        # f32-input norms over bf16 rows flip argmins near ties and
        # diverge after a save/load round-trip.
        xs = x.astype(_STORE_DTYPES[self.store_dtype]).astype(jnp.float32)
        self._sqn = jnp.concatenate(
            [self._sqn, jnp.sum(xs * xs, axis=-1)]
        )
        self._replica_cache = None  # sharded serving must re-place

    def merge_from(self, other) -> int:
        """Unsupported: the navigable graph's edges are global — merging
        two graphs needs a rebuild (same limitation as faiss HNSW).
        Rebuild with ``GraphIndex.build`` on the unioned rows instead."""
        raise InvalidData(
            "GraphIndex does not support merge_from — rebuild from the "
            "union of the corpora"
        )

    def remove_ids(self, ids, *, chunk: int = 1024) -> int:
        """Positional removal with sequential renumbering (the faiss
        ``remove_ids`` contract — which faiss HNSW itself refuses).

        Dropping a graph node severs every path through it, so plain
        edge deletion degrades navigability. This implements the
        standard delete-repair instead (FreshDiskANN-style): every
        surviving node that pointed at a removed node is *patched* with
        candidates drawn from that removed node's own surviving
        out-neighbors (bridging the hole), then its adjacency is
        alpha-re-pruned to the list width when it overflows — the same
        vectorized kernels :meth:`build` and :meth:`add` use. Finally
        rows/adjacency/entries/routing-sample compact and renumber.
        Heavy removal churn still warrants a :meth:`build` (global
        candidate sets), as with HNSW."""
        from vq_tpu.search import _removal_keep_mask

        if self.ntotal == 0:
            raise EmptyInput("index is empty")
        n0, W = self.ntotal, int(self.graph.shape[1])
        mask = _removal_keep_mask(ids, n0)
        keep_np = np.asarray(mask)
        removed = int(n0 - keep_np.sum())
        if removed == 0:
            return 0
        a2 = jnp.float32(self.alpha ** 2)

        g = np.asarray(self.graph)
        # Edges into the removed set, and the surviving nodes they leave.
        tgt_removed = (g >= 0) & ~keep_np[np.maximum(g, 0)]
        aff = np.nonzero(keep_np & tgt_removed.any(axis=1))[0]

        graph_all = self.graph
        if aff.size:
            # Bridge candidates per affected node u: the union of
            # graph[r] over u's removed targets r, filtered to surviving
            # nodes != u, capped at 2W (valid-first stable compaction).
            rs = np.where(tgt_removed[aff], g[aff], -1)  # [A, W]
            br = g[np.maximum(rs, 0)].reshape(aff.size, -1)  # [A, W*W]
            br = np.where(np.repeat(rs >= 0, W, axis=1), br, -1)
            valid = (
                (br >= 0)
                & keep_np[np.maximum(br, 0)]
                & (br != aff[:, None])
            )
            br = np.where(valid, br, -1)
            order = np.argsort(~valid, axis=1, kind="stable")
            br = np.take_along_axis(br, order, axis=1)[:, : 2 * W]
            # Surviving own adjacency (removed targets masked out).
            adj_np = np.where(tgt_removed[aff], -1, g[aff])

            aff_j = jnp.asarray(aff, jnp.int32)
            adj_j = jnp.asarray(adj_np)
            br_j = jnp.asarray(br, jnp.int32)
            rows32 = self._rows.astype(jnp.float32)
            for s in range(0, aff.size, int(chunk)):
                e = min(s + int(chunk), aff.size)
                node_rows = jnp.take(rows32, aff_j[s:e], axis=0)
                adj = adj_j[s:e]
                adj_d = _ids_dist_jit(
                    node_rows,
                    adj,
                    jnp.take(rows32, jnp.maximum(adj, 0), axis=0),
                )
                si, sd = _augment_candidates_chunk(
                    node_rows, aff_j[s:e], adj, adj_d, br_j[s:e],
                    jnp.take(
                        rows32, jnp.maximum(br_j[s:e], 0), axis=0
                    ),
                )
                # Same overflow rule as add(): underfull unions keep
                # everything nearest-first (a dominance prune could
                # evict the reserved small-world shortcut edges).
                cand_rows = jnp.take(
                    rows32, jnp.maximum(si, 0), axis=0
                )
                pruned = _robust_prune_chunk(
                    node_rows, si, sd, cand_rows, a2, W
                )
                overflow = jnp.sum(si >= 0, axis=1) > W
                out = jnp.where(overflow[:, None], pruned, si[:, :W])
                graph_all = graph_all.at[aff_j[s:e]].set(out)

        # Renumber + compact. new_of[old] = position among survivors.
        alive = np.nonzero(keep_np)[0]
        new_of = np.full(n0, -1, np.int32)
        new_of[alive] = np.arange(alive.size, dtype=np.int32)
        g_kept = np.asarray(graph_all)[alive]
        ok = (g_kept >= 0) & keep_np[np.maximum(g_kept, 0)]
        g_new = np.where(ok, new_of[np.maximum(g_kept, 0)], -1)
        # Compact -1 pads rightward within each adjacency row.
        g_new = np.take_along_axis(
            g_new, np.argsort(g_new < 0, axis=1, kind="stable"), axis=1
        )

        alive_j = jnp.asarray(alive, jnp.int32)
        self._rows = jnp.take(self._rows, alive_j, axis=0)
        self._sqn = jnp.take(self._sqn, alive_j)
        self.graph = jnp.asarray(g_new, jnp.int32)

        def _remap(old_ids: jnp.ndarray, *, fallback_medoid: bool):
            if alive.size == 0:
                return jnp.zeros((0,), jnp.int32)
            kept = new_of[np.asarray(old_ids)]
            kept = kept[kept >= 0]
            if kept.size == 0:
                if fallback_medoid:
                    rows32 = self._rows.astype(jnp.float32)
                    mean = jnp.mean(rows32, axis=0, keepdims=True)
                    kept = np.asarray(
                        jnp.argmin(jnp.sum((rows32 - mean) ** 2, -1))
                    ).reshape(1)
                else:
                    S = min(4096, alive.size)
                    kept = np.asarray(
                        jax.random.permutation(
                            jax.random.PRNGKey(alive.size), alive.size
                        )[:S]
                    )
            return jnp.asarray(kept, jnp.int32)

        self.entry = _remap(self.entry, fallback_medoid=True)
        self.sample = _remap(self.sample, fallback_medoid=False)
        self._replica_cache = None
        return removed

    # -- persistence --------------------------------------------------------
    def save(self, path: str) -> str:
        rows = np.asarray(self._rows)
        if self.store_dtype == "bfloat16":
            rows = rows.view(np.uint16)
        return _to_npz(
            path,
            "graph_index",
            {
                "store_dtype": self.store_dtype,
                "alpha": self.alpha,
                "regime_warning": self.regime_warning or "",
            },
            {
                "rows": rows,
                "graph": np.asarray(self.graph),
                "entry": np.asarray(self.entry),
                "sample": np.asarray(self.sample),
            },
        )

    @classmethod
    def load(cls, path: str) -> "GraphIndex":
        kind, config, arrays = _from_npz(path)
        if kind != "graph_index":
            raise InvalidData(
                f"expected a graph_index checkpoint, got {kind!r}"
            )
        rows = arrays["rows"]
        if config["store_dtype"] == "bfloat16":
            rows = rows.view(jnp.bfloat16.dtype)
        return cls(
            rows, arrays["graph"], arrays["entry"],
            sample=arrays.get("sample"),
            store_dtype=config["store_dtype"],
            alpha=config.get("alpha", 1.2),
            regime_warning=config.get("regime_warning") or None,
        )

    def __repr__(self) -> str:
        return (
            f"GraphIndex(ntotal={self.ntotal}, dim={self.dim}, "
            f"degree={self.degree}, store_dtype={self.store_dtype!r})"
        )
