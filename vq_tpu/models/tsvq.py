"""Tree-structured vector quantization (TSVQ).

The reference (src/tsvq.rs) builds a binary tree of centroids recursively —
inherently data-dependent control flow — and encodes by greedy root-to-leaf
traversal. The TPU-native split of responsibilities (SURVEY.md §7.2 L4):

* **Build** runs host-orchestrated: per-node statistics (mean, per-dim
  variance, median, partition) are numpy batch reductions; the recursion and
  tree topology live in Python. The result is flattened into three arrays —
  ``centroids [nodes, d]``, ``left [nodes]``, ``right [nodes]`` (−1 = none) —
  a structure-of-arrays layout XLA can gather from.
* **Encode** compiles to a fixed-depth vectorized traversal: ``depth`` rounds
  of (gather children centroids, row-wise distance, select), fully batched —
  no per-vector recursion.

Reference semantics preserved (src/tsvq.rs:31-132):

* Node centroid = mean of its subset (src/tsvq.rs:36).
* Split dimension = argmax of per-dim *summed* squared deviation, NaN
  variances excluded (src/tsvq.rs:47-66; all-NaN falls back to dim 0).
* Threshold = median of that dimension's non-NaN values; even count averages
  the two middle values (src/tsvq.rs:68-81).
* Partition: ``value <= median`` goes left; NaN comparisons are false so NaN
  rows go right (src/tsvq.rs:83-85).
* A child is built only when its partition is non-empty AND smaller than the
  parent (progress check, src/tsvq.rs:88-108).
* Traversal: at a 2-child node compare child-centroid distances under the
  user's metric; ``dist_left <= dist_right`` descends left (ties left,
  src/tsvq.rs:117-132). Single-child nodes descend into that child.
* ``quantize`` emits the leaf centroid as f16 (src/tsvq.rs:247-254);
  ``dequantize`` is the f16 -> f32 cast with a dim check (src/tsvq.rs:257-265).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.errors import DimensionMismatch, InvalidParameter
from vq_tpu.models.base import Quantizer, as_batch_f32, check_training_matrix
from vq_tpu.ops.distance import Distance, Metric, _rowwise_jit

__all__ = ["TSVQ", "TSVQTree", "tsvq_build", "tsvq_build_batched"]


class TSVQTree:
    """Flattened TSVQ tree: structure-of-arrays, ready for jitted traversal."""

    def __init__(self, centroids, left, right, depth: int):
        self.centroids = jnp.asarray(centroids, jnp.float32)  # [nodes, d]
        self.left = jnp.asarray(left, jnp.int32)  # [nodes], -1 = none
        self.right = jnp.asarray(right, jnp.int32)
        self.depth = int(depth)
        self._bfs_cache = None

    def bfs_layout(self):
        """Level-major (BFS) relabeling of the tree, cached.

        Returns ``(centroids_bfs, left_bfs, right_bfs, perm, starts)``:
        node ids renumbered so level ℓ occupies ``[starts[ℓ],
        starts[ℓ+1])`` contiguously, ``perm[new_id] = old_id`` maps
        traversal results back. Feeds the level-sliced deep-tree
        traversal in :func:`_tsvq_find_leaf` — at step ``t`` every
        still-descending row sits exactly at level ``t`` (one-child
        nodes still advance a level; leaf rows stop needing scores), so
        only level ``t+1``'s score slice is ever read.
        """
        if self._bfs_cache is None:
            left = np.asarray(self.left)
            right = np.asarray(self.right)
            order, starts = [], [0]
            frontier = [0] if left.shape[0] else []
            while frontier:
                order.extend(frontier)
                starts.append(len(order))
                nxt = []
                for p in frontier:
                    for c in (int(left[p]), int(right[p])):
                        if c >= 0:
                            nxt.append(c)
                frontier = nxt
            perm = np.asarray(order, np.int32)  # new -> old
            inv = np.full(left.shape[0], -1, np.int32)
            inv[perm] = np.arange(len(perm), dtype=np.int32)

            def remap(children):
                out = np.where(
                    children[perm] >= 0,
                    inv[np.maximum(children[perm], 0)], -1
                )
                return out.astype(np.int32)

            # ensure_compile_time_eval: the first call may happen while
            # TRACING a user jit (encode under jax.jit); without it the
            # staged jnp ops would cache tracers that leak out of the
            # trace (seen: benchmarks/tsvq_deep.py's chained encode).
            with jax.ensure_compile_time_eval():
                self._bfs_cache = (
                    jnp.take(self.centroids, jnp.asarray(perm), axis=0),
                    jnp.asarray(remap(left)),
                    jnp.asarray(remap(right)),
                    jnp.asarray(perm),
                    tuple(int(s) for s in starts),
                )
        return self._bfs_cache

    @property
    def num_nodes(self) -> int:
        return self.centroids.shape[0]

    @property
    def num_leaves(self) -> int:
        both_none = (np.asarray(self.left) < 0) & (np.asarray(self.right) < 0)
        return int(both_none.sum())

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]


def _build_node(
    data: np.ndarray,
    idx: np.ndarray,
    max_depth: int,
    centroids: list,
    lefts: list,
    rights: list,
) -> int:
    """Recursively build the subtree over ``data[idx]``; returns node id.

    Memory-aware (SURVEY.md §7.3 "TSVQ medians at scale"): per-node
    temporaries are freed *before* recursing, so peak memory is
    O(n·d · Σ 2^-level) ≈ 2·n·d instead of O(n·d·depth) — holding each
    level's subset copy across the child recursion made million-row
    960-d builds thrash.
    """
    subset = data[idx]  # one gather per node
    centroid = subset.mean(axis=0, dtype=np.float32)
    node = len(centroids)
    centroids.append(centroid)
    lefts.append(-1)
    rights.append(-1)

    n = idx.shape[0]
    if max_depth == 0 or n <= 1:
        return node

    # Summed squared deviation per dim (the reference's "variance",
    # src/tsvq.rs:47-57 — a sum, not a mean; argmax is the same either way).
    # In-place center + einsum avoids two [n, d] temporaries; NaNs
    # propagate into the per-dim sums exactly as with the naive form.
    values_col: np.ndarray  # original values of the split column
    subset -= centroid[None, :]
    variances = np.einsum(
        "ij,ij->j", subset, subset, dtype=np.float32
    )
    finite = ~np.isnan(variances)
    if finite.any():
        masked = np.where(finite, variances, -np.inf)
        split_dim = int(np.argmax(masked))  # first max wins, like max_by
    else:
        split_dim = 0  # reference's unwrap_or(0), src/tsvq.rs:66

    del subset  # free before median/partition/recursion
    # Re-gather the split column's ORIGINAL values: reconstructing them from
    # the centered copy ((x - c) + c) can differ by an ulp and flip
    # median/partition decisions vs the reference.
    values_col = data[idx, split_dim]

    finite_vals = values_col[~np.isnan(values_col)]
    if finite_vals.size == 0:
        return node  # all-NaN split column: nothing to split on
    half = finite_vals.size // 2
    if finite_vals.size % 2 == 0:
        two = np.partition(finite_vals, [half - 1, half])
        median = float((two[half - 1] + two[half]) / 2.0)
    else:
        median = float(np.partition(finite_vals, half)[half])

    go_left = values_col <= median  # NaN -> False -> right
    left_idx = idx[go_left]
    right_idx = idx[~go_left]
    del values_col, go_left

    if 0 < left_idx.shape[0] < n:
        lefts[node] = _build_node(
            data, left_idx, max_depth - 1, centroids, lefts, rights
        )
    if 0 < right_idx.shape[0] < n:
        rights[node] = _build_node(
            data, right_idx, max_depth - 1, centroids, lefts, rights
        )
    return node


def tsvq_build(training_data, max_depth: int) -> TSVQTree:
    """Build a TSVQ tree (reference ``TSVQNode::build``, src/tsvq.rs:31-115)."""
    data = check_training_matrix(training_data)
    max_depth = int(max_depth)
    if max_depth < 0:
        raise InvalidParameter("max_depth", "must be non-negative")
    host = np.asarray(data, dtype=np.float32)
    centroids: list = []
    lefts: list = []
    rights: list = []
    _build_node(
        host, np.arange(host.shape[0]), max_depth, centroids, lefts, rights
    )
    return TSVQTree(np.stack(centroids), lefts, rights, depth=max_depth)


# ---------------------------------------------------------------------------
# Level-synchronous device build: every node of a level in one batch of
# segment ops. Host only orchestrates levels and the final topology.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("ncap",))
def _level_stats(x, seg, ncap: int):
    """Per-segment stats for one level, all nodes at once.

    ``seg [n]`` maps each point to its frontier slot (``ncap`` = slot
    capacity; inactive points carry ``seg = ncap`` and fall into a waste
    slot that is sliced off). Returns per-slot ``counts``, ``means``,
    ``split_dim`` (argmax of summed squared deviation, NaN dims excluded,
    all-NaN -> 0 like the reference's unwrap_or).
    """
    nseg = ncap + 1
    ones = jnp.ones(seg.shape, jnp.float32)
    counts = jax.ops.segment_sum(ones, seg, nseg)[:ncap]
    sums = jax.ops.segment_sum(x, seg, nseg)[:ncap]
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    dev = x - means[jnp.minimum(seg, ncap - 1)]
    devsq = jax.ops.segment_sum(dev * dev, seg, nseg)[:ncap]  # [ncap, d]
    finite = ~jnp.isnan(devsq)
    masked = jnp.where(finite, devsq, -jnp.inf)
    any_finite = jnp.any(finite, axis=-1)
    split_dim = jnp.where(any_finite, jnp.argmax(masked, axis=-1), 0)
    return counts, means, split_dim.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("ncap",))
def _level_medians(v, seg, counts, ncap: int):
    """Exact per-segment medians of ``v`` (NaN-filtered, even counts
    average the two middle values — reference src/tsvq.rs:68-81)."""
    nseg = ncap + 1
    order = jnp.lexsort((v, seg))  # NaNs sort last within each segment
    sv = v[order]
    nan_counts = jax.ops.segment_sum(
        jnp.isnan(v).astype(jnp.float32), seg, nseg
    )[:ncap]
    valid = (counts - nan_counts).astype(jnp.int32)  # [ncap]
    starts = jnp.searchsorted(
        seg[order], jnp.arange(ncap, dtype=seg.dtype)
    ).astype(jnp.int32)
    half = valid // 2
    n_total = v.shape[0]
    lo = jnp.clip(starts + jnp.maximum(half - 1, 0), 0, n_total - 1)
    hi = jnp.clip(starts + half, 0, n_total - 1)
    even = (valid % 2) == 0
    med = jnp.where(even, (sv[lo] + sv[hi]) / 2.0, sv[hi])
    return med, valid


def tsvq_build_batched(training_data, max_depth: int) -> TSVQTree:
    """Device-accelerated TSVQ build — same tree as :func:`tsvq_build`.

    Each level's node statistics (means, variance-argmax split dims, exact
    medians, partitions) run as one batch of segment ops on the
    accelerator; only the O(2^depth) topology bookkeeping runs on host.
    The resulting tree is renumbered to the recursive builder's DFS
    preorder so the flattened arrays match it exactly (up to f32
    reduction-order effects in variance near exact ties).
    """
    data = check_training_matrix(training_data)
    max_depth = int(max_depth)
    if max_depth < 0:
        raise InvalidParameter("max_depth", "must be non-negative")
    x = jnp.asarray(data, jnp.float32)
    n, d = x.shape

    # BFS nodes: dict id -> (centroid, left, right); slot bookkeeping.
    bfs_centroids: list = []
    bfs_children: list = []  # (left_id | -1, right_id | -1)

    seg = np.zeros((n,), np.int32)  # frontier slot per point
    frontier_nodes = [0]  # bfs ids of current frontier slots
    bfs_centroids.append(None)  # filled below
    bfs_children.append((-1, -1))

    for level in range(max_depth + 1):
        ncap = len(frontier_nodes)
        if ncap == 0:
            break
        seg_dev = jnp.asarray(seg)
        counts, means, split_dim = _level_stats(x, seg_dev, ncap)
        counts_h = np.asarray(counts)
        means_h = np.asarray(means)
        for f, node in enumerate(frontier_nodes):
            bfs_centroids[node] = means_h[f]
        if level == max_depth:
            break  # leaves at depth limit: centroid only (max_depth==0 case)

        v = x[jnp.arange(n), jnp.asarray(split_dim)[jnp.minimum(seg_dev, ncap - 1)]]
        v = jnp.where(seg_dev < ncap, v, jnp.nan)  # inactive rows inert
        med, valid = _level_medians(v, seg_dev, counts, ncap)
        go_left = np.asarray(v <= med[jnp.minimum(seg_dev, ncap - 1)])
        valid_h = np.asarray(valid)
        med_h = np.asarray(med)

        left_counts = np.zeros(ncap, np.int64)
        np.add.at(left_counts, seg[seg < ncap], go_left[seg < ncap])
        new_frontier: list = []
        new_slot_left = np.full(ncap, -1, np.int32)
        new_slot_right = np.full(ncap, -1, np.int32)
        for f, node in enumerate(frontier_nodes):
            cnt = int(counts_h[f])
            if cnt <= 1 or valid_h[f] == 0 or not np.isfinite(med_h[f]):
                continue  # leaf: too small or all-NaN split column
            lc = int(left_counts[f])
            rc = cnt - lc
            left_id = right_id = -1
            if 0 < lc < cnt:
                left_id = len(bfs_centroids)
                bfs_centroids.append(None)
                bfs_children.append((-1, -1))
                new_slot_left[f] = len(new_frontier)
                new_frontier.append(left_id)
            if 0 < rc < cnt:
                right_id = len(bfs_centroids)
                bfs_centroids.append(None)
                bfs_children.append((-1, -1))
                new_slot_right[f] = len(new_frontier)
                new_frontier.append(right_id)
            bfs_children[node] = (left_id, right_id)

        if not new_frontier:
            break
        # Reassign points to child slots (or the waste slot).
        old = seg.copy()
        active = old < ncap
        child_slot = np.where(
            go_left, new_slot_left[np.minimum(old, ncap - 1)],
            new_slot_right[np.minimum(old, ncap - 1)],
        )
        seg = np.where(active & (child_slot >= 0), child_slot,
                       len(new_frontier)).astype(np.int32)
        frontier_nodes = new_frontier

    # Renumber BFS ids to the recursive builder's DFS preorder.
    order: list = []

    def dfs(node: int):
        order.append(node)
        l, r = bfs_children[node]
        if l >= 0:
            dfs(l)
        if r >= 0:
            dfs(r)

    dfs(0)
    remap = {old: new for new, old in enumerate(order)}
    centroids = np.stack([bfs_centroids[old] for old in order])
    lefts = [
        remap[bfs_children[old][0]] if bfs_children[old][0] >= 0 else -1
        for old in order
    ]
    rights = [
        remap[bfs_children[old][1]] if bfs_children[old][1] >= 0 else -1
        for old in order
    ]
    return TSVQTree(centroids, lefts, rights, depth=max_depth)


@functools.partial(
    jax.jit, static_argnames=("metric", "depth", "force_scores")
)
def _tsvq_find_leaf(
    x: jnp.ndarray,
    centroids: jnp.ndarray,
    left: jnp.ndarray,
    right: jnp.ndarray,
    metric: Metric,
    depth: int,
    force_scores: bool = False,
) -> jnp.ndarray:
    """Vectorized greedy traversal -> leaf node id per row of ``x``.

    Two formulations, identical descent rule (two children: ``dl <= dr``
    goes left, src/tsvq.rs:122-126; one child: descend into it,
    :128-129; leaf: stay):

    * **scores path** (L2 family, trees up to 128 nodes — depth ≤ 6,
      the reference eval default): ONE ``[block, d] x [d, nodes]``
      HIGHEST matmul scores all node centroids per row block; each
      level then reads the sign of ``dl − dr`` with one fused
      signed-mask lane reduce. Measured at 1M×384 depth 5: **4.3 ms**
      vs 57.7 for the old per-level gather path (which materialized
      two ``[n, d]`` centroid copies per level) — and vs 152 ms for a
      ``take_along_axis`` row-gather select (per-use relayouts).
      Comparisons use ``cc - 2 x·c`` (the ``+||x||²`` term is common
      to both sides — order-identical in exact arithmetic; the same
      decomposed form every encode path in this framework uses). The
      per-level select scans the full ``[block, nodes]`` score matrix,
      so cost grows as ``nodes × depth`` — past ~128 nodes (measured:
      157 ms at 511 nodes) the gather path wins and takes over.
    * **gather path** (manhattan/cosine, deep trees): the original
      per-level rowwise form.
    """
    n = x.shape[0]
    num_nodes = centroids.shape[0]
    if (
        metric in (Metric.SQUARED_EUCLIDEAN, Metric.EUCLIDEAN)
        and num_nodes <= 128
        and n > 0
        # TPU-only: the scores form dodges the take select-ladder
        # pathology; on CPU it does ~nodes·d/(2·d·depth) times MORE
        # arithmetic than the gather form, where take was never slow.
        # force_scores is the CPU test hook.
        and (force_scores or jax.default_backend() == "tpu")
    ):
        # Row blocks keep the [block, nodes] score matrix bounded
        # (~512 MB of f32 scores — fewer map steps measured faster:
        # 12.5 -> 4.6 ms/1M at depth 5 going from 8 blocks to 1).
        block = max(min(n, 128 * 1024 * 1024 // max(num_nodes, 1)), 1)
        block = min(block, 2 * 1024 * 1024)
        pad = (-n) % block
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        cc = jnp.sum(centroids * centroids, axis=-1)  # [nodes]
        node_iota = jnp.arange(num_nodes, dtype=jnp.int32)[None, :]

        def one(xb):
            xc = jax.lax.dot_general(
                xb, centroids,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            scores = cc[None, :] - 2.0 * xc  # [block, nodes]
            nodes_b = jnp.zeros((xb.shape[0],), jnp.int32)
            for _ in range(depth):
                l = jnp.take(left, nodes_b)
                r = jnp.take(right, nodes_b)
                # Signed one-hot select: ONE fused pass reads
                # diff = dl - dr (each lane contributes +score at the
                # left child, -score at the right, 0 elsewhere);
                # dl <= dr <=> diff <= 0 preserves the ties-left rule.
                lmask = node_iota == jnp.maximum(l, 0)[:, None]
                rmask = node_iota == jnp.maximum(r, 0)[:, None]
                diff = jnp.sum(
                    jnp.where(lmask, scores, 0.0)
                    - jnp.where(rmask, scores, 0.0),
                    axis=1,
                )
                both = (l >= 0) & (r >= 0)
                pick_two = jnp.where(diff <= 0.0, l, r)
                pick_one = jnp.where(
                    l >= 0, l, jnp.where(r >= 0, r, nodes_b)
                )
                nodes_b = jnp.where(both, pick_two, pick_one)
            return nodes_b

        if xp.shape[0] == block:
            return one(xp)[:n]
        return jax.lax.map(
            one, xp.reshape(-1, block, x.shape[1])
        ).reshape(-1)[:n]

    nodes = jnp.zeros((n,), jnp.int32)
    for _ in range(depth):
        l = jnp.take(left, nodes)
        r = jnp.take(right, nodes)
        cl = jnp.take(centroids, jnp.maximum(l, 0), axis=0)
        cr = jnp.take(centroids, jnp.maximum(r, 0), axis=0)
        dl = _rowwise_jit(x, cl, metric)
        dr = _rowwise_jit(x, cr, metric)
        both = (l >= 0) & (r >= 0)
        # Two children: ties go left (src/tsvq.rs:122-126). One child:
        # descend into it (src/tsvq.rs:128-129). Leaf: stay.
        pick_two = jnp.where(dl <= dr, l, r)
        pick_one = jnp.where(l >= 0, l, jnp.where(r >= 0, r, nodes))
        nodes = jnp.where(both, pick_two, pick_one)
    return nodes


# A level at least this wide stops scoring its whole centroid slice
# ([block, w] matmul, cost ∝ w·d per row) and instead GATHERS each row's
# two child centroids (cost ∝ d per row, width-independent): past ~1k
# rows XLA's row gather is a real tpu gather, not the small-table select
# ladder that motivated the masked-reduce forms. This is what removes the
# old 4096-node ceiling — deep levels are exactly the wide ones, and
# their per-row cost no longer grows with width (the deepest level of a
# complete binary tree holds half the nodes).
_TSVQ_WIDE_LEVEL_W = 1024


def _lookup_local(table_lvl, idx_local, w_cur):
    """``table_lvl[idx_local]`` with out-of-range ``idx_local`` -> -1.

    Narrow tables use a masked lane reduce — ``jnp.take`` with millions
    of indices into a several-hundred-row table lowers to a select
    ladder that measured ~15 ms PER LOOKUP at 511 nodes (>80% of the
    whole traversal); the masked reduce is a free fused elementwise
    pass. Wide tables (≥ :data:`_TSVQ_WIDE_LEVEL_W`) take the real
    gather path, where the reduce's O(rows·w) lane work would dominate
    instead. Rows not at this level (already at a shallower leaf) come
    out as -1 (leaf-stay)."""
    if w_cur < _TSVQ_WIDE_LEVEL_W:
        iota_cur = jnp.arange(w_cur, dtype=jnp.int32)[None, :]
        return jnp.sum(
            jnp.where(
                iota_cur == idx_local[:, None],
                (table_lvl + 1)[None, :], 0,
            ), axis=1,
        ) - 1
    hit = (idx_local >= 0) & (idx_local < w_cur)
    picked = jnp.take(table_lvl, jnp.clip(idx_local, 0, w_cur - 1))
    return jnp.where(hit, picked, -1)


@functools.partial(jax.jit, static_argnames=("depth", "starts"))
def _tsvq_find_leaf_levels(
    x: jnp.ndarray,
    cents_bfs: jnp.ndarray,
    left_bfs: jnp.ndarray,
    right_bfs: jnp.ndarray,
    perm: jnp.ndarray,
    depth: int,
    starts: tuple,
):
    """Deep-tree traversal over the BFS level-major layout (L2 family).

    At step ``t`` every still-descending row is exactly at level ``t``
    (leaf rows stop consuming scores), so the step touches ONLY level
    ``t+1``'s centroid slice. Two per-level forms, chosen by the level's
    width:

    * **narrow** (< :data:`_TSVQ_WIDE_LEVEL_W`): one ``[block, d] x
      [d, width]`` HIGHEST matmul scores the whole slice; the branch is
      the sign of ``dl − dr`` read via the fused signed one-hot reduce
      (same ``cc − 2 x·c`` comparison form as the shallow path). Total
      select traffic is one pass over ``Σ widths`` columns instead of
      ``num_nodes × depth`` (the full-scores path, which loses past
      ~128 nodes: 157 ms at 511 nodes / 1M×384).
    * **wide** (≥ 1024): scoring the slice would cost ``w·d`` per row
      while each row needs only its own two children — gather those two
      centroid rows (real tpu gather at this width, not the small-table
      select ladder) and compare exact rowwise ``Σ(x−c)²`` distances,
      the gather form's own float shape. Per-row cost is ``O(d)``
      independent of width, so arbitrarily deep trees stay fast — this
      removed the round-4 4096-node ceiling.

    Same descent rule throughout (two children: ``dl <= dr`` left; one
    child: into it; leaf: stay); returns ORIGINAL node ids via ``perm``.
    """
    n, d = x.shape
    n_levels = len(starts) - 1  # starts[ℓ] .. starts[ℓ+1] = level ℓ
    widths = [
        starts[i + 1] - starts[i] for i in range(1, n_levels)
    ]  # levels 1..deepest
    narrow_ws = [w for w in widths if w < _TSVQ_WIDE_LEVEL_W]
    max_w = max(narrow_ws, default=1)
    block = max(min(n, 128 * 1024 * 1024 // max(max_w, 1)), 1)
    if any(w >= _TSVQ_WIDE_LEVEL_W for w in widths):
        # Wide levels materialize [block, d] gathered-centroid rows
        # (f32) — bound those temporaries the way narrow levels bound
        # the [block, w] score matrix.
        block = min(block, max(32 * 1024 * 1024 // max(d, 1), 8))
    block = min(block, 2 * 1024 * 1024)
    pad = (-n) % block
    xp = jnp.pad(x, ((0, pad), (0, 0)))

    def one(xb):
        nodes_b = jnp.zeros((xb.shape[0],), jnp.int32)
        for t in range(min(depth, n_levels - 1)):
            s0, s1 = starts[t + 1], starts[t + 2]
            w = s1 - s0
            if w == 0:
                break
            # Child lookups, level-local (rows needing them sit exactly
            # at level t).
            c0, c1 = starts[t], starts[t + 1]
            idx_local = nodes_b - c0
            l = _lookup_local(
                jax.lax.slice(left_bfs, (c0,), (c1,)), idx_local, c1 - c0
            )
            r = _lookup_local(
                jax.lax.slice(right_bfs, (c0,), (c1,)), idx_local, c1 - c0
            )
            cl_lvl = jax.lax.slice(cents_bfs, (s0, 0), (s1, d))  # [w, d]
            if w < _TSVQ_WIDE_LEVEL_W:
                cc = jnp.sum(cl_lvl * cl_lvl, axis=-1)
                xc = jax.lax.dot_general(
                    xb, cl_lvl,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                sc = cc[None, :] - 2.0 * xc  # [block, w]
                iota_w = jnp.arange(w, dtype=jnp.int32)[None, :]
                lm = iota_w == (l - s0)[:, None]  # shallow-leaf: no hit
                rm = iota_w == (r - s0)[:, None]
                diff = jnp.sum(
                    jnp.where(lm, sc, 0.0) - jnp.where(rm, sc, 0.0),
                    axis=1,
                )
                go_left = diff <= 0.0
            else:
                crl = jnp.take(
                    cl_lvl, jnp.clip(l - s0, 0, w - 1), axis=0
                )  # [block, d] real gather at this width
                crr = jnp.take(cl_lvl, jnp.clip(r - s0, 0, w - 1), axis=0)
                dl = jnp.sum(jnp.square(xb - crl), axis=-1)
                dr = jnp.sum(jnp.square(xb - crr), axis=-1)
                go_left = dl <= dr
            both = (l >= 0) & (r >= 0)
            pick_two = jnp.where(go_left, l, r)
            pick_one = jnp.where(l >= 0, l, jnp.where(r >= 0, r, nodes_b))
            nodes_b = jnp.where(both, pick_two, pick_one)
        return nodes_b

    if xp.shape[0] == block:
        nodes = one(xp)[:n]
    else:
        nodes = jax.lax.map(
            one, xp.reshape(-1, block, d)
        ).reshape(-1)[:n]
    # Back to original node ids. Narrow trees use the masked reduce (NOT
    # jnp.take — the select-ladder cost, ~15 ms at 511 nodes); wide trees
    # take the real gather path, where the reduce's O(n·nodes) lane work
    # would dominate instead.
    num_nodes = perm.shape[0]
    if num_nodes < _TSVQ_WIDE_LEVEL_W:
        iota_all = jnp.arange(num_nodes, dtype=jnp.int32)[None, :]
        return jnp.sum(
            jnp.where(iota_all == nodes[:, None], perm[None, :] + 1, 0),
            axis=1,
        ) - 1
    return jnp.take(perm, nodes)


# Deep-tree gate: past this node count the full-scores path's
# nodes×depth select traffic loses to the level-sliced form. No upper
# bound: levels ≥ _TSVQ_WIDE_LEVEL_W wide switch to real child gathers
# (O(d) per row, width-independent), so the levels form scales to
# arbitrarily deep trees (round-4's 4096-node ceiling removed).
_TSVQ_SCORES_MAX_NODES = 128


def _find_leaves(tree: "TSVQTree", x: jnp.ndarray, metric: Metric,
                 force_levels: bool = False):
    """Dispatch the fastest traversal for this tree/metric/backend."""
    l2 = metric in (Metric.SQUARED_EUCLIDEAN, Metric.EUCLIDEAN)
    if (
        l2
        and tree.num_nodes > _TSVQ_SCORES_MAX_NODES
        and (force_levels or jax.default_backend() == "tpu")
    ):
        cb, lb, rb, perm, starts = tree.bfs_layout()
        return _tsvq_find_leaf_levels(
            x, cb, lb, rb, perm, tree.depth, starts
        )
    return _tsvq_find_leaf(
        x, tree.centroids, tree.left, tree.right, metric, tree.depth
    )


class TSVQ(Quantizer):
    """Tree-structured vector quantizer (reference: src/tsvq.rs:158-266).

    pyvq-compatible constructor: ``TSVQ(training_data, max_depth,
    distance=None)`` with ``distance`` defaulting to Euclidean
    (pyvq/src/tsvq.rs:42-70). A prebuilt :class:`TSVQTree` may be supplied
    via ``tree=`` (e.g. from a checkpoint).

    A depth-1 tree splits on the max-variance dimension at its median
    (reference src/tsvq.rs:47-81) and emits the chosen leaf's centroid
    as f16:

    >>> import numpy as np
    >>> data = np.array(
    ...     [[0., 0.], [0., 1.], [10., 0.], [10., 1.]], np.float32
    ... )
    >>> t = TSVQ(data, max_depth=1)
    >>> t.quantize(np.array([9.5, 0.4], np.float32)).astype(
    ...     np.float32
    ... ).tolist()
    [10.0, 0.5]
    """

    def __init__(
        self,
        training_data=None,
        max_depth: int = None,
        distance=None,
        *,
        tree: Optional[TSVQTree] = None,
        build: str = "host",
    ):
        if isinstance(distance, Distance):
            self._metric = distance.metric
        else:
            self._metric = Metric.parse(distance)
        if tree is not None:
            self._tree = tree
        else:
            if training_data is None or max_depth is None:
                raise InvalidParameter(
                    "training_data/max_depth",
                    "required when a prebuilt tree is not given",
                )
            if build == "device":
                # Level-synchronous accelerator build (same tree; ~7x
                # faster than the host recursion at GIST scale once the
                # per-level programs are compiled).
                self._tree = tsvq_build_batched(training_data, max_depth)
            elif build == "host":
                self._tree = tsvq_build(training_data, max_depth)
            else:
                raise InvalidParameter(
                    "build", f"expected 'host' or 'device', got {build!r}"
                )

    @property
    def tree(self) -> TSVQTree:
        return self._tree

    @property
    def dim(self) -> int:
        return self._tree.dim

    @property
    def max_depth(self) -> int:
        return self._tree.depth

    @property
    def num_nodes(self) -> int:
        return self._tree.num_nodes

    @property
    def num_leaves(self) -> int:
        return self._tree.num_leaves

    @property
    def distance_metric(self) -> str:
        return self._metric.value

    @property
    def distance(self) -> Distance:
        return Distance(self._metric)

    def encode(self, x) -> jnp.ndarray:
        """Leaf node ids ``[n]`` int32 for each input row — the compact code
        (log2(leaves) bits/vector, vs the reference's f16-per-element)."""
        x2d, was_1d = as_batch_f32(x)
        if x2d.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x2d.shape[1])
        nodes = _find_leaves(self._tree, x2d, self._metric)
        return nodes[0] if was_1d else nodes

    def decode(self, nodes) -> jnp.ndarray:
        """Leaf node ids -> f32 centroid vectors.

        On TPU with small trees this is a one-hot HIGHEST matmul, not
        ``jnp.take`` — a take with millions of indices into a
        several-hundred-row table lowers to a ~15 ms select ladder
        (same finding as PQ decode, 9.7x there); the bf16x6 one-hot
        product reconstructs the f32 centroids bit-exactly.
        """
        nodes = jnp.asarray(nodes, jnp.int32)
        cents = self._tree.centroids
        if nodes.ndim == 1:
            from vq_tpu.ops.pick import pick_rows

            return pick_rows(cents, nodes)  # one-hot on TPU <= 4096 rows
        return jnp.take(cents, nodes, axis=0)

    def quantize(self, x) -> jnp.ndarray:
        """Reference-parity quantize: leaf centroid as f16
        (src/tsvq.rs:239-255)."""
        x2d, was_1d = as_batch_f32(x)
        if x2d.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x2d.shape[1])
        recon = self.decode(self.encode(x2d)).astype(jnp.float16)
        return recon[0] if was_1d else recon

    def dequantize(self, quantized) -> jnp.ndarray:
        """f16 -> f32 cast with dim check (src/tsvq.rs:257-265)."""
        q = jnp.asarray(quantized)
        d = q.shape[-1] if q.ndim else 0
        if d != self.dim:
            raise DimensionMismatch(expected=self.dim, found=d)
        return q.astype(jnp.float32)

    def __repr__(self) -> str:
        return (
            f"TSVQ(dim={self.dim}, max_depth={self.max_depth}, "
            f"nodes={self.num_nodes}, distance={self._metric.value!r})"
        )
