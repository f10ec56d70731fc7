"""Runtime-parameter autotuning — the faiss ``ParameterSpace`` /
``OperatingPoints`` analog.

The reference library has no serving layer, so it has nothing to tune; every
approximate index here does (``nprobe`` for the IVF family, ``beam`` for the
graph, ``rerank`` for the coded flat scans). This module measures the
recall/latency operating points of an index over a parameter grid and picks
the cheapest configuration that meets a recall target:

    gt, _ = exact_neighbors(corpus, queries, k=10)
    ops = sweep(index, queries, gt)             # default grid for the type
    best = tune(index, queries, gt, target_recall=0.95)
    index.search(queries, 10, **best.params)

Timing is forced-completion (a host readback of the returned ids), because
``block_until_ready`` under-reports through tunneled PJRT backends — see
`.claude/skills/verify/SKILL.md`.
"""

from __future__ import annotations

import itertools
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from vq_tpu.errors import InvalidParameter

__all__ = [
    "OperatingPoint",
    "exact_neighbors",
    "recall_at",
    "sweep",
    "pareto",
    "tune",
    "default_grid",
]


@dataclass(frozen=True)
class OperatingPoint:
    """One measured (parameters → quality/cost) point."""

    params: Dict[str, int] = field(compare=False)
    recall: float = 0.0
    time_ms: float = 0.0  # per query batch
    qps: float = 0.0

    def dominates(self, other: "OperatingPoint") -> bool:
        """At least as good on both axes, strictly better on one."""
        return (
            self.recall >= other.recall
            and self.time_ms <= other.time_ms
            and (self.recall > other.recall or self.time_ms < other.time_ms)
        )


def exact_neighbors(
    corpus, queries, k: int = 10, *, metric: str = "squared_euclidean"
) -> Tuple[np.ndarray, np.ndarray]:
    """Ground-truth top-k ``(ids [Q, k], values [Q, k])`` by exact scan."""
    from vq_tpu.search import FlatIndex

    idx = FlatIndex.from_data(corpus, metric=metric)
    ids, vals = idx.search(queries, k)
    return np.asarray(ids), np.asarray(vals)


def recall_at(ids, gt_ids) -> float:
    """Fraction of ground-truth neighbors retrieved (set intersection per
    query, the standard recall@k). ``-1`` padding never matches."""
    ids = np.asarray(ids)
    gt = np.asarray(gt_ids)
    if ids.shape[0] != gt.shape[0]:
        raise InvalidParameter(
            "ids", f"query counts differ: {ids.shape[0]} vs {gt.shape[0]}"
        )
    hits = 0
    for row, gt_row in zip(ids, gt):
        want = gt_row[gt_row >= 0]
        hits += np.intersect1d(row[row >= 0], want).size
    total = int((gt >= 0).sum())
    return hits / max(total, 1)


def default_grid(index, k: int = 10) -> Dict[str, Sequence[int]]:
    """A sensible sweep grid for the index's type (the ``ParameterSpace``
    heuristics): ``nprobe`` doublings for the IVF family, ``beam`` for the
    graph, ``rerank`` multiples of k for coded scans with a kept corpus."""
    from vq_tpu.factory import FactoryIndex, IdMapIndex
    from vq_tpu.graph import GraphIndex
    from vq_tpu.ivf import IVFPQIndex
    from vq_tpu.ivf_flat import _IVFScanBase
    from vq_tpu.search import PQIndex, RQIndex, SQIndex
    from vq_tpu.transforms import TransformedIndex

    if isinstance(index, FactoryIndex):
        return default_grid(index.index, k)
    if isinstance(index, (IdMapIndex, TransformedIndex)):
        return default_grid(index.base, k)
    from vq_tpu.refine import RefineIndex

    if isinstance(index, RefineIndex):
        grid = dict(default_grid(index.base, k))
        grid.pop("rerank", None)  # the refiner IS the rerank stage
        grid["k_factor"] = [1, 2, 4, 8, 16]
        return grid
    if isinstance(index, (_IVFScanBase, IVFPQIndex)):
        nlist = index.nlist
        probes = [p for p in (1, 2, 4, 8, 16, 32, 64, 128) if p <= nlist]
        if not probes or probes[-1] != nlist:
            probes.append(nlist)
        grid: Dict[str, Sequence[int]] = {"nprobe": probes}
        if getattr(index, "_corpus", None) is not None:
            grid["rerank"] = [0, 4 * k, 16 * k]
        return grid
    if isinstance(index, GraphIndex):
        return {"beam": [8, 16, 32, 64]}
    if isinstance(index, (PQIndex, RQIndex, SQIndex)):
        if getattr(index, "_corpus", None) is not None:
            return {"rerank": [0, 2 * k, 4 * k, 16 * k]}
        return {}
    return {}  # exact indexes: nothing to tune


def _timed_search(index, queries, k: int, params: Dict, reps: int):
    best = float("inf")
    ids = None
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        ids, _ = index.search(queries, k, **params)
        ids = np.asarray(ids)  # forced completion: host readback
        best = min(best, time.perf_counter() - t0)
    return ids, best


def sweep(
    index,
    queries,
    gt_ids,
    *,
    k: Optional[int] = None,
    grid: Optional[Dict[str, Sequence[int]]] = None,
    reps: int = 2,
) -> List[OperatingPoint]:
    """Measure recall and latency at every grid point (cartesian product).

    ``gt_ids`` is the exact top-k (``exact_neighbors``); ``k`` defaults to
    its width. Each point is searched ``reps`` times keeping the fastest
    (first call pays compilation — with ``reps >= 2`` the steady state is
    measured). Returns points in grid order."""
    gt = np.asarray(gt_ids)
    if k is None:
        k = int(gt.shape[1])
    if grid is None:
        grid = default_grid(index, k)
    names = sorted(grid)
    combos = (
        [dict(zip(names, vals)) for vals in itertools.product(
            *(grid[n] for n in names)
        )]
        if names else [{}]
    )
    nq = np.asarray(queries).shape[0]
    points = []
    for params in combos:
        ids, secs = _timed_search(index, queries, k, params, reps)
        points.append(
            OperatingPoint(
                params=params,
                recall=recall_at(ids, gt),
                time_ms=secs * 1e3,
                qps=nq / secs if secs > 0 else float("inf"),
            )
        )
    return points


def pareto(points: Sequence[OperatingPoint]) -> List[OperatingPoint]:
    """The non-dominated (recall ↑, time ↓) frontier, sorted by time."""
    frontier = [
        p for p in points
        if not any(q.dominates(p) for q in points)
    ]
    return sorted(frontier, key=lambda p: (p.time_ms, -p.recall))


def tune(
    index,
    queries,
    gt_ids,
    target_recall: float = 0.9,
    *,
    k: Optional[int] = None,
    grid: Optional[Dict[str, Sequence[int]]] = None,
    reps: int = 2,
) -> OperatingPoint:
    """Cheapest measured operating point with ``recall >= target_recall``.

    Falls back to the highest-recall point when the target is unreachable
    on the grid (so the caller always gets something runnable)."""
    points = sweep(index, queries, gt_ids, k=k, grid=grid, reps=reps)
    feasible = [p for p in points if p.recall >= target_recall]
    if feasible:
        return min(feasible, key=lambda p: p.time_ms)
    return max(points, key=lambda p: (p.recall, -p.time_ms))
