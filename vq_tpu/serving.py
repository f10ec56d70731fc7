"""Dispatch-amortized batch serving.

A single ``index.search`` call costs one host→device dispatch; through any
RPC layer (a PJRT tunnel, a serving frontend, a remote executor) that fixed
cost dominates — on this machine's tunneled TPU a trivial matmul measures
~25 ms/call while the rebalanced fused IVF probe needs only 6.4 ms of
device time per 128 queries (docs/performance.md). :class:`BatchPipeline`
removes the per-batch dispatch: it compiles ONE program that ``lax.scan``s
the index's search core over ``T`` query batches, so ``T`` batches cost one
dispatch and the client observes device-rate QPS (~20k/chip for rebalanced
IVF-Flat at 1M×128 instead of ~3-4k).

Every index exposes its search as a traceable ``_search_core(k, **params)
-> (fn, arrays)`` pair — the same code path :meth:`search` runs eagerly, so
pipelined results are bit-identical to per-batch calls. Storage rides as
program *arguments* (never jit-closure constants, which would re-upload the
corpus on each compile through a tunnel).

The reference is a single-call CPU library with no serving layer; this is
north-star capability (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vq_tpu.errors import (
    DimensionMismatch,
    InvalidData,
    InvalidParameter,
)

__all__ = ["BatchPipeline", "pipelined_search"]


class BatchPipeline:
    """Compile-once pipelined serving over an index.

    ::

        pipe = BatchPipeline(index, k=10, nprobe=8)
        ids, vals = pipe.search(batches)   # [T, Q, d] -> [T, Q, k] x2

    The pipeline snapshots the index's storage at construction; after
    ``add``/``remove_ids``/``rebalance``, build a new pipeline (searching
    a stale one raises). One compile per distinct ``[T, Q]`` shape.
    """

    def __init__(self, index, k: int = 10, **search_params):
        core_maker = getattr(index, "_search_core", None)
        if core_maker is None:
            raise InvalidParameter(
                "index",
                f"{type(index).__name__} does not support pipelined "
                "serving (no _search_core)",
            )
        self.index = index
        self.k = int(k)
        self.params = dict(search_params)
        core, arrays = core_maker(self.k, **self.params)
        self._wire(core, arrays, ntotal=index.ntotal,
                   dim=getattr(index, "dim", None))

    @classmethod
    def from_core(cls, core, arrays, *, dim: Optional[int] = None):
        """Build a pipeline from an explicit ``(fn, arrays)`` search core
        — e.g. the multi-chip
        :func:`vq_tpu.parallel.sharded_scan_search_core`, whose arrays
        come back mesh-placed so the scanned program serves list-sharded
        buckets across devices. No staleness check (there is no index to
        watch); rebuild after the underlying storage changes."""
        self = cls.__new__(cls)
        self.index = None
        self.k = None
        self.params = {}
        self._wire(core, tuple(arrays), ntotal=None, dim=dim)
        return self

    def _wire(self, core, arrays, *, ntotal, dim):
        self._arrays = arrays
        self._ntotal = ntotal
        self._dim = dim

        def scanner(qs, *arrs):
            def step(_, q):
                return None, core(q, *arrs)

            _, out = jax.lax.scan(step, None, qs)
            return out

        self._scanner = jax.jit(scanner)

    def search(
        self, query_batches
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Run every batch in ONE device dispatch.

        ``query_batches`` is ``[T, Q, d]`` (or a list of ``[Q, d]`` arrays
        of equal shape). Returns ``(ids [T, Q, k], values [T, Q, k])``.
        """
        if self.index is not None and self.index.ntotal != self._ntotal:
            raise InvalidData(
                "index contents changed since this BatchPipeline was "
                "built — construct a new one"
            )
        qs = jnp.asarray(query_batches, jnp.float32)
        if qs.ndim != 3:
            raise InvalidParameter(
                "query_batches", f"expected [T, Q, d], got {qs.ndim}-D"
            )
        if self._dim is not None and qs.shape[-1] != self._dim:
            raise DimensionMismatch(expected=self._dim, found=qs.shape[-1])
        return self._scanner(qs, *self._arrays)


def pipelined_search(
    index,
    queries,
    k: int = 10,
    *,
    batch: int = 128,
    pipeline: Optional[BatchPipeline] = None,
    **search_params,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Search a large flat query set ``[N, d]`` at device rate.

    Splits the queries into ``ceil(N / batch)`` batches (the last padded
    with its first row), scans them in one dispatch, and returns
    ``(ids [N, k], values [N, k])``. Pass a pre-built ``pipeline`` to
    reuse its compiled program across calls (recommended in serving
    loops); otherwise one is built from ``k`` and ``search_params``.
    """
    q = jnp.asarray(queries, jnp.float32)
    if q.ndim == 1:
        q = q[None, :]
    if q.ndim != 2:
        raise InvalidParameter(
            "queries", f"expected [N, d], got {q.ndim}-D"
        )
    n, d = q.shape
    if n == 0:
        raise InvalidParameter("queries", "empty query set")
    batch = max(1, min(int(batch), n))
    if pipeline is None:
        pipeline = BatchPipeline(index, k=k, **search_params)
    pad = (-n) % batch
    if pad:
        q = jnp.concatenate([q, jnp.broadcast_to(q[:1], (pad, d))])
    ids, vals = pipeline.search(q.reshape(-1, batch, d))
    kk = ids.shape[-1]
    return ids.reshape(-1, kk)[:n], vals.reshape(-1, kk)[:n]
