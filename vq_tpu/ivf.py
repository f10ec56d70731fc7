"""IVF-PQ: inverted-file index with product-quantized residuals.

The standard two-level large-scale ANN index (coarse k-means partition +
PQ codes per list), built TPU-first:

* **Static shapes everywhere.** Inverted lists live in the chunked
  pool layout (:mod:`vq_tpu.ivf_pool`: ``codes [n_chunks, CH, m]`` +
  per-list chunk chains, −1 = dead slot), so a search is pure gathers +
  matmuls under jit — no ragged structures, and no padded-cap memory
  inflation from skew.
* **Residual encoding** (``by_residual=True``, the accuracy-standard
  formulation): PQ trains on ``x − coarse_centroid(x)`` and search builds
  per-(query, probed-list) lookup tables over the query residuals.
* **Search** = coarse scan ([Q, nlist] matmul) → top-``nprobe`` lists →
  residual ADC tables ([Q, nprobe, m, k] einsum) → per-subspace
  table gathers over the probed buckets → masked top-k. Optional exact
  rerank when the raw corpus is retained.

Everything heavy is jitted; `add` is append-only with lazy bucket
(re)building.

* **MIPS** (``metric="dot"``): probes lists by max ``q.c``, scores
  candidates by decomposed inner product (per-query dot tables through the
  same fused probe kernel, negated; plus a ``q.c_probe`` offset for
  residual-coded indexes), and returns descending scores with ``-inf``
  padding. Train with ``metric="dot"`` to get score-aware (anisotropic)
  codebooks — the ScaNN-style pipeline at IVF scale. Caveat measured on
  isotropic (structureless) data: coarse lists capture little of the
  score variance, so probing needs a large ``nprobe`` and top-1-ish
  precision needs ``keep_corpus=True`` + ``rerank`` (full-probe recall
  exactly matches the full-scan-over-reconstructions ceiling — the
  machinery loses nothing; the codes and the partition are the limits,
  as for any IVF-MIPS system).

**When to prefer the flat index on TPU:** the flat ADC scan is O(n) pure
MXU work (3122 QPS at 1M rows); the fused Pallas probe (round 2:
scalar-prefetch DMA of probed lists into VMEM, no HBM mega-gather) is
O(nprobe × cap) independent of corpus size — 2634 QPS at cap=2048 after
:meth:`IVFPQIndex.rebalance`. Crossover ≈ 1-2M rows: below it use
`PQIndex`, above it IVF wins linearly (measured numbers in
docs/performance.md). Keep lists balanced — probe cost tracks the LARGEST
list, so `rebalance()` after skewed ingest is what buys the win.
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
from vq_tpu.ivf_pool import ChunkPool, take_list_ids, take_list_payload
from vq_tpu.models.pq import ProductQuantizer, pq_train
from vq_tpu.ops.kmeans import lloyd
from vq_tpu.utils.serialize import _from_npz, _to_npz

__all__ = ["IVFPQIndex"]


def _ivf_probe_dists(
    q, coarse, cb, pool_codes, slot_ids, chains_s, nprobe, cap,
    use_pallas, interpret, metric, by_residual,
):
    """Probe + ADC scoring shared by search and range_search:
    returns ``(ids [Q, np, cap], dist [Q, np, cap])`` — smaller is
    better, pads inf-masked (``metric="dot"`` tables are negated
    scores; the caller negates back)."""
    Q, d = q.shape
    m, kk, s = cb.shape

    # Coarse scan on the MXU. L2 probes by min ||q-c||^2; dot probes by
    # max q.c (the standard MIPS-IVF heuristic).
    cc = jnp.sum(coarse * coarse, axis=-1)
    qc = jax.lax.dot_general(
        q, coarse, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    if metric == "dot":
        coarse_scores = -qc
    else:
        coarse_scores = cc[None, :] - 2.0 * qc  # (+||q||^2, argmin-inv)
    _, probe = jax.lax.top_k(-coarse_scores, nprobe)  # [Q, nprobe]

    if metric == "dot":
        # Score decomposes: q.x~ = [q.c_probe +] sum_i q_i.cb_i[code_i].
        # Tables are per-query only (no residual adjustment) — negated, and
        # the q.c offset is added back after the bucket scan.
        qs = q.reshape(Q, m, s)
        t = jnp.einsum(
            "qms,mks->qmk", qs, cb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Q, m, kk]
        tables = jnp.broadcast_to(-t[:, None], (Q, nprobe, m, kk))
    else:
        # L2 tables from the residual r = q - c_probe when codes are
        # residual-coded, from q itself otherwise (a non-residual index
        # must NOT subtract the coarse centroid — its codes reconstruct
        # the raw vectors).
        if by_residual:
            qres = q[:, None, :] - jnp.take(coarse, probe, axis=0)
        else:
            qres = jnp.broadcast_to(q[:, None, :], (Q, nprobe, d))
        qres = qres.reshape(Q, nprobe, m, s)  # [Q, np, m, s]
        cbcb = jnp.sum(cb * cb, axis=-1)  # [m, kk]
        rc = jnp.einsum(
            "plms,mks->plmk", qres, cb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Q, np, m, kk]
        rr = jnp.sum(qres * qres, axis=-1)  # [Q, np, m]
        tables = rr[..., None] + cbcb[None, None] - 2.0 * rc  # [Q,np,m,kk]

    ch = slot_ids.shape[1]
    ids = take_list_ids(slot_ids, chains_s, probe, cap)  # [Q, np, ce]
    from vq_tpu.ivf_flat import _prefetch_fits

    if use_pallas and _prefetch_fits(Q, nprobe, chains_s):
        # Fused probe kernel: scalar-prefetched CHUNK ids DMA each probed
        # chain's codes straight into VMEM; no [Q, np, ce, m] HBM gather
        # and no take_along_axis lane gathers (round-1's 20x slowdown).
        # The kernel is the padded-bucket one unchanged — a chunk is
        # natively one of its "lists", probed per chain position.
        from vq_tpu.ops.pallas_kernels import ivf_probe_adc_fused

        ct = jnp.take(chains_s, probe, axis=0)  # [Q, np, maxc_s]
        maxc_s = ct.shape[-1]
        tab_rep = jnp.broadcast_to(
            tables[:, :, None], (Q, nprobe, maxc_s, m, kk)
        ).reshape(Q * nprobe * maxc_s, m, kk)
        dist = ivf_probe_adc_fused(
            tab_rep,
            jnp.maximum(ct, 0).reshape(-1),
            pool_codes,
            interpret=interpret,
        ).reshape(Q, nprobe, maxc_s * ch)  # [Q, np, ce]
    else:
        # XLA fallback: gather probed chains' codes, sum table entries
        # per subspace. Codes are stored u8 (k <= 256) so the big gather
        # moves 4x less HBM; the index cast fuses into its consumer.
        codes = take_list_payload(
            pool_codes, chains_s, probe
        )  # [Q, np, ce, m]
        dist = jnp.zeros(codes.shape[:3], jnp.float32)  # [Q, np, ce]
        for i in range(m):
            dist = dist + jnp.take_along_axis(
                tables[:, :, i, :], codes[..., i].astype(jnp.int32), axis=-1
            )
    if metric == "dot" and by_residual:
        # Per-probed-list offset: score += q.c_probe (negated convention).
        qc_probe = jnp.take_along_axis(qc, probe, axis=1)  # [Q, np]
        dist = dist - qc_probe[..., None]
    dist = jnp.where(ids >= 0, dist, jnp.inf)
    return ids, dist


@functools.partial(
    jax.jit,
    static_argnames=(
        "nprobe", "k", "cap", "use_pallas", "interpret", "metric",
        "by_residual",
    ),
)
def _ivf_search_jit(
    q: jnp.ndarray,  # [Q, d]
    coarse: jnp.ndarray,  # [nlist, d]
    cb: jnp.ndarray,  # [m, kk, s]
    pool_codes: jnp.ndarray,  # [n_chunks, CH, m] u8/int32
    slot_ids: jnp.ndarray,  # [n_chunks, CH] int32 (-1 empty)
    chains_s: jnp.ndarray,  # [nlist, maxc_s] int32 chunk chains
    nprobe: int,
    k: int,
    cap: int,
    use_pallas: bool = False,
    interpret: bool = False,
    metric: str = "l2",
    by_residual: bool = True,
):
    """Probe + ADC + top-k merge."""
    Q = q.shape[0]
    ids, dist = _ivf_probe_dists(
        q, coarse, cb, pool_codes, slot_ids, chains_s, nprobe, cap,
        use_pallas, interpret, metric, by_residual,
    )
    flat_dist = dist.reshape(Q, -1)
    flat_ids = ids.reshape(Q, -1)
    neg_top, pos = jax.lax.top_k(-flat_dist, k)
    found = jnp.take_along_axis(flat_ids, pos, axis=1)
    return found, -neg_top


@functools.partial(
    jax.jit,
    static_argnames=(
        "nprobe", "fetch", "cap", "use_pallas", "interpret", "metric",
        "by_residual",
    ),
)
def _ivf_range_jit(
    q, coarse, cb, pool_codes, slot_ids, chains_s, nprobe: int,
    fetch: int, cap: int, radius, use_pallas: bool, interpret: bool,
    metric: str, by_residual: bool,
):
    """Probe + ADC radius scan: best ``fetch`` hits within ``radius``
    (smaller-is-better domain) plus TRUE per-query probed-hit counts."""
    Q = q.shape[0]
    ids, dist = _ivf_probe_dists(
        q, coarse, cb, pool_codes, slot_ids, chains_s, nprobe, cap,
        use_pallas, interpret, metric, by_residual,
    )
    flat_d = dist.reshape(Q, -1)
    flat_i = ids.reshape(Q, -1)
    hit = (flat_d <= radius) & (flat_i >= 0)
    counts = jnp.sum(hit, axis=1, dtype=jnp.int32)
    flat_d = jnp.where(hit, flat_d, jnp.inf)
    flat_i = jnp.where(hit, flat_i, -1)
    neg, pos = jax.lax.top_k(-flat_d, fetch)
    return jnp.take_along_axis(flat_i, pos, axis=1), -neg, counts


class IVFPQIndex:
    """Inverted-file index with PQ-coded residuals (the FAISS ``IVFx,PQy``
    analog), TPU-native.

    Build with :meth:`train` (coarse k-means + residual PQ from a training
    sample), then :meth:`add` corpus batches and :meth:`search`.
    """

    def __init__(
        self,
        coarse_centroids,
        pq: ProductQuantizer,
        *,
        by_residual: bool = True,
        keep_corpus: bool = False,
        max_list_size: Optional[int] = None,
        metric: str = "l2",
    ):
        """``max_list_size`` caps the padded bucket capacity: lists longer
        than the cap keep only their first ``max_list_size`` entries in the
        probe structure (overflow entries are reported by
        :meth:`bucket_stats` and still retrievable via rerank when the
        corpus is kept). Bounds memory to ``nlist * cap * m`` under
        adversarial skew.

        ``metric="dot"`` makes :meth:`search` a maximum-inner-product
        search (descending scores, ``-inf`` padding); pass an
        :class:`~vq_tpu.models.pq_anisotropic.AnisotropicProductQuantizer`
        as ``pq`` (or use :meth:`train` with ``metric="dot"``) for
        score-aware codes."""
        if metric not in ("l2", "dot"):
            raise InvalidParameter("metric", "must be 'l2' or 'dot'")
        self.metric = metric
        self.coarse = jnp.asarray(coarse_centroids, jnp.float32)  # [nlist, d]
        self.pq = pq
        self.by_residual = bool(by_residual)
        self.keep_corpus = bool(keep_corpus)
        self.max_list_size = max_list_size
        if self.coarse.shape[1] != pq.dim:
            raise DimensionMismatch(
                expected=pq.dim, found=self.coarse.shape[1]
            )
        # Chunk-pool code storage (round 5): codes scatter in place
        # into fixed-size chunks (vq_tpu.ivf_pool) — no padded bucket
        # tensor, no flat shadow copy, appends peak at O(batch). The
        # optional kept corpus stays a flat device array (exact-rerank
        # convenience; impractical at the scales the pool targets).
        self._pool: Optional[ChunkPool] = None
        self._flat_lists: Optional[jnp.ndarray] = None  # [n] i32
        self._corpus: Optional[jnp.ndarray] = None
        self._buckets = None

    def _payload_specs(self) -> dict:
        code_dt = jnp.uint8 if self.pq.num_centroids <= 256 else jnp.int32
        return {"codes": ((self.pq.num_subspaces,), code_dt)}

    def _pool_append(self, lists, payloads: dict) -> None:
        if self._pool is None:
            self._pool = ChunkPool(
                self._payload_specs(), self.nlist,
                max_list_size=self.max_list_size,
            )
        self._pool.append(lists, payloads)
        self._buckets = None

    def reserve(self, rows: int) -> None:
        """Preallocate code storage for ``rows`` total vectors so adds
        scatter into place without doubling copies."""
        if self._pool is None:
            self._pool = ChunkPool(
                self._payload_specs(), self.nlist,
                max_list_size=self.max_list_size,
            )
        self._pool.reserve(int(rows))

    # -- construction -------------------------------------------------------

    @classmethod
    def train(
        cls,
        training_data,
        nlist: int,
        num_subspaces: int,
        num_centroids: int = 256,
        *,
        max_iters: int = 10,
        seed: int = 42,
        by_residual: Optional[bool] = None,
        keep_corpus: bool = False,
        metric: str = "l2",
        anisotropic_threshold: float = 0.2,
        refine_iters: int = 5,
        spherical: bool = False,
    ) -> "IVFPQIndex":
        """Fit the coarse quantizer and the (residual) PQ codebooks.

        The coarse quantizer seeds with k-means++ — balanced lists directly
        bound the padded bucket capacity (memory and search cost both scale
        with the largest list).

        With ``metric="dot"`` the index defaults to ``by_residual=False``
        and fits an anisotropic (score-aware) PQ on the raw vectors — the
        parallel-error weighting needs each datapoint's own direction, so
        non-residual coding is where it applies exactly. ``by_residual``
        may still be forced True (plain PQ on residuals + score offsets at
        search time).
        """
        if metric not in ("l2", "dot"):
            raise InvalidParameter("metric", "must be 'l2' or 'dot'")
        if by_residual is None:
            by_residual = metric == "l2"
        x = jnp.asarray(training_data, jnp.float32)
        res = lloyd(x, nlist, max_iters=max_iters, seed=seed,
                    init="kmeans++", spherical=spherical)
        coarse = res.centroids
        if by_residual:
            from vq_tpu.ops.pick import pick_rows

            assign = res.assignments
            train_vecs = x - pick_rows(coarse, assign)
        else:
            train_vecs = x
        if metric == "dot" and not by_residual:
            from vq_tpu.models.pq_anisotropic import (
                AnisotropicProductQuantizer,
                pq_train_anisotropic,
            )

            cb = pq_train_anisotropic(
                train_vecs, num_subspaces, num_centroids,
                max_iters=max_iters, seed=seed + 1,
                threshold=anisotropic_threshold, refine_iters=refine_iters,
            )
            pq = AnisotropicProductQuantizer(
                codebooks=cb, threshold=anisotropic_threshold
            )
        else:
            cb = pq_train(
                train_vecs, num_subspaces, num_centroids,
                max_iters=max_iters, seed=seed + 1,
            )
            pq = ProductQuantizer(codebooks=cb, distance="squared_euclidean")
        return cls(
            coarse, pq, by_residual=by_residual, keep_corpus=keep_corpus,
            metric=metric,
        )

    @property
    def nlist(self) -> int:
        return self.coarse.shape[0]

    @property
    def dim(self) -> int:
        return int(self.coarse.shape[1])

    @property
    def ntotal(self) -> int:
        return 0 if self._flat_lists is None else int(
            self._flat_lists.shape[0]
        )

    # -- data ---------------------------------------------------------------

    def add(self, vectors) -> None:
        """Coarse-assign, residual-encode, and append a batch.

        f16/bf16 batches keep a half-width kept-corpus; residuals compute
        in f32 (the subtraction promotes), so codes match f32 input.
        """
        x = jnp.asarray(vectors)
        if x.dtype not in (jnp.float16, jnp.bfloat16):
            x = x.astype(jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[1] != self.pq.dim:
            raise DimensionMismatch(expected=self.pq.dim, found=x.shape[1])
        from vq_tpu.ops.kmeans import assign

        from vq_tpu.ops.pick import pick_rows

        lists, _ = assign(x, self.coarse)
        enc_in = (
            x - pick_rows(self.coarse, lists) if self.by_residual else x
        )
        codes = self.pq.encode(enc_in)  # stays on device
        lists = jnp.asarray(lists, jnp.int32)
        self._pool_append(lists, {"codes": codes})
        self._flat_lists = (
            lists if self._flat_lists is None
            else jnp.concatenate([self._flat_lists, lists])
        )
        if self.keep_corpus:
            self._corpus = (
                x if self._corpus is None
                else jnp.concatenate([self._corpus, x], axis=0)
            )

    def remove_ids(self, ids) -> int:
        """Remove stored vectors by position; remaining vectors renumber
        sequentially (faiss ``remove_ids`` contract). Buckets rebuild
        lazily on the next search."""
        from vq_tpu.search import _removal_keep_mask

        if self._flat_lists is None:
            raise EmptyInput("index is empty")
        mask = np.asarray(_removal_keep_mask(ids, self.ntotal))
        removed_idx = np.where(~mask)[0]
        lists_np = np.asarray(self._flat_lists)
        keep = jnp.asarray(np.nonzero(mask)[0], jnp.int32)
        self._flat_lists = jnp.take(self._flat_lists, keep)
        self._pool.remove(removed_idx, lists_np)
        if self._corpus is not None:
            self._corpus = jnp.asarray(np.asarray(self._corpus)[mask])
        self._buckets = None
        return int(removed_idx.size)

    def merge_from(self, other: "IVFPQIndex") -> int:
        """Move every vector of ``other`` into this index (faiss IVF
        ``merge_from``: same coarse quantizer and PQ codebooks; codes are
        copied, never re-encoded, and ``other`` is left empty). Returns
        the number of vectors moved."""
        from vq_tpu.search import _merge_check, _merge_corpus

        _merge_check(
            self, other, attrs=("metric", "by_residual"),
            arrays=(
                ("coarse centroids", self.coarse, other.coarse),
                ("PQ codebooks", self.pq._codebooks, other.pq._codebooks),
            ),
        )
        moved = other.ntotal
        _merge_corpus(self, other)
        if moved:
            self._pool_append(other._flat_lists, other._pool.to_flat())
            self._flat_lists = (
                other._flat_lists if self._flat_lists is None
                else jnp.concatenate([self._flat_lists, other._flat_lists])
            )
        other._pool = other._flat_lists = other._corpus = None
        other._buckets = None
        return moved

    def reconstruct(self, ids) -> jnp.ndarray:
        """Decode stored codes for ids (coarse centroid + PQ decode of the
        residual when ``by_residual``) — the quantized approximation of
        the original vectors, like faiss ``IndexIVFPQ.reconstruct``."""
        if self._pool is None or self._pool.n_rows == 0:
            raise EmptyInput("index is empty")
        pos = jnp.asarray(ids, jnp.int32)
        rec = self.pq.decode(self._pool.gather_rows("codes", pos))
        if self.by_residual:
            lists = jnp.take(jnp.asarray(self._flat_lists), pos, axis=0)
            rec = rec + jnp.take(self.coarse, lists, axis=0)
        return rec

    def search_and_reconstruct(self, queries, k: int = 10, **kw):
        """Search plus the decoded vector of every hit — ``(ids, values,
        vectors [Q, k, d])``; padded ``-1`` ids yield zero rows."""
        from vq_tpu.search import _search_and_reconstruct

        return _search_and_reconstruct(self, queries, k, **kw)

    def _reconstruct_core(self):
        """:meth:`reconstruct` as a traceable ``(fn, arrays)`` pair with
        ``fn(ids [N] i32, *arrays) -> [N, d] f32`` — pool code storage
        (+ its id->slot map), list assignments, and the coarse centroids
        ride as arguments. Used by :class:`vq_tpu.refine.RefineIndex`
        for IVFPQR-style residual refinement."""
        if self._pool is None or self._pool.n_rows == 0:
            raise EmptyInput("index is empty — add() vectors first")
        pq, by_residual = self.pq, self.by_residual
        m = self.pq.num_subspaces

        def fn(ids, codes_pool, pos, lists, coarse):
            flat = codes_pool.reshape(-1, m)
            rec = pq.decode(jnp.take(flat, jnp.take(pos, ids), axis=0))
            if by_residual:
                rec = rec + jnp.take(
                    coarse, jnp.take(lists, ids, axis=0), axis=0
                )
            return rec

        return fn, (
            self._pool.data["codes"],
            self._pool.pos,
            jnp.asarray(self._flat_lists, jnp.int32),
            self.coarse,
        )

    def _build_buckets(self) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """The search view of the pool (cached): ``(codes [n_chunks, CH,
        m], slot_ids [n_chunks, CH], chains [nlist, maxc_s])`` — plain
        views plus one cheap chain slice, nothing repacks."""
        if self._buckets is not None:
            return self._buckets
        if self._pool is None or self._pool.n_rows == 0:
            raise EmptyInput("index is empty — add() vectors first")
        self._buckets = (
            self._pool.data["codes"],
            self._pool.slot_ids,
            self._pool.chains_search(),
        )
        return self._buckets

    def bucket_stats(self) -> dict:
        """Occupancy diagnostics: list-size distribution, padded capacity,
        and how many entries a ``max_list_size`` cap currently drops."""
        if self._flat_lists is None:
            return {"ntotal": 0}
        counts = self._pool.lens_h
        cap = self._pool.cap
        return {
            "ntotal": int(self.ntotal),
            "nlist": self.nlist,
            "cap": cap,
            "min": int(counts.min()),
            "mean": float(counts.mean()),
            "max": int(counts.max()),
            "empty_lists": int((counts == 0).sum()),
            "overflow_dropped": int(np.maximum(counts - cap, 0).sum()),
            "padding_waste": float(
                1.0 - int(np.minimum(counts, cap).sum())
                / (self.nlist * cap)
            ),
            **self._pool.stats(),
        }

    def rebalance(
        self,
        *,
        target_max: Optional[int] = None,
        min_size: int = 0,
        max_iters: int = 8,
        seed: int = 0,
        rounds: int = 3,
    ) -> dict:
        """Split overfull lists and retire underfull ones.

        The padded-dense bucket layout pays ``nlist * cap`` memory where
        ``cap`` tracks the LARGEST list, and a ``max_list_size`` cap drops
        overflow entries from the probe structure — so skew costs either
        memory or recall. Rebalancing removes the skew at its source:

        * every list longer than ``target_max`` is split: k-means
          (k = ceil(len / target_max)) on a ``target_max``-row subsample of
          its members yields part centroids that replace its coarse
          centroid (fixed subsample size -> one jit compile per distinct
          part count, not per list size — remote TPU compiles cost
          minutes);
        * every list smaller than ``min_size`` is retired;
        * all affected members are then reassigned in ONE global
          nearest-centroid pass and re-encoded against their new centroid
          (exact when ``keep_corpus=True``; otherwise from their
          reconstructions, adding at most the quantization error already
          present). Unaffected lists keep their assignments and codes.

        Because k-means parts aren't exactly balanced, up to ``rounds``
        passes run until no list exceeds ``target_max`` (typically 1-2).
        ``target_max`` defaults to ``max_list_size`` (or 2x the mean list
        size if no cap is set). Returns a summary dict.
        """
        if self._flat_lists is None:
            raise EmptyInput("index is empty — add() vectors first")
        total_split = total_retired = 0
        for r in range(max(1, int(rounds))):
            info = self._rebalance_once(
                target_max=target_max,
                min_size=min_size if r == 0 else 0,
                max_iters=max_iters,
                seed=seed + 1000 * r,
            )
            total_split += info["split"]
            total_retired += info["retired"]
            if info["split"] == 0 and info["retired"] == 0:
                break
        return {
            "split": total_split,
            "retired": total_retired,
            "new_nlist": self.nlist,
        }

    def _rebalance_once(
        self, *, target_max, min_size, max_iters, seed
    ) -> dict:
        from vq_tpu.ivf_flat import _rebalance_pass

        lists_np = np.asarray(self._flat_lists)  # one pull; host-orchestrated pass
        counts = np.bincount(lists_np, minlength=self.nlist)
        old_lists = lists_np  # pre-rebalance assignment
        old_coarse = np.array(self.coarse)
        pool = self._pool

        def member_vectors(row_idx: np.ndarray) -> jnp.ndarray:
            if self._corpus is not None:
                return jnp.asarray(self._corpus)[row_idx].astype(jnp.float32)
            # Reconstruct: decode(residual codes) + OLD coarse centroid.
            rec = self.pq.decode(
                pool.gather_rows("codes", jnp.asarray(row_idx, jnp.int32))
            )
            if self.by_residual:
                rec = rec + jnp.asarray(old_coarse)[old_lists[row_idx]]
            return rec

        out = _rebalance_pass(
            lists_np, old_coarse, self.nlist, member_vectors,
            target_max=target_max,
            default_target=self.max_list_size or int(
                max(8, 2 * max(1.0, counts.mean()))
            ),
            min_size=min_size, max_iters=max_iters, seed=seed,
        )
        if out is None:
            return {"split": 0, "retired": 0, "new_nlist": self.nlist}
        new_nlist = out["coarse_new"].shape[0]
        if out["rows"] is not None:
            # Chunk-wise move (O(affected)) in ROW BLOCKS: per block,
            # reconstruct the movers (PRE-mutation pool state) and
            # re-encode them against their new centroids; then free the
            # emptied lists' chunks, relabel surviving chains, and
            # scatter the code blocks back. Blocks bound the transient
            # f32 member matrix (the one-shot form OOM'd at 16M rows).
            from vq_tpu.ivf_flat import _REBALANCE_BLOCK_ROWS

            rows_np, nl_np = out["rows"], out["new_lists"]
            coarse_new = jnp.asarray(out["coarse_new"], jnp.float32)
            blocks = []
            for s in range(0, rows_np.size, _REBALANCE_BLOCK_ROWS):
                rb_np = rows_np[s:s + _REBALANCE_BLOCK_ROWS]
                nlb = jnp.asarray(
                    nl_np[s:s + _REBALANCE_BLOCK_ROWS], jnp.int32
                )
                xb = member_vectors(rb_np)
                enc_in = (
                    xb - coarse_new[nlb] if self.by_residual else xb
                )
                blocks.append(
                    (jnp.asarray(rb_np, jnp.int32), nlb,
                     self.pq.encode(enc_in))
                )
            pool.free_lists(np.unique(lists_np[rows_np]))
            pool.relabel_lists(out["remap_old"], new_nlist)
            for rb, nlb, codes_b in blocks:
                pool.append(nlb, {"codes": codes_b}, row_ids=rb)
        else:
            pool.relabel_lists(out["remap_old"], new_nlist)
        self.coarse = jnp.asarray(out["coarse_new"], jnp.float32)
        self._flat_lists = jnp.asarray(out["lists"], jnp.int32)
        self._buckets = None
        return {
            "split": out["split"],
            "retired": out["retired"],
            "new_nlist": self.nlist,
        }

    # -- search -------------------------------------------------------------

    def search(
        self, queries, k: int = 10, *, nprobe: int = 8, rerank: int = 0,
        use_pallas: Optional[bool] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k ``(ids, values)``. ``nprobe`` lists per query.

        For ``metric="l2"`` values are squared-L2 distances, ascending; for
        ``metric="dot"`` values are inner-product scores, descending (pad
        value ``-inf``). Ids of −1 mean fewer than k candidates existed in
        the probed lists. With ``rerank=R`` and ``keep_corpus=True``, a
        top-R shortlist is re-scored exactly under the index metric. On TPU
        the probe step runs the fused Pallas kernel (scalar-prefetch DMA of
        probed lists into VMEM) — identical returned ids to the XLA path.
        """
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.pq.dim:
            raise DimensionMismatch(expected=self.pq.dim, found=q.shape[1])
        fn, arrays = self._search_core(
            int(k), nprobe=nprobe, rerank=rerank, use_pallas=use_pallas
        )
        return fn(q, *arrays)

    def _search_core(
        self,
        k: int,
        *,
        nprobe: int = 8,
        rerank: int = 0,
        use_pallas: Optional[bool] = None,
    ):
        """The search as ``(fn, arrays)`` with ``fn(q, *arrays)`` fully
        traceable — :meth:`search` is one eager call of it and
        :class:`vq_tpu.serving.BatchPipeline` scans it over many query
        batches in one dispatch. Storage is passed as arguments so jitted
        callers don't bake it into the program as constants."""
        pool_codes, slot_ids, chains_s = self._build_buckets()
        cap = self._pool.cap
        k = int(k)
        rerank = int(rerank)
        if rerank and self._corpus is None:
            raise InvalidData(
                "rerank requires keep_corpus=True at construction"
            )
        nprobe = min(int(nprobe), self.nlist)
        fetch = max(k, rerank) if rerank else k
        # The candidate pool a search actually sees is nprobe * the
        # per-list fetch width (NOT nlist * cap); k / rerank beyond it
        # are satisfied by -1/inf padding per the documented contract.
        ce = int(chains_s.shape[1]) * int(slot_ids.shape[1])
        pool_width = nprobe * ce
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        use_pallas = bool(use_pallas)
        metric, by_residual = self.metric, self.by_residual
        codebooks = self.pq.codebooks
        arrays = (
            self.coarse, codebooks, pool_codes, slot_ids, chains_s
        ) + ((self._corpus,) if rerank else ())

        def fn(q, coarse, cbs, bcodes, bids, bchains, *rest):
            ids, dist = _ivf_search_jit(
                q, coarse, cbs, bcodes, bids, bchains,
                nprobe, min(fetch, pool_width), cap, use_pallas,
                metric=metric, by_residual=by_residual,
            )
            # Internal convention is smaller-is-better (dot scores negated).
            if rerank:
                corpus = rest[0]
                safe = jnp.maximum(ids, 0)
                cand = jnp.take(corpus, safe, axis=0)  # [Q, R, d]
                if metric == "dot":
                    exact = -jnp.sum(
                        cand.astype(jnp.float32) * q[:, None, :], axis=-1
                    )
                else:
                    exact = jnp.sum((cand - q[:, None, :]) ** 2, axis=-1)
                exact = jnp.where(ids >= 0, exact, jnp.inf)
                neg_top, pos = jax.lax.top_k(-exact, min(k, exact.shape[1]))
                ids, dist = jnp.take_along_axis(ids, pos, axis=1), -neg_top
            else:
                ids, dist = ids[:, :k], dist[:, :k]
            ids = jnp.where(jnp.isinf(dist), -1, ids)
            if ids.shape[1] < k:  # pool smaller than k: pad the contract
                pad = k - ids.shape[1]
                ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
                dist = jnp.pad(
                    dist, ((0, 0), (0, pad)), constant_values=jnp.inf
                )
            if metric == "dot":
                dist = -dist  # back to descending scores; pads become -inf
            return ids, dist

        return fn, arrays

    def range_search(
        self,
        queries,
        radius: float,
        *,
        nprobe: int = 8,
        max_results: int = 1024,
        use_pallas: Optional[bool] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """All probed rows whose ADC value is within ``radius`` (the
        faiss IVF ``range_search`` contract — recall bounded by the probe
        set, values are the asymmetric PQ approximations, not exact
        distances). Returns ``(ids, values, counts)`` with the family's
        static-shape contract: best ``max_results`` hits padded with
        ``-1`` / ``inf`` (``-inf`` scores for ``dot``), ``counts[q]`` the
        TRUE number of probed hits. A hit is ``value <= radius`` for L2,
        ``score >= radius`` for ``dot``.
        """
        if int(max_results) < 1:
            raise InvalidParameter("max_results", "must be >= 1")
        pool_codes, slot_ids, chains_s = self._build_buckets()
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.pq.dim:
            raise DimensionMismatch(expected=self.pq.dim, found=q.shape[1])
        nprobe = min(int(nprobe), self.nlist)
        ce = int(chains_s.shape[1]) * int(slot_ids.shape[1])
        fetch = min(int(max_results), nprobe * ce)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        r = float(radius)
        r_internal = -r if self.metric == "dot" else r
        ids, d, counts = _ivf_range_jit(
            q, self.coarse, self.pq.codebooks, pool_codes, slot_ids,
            chains_s, nprobe, fetch, self._pool.cap,
            jnp.float32(r_internal), bool(use_pallas),
            False, self.metric, self.by_residual,
        )
        if ids.shape[1] < max_results:
            pad = int(max_results) - ids.shape[1]
            ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            d = jnp.pad(d, ((0, 0), (0, pad)), constant_values=jnp.inf)
        if self.metric == "dot":
            d = -d  # back to descending scores; pads become -inf
        return ids, d, counts

    # -- persistence --------------------------------------------------------

    def save(self, path: str) -> str:
        arrays = {
            "coarse": np.asarray(self.coarse),
            "codebooks": np.asarray(self.pq.codebooks),
            "flat_codes": (
                np.asarray(self._pool.to_flat(["codes"])["codes"])
                if self._pool is not None and self._pool.n_rows
                else np.zeros((0, self.pq.num_subspaces), np.int32)
            ),
            "flat_lists": (
                np.asarray(self._flat_lists)
                if self._flat_lists is not None
                else np.zeros((0,), np.int32)
            ),
        }
        if self.keep_corpus and self._corpus is not None:
            arrays["corpus"] = np.asarray(self._corpus)
        config = {
            "by_residual": self.by_residual,
            "keep_corpus": self.keep_corpus,
            "max_list_size": self.max_list_size,
            "metric": self.metric,
        }
        eta = getattr(self.pq, "eta", None)
        if eta is not None:
            config["pq_eta"] = float(eta)  # anisotropic PQ round-trips
        return _to_npz(path, "ivfpq_index", config, arrays)

    @classmethod
    def load(cls, path: str) -> "IVFPQIndex":
        kind, config, arrays = _from_npz(path)
        if kind != "ivfpq_index":
            raise InvalidData(f"expected an ivfpq_index checkpoint, got {kind!r}")
        if config.get("pq_eta") is not None:
            from vq_tpu.models.pq_anisotropic import (
                AnisotropicProductQuantizer,
            )

            pq = AnisotropicProductQuantizer(
                codebooks=arrays["codebooks"], eta=config["pq_eta"]
            )
        else:
            pq = ProductQuantizer(
                codebooks=arrays["codebooks"], distance="squared_euclidean"
            )
        idx = cls(
            arrays["coarse"], pq,
            by_residual=config["by_residual"],
            keep_corpus=config["keep_corpus"],
            # .get: round-1/2 checkpoints predate these fields.
            max_list_size=config.get("max_list_size"),
            metric=config.get("metric", "l2"),
        )
        if arrays["flat_codes"].shape[0]:
            lists = jnp.asarray(arrays["flat_lists"], jnp.int32)
            idx._pool_append(lists, {
                "codes": jnp.asarray(arrays["flat_codes"]),
            })
            idx._flat_lists = lists
        if "corpus" in arrays:
            idx._corpus = jnp.asarray(arrays["corpus"])
        return idx

    def __repr__(self) -> str:
        return (
            f"IVFPQIndex(nlist={self.nlist}, ntotal={self.ntotal}, "
            f"m={self.pq.num_subspaces}, k={self.pq.num_centroids}, "
            f"residual={self.by_residual}, metric={self.metric!r})"
        )
