"""Search indexes — the serving layer over the quantizers.

The reference is a quantization library only; a user deploying it for
vector search must hand-roll storage and scanning. vq_tpu ships the
standard memory-resident index types its quantizers imply:

* :class:`FlatIndex` — exact brute-force scan over raw rows (f32 or
  half-width storage), all 5 metrics, ``range_search``. The recall
  baseline for everything below.
* :class:`PQIndex` — PQ codes + ADC scan (+ optional exact rerank when the
  raw corpus is kept). 16 bytes/vector at the 8x256 config.
* :class:`BinaryIndex` — packed sign bits + Hamming scan via popcount.
  4 bytes/vector at 128-d (+ optional exact rerank).
* :class:`SQIndex` — per-dimension scalar-quantized rows + asymmetric
  distance scan (the faiss ``IndexScalarQuantizer`` analog). d bytes/vector
  (75% smaller than f32) at full dimensionality — higher recall than PQ at
  4x the code size.
* :class:`RQIndex` — additive residual-quantizer codes + asymmetric ADC
  scan with stored row norms (the faiss ``IndexResidualQuantizer``
  analog). S bytes/vector; better reconstruction than PQ at equal bytes
  on data without coordinate-aligned structure.

All are append-only, batch-first, and jit-backed; ``save``/``load``
round-trip through the same single-file `.npz` scheme as the quantizers.
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
from vq_tpu.models.bq import BinaryQuantizer, hamming_distance
from vq_tpu.models.pq import ProductQuantizer
from vq_tpu.models.rq import ResidualQuantizer
from vq_tpu.models.sq import PerDimScalarQuantizer
from vq_tpu.ops.distance import COSINE_NORM_EPS, Metric
from vq_tpu.utils.serialize import _from_npz, _to_npz

__all__ = ["FlatIndex", "PQIndex", "BinaryIndex", "SQIndex", "RQIndex"]


def _removal_keep_mask(ids, ntotal: int) -> jnp.ndarray:
    """Boolean keep-mask for ``remove_ids``: validates, dedups, and
    rejects out-of-range positions."""
    ids = jnp.atleast_1d(jnp.asarray(ids, jnp.int32))
    if ids.ndim != 1:
        raise InvalidParameter("ids", "expected a 1-D array of positions")
    if ids.size and bool((ids < 0).any() | (ids >= ntotal).any()):
        raise InvalidParameter(
            "ids", f"positions must be in [0, {ntotal})"
        )
    return jnp.ones((ntotal,), bool).at[ids].set(False)


def _compact_rows(mask: jnp.ndarray, *arrays):
    """Drop masked-out rows from each (possibly-None) array."""
    (keep,) = jnp.nonzero(mask)
    return tuple(
        None if a is None else jnp.take(a, keep, axis=0) for a in arrays
    )


def _merge_check(self, other, *, attrs=(), arrays=()):
    """Validate that ``other`` is mergeable into ``self`` (faiss
    ``merge_from`` contract: same index type, same trained state).

    ``attrs`` are scalar attribute names that must compare equal;
    ``arrays`` are ``(label, a, b)`` trained-array pairs that must match
    elementwise (codebooks, coarse centroids, quantizer ranges)."""
    if type(other) is not type(self):
        raise InvalidParameter(
            "other",
            f"can only merge another {type(self).__name__}, "
            f"got {type(other).__name__}",
        )
    for name in attrs:
        if getattr(self, name) != getattr(other, name):
            raise InvalidData(
                f"cannot merge: {name} differs "
                f"({getattr(self, name)!r} vs {getattr(other, name)!r})"
            )
    for label, a, b in arrays:
        same = (
            a is None and b is None
        ) or (
            a is not None and b is not None and a.shape == b.shape
            and bool(jnp.array_equal(a, b))
        )
        if not same:
            raise InvalidData(f"cannot merge: trained {label} differ")


def _concat_rows(a, b):
    """Row-concatenate two optional arrays (either side may be None)."""
    if b is None:
        return a
    return b if a is None else jnp.concatenate([a, b], axis=0)


def _merge_corpus(self, other) -> None:
    """Carry the kept corpus across a merge. If ``self`` reranks from a
    kept corpus, ``other`` must have one too (otherwise rerank on the
    merged index would silently cover only part of the data)."""
    if not self.keep_corpus:
        return
    if other.ntotal > 0 and other._corpus is None:
        raise InvalidData(
            "cannot merge: self keeps a rerank corpus but other has none"
        )
    self._corpus = _concat_rows(self._corpus, other._corpus)


def _search_and_reconstruct(self, queries, k: int = 10, **kw):
    """Shared ``search_and_reconstruct`` body (faiss analog): search,
    then decode every returned id. Padded ``-1`` ids reconstruct as zero
    rows. Returns ``(ids [Q, k], values [Q, k], vectors [Q, k, d])``."""
    ids, vals = self.search(queries, k, **kw)
    flat = jnp.reshape(ids, (-1,))
    rec = self.reconstruct(jnp.maximum(flat, 0))
    rec = jnp.where((flat >= 0)[:, None], rec, 0.0)
    return ids, vals, rec.reshape((*ids.shape, rec.shape[-1]))


_FLAT_METRICS = (
    "squared_euclidean", "euclidean", "cosine", "dot", "manhattan"
)


@functools.partial(jax.jit, static_argnames=("metric", "fetch"))
def _flat_scan_jit(
    q: jnp.ndarray,  # [Q, d] f32 queries
    row_chunks: jnp.ndarray,  # [nc, chunk, d] stored rows (f32/bf16/f16)
    row_sqn_chunks: jnp.ndarray,  # [nc, chunk] f32 ||row||^2
    nvalid: jnp.ndarray,  # [] real row count
    radius: jnp.ndarray,  # [] f32 hit threshold (+inf = plain top-k)
    metric: str,
    fetch: int,
):
    """Blockwise exact scan over raw corpus rows.

    Decomposable metrics (sq-L2 / L2 / cosine / dot) ride one
    ``[Q, d] x [d, chunk]`` MXU matmul per block plus the precomputed row
    norms; Manhattan is a fused broadcast-reduce on the VPU (use a smaller
    ``chunk``). Blocks merge through a running top-``fetch``. Also counts
    rows with value within ``radius`` (<= for distances, >= score for
    ``dot``) to support :meth:`FlatIndex.range_search` in the same pass.
    """
    Q = q.shape[0]
    chunk = row_chunks.shape[1]
    qn2 = jnp.sum(q * q, axis=-1)  # [Q]
    qn = jnp.sqrt(qn2)

    def body(carry, inp):
        best_d, best_i, hits = carry  # [Q, fetch], [Q, fetch], [Q]
        rows, row_sqn, cidx = inp  # [chunk, d], [chunk], []
        c = rows.astype(jnp.float32)
        if metric == "manhattan":
            d = jnp.sum(jnp.abs(q[:, None, :] - c[None, :, :]), axis=-1)
        else:
            qdoty = jax.lax.dot_general(
                q, c, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [Q, chunk]
            if metric in ("squared_euclidean", "euclidean"):
                d = jnp.maximum(
                    qn2[:, None] - 2.0 * qdoty + row_sqn[None, :], 0.0
                )
                if metric == "euclidean":
                    d = jnp.sqrt(d)
            elif metric == "cosine":
                rn = jnp.sqrt(jnp.maximum(row_sqn, 0.0))
                denom = jnp.maximum(
                    qn[:, None] * rn[None, :], COSINE_NORM_EPS
                )
                d = jnp.clip(1.0 - qdoty / denom, 0.0, 1.0)
                degenerate = (qn[:, None] < COSINE_NORM_EPS) | (
                    rn[None, :] < COSINE_NORM_EPS
                )
                d = jnp.where(degenerate, 1.0, d)
            else:  # dot: minimize the negated score
                d = -qdoty
        gidx = cidx * chunk + jnp.arange(chunk)
        valid = (gidx < nvalid)[None, :]
        d = jnp.where(valid, d, jnp.inf)
        # radius is in minimized-value space (negated for dot upstream).
        hits = hits + jnp.sum((d <= radius) & valid, axis=1)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(gidx[None, :], (Q, chunk))], axis=1
        )
        neg, pos = jax.lax.top_k(-cat_d, fetch)
        return (
            -neg, jnp.take_along_axis(cat_i, pos, axis=1), hits
        ), None

    init = (
        jnp.full((Q, fetch), jnp.inf, jnp.float32),
        jnp.full((Q, fetch), -1, jnp.int32),
        jnp.zeros((Q,), jnp.int32),
    )
    (best_d, best_i, hits), _ = jax.lax.scan(
        body, init,
        (row_chunks, row_sqn_chunks, jnp.arange(row_chunks.shape[0])),
    )
    return best_i, best_d, hits


class FlatIndex:
    """Exact brute-force index over raw corpus rows (faiss ``IndexFlat``
    analog — the baseline every quantized index is measured against; the
    reference has no index layer at all).

    Rows are stored on device at ``storage`` width (``"float32"`` exact,
    ``"bfloat16"``/``"float16"`` for half the HBM traffic — the scan is
    bandwidth-bound, so half-width is ~1.6x faster at a ~1e-3 relative
    distance error). Search is a blockwise MXU scan; distances are exact
    distances to the stored rows.

    Supports all five metrics: ``squared_euclidean`` (default),
    ``euclidean``, ``cosine``, ``manhattan`` (VPU broadcast-reduce — use
    for parity, not speed), and ``dot`` (maximum-inner-product; descending
    scores).
    """

    def __init__(
        self,
        dim: int,
        *,
        metric: str = "squared_euclidean",
        storage: str = "float32",
    ):
        if int(dim) < 1:
            raise InvalidParameter("dim", "must be >= 1")
        m = metric.value if isinstance(metric, Metric) else str(metric)
        if m not in _FLAT_METRICS:
            raise InvalidParameter(
                "metric", f"must be one of {', '.join(_FLAT_METRICS)}"
            )
        if storage not in ("float32", "bfloat16", "float16"):
            raise InvalidParameter(
                "storage", "must be 'float32', 'bfloat16', or 'float16'"
            )
        self.dim = int(dim)
        self.metric = m
        self.storage = storage
        self._rows: Optional[jnp.ndarray] = None  # [n, d] storage dtype
        self._row_sqn: Optional[jnp.ndarray] = None  # [n] f32

    @classmethod
    def from_data(
        cls, data, *, metric: str = "squared_euclidean",
        storage: str = "float32",
    ) -> "FlatIndex":
        """Build an index holding ``data``.

        >>> import numpy as np
        >>> idx = FlatIndex.from_data(
        ...     np.array([[0., 0.], [1., 1.], [2., 2.]], np.float32)
        ... )
        >>> ids, dist = idx.search(np.array([[0.9, 0.9]], np.float32), k=2)
        >>> ids.tolist()
        [[1, 0]]
        """
        x = jnp.asarray(data)
        idx = cls(x.shape[-1], metric=metric, storage=storage)
        idx.add(x)
        return idx

    @property
    def ntotal(self) -> int:
        return 0 if self._rows is None else int(self._rows.shape[0])

    @property
    def code_bytes_per_vector(self) -> int:
        return self.dim * (4 if self.storage == "float32" else 2)

    def add(self, vectors) -> None:
        """Append a batch of raw vectors (stored at ``storage`` width)."""
        x = jnp.asarray(vectors)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x.shape[1])
        rows = x.astype(jnp.dtype(self.storage))
        row_sqn = jnp.sum(
            rows.astype(jnp.float32) ** 2, axis=-1
        )
        if self._rows is None:
            self._rows, self._row_sqn = rows, row_sqn
        else:
            self._rows = jnp.concatenate([self._rows, rows], axis=0)
            self._row_sqn = jnp.concatenate([self._row_sqn, row_sqn], axis=0)

    def remove_ids(self, ids) -> int:
        """Remove stored vectors by position; remaining vectors renumber
        sequentially (faiss ``remove_ids`` contract)."""
        if self._rows is None:
            raise EmptyInput("index is empty")
        mask = _removal_keep_mask(ids, self.ntotal)
        removed = self.ntotal - int(mask.sum())
        self._rows, self._row_sqn = _compact_rows(
            mask, self._rows, self._row_sqn
        )
        return removed

    def merge_from(self, other: "FlatIndex") -> int:
        """Move every vector of ``other`` into this index (faiss
        ``merge_from`` contract: same type and build parameters; the
        moved vectors get ids starting at ``self.ntotal`` and ``other``
        is left empty). Returns the number of vectors moved."""
        _merge_check(self, other, attrs=("dim", "metric", "storage"))
        moved = other.ntotal
        self._rows = _concat_rows(self._rows, other._rows)
        self._row_sqn = _concat_rows(self._row_sqn, other._row_sqn)
        other._rows = other._row_sqn = None
        return moved

    def search_and_reconstruct(self, queries, k: int = 10, **kw):
        """Search plus the stored vectors of every hit — ``(ids, values,
        vectors [Q, k, d])``; padded ``-1`` ids yield zero rows."""
        return _search_and_reconstruct(self, queries, k, **kw)

    def _default_chunk(self, chunk: Optional[int]) -> int:
        if chunk is not None:
            return int(chunk)
        # Manhattan materializes a [Q, chunk, d] broadcast per block.
        return 8_192 if self.metric == "manhattan" else 262_144

    def _scan(self, queries, fetch: int, radius: float, chunk: Optional[int]):
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=q.shape[1])
        n = self.ntotal
        chunk = min(self._default_chunk(chunk), max(n, 1))
        pad = (-n) % chunk
        row_chunks = jnp.pad(self._rows, ((0, pad), (0, 0))).reshape(
            -1, chunk, self.dim
        )
        sqn_chunks = jnp.pad(self._row_sqn, (0, pad)).reshape(-1, chunk)
        return _flat_scan_jit(
            q, row_chunks, sqn_chunks, jnp.int32(n),
            jnp.float32(radius), self.metric, int(fetch),
        )

    def search(
        self, queries, k: int = 10, *, chunk: Optional[int] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Exact top-k ids + values for each query row.

        Values are distances (ascending) for distance metrics and
        inner-product scores (descending) for ``dot``.
        """
        fn, arrays = self._search_core(int(k), chunk=chunk)
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=q.shape[1])
        return fn(q, *arrays)

    def _search_core(self, k: int, *, chunk: Optional[int] = None):
        """The search as ``(fn, arrays)`` with ``fn(q, *arrays)`` fully
        traceable — :meth:`search` is one eager call of it and
        :class:`vq_tpu.serving.BatchPipeline` scans it over many query
        batches in one dispatch. Storage is passed as arguments so jitted
        callers don't bake it into the program as constants."""
        if self._rows is None:
            raise EmptyInput("index is empty — add() vectors first")
        n = self.ntotal
        k_eff = min(int(k), n)
        chunk = min(self._default_chunk(chunk), max(n, 1))
        pad = (-n) % chunk
        row_chunks = jnp.pad(self._rows, ((0, pad), (0, 0))).reshape(
            -1, chunk, self.dim
        )
        sqn_chunks = jnp.pad(self._row_sqn, (0, pad)).reshape(-1, chunk)
        metric = self.metric

        def fn(q, rows_c, sqn_c):
            ids, d, _ = _flat_scan_jit(
                q, rows_c, sqn_c, jnp.int32(n),
                jnp.float32(float("inf")), metric, k_eff,
            )
            return (ids, -d) if metric == "dot" else (ids, d)

        return fn, (row_chunks, sqn_chunks)

    def range_search(
        self,
        queries,
        radius: float,
        *,
        max_results: int = 1024,
        chunk: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """All stored rows within ``radius`` of each query (faiss
        ``range_search`` analog, static-shaped for jit).

        For distance metrics a hit is ``value <= radius``; for ``dot`` a
        hit is ``score >= radius``. Returns ``(ids, values, counts)``:
        ``ids``/``values`` are ``[Q, max_results]`` holding the *best*
        hits padded with ``-1`` / ``inf`` (``-inf`` scores for dot), and
        ``counts[q]`` is the TRUE number of hits — if it exceeds
        ``max_results``, re-run with a larger cap to retrieve them all.
        """
        if self._rows is None:
            raise EmptyInput("index is empty — add() vectors first")
        if int(max_results) < 1:
            raise InvalidParameter("max_results", "must be >= 1")
        fetch = min(int(max_results), self.ntotal)
        r = float(radius)
        ids, d, counts = self._scan(
            queries, fetch, -r if self.metric == "dot" else r, chunk
        )
        hit = d <= (-r if self.metric == "dot" else r)
        ids = jnp.where(hit, ids, -1)
        d = jnp.where(hit, d, jnp.inf)
        if self.metric == "dot":
            return ids, -d, counts
        return ids, d, counts

    def reconstruct(self, ids) -> jnp.ndarray:
        """Stored rows for the given ids (exact up to storage width)."""
        if self._rows is None:
            raise EmptyInput("index is empty")
        ids = jnp.asarray(ids, jnp.int32)
        return jnp.take(self._rows, ids, axis=0).astype(jnp.float32)

    def save(self, path: str) -> str:
        rows = (
            self._rows if self._rows is not None
            else jnp.zeros((0, self.dim), jnp.float32)
        )
        if rows.dtype == jnp.bfloat16:
            rows = rows.astype(jnp.float32)  # lossless; npz has no bf16
        arrays = {
            "rows": np.asarray(rows),
            "row_sqn": np.asarray(
                self._row_sqn if self._row_sqn is not None
                else np.zeros((0,), np.float32)
            ),
        }
        return _to_npz(
            path,
            "flat_index",
            {
                "dim": self.dim,
                "metric": self.metric,
                "storage": self.storage,
            },
            arrays,
        )

    @classmethod
    def load(cls, path: str) -> "FlatIndex":
        kind, config, arrays = _from_npz(path)
        if kind != "flat_index":
            raise InvalidData(
                f"expected a flat_index checkpoint, got {kind!r}"
            )
        idx = cls(
            config["dim"], metric=config["metric"],
            storage=config["storage"],
        )
        if arrays["rows"].shape[0]:
            idx._rows = jnp.asarray(arrays["rows"]).astype(
                jnp.dtype(config["storage"])
            )
            idx._row_sqn = jnp.asarray(arrays["row_sqn"])
        return idx

    def __repr__(self) -> str:
        return (
            f"FlatIndex(ntotal={self.ntotal}, dim={self.dim}, "
            f"metric={self.metric!r}, storage={self.storage!r})"
        )


@functools.partial(
    jax.jit, static_argnames=("metric", "fetch", "pack_bits", "m")
)
def _pq_range_scan_jit(
    tables: jnp.ndarray,  # [Q, m, k] per-query ADC tables
    cb_sqn: jnp.ndarray,  # [m, k] per-centroid squared norms (cosine only)
    qn: jnp.ndarray,  # [Q] query norms (cosine only)
    code_chunks: jnp.ndarray,  # [nc, chunk, m] codes ([nc, chunk, B] packed)
    nvalid: jnp.ndarray,  # [] real row count
    radius: jnp.ndarray,  # [] f32 hit threshold
    metric: str,
    fetch: int,
    pack_bits: int,
    m: int,
):
    """Blockwise ADC scan that also counts radius hits — the
    :meth:`PQIndex.range_search` engine (the search path reuses the
    shared scan in models/pq.py)."""
    from vq_tpu.models.pq import _adc_lookup_jit

    Q = tables.shape[0]
    chunk = code_chunks.shape[1]

    def body(carry, inp):
        best_d, best_i, hits = carry
        chunk_codes, cidx = inp
        if pack_bits < 8:
            from vq_tpu.ops.packing import _unpack_jit

            chunk_codes = _unpack_jit(chunk_codes, pack_bits, m)
        acc = _adc_lookup_jit(tables, chunk_codes.astype(jnp.int32))
        if metric == "euclidean":
            d = jnp.sqrt(jnp.maximum(acc, 0.0))
        elif metric == "cosine":
            recon_sqn = _adc_lookup_jit(
                cb_sqn[None], chunk_codes.astype(jnp.int32)
            )[0]
            rn = jnp.sqrt(jnp.maximum(recon_sqn, 0.0))
            denom = jnp.maximum(qn[:, None] * rn[None, :], COSINE_NORM_EPS)
            d = jnp.clip(1.0 - acc / denom, 0.0, 1.0)
            degenerate = (qn[:, None] < COSINE_NORM_EPS) | (
                rn[None, :] < COSINE_NORM_EPS
            )
            d = jnp.where(degenerate, 1.0, d)
        else:  # squared_euclidean / manhattan tables sum to the distance
            d = acc
        gidx = cidx * chunk + jnp.arange(chunk)
        valid = (gidx < nvalid)[None, :]
        d = jnp.where(valid, d, jnp.inf)
        hits = hits + jnp.sum((d <= radius) & valid, axis=1)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(gidx[None, :], (Q, chunk))], axis=1
        )
        neg, pos = jax.lax.top_k(-cat_d, fetch)
        return (-neg, jnp.take_along_axis(cat_i, pos, axis=1), hits), None

    init = (
        jnp.full((Q, fetch), jnp.inf, jnp.float32),
        jnp.full((Q, fetch), -1, jnp.int32),
        jnp.zeros((Q,), jnp.int32),
    )
    (best_d, best_i, hits), _ = jax.lax.scan(
        body, init, (code_chunks, jnp.arange(code_chunks.shape[0]))
    )
    return best_i, best_d, hits


class PQIndex:
    """Flat ADC index over PQ codes.

    ``keep_corpus=True`` retains the raw vectors (on device) to enable
    exact reranking: ``search(..., rerank=R)`` re-scores a top-R ADC
    shortlist with exact distances under the quantizer's metric.

    ``packed=True`` stores codes sub-byte-packed (the faiss ``nbits < 8``
    analog): at k <= 16 each code takes 4 bits, so an m x 16 config costs
    m/2 bytes per vector instead of m. Blocks unpack on the VPU inside the
    scan (shift/mask — fused, no unpacked corpus copy). ``packed=None``
    (default) packs automatically whenever k <= 16.
    """

    def __init__(
        self,
        quantizer: ProductQuantizer,
        *,
        keep_corpus: bool = False,
        packed: Optional[bool] = None,
    ):
        from vq_tpu.ops.packing import bits_for

        self.pq = quantizer
        self.keep_corpus = keep_corpus
        min_bits = bits_for(quantizer.num_centroids)
        if packed is None:
            packed = min_bits < 8
        if packed and min_bits >= 8:
            raise InvalidParameter(
                "packed", "sub-byte packing requires k <= 16 centroids"
            )
        self.pack_bits = min_bits if packed else 8
        self._codes: Optional[jnp.ndarray] = None  # [n, m] ([n, B] packed)
        self._corpus: Optional[jnp.ndarray] = None  # [n, d] if kept

    @property
    def dim(self) -> int:
        return self.pq.dim

    @property
    def ntotal(self) -> int:
        return 0 if self._codes is None else int(self._codes.shape[0])

    @property
    def code_bytes_per_vector(self) -> int:
        if self.pack_bits < 8:
            return -(-self.pq.num_subspaces * self.pack_bits // 8)
        itemsize = 1 if self.pq.num_centroids <= 256 else 4
        return self.pq.num_subspaces * itemsize

    def add(self, vectors, *, precision: str = "highest") -> None:
        """Encode and append a batch of raw vectors.

        f16/bf16 batches stay half-width: encode upcasts per-tile and a
        kept corpus is stored half (rerank upcasts candidates only).
        ``precision``: bulk-ingest speed knob — ``"high"``/``"default"``
        opt into the 1.3x/2.7x m-packed bf16 encode (near-tie code flips
        only; see :func:`vq_tpu.models.pq.pq_encode`).
        """
        x = jnp.asarray(vectors)
        if x.dtype not in (jnp.float16, jnp.bfloat16):
            x = x.astype(jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[1] != self.pq.dim:
            raise DimensionMismatch(expected=self.pq.dim, found=x.shape[1])
        codes = self.pq.encode(x, precision=precision)
        if self.pack_bits < 8:
            from vq_tpu.ops.packing import pack_codes

            codes = pack_codes(codes, self.pack_bits)
        self._codes = (
            codes if self._codes is None
            else jnp.concatenate([self._codes, codes], axis=0)
        )
        if self.keep_corpus:
            self._corpus = (
                x if self._corpus is None
                else jnp.concatenate([self._corpus, x], axis=0)
            )

    def remove_ids(self, ids) -> int:
        """Remove stored vectors by position (the faiss ``remove_ids``
        analog); returns the number removed. Remaining vectors renumber
        sequentially, so ids from later searches reflect the compacted
        order — same contract as faiss's flat indexes."""
        if self._codes is None:
            raise EmptyInput("index is empty")
        mask = _removal_keep_mask(ids, self.ntotal)
        removed = self.ntotal - int(mask.sum())
        self._codes, self._corpus = _compact_rows(
            mask, self._codes, self._corpus
        )
        return removed

    def merge_from(self, other: "PQIndex") -> int:
        """Move every vector of ``other`` into this index. Requires the
        same trained codebooks and code packing (codes are copied, not
        re-encoded — faiss ``merge_from`` contract). Returns the count
        moved; ``other`` is left empty."""
        _merge_check(
            self, other, attrs=("pack_bits",),
            arrays=(
                ("PQ codebooks", self.pq._codebooks, other.pq._codebooks),
            ),
        )
        moved = other.ntotal
        _merge_corpus(self, other)
        self._codes = _concat_rows(self._codes, other._codes)
        other._codes = other._corpus = None
        return moved

    def search_and_reconstruct(self, queries, k: int = 10, **kw):
        """Search plus the decoded codes of every hit — ``(ids, values,
        vectors [Q, k, d])``; padded ``-1`` ids yield zero rows."""
        return _search_and_reconstruct(self, queries, k, **kw)

    def search(
        self, queries, k: int = 10, *, rerank: int = 0
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k ids + distances for each query row."""
        fn, arrays = self._search_core(int(k), rerank=rerank)
        return fn(jnp.asarray(queries), *arrays)

    def _search_core(self, k: int, *, rerank: int = 0):
        """The search as ``(fn, arrays)`` with ``fn(q, *arrays)`` fully
        traceable — :meth:`search` is one eager call of it and
        :class:`vq_tpu.serving.BatchPipeline` scans it over many query
        batches in one dispatch. Code storage is passed as an argument so
        jitted callers don't bake it into the program as constants (the
        small codebooks ride along inside the quantizer)."""
        if self._codes is None:
            raise EmptyInput("index is empty — add() vectors first")
        rerank = int(rerank)
        if rerank and self._corpus is None:
            raise InvalidData(
                "rerank requires keep_corpus=True at index construction"
            )
        k_eff = min(int(k), self.ntotal)
        pq, pack_bits = self.pq, self.pack_bits
        arrays = (self._codes,) + ((self._corpus,) if rerank else ())

        def fn(q, codes, *rest):
            return pq.adc_search(
                q, codes, k=k_eff, rerank=rerank,
                corpus=rest[0] if rerank else None, pack_bits=pack_bits,
            )

        return fn, arrays

    def range_search(
        self,
        queries,
        radius: float,
        *,
        max_results: int = 1024,
        chunk: int = 262_144,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """All rows whose ADC (asymmetric) distance is within ``radius``
        of each query — same contract as :meth:`FlatIndex.range_search`
        (best ``max_results`` hits padded with ``-1``/``inf``, plus TRUE
        per-query hit counts)."""
        if self._codes is None:
            raise EmptyInput("index is empty — add() vectors first")
        if int(max_results) < 1:
            raise InvalidParameter("max_results", "must be >= 1")
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.pq.dim:
            raise DimensionMismatch(expected=self.pq.dim, found=q.shape[1])
        n = self.ntotal
        fetch = min(int(max_results), n)
        chunk = min(int(chunk), max(n, 1))
        pad = (-n) % chunk
        width = self._codes.shape[1]
        code_chunks = jnp.pad(self._codes, ((0, pad), (0, 0))).reshape(
            -1, chunk, width
        )
        tables = self.pq.adc_tables(q)
        cb = self.pq.codebooks
        cb_sqn = jnp.sum(cb * cb, axis=-1)  # [m, k] (cosine only)
        qn = jnp.sqrt(jnp.sum(q * q, axis=-1))  # [Q] (cosine only)
        ids, d, counts = _pq_range_scan_jit(
            tables, cb_sqn, qn, code_chunks, jnp.int32(n),
            jnp.float32(radius), self.pq.distance_metric, int(fetch),
            int(self.pack_bits), self.pq.num_subspaces,
        )
        hit = d <= float(radius)
        return (
            jnp.where(hit, ids, -1),
            jnp.where(hit, d, jnp.inf),
            counts,
        )

    def reconstruct(self, ids) -> jnp.ndarray:
        """Approximate vectors for stored ids (decoded from codes)."""
        if self._codes is None:
            raise EmptyInput("index is empty")
        ids = jnp.asarray(ids, jnp.int32)
        rows = jnp.take(self._codes, ids, axis=0)
        if self.pack_bits < 8:
            from vq_tpu.ops.packing import unpack_codes

            rows = unpack_codes(rows, self.pack_bits, self.pq.num_subspaces)
        return self.pq.decode(rows)

    def _reconstruct_core(self):
        """:meth:`reconstruct` as a traceable ``(fn, arrays)`` pair with
        ``fn(ids [N] i32, *arrays) -> [N, d] f32`` — code storage rides as
        an argument (the small codebooks close over inside the quantizer).
        Used by :class:`vq_tpu.refine.RefineIndex` for residual-coded
        refinement."""
        if self._codes is None:
            raise EmptyInput("index is empty — add() vectors first")
        pq, pack_bits = self.pq, self.pack_bits

        def fn(ids, codes):
            rows = jnp.take(codes, ids, axis=0)
            if pack_bits < 8:
                from vq_tpu.ops.packing import unpack_codes

                rows = unpack_codes(rows, pack_bits, pq.num_subspaces)
            return pq.decode(rows)

        return fn, (self._codes,)

    def save(self, path: str) -> str:
        width = self.code_bytes_per_vector if self.pack_bits < 8 else (
            self.pq.num_subspaces
        )
        arrays = {
            "codebooks": np.asarray(self.pq.codebooks),
            "codes": np.asarray(
                self._codes if self._codes is not None
                else np.zeros((0, width), np.uint8)
            ),
        }
        if self.keep_corpus and self._corpus is not None:
            arrays["corpus"] = np.asarray(self._corpus)
        return _to_npz(
            path,
            "pq_index",
            {
                "distance": self.pq.distance_metric,
                "keep_corpus": bool(self.keep_corpus),
                "pack_bits": int(self.pack_bits),
            },
            arrays,
        )

    @classmethod
    def load(cls, path: str) -> "PQIndex":
        kind, config, arrays = _from_npz(path)
        if kind != "pq_index":
            raise InvalidData(f"expected a pq_index checkpoint, got {kind!r}")
        pq = ProductQuantizer(
            codebooks=arrays["codebooks"], distance=config["distance"]
        )
        # Pre-packing checkpoints (round 1/2) carry no pack_bits: unpacked.
        pack_bits = int(config.get("pack_bits", 8))
        idx = cls(
            pq,
            keep_corpus=config["keep_corpus"],
            packed=pack_bits < 8,
        )
        if arrays["codes"].shape[0]:
            idx._codes = jnp.asarray(arrays["codes"])
        if "corpus" in arrays:
            idx._corpus = jnp.asarray(arrays["corpus"])
        return idx

    def __repr__(self) -> str:
        return (
            f"PQIndex(ntotal={self.ntotal}, m={self.pq.num_subspaces}, "
            f"k={self.pq.num_centroids}, metric={self.pq.distance_metric!r}, "
            f"pack_bits={self.pack_bits})"
        )


class BinaryIndex:
    """Flat Hamming index over packed sign bits (32x compression)."""

    def __init__(
        self,
        dim: int,
        threshold: float = 0.0,
        *,
        keep_corpus: bool = False,
    ):
        self.dim = int(dim)
        self.bq = BinaryQuantizer(threshold)
        self.keep_corpus = keep_corpus
        self._packed: Optional[jnp.ndarray] = None  # [n, words] u32
        self._corpus: Optional[jnp.ndarray] = None

    @property
    def ntotal(self) -> int:
        return 0 if self._packed is None else int(self._packed.shape[0])

    def add(self, vectors) -> None:
        x = jnp.asarray(vectors, jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x.shape[1])
        packed = self.bq.quantize_packed(x)
        self._packed = (
            packed if self._packed is None
            else jnp.concatenate([self._packed, packed], axis=0)
        )
        if self.keep_corpus:
            self._corpus = (
                x if self._corpus is None
                else jnp.concatenate([self._corpus, x], axis=0)
            )

    def remove_ids(self, ids) -> int:
        """Remove stored vectors by position; remaining vectors renumber
        sequentially (faiss ``remove_ids`` contract)."""
        if self._packed is None:
            raise EmptyInput("index is empty")
        mask = _removal_keep_mask(ids, self.ntotal)
        removed = self.ntotal - int(mask.sum())
        self._packed, self._corpus = _compact_rows(
            mask, self._packed, self._corpus
        )
        return removed

    def merge_from(self, other: "BinaryIndex") -> int:
        """Move every vector of ``other`` into this index. Requires the
        same dimension and binarization threshold (packed codes are
        copied). Returns the count moved; ``other`` is left empty."""
        _merge_check(self, other, attrs=("dim",))
        if self.bq._threshold != other.bq._threshold:
            raise InvalidData("cannot merge: thresholds differ")
        moved = other.ntotal
        _merge_corpus(self, other)
        self._packed = _concat_rows(self._packed, other._packed)
        other._packed = other._corpus = None
        return moved

    def search(
        self, queries, k: int = 10, *, rerank: int = 0
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k ids + Hamming distances (or exact L2 when reranked)."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        fn, arrays = self._search_core(int(k), rerank=rerank)
        return fn(q, *arrays)

    def _search_core(self, k: int, *, rerank: int = 0):
        """The search as ``(fn, arrays)`` with ``fn(q, *arrays)`` fully
        traceable — :meth:`search` is one eager call of it and
        :class:`vq_tpu.serving.BatchPipeline` scans it over many query
        batches in one dispatch."""
        if self._packed is None:
            raise EmptyInput("index is empty — add() vectors first")
        rerank = int(rerank)
        if rerank and self._corpus is None:
            # Same contract as PQIndex.search — silently falling back to
            # unreranked Hamming results would hide the misuse.
            raise InvalidData(
                "rerank requires keep_corpus=True at index construction"
            )
        k_eff = min(int(k), self.ntotal)
        r = min(rerank, self.ntotal)
        bq = self.bq
        arrays = (self._packed,) + ((self._corpus,) if rerank else ())

        def fn(q, packed, *rest):
            qp = bq.quantize_packed(q)
            ham = hamming_distance(qp, packed)  # [Q, n] int32
            if rerank:
                corpus = rest[0]
                _, short = jax.lax.top_k(-ham, r)
                cand = jnp.take(corpus, short, axis=0)  # [Q, R, d]
                exact = jax.vmap(
                    lambda qv, cv: jnp.sum((cv - qv[None, :]) ** 2, axis=-1)
                )(q, cand)
                neg_top, pos = jax.lax.top_k(-exact, min(k_eff, r))
                idx = jnp.take_along_axis(short, pos, axis=1)
                return idx, -neg_top
            neg_top, idx = jax.lax.top_k(-ham.astype(jnp.float32), k_eff)
            return idx, -neg_top

        return fn, arrays

    def save(self, path: str) -> str:
        arrays = {
            "packed": np.asarray(
                self._packed if self._packed is not None
                else np.zeros((0, (self.dim + 31) // 32), np.uint32)
            ),
        }
        if self.keep_corpus and self._corpus is not None:
            arrays["corpus"] = np.asarray(self._corpus)
        return _to_npz(
            path,
            "binary_index",
            {
                "dim": self.dim,
                "threshold": self.bq.threshold,
                "keep_corpus": bool(self.keep_corpus),
            },
            arrays,
        )

    @classmethod
    def load(cls, path: str) -> "BinaryIndex":
        kind, config, arrays = _from_npz(path)
        if kind != "binary_index":
            raise InvalidData(
                f"expected a binary_index checkpoint, got {kind!r}"
            )
        idx = cls(
            config["dim"],
            threshold=config["threshold"],
            keep_corpus=config["keep_corpus"],
        )
        if arrays["packed"].shape[0]:
            idx._packed = jnp.asarray(arrays["packed"])
        if "corpus" in arrays:
            idx._corpus = jnp.asarray(arrays["corpus"])
        return idx

    def __repr__(self) -> str:
        return f"BinaryIndex(ntotal={self.ntotal}, dim={self.dim})"


@functools.partial(
    jax.jit, static_argnames=("metric", "fetch", "pack_bits")
)
def _sq_scan_jit(
    q: jnp.ndarray,  # [Q, d] raw queries (f32)
    lo: jnp.ndarray,  # [d]
    step: jnp.ndarray,  # [d]
    code_chunks: jnp.ndarray,  # [nc, chunk, B] u8 corpus codes, padded
    row_sqn_chunks: jnp.ndarray,  # [nc, chunk] ||decode(row)||^2
    nvalid: jnp.ndarray,  # [] real row count
    radius: jnp.ndarray,  # [] f32 hit threshold (+inf = plain top-k)
    metric: str,
    fetch: int,
    pack_bits: int = 8,
):
    """Blockwise asymmetric scan over scalar-quantized rows.

    Every decoded row is the affine map ``y = lo + c * step``, so
    ``q . y = q . lo + (q * step) . c`` — one ``[Q, d] x [d, chunk]`` MXU
    matmul per block recovers exact decoded-corpus distances for every
    decomposable metric (sq-L2 / L2 / cosine / dot) without materializing
    the f32 corpus. Working set is one ``[Q, chunk]`` block; blocks merge
    through a running top-``fetch`` exactly like the PQ ADC scan.
    ``pack_bits < 8`` (SQ4/SQ2/SQ1) stores several codes per byte; blocks
    unpack on the VPU right before the matmul (the PQIndex sub-byte
    pattern).
    """
    Q, dim = q.shape
    chunk = code_chunks.shape[1]
    qs = q * step[None, :]  # [Q, d]
    qlo = q @ lo  # [Q]
    qn2 = jnp.sum(q * q, axis=-1)  # [Q]
    qn = jnp.sqrt(qn2)

    def body(carry, inp):
        best_d, best_i, hits = carry  # [Q, fetch] x2, [Q]
        chunk_codes, row_sqn, cidx = inp  # [chunk, B] u8, [chunk], []
        if pack_bits < 8:
            from vq_tpu.ops.packing import unpack_codes

            chunk_codes = unpack_codes(chunk_codes, pack_bits, dim)
        c = chunk_codes.astype(jnp.float32)
        qdoty = qlo[:, None] + jax.lax.dot_general(
            qs, c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Q, chunk]
        if metric in ("squared_euclidean", "euclidean"):
            d = jnp.maximum(qn2[:, None] - 2.0 * qdoty + row_sqn[None, :], 0.0)
            if metric == "euclidean":
                d = jnp.sqrt(d)
        elif metric == "cosine":
            rn = jnp.sqrt(jnp.maximum(row_sqn, 0.0))
            denom = jnp.maximum(qn[:, None] * rn[None, :], COSINE_NORM_EPS)
            d = jnp.clip(1.0 - qdoty / denom, 0.0, 1.0)
            degenerate = (qn[:, None] < COSINE_NORM_EPS) | (
                rn[None, :] < COSINE_NORM_EPS
            )
            d = jnp.where(degenerate, 1.0, d)
        else:  # dot: minimize the negated score
            d = -qdoty
        gidx = cidx * chunk + jnp.arange(chunk)
        valid = (gidx < nvalid)[None, :]
        d = jnp.where(valid, d, jnp.inf)
        hits = hits + jnp.sum((d <= radius) & valid, axis=1)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(gidx[None, :], (Q, chunk))], axis=1
        )
        neg, pos = jax.lax.top_k(-cat_d, fetch)
        return (-neg, jnp.take_along_axis(cat_i, pos, axis=1), hits), None

    init = (
        jnp.full((Q, fetch), jnp.inf, jnp.float32),
        jnp.full((Q, fetch), -1, jnp.int32),
        jnp.zeros((Q,), jnp.int32),
    )
    (best_d, best_i, hits), _ = jax.lax.scan(
        body, init,
        (code_chunks, row_sqn_chunks, jnp.arange(code_chunks.shape[0])),
    )
    return best_i, best_d, hits


_SQ_METRICS = ("squared_euclidean", "euclidean", "cosine", "dot")


class SQIndex:
    """Flat asymmetric-distance index over scalar-quantized rows.

    The faiss ``IndexScalarQuantizer`` analog, absent from the reference
    (whose SQ — /root/reference/src/sq.rs — only round-trips values).
    Rows are stored as ``[n, d]`` u8 codes (75% smaller than f32) plus one
    precomputed f32 squared norm per row; queries stay full-precision, so
    search distances equal exact distances to the *decoded* corpus — the
    same asymmetric-distance idea as PQ's ADC, at full dimensionality.

    Supported metrics decompose onto a single MXU matmul per scanned block
    (``q . y = q . lo + (q * step) . c``): ``squared_euclidean`` (default),
    ``euclidean``, ``cosine``, and ``dot`` (maximum-inner-product; returns
    descending scores). Manhattan does not decompose and is rejected.

    ``keep_corpus=True`` retains raw rows for exact reranking, matching
    :class:`PQIndex` semantics.
    """

    def __init__(
        self,
        quantizer: PerDimScalarQuantizer,
        *,
        metric: str = "squared_euclidean",
        keep_corpus: bool = False,
    ):
        if not isinstance(quantizer, PerDimScalarQuantizer):
            raise InvalidParameter(
                "quantizer",
                "SQIndex requires a PerDimScalarQuantizer (use "
                "PerDimScalarQuantizer.from_data or SQIndex.from_data)",
            )
        m = metric.value if isinstance(metric, Metric) else str(metric)
        if m not in _SQ_METRICS:
            raise InvalidParameter(
                "metric",
                "must be one of 'squared_euclidean', 'euclidean', "
                "'cosine', 'dot' (manhattan does not decompose onto the "
                "asymmetric scan)",
            )
        self.sq = quantizer
        self.metric = m
        self.keep_corpus = keep_corpus
        # Sub-byte storage when the level count allows it (faiss SQ4):
        # several codes per byte, unpacked on the VPU inside the scan.
        lv = quantizer.levels
        self.pack_bits = 1 if lv <= 2 else 2 if lv <= 4 else (
            4 if lv <= 16 else 8
        )
        self._codes: Optional[jnp.ndarray] = None  # [n, B] u8 (packed)
        self._row_sqn: Optional[jnp.ndarray] = None  # [n] f32
        self._corpus: Optional[jnp.ndarray] = None  # [n, d] if kept

    @classmethod
    def from_data(
        cls,
        data,
        levels: int = 256,
        *,
        metric: str = "squared_euclidean",
        keep_corpus: bool = False,
    ) -> "SQIndex":
        """Fit per-dimension ranges from ``data``, build, and add it."""
        idx = cls(
            PerDimScalarQuantizer.from_data(data, levels),
            metric=metric,
            keep_corpus=keep_corpus,
        )
        idx.add(data)
        return idx

    @property
    def dim(self) -> int:
        return self.sq.dim

    @property
    def ntotal(self) -> int:
        return 0 if self._codes is None else int(self._codes.shape[0])

    @property
    def code_bytes_per_vector(self) -> int:
        # packed bytes per row (+4 for the cached row norm)
        return -(-self.dim * self.pack_bits // 8)

    def add(self, vectors) -> None:
        """Quantize and append a batch of raw vectors."""
        x = jnp.asarray(vectors)
        if x.dtype not in (jnp.float16, jnp.bfloat16):
            x = x.astype(jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x.shape[1])
        codes = self.sq.quantize(x.astype(jnp.float32))
        y = self.sq.dequantize(codes)
        row_sqn = jnp.sum(y * y, axis=-1)
        if self.pack_bits < 8:
            from vq_tpu.ops.packing import pack_codes

            codes = pack_codes(codes, self.pack_bits)
        if self._codes is None:
            self._codes, self._row_sqn = codes, row_sqn
        else:
            self._codes = jnp.concatenate([self._codes, codes], axis=0)
            self._row_sqn = jnp.concatenate([self._row_sqn, row_sqn], axis=0)
        if self.keep_corpus:
            self._corpus = (
                x if self._corpus is None
                else jnp.concatenate([self._corpus, x], axis=0)
            )

    def remove_ids(self, ids) -> int:
        """Remove stored vectors by position; remaining vectors renumber
        sequentially (faiss ``remove_ids`` contract)."""
        if self._codes is None:
            raise EmptyInput("index is empty")
        mask = _removal_keep_mask(ids, self.ntotal)
        removed = self.ntotal - int(mask.sum())
        self._codes, self._row_sqn, self._corpus = _compact_rows(
            mask, self._codes, self._row_sqn, self._corpus
        )
        return removed

    def merge_from(self, other: "SQIndex") -> int:
        """Move every vector of ``other`` into this index. Requires the
        same metric and fitted per-dimension ranges (codes are copied,
        not re-quantized). Returns the count moved; ``other`` is left
        empty."""
        _merge_check(
            self, other, attrs=("metric",),
            arrays=(
                ("SQ lo", self.sq._lo, other.sq._lo),
                ("SQ hi", self.sq._hi, other.sq._hi),
            ),
        )
        if self.sq._levels != other.sq._levels:
            raise InvalidData("cannot merge: SQ levels differ")
        moved = other.ntotal
        _merge_corpus(self, other)
        self._codes = _concat_rows(self._codes, other._codes)
        self._row_sqn = _concat_rows(self._row_sqn, other._row_sqn)
        other._codes = other._row_sqn = other._corpus = None
        return moved

    def search_and_reconstruct(self, queries, k: int = 10, **kw):
        """Search plus the decoded rows of every hit — ``(ids, values,
        vectors [Q, k, d])``; padded ``-1`` ids yield zero rows."""
        return _search_and_reconstruct(self, queries, k, **kw)


    def _check_query(self, queries) -> jnp.ndarray:
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=q.shape[1])
        return q

    def _scan(self, q, fetch: int, radius: float, chunk: int):
        n = self.ntotal
        chunk = min(int(chunk), max(n, 1))
        pad = (-n) % chunk
        width = self._codes.shape[1]
        code_chunks = jnp.pad(self._codes, ((0, pad), (0, 0))).reshape(
            -1, chunk, width
        )
        sqn_chunks = jnp.pad(self._row_sqn, (0, pad)).reshape(-1, chunk)
        return _sq_scan_jit(
            q, self.sq.mins, self.sq.steps, code_chunks, sqn_chunks,
            jnp.int32(n), jnp.float32(radius), self.metric, int(fetch),
            self.pack_bits,
        )

    def range_search(
        self,
        queries,
        radius: float,
        *,
        max_results: int = 1024,
        chunk: int = 262_144,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """All rows whose asymmetric (decoded-corpus) value is within
        ``radius`` of each query — same contract as
        :meth:`FlatIndex.range_search` (``value <= radius`` for distance
        metrics, ``score >= radius`` for ``dot``; returns the best
        ``max_results`` hits + TRUE per-query hit counts)."""
        if self._codes is None:
            raise EmptyInput("index is empty — add() vectors first")
        if int(max_results) < 1:
            raise InvalidParameter("max_results", "must be >= 1")
        q = self._check_query(queries)
        fetch = min(int(max_results), self.ntotal)
        r = float(radius)
        rad = -r if self.metric == "dot" else r
        ids, d, counts = self._scan(q, fetch, rad, chunk)
        hit = d <= rad
        ids = jnp.where(hit, ids, -1)
        d = jnp.where(hit, d, jnp.inf)
        if self.metric == "dot":
            return ids, -d, counts
        return ids, d, counts

    def search(
        self, queries, k: int = 10, *, rerank: int = 0, chunk: int = 262_144
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k ids + values for each query row.

        Values are distances (ascending) for L2-family/cosine metrics and
        inner-product scores (descending) for ``dot``. With ``rerank=R``
        and a kept corpus, a top-R shortlist is re-scored exactly.
        """
        q = self._check_query(queries)
        fn, arrays = self._search_core(int(k), rerank=rerank, chunk=chunk)
        return fn(q, *arrays)

    def _search_core(
        self, k: int, *, rerank: int = 0, chunk: int = 262_144
    ):
        """The search as ``(fn, arrays)`` with ``fn(q, *arrays)`` fully
        traceable — :meth:`search` is one eager call of it and
        :class:`vq_tpu.serving.BatchPipeline` scans it over many query
        batches in one dispatch. Storage is passed as arguments so jitted
        callers don't bake it into the program as constants."""
        if self._codes is None:
            raise EmptyInput("index is empty — add() vectors first")
        rerank = int(rerank)
        if rerank and self._corpus is None:
            raise InvalidData(
                "rerank requires keep_corpus=True at index construction"
            )
        n = self.ntotal
        k_eff = min(int(k), n)
        fetch = min(max(k_eff, rerank), n)
        chunk = min(int(chunk), max(n, 1))
        pad = (-n) % chunk
        metric = self.metric
        pack_bits = self.pack_bits
        width = self._codes.shape[1]
        code_chunks = jnp.pad(self._codes, ((0, pad), (0, 0))).reshape(
            -1, chunk, width
        )
        sqn_chunks = jnp.pad(self._row_sqn, (0, pad)).reshape(-1, chunk)
        arrays = (code_chunks, sqn_chunks, self.sq.mins, self.sq.steps) + (
            (self._corpus,) if rerank else ()
        )

        def fn(q, code_c, sqn_c, mins, steps, *rest):
            ids, d, _ = _sq_scan_jit(
                q, mins, steps, code_c, sqn_c, jnp.int32(n),
                jnp.float32(float("inf")), metric, fetch, pack_bits,
            )
            if rerank:
                corpus = rest[0]
                cand = jnp.take(corpus, ids, axis=0).astype(jnp.float32)
                if metric == "dot":
                    exact = jnp.einsum("qd,qrd->qr", q, cand)
                    neg, pos = jax.lax.top_k(exact, k_eff)
                    return jnp.take_along_axis(ids, pos, axis=1), neg
                from vq_tpu.ops.distance import _PAIRWISE

                exact = jax.vmap(
                    lambda qv, cv: _PAIRWISE[Metric(metric)](qv[None, :], cv)[0]
                )(q, cand)
                neg_top, pos = jax.lax.top_k(-exact, k_eff)
                return jnp.take_along_axis(ids, pos, axis=1), -neg_top
            if metric == "dot":
                return ids[:, :k_eff], -d[:, :k_eff]
            return ids[:, :k_eff], d[:, :k_eff]

        return fn, arrays

    def reconstruct(self, ids) -> jnp.ndarray:
        """Decoded (approximate) vectors for stored ids."""
        if self._codes is None:
            raise EmptyInput("index is empty")
        ids = jnp.asarray(ids, jnp.int32)
        rows = jnp.take(self._codes, ids, axis=0)
        if self.pack_bits < 8:
            from vq_tpu.ops.packing import unpack_codes

            rows = unpack_codes(rows, self.pack_bits, self.dim)
        return self.sq.dequantize(rows)

    def _reconstruct_core(self):
        """Traceable ``(fn, arrays)`` reconstruct — see
        :meth:`PQIndex._reconstruct_core`."""
        if self._codes is None:
            raise EmptyInput("index is empty — add() vectors first")
        sq, pack_bits, d = self.sq, self.pack_bits, self.dim

        def fn(ids, codes):
            rows = jnp.take(codes, ids, axis=0)
            if pack_bits < 8:
                from vq_tpu.ops.packing import unpack_codes

                rows = unpack_codes(rows, pack_bits, d)
            return sq.dequantize(rows)

        return fn, (self._codes,)

    def save(self, path: str) -> str:
        arrays = {
            "mins": np.asarray(self.sq.mins),
            "maxs": np.asarray(self.sq.maxs),
            "codes": np.asarray(
                self._codes if self._codes is not None
                else np.zeros((0, self.dim), np.uint8)
            ),
            "row_sqn": np.asarray(
                self._row_sqn if self._row_sqn is not None
                else np.zeros((0,), np.float32)
            ),
        }
        if self.keep_corpus and self._corpus is not None:
            arrays["corpus"] = np.asarray(self._corpus)
        return _to_npz(
            path,
            "sq_index",
            {
                "levels": self.sq.levels,
                "metric": self.metric,
                "keep_corpus": bool(self.keep_corpus),
            },
            arrays,
        )

    @classmethod
    def load(cls, path: str) -> "SQIndex":
        kind, config, arrays = _from_npz(path)
        if kind != "sq_index":
            raise InvalidData(f"expected a sq_index checkpoint, got {kind!r}")
        sq = PerDimScalarQuantizer(
            arrays["mins"], arrays["maxs"], config["levels"]
        )
        idx = cls(
            sq, metric=config["metric"], keep_corpus=config["keep_corpus"]
        )
        if arrays["codes"].shape[0]:
            idx._codes = jnp.asarray(arrays["codes"])
            idx._row_sqn = jnp.asarray(arrays["row_sqn"])
        if "corpus" in arrays:
            idx._corpus = jnp.asarray(arrays["corpus"])
        return idx

    def __repr__(self) -> str:
        return (
            f"SQIndex(ntotal={self.ntotal}, dim={self.dim}, "
            f"levels={self.sq.levels}, metric={self.metric!r})"
        )


@functools.partial(jax.jit, static_argnames=("metric", "fetch"))
def _rq_scan_jit(
    tables: jnp.ndarray,  # [Q, S, k] per-stage dot tables q . C_s[j]
    qn2: jnp.ndarray,  # [Q] query squared norms
    code_chunks: jnp.ndarray,  # [nc, chunk, S] corpus codes, padded
    row_sqn_chunks: jnp.ndarray,  # [nc, chunk] ||decode(row)||^2
    nvalid: jnp.ndarray,  # [] real row count
    radius: jnp.ndarray,  # [] f32 hit threshold (+inf = plain top-k)
    metric: str,
    fetch: int,
):
    """Blockwise ADC scan over additive (residual-quantizer) codes.

    An additive reconstruction is ``y = sum_s C_s[c_s]``, so
    ``q . y = sum_s T_s[c_s]`` with per-stage dot tables — the identical
    table-sum shape as PQ's ADC (reused: ``m`` one-hot MXU matmuls per
    block, no gathers). Unlike PQ, ``||y||^2`` carries cross-stage terms
    the tables can't see, so each row's exact decoded squared norm is
    precomputed at ``add`` time and streamed alongside the codes — the
    same trick faiss's ``IndexResidualQuantizer`` uses (stored norms).
    Every decomposable metric (sq-L2 / L2 / cosine / dot) then reduces to
    ``q . y`` + per-row norms; distances equal exact distances to the
    decoded corpus.
    """
    from vq_tpu.models.pq import _adc_lookup_jit

    Q = tables.shape[0]
    chunk = code_chunks.shape[1]
    qn = jnp.sqrt(qn2)

    def body(carry, inp):
        best_d, best_i, hits = carry  # [Q, fetch] x2, [Q]
        chunk_codes, row_sqn, cidx = inp  # [chunk, S], [chunk], []
        qdoty = _adc_lookup_jit(
            tables, chunk_codes.astype(jnp.int32)
        )  # [Q, chunk]
        if metric in ("squared_euclidean", "euclidean"):
            d = jnp.maximum(
                qn2[:, None] - 2.0 * qdoty + row_sqn[None, :], 0.0
            )
            if metric == "euclidean":
                d = jnp.sqrt(d)
        elif metric == "cosine":
            rn = jnp.sqrt(jnp.maximum(row_sqn, 0.0))
            denom = jnp.maximum(qn[:, None] * rn[None, :], COSINE_NORM_EPS)
            d = jnp.clip(1.0 - qdoty / denom, 0.0, 1.0)
            degenerate = (qn[:, None] < COSINE_NORM_EPS) | (
                rn[None, :] < COSINE_NORM_EPS
            )
            d = jnp.where(degenerate, 1.0, d)
        else:  # dot: minimize the negated score
            d = -qdoty
        gidx = cidx * chunk + jnp.arange(chunk)
        valid = (gidx < nvalid)[None, :]
        d = jnp.where(valid, d, jnp.inf)
        hits = hits + jnp.sum((d <= radius) & valid, axis=1)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(gidx[None, :], (Q, chunk))], axis=1
        )
        neg, pos = jax.lax.top_k(-cat_d, fetch)
        return (-neg, jnp.take_along_axis(cat_i, pos, axis=1), hits), None

    init = (
        jnp.full((Q, fetch), jnp.inf, jnp.float32),
        jnp.full((Q, fetch), -1, jnp.int32),
        jnp.zeros((Q,), jnp.int32),
    )
    (best_d, best_i, hits), _ = jax.lax.scan(
        body, init,
        (code_chunks, row_sqn_chunks, jnp.arange(code_chunks.shape[0])),
    )
    return best_i, best_d, hits


@functools.partial(
    jax.jit, static_argnames=("fetch", "metric", "interpret")
)
def _rq_search_fused_jit(
    tables: jnp.ndarray,  # [Q, S, k] per-stage dot tables
    qn2: jnp.ndarray,  # [Q]
    codes: jnp.ndarray,  # [n, S] u8
    row_sqn: jnp.ndarray,  # [n] f32 stored decoded norms
    fetch: int,
    metric: str,
    interpret: bool = False,
):
    """Additive-code top-``fetch`` via the VMEM-resident scan+top-k
    kernel (the :func:`_rq_scan_jit` fast path — same per-element f32
    assembly order and tie preference, so results match exactly; see
    ``adc_scan_topk_fused`` mode ``"l2"``/``"dot"``)."""
    from vq_tpu.ops.pallas_kernels import adc_scan_topk_fused

    codes_t = codes.astype(jnp.uint8).T  # [S, n]
    if metric == "dot":
        vals, ids = adc_scan_topk_fused(
            tables, codes_t, fetch, mode="dot", interpret=interpret
        )
    else:
        vals, ids = adc_scan_topk_fused(
            tables, codes_t, fetch, mode="l2", qn2=qn2,
            offsets=row_sqn, interpret=interpret,
        )
    neg, pos = jax.lax.top_k(-vals, fetch)
    dist = -neg
    idx = jnp.take_along_axis(ids, pos, axis=1)
    idx = jnp.where(jnp.isinf(dist), -1, idx)
    if metric == "euclidean":
        dist = jnp.sqrt(jnp.maximum(dist, 0.0))
    return idx, dist


@functools.partial(jax.jit, static_argnames=("metric",))
def _rq_tables_jit(q: jnp.ndarray, cbs: jnp.ndarray, metric: str):
    """Per-stage dot tables ``T[q, s, j] = q . C_s[j]`` — [Q, S, k]."""
    del metric  # every supported metric builds from the same dot tables
    return jnp.einsum(
        "qd,skd->qsk", q, cbs,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


class RQIndex:
    """Flat asymmetric-distance index over additive (RQ) codes.

    The faiss ``IndexResidualQuantizer`` analog — no counterpart exists in
    the reference (which has no additive quantizer at all). Rows are
    stored as ``[n, S]`` stage codes (S bytes/vector at k <= 256) plus one
    exact decoded squared norm per row (additive codes have cross-stage
    norm terms PQ-style tables can't express). Search distances equal
    exact distances to the decoded corpus under ``squared_euclidean``
    (default), ``euclidean``, ``cosine``, or ``dot`` (maximum inner
    product; descending scores).

    At equal byte budgets RQ codes reconstruct better than PQ on data
    without coordinate-aligned structure, making this the accuracy play at
    small code sizes; the scan cost is identical to :class:`PQIndex`
    (same one-hot table-sum kernel shape, ``S`` vs ``m`` stages).

    ``beam`` controls encode quality at :meth:`add` time (beam-search over
    stage combinations; 1 = greedy). ``keep_corpus=True`` retains raw rows
    for exact reranking, matching :class:`PQIndex` semantics.
    """

    def __init__(
        self,
        quantizer: ResidualQuantizer,
        *,
        metric: str = "squared_euclidean",
        keep_corpus: bool = False,
        beam: int = 1,
    ):
        if not isinstance(quantizer, ResidualQuantizer):
            raise InvalidParameter(
                "quantizer", "RQIndex requires a ResidualQuantizer"
            )
        m = metric.value if isinstance(metric, Metric) else str(metric)
        if m not in _SQ_METRICS:
            raise InvalidParameter(
                "metric",
                "must be one of 'squared_euclidean', 'euclidean', "
                "'cosine', 'dot' (manhattan does not decompose onto the "
                "asymmetric scan)",
            )
        if int(beam) < 1:
            raise InvalidParameter("beam", "must be >= 1")
        self.rq = quantizer
        self.metric = m
        self.keep_corpus = keep_corpus
        self.beam = int(beam)
        self._codes: Optional[jnp.ndarray] = None  # [n, S] u8/i32
        self._row_sqn: Optional[jnp.ndarray] = None  # [n] f32
        self._corpus: Optional[jnp.ndarray] = None  # [n, d] if kept

    @property
    def dim(self) -> int:
        return self.rq.dim

    @property
    def ntotal(self) -> int:
        return 0 if self._codes is None else int(self._codes.shape[0])

    @property
    def code_bytes_per_vector(self) -> int:
        itemsize = 1 if self.rq.num_centroids <= 256 else 4
        return self.rq.num_stages * itemsize  # +4 for the cached row norm

    def add(self, vectors) -> None:
        """Encode (greedy or beam) and append a batch of raw vectors."""
        x = jnp.asarray(vectors)
        if x.dtype not in (jnp.float16, jnp.bfloat16):
            x = x.astype(jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x.shape[1])
        codes = self.rq.encode(x.astype(jnp.float32), beam=self.beam)
        y = self.rq.decode(codes)
        row_sqn = jnp.sum(y * y, axis=-1)
        if self._codes is None:
            self._codes, self._row_sqn = codes, row_sqn
        else:
            self._codes = jnp.concatenate([self._codes, codes], axis=0)
            self._row_sqn = jnp.concatenate([self._row_sqn, row_sqn], axis=0)
        if self.keep_corpus:
            self._corpus = (
                x if self._corpus is None
                else jnp.concatenate([self._corpus, x], axis=0)
            )

    def remove_ids(self, ids) -> int:
        """Remove stored vectors by position; remaining vectors renumber
        sequentially (faiss ``remove_ids`` contract)."""
        if self._codes is None:
            raise EmptyInput("index is empty")
        mask = _removal_keep_mask(ids, self.ntotal)
        removed = self.ntotal - int(mask.sum())
        self._codes, self._row_sqn, self._corpus = _compact_rows(
            mask, self._codes, self._row_sqn, self._corpus
        )
        return removed

    def merge_from(self, other: "RQIndex") -> int:
        """Move every vector of ``other`` into this index. Requires the
        same metric and trained stage codebooks (codes are copied, not
        re-encoded). Returns the count moved; ``other`` is left empty."""
        _merge_check(
            self, other, attrs=("metric",),
            arrays=(
                ("RQ codebooks", self.rq._cbs, other.rq._cbs),
            ),
        )
        moved = other.ntotal
        _merge_corpus(self, other)
        self._codes = _concat_rows(self._codes, other._codes)
        self._row_sqn = _concat_rows(self._row_sqn, other._row_sqn)
        other._codes = other._row_sqn = other._corpus = None
        return moved

    def search_and_reconstruct(self, queries, k: int = 10, **kw):
        """Search plus the decoded codes of every hit — ``(ids, values,
        vectors [Q, k, d])``; padded ``-1`` ids yield zero rows."""
        return _search_and_reconstruct(self, queries, k, **kw)


    def _check_query(self, queries) -> jnp.ndarray:
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=q.shape[1])
        return q

    def _scan(self, q, fetch: int, radius: float, chunk: int):
        n = self.ntotal
        chunk = min(int(chunk), max(n, 1))
        pad = (-n) % chunk
        code_chunks = jnp.pad(self._codes, ((0, pad), (0, 0))).reshape(
            -1, chunk, self.rq.num_stages
        )
        sqn_chunks = jnp.pad(self._row_sqn, (0, pad)).reshape(-1, chunk)
        tables = _rq_tables_jit(q, self.rq.codebooks, self.metric)
        qn2 = jnp.sum(q * q, axis=-1)
        return _rq_scan_jit(
            tables, qn2, code_chunks, sqn_chunks, jnp.int32(n),
            jnp.float32(radius), self.metric, int(fetch),
        )

    def range_search(
        self,
        queries,
        radius: float,
        *,
        max_results: int = 1024,
        chunk: int = 262_144,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """All rows whose asymmetric (decoded-corpus) value is within
        ``radius`` of each query — same contract as
        :meth:`FlatIndex.range_search` (``value <= radius`` for distance
        metrics, ``score >= radius`` for ``dot``; returns the best
        ``max_results`` hits + TRUE per-query hit counts)."""
        if self._codes is None:
            raise EmptyInput("index is empty — add() vectors first")
        if int(max_results) < 1:
            raise InvalidParameter("max_results", "must be >= 1")
        q = self._check_query(queries)
        fetch = min(int(max_results), self.ntotal)
        r = float(radius)
        rad = -r if self.metric == "dot" else r
        ids, d, counts = self._scan(q, fetch, rad, chunk)
        hit = d <= rad
        ids = jnp.where(hit, ids, -1)
        d = jnp.where(hit, d, jnp.inf)
        if self.metric == "dot":
            return ids, -d, counts
        return ids, d, counts

    def search(
        self, queries, k: int = 10, *, rerank: int = 0, chunk: int = 262_144
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k ids + values for each query row.

        Values are distances (ascending) for L2-family/cosine metrics and
        inner-product scores (descending) for ``dot``. With ``rerank=R``
        and a kept corpus, a top-R shortlist is re-scored exactly.
        """
        q = self._check_query(queries)
        fn, arrays = self._search_core(int(k), rerank=rerank, chunk=chunk)
        return fn(q, *arrays)

    def _search_core(
        self, k: int, *, rerank: int = 0, chunk: int = 262_144
    ):
        """The search as ``(fn, arrays)`` with ``fn(q, *arrays)`` fully
        traceable — :meth:`search` is one eager call of it and
        :class:`vq_tpu.serving.BatchPipeline` scans it over many query
        batches in one dispatch. Storage is passed as arguments so jitted
        callers don't bake it into the program as constants."""
        if self._codes is None:
            raise EmptyInput("index is empty — add() vectors first")
        rerank = int(rerank)
        if rerank and self._corpus is None:
            raise InvalidData(
                "rerank requires keep_corpus=True at index construction"
            )
        n = self.ntotal
        k_eff = min(int(k), n)
        fetch = min(max(k_eff, rerank), n)
        chunk = min(int(chunk), max(n, 1))
        pad = (-n) % chunk
        metric = self.metric
        fused_ok = (
            jax.default_backend() == "tpu"
            and self.rq.codebooks.shape[1] <= 256
            and metric in ("squared_euclidean", "euclidean", "dot")
            and 1 <= fetch <= 128
            and n > 32_768
        )
        # FLAT storage either way; the chunked fallback reshapes inside
        # the traced fn (free under jit), so the fused/chunked choice
        # can also depend on the query-batch size, which is only known
        # at trace time (the kernel's VMEM gate needs Q AND the table
        # scratch — adc_topk_max_block — to fit together).
        num_stages = self.rq.num_stages
        num_cents = int(self.rq.codebooks.shape[1])
        fused_mode = "dot" if metric == "dot" else "l2"
        arrays = (self._codes, self._row_sqn, self.rq.codebooks) + (
            (self._corpus,) if rerank else ()
        )
        from vq_tpu.ops.pallas_kernels import adc_topk_max_block

        def fn(q, code_c, sqn_c, cbs, *rest):
            tables = _rq_tables_jit(q, cbs, metric)
            qn2 = jnp.sum(q * q, axis=-1)
            if fused_ok and adc_topk_max_block(
                q.shape[0], num_stages, num_cents, fused_mode
            ) > 0:
                # VMEM-resident gather+top-k scan (identical results to
                # the XLA chunked scan — see _rq_search_fused_jit).
                ids, d = _rq_search_fused_jit(
                    tables, qn2, code_c, sqn_c, fetch, metric
                )
            else:
                code_chunks = jnp.pad(
                    code_c, ((0, pad), (0, 0))
                ).reshape(-1, chunk, num_stages)
                sqn_chunks = jnp.pad(sqn_c, (0, pad)).reshape(-1, chunk)
                ids, d, _ = _rq_scan_jit(
                    tables, qn2, code_chunks, sqn_chunks, jnp.int32(n),
                    jnp.float32(float("inf")), metric, fetch,
                )
            if rerank:
                corpus = rest[0]
                cand = jnp.take(corpus, ids, axis=0).astype(jnp.float32)
                if metric == "dot":
                    exact = jnp.einsum("qd,qrd->qr", q, cand)
                    neg, pos = jax.lax.top_k(exact, k_eff)
                    return jnp.take_along_axis(ids, pos, axis=1), neg
                from vq_tpu.ops.distance import _PAIRWISE

                exact = jax.vmap(
                    lambda qv, cv: _PAIRWISE[Metric(metric)](qv[None, :], cv)[0]
                )(q, cand)
                neg_top, pos = jax.lax.top_k(-exact, k_eff)
                return jnp.take_along_axis(ids, pos, axis=1), -neg_top
            if metric == "dot":
                return ids[:, :k_eff], -d[:, :k_eff]
            return ids[:, :k_eff], d[:, :k_eff]

        return fn, arrays

    def reconstruct(self, ids) -> jnp.ndarray:
        """Decoded (approximate) vectors for stored ids."""
        if self._codes is None:
            raise EmptyInput("index is empty")
        ids = jnp.asarray(ids, jnp.int32)
        return self.rq.decode(jnp.take(self._codes, ids, axis=0))

    def _reconstruct_core(self):
        """Traceable ``(fn, arrays)`` reconstruct — see
        :meth:`PQIndex._reconstruct_core`."""
        if self._codes is None:
            raise EmptyInput("index is empty — add() vectors first")
        rq = self.rq

        def fn(ids, codes):
            return rq.decode(jnp.take(codes, ids, axis=0))

        return fn, (self._codes,)

    def save(self, path: str) -> str:
        arrays = {
            "codebooks": np.asarray(self.rq.codebooks),
            "codes": np.asarray(
                self._codes if self._codes is not None
                else np.zeros((0, self.rq.num_stages), np.uint8)
            ),
            "row_sqn": np.asarray(
                self._row_sqn if self._row_sqn is not None
                else np.zeros((0,), np.float32)
            ),
        }
        if self.keep_corpus and self._corpus is not None:
            arrays["corpus"] = np.asarray(self._corpus)
        return _to_npz(
            path,
            "rq_index",
            {
                "metric": self.metric,
                "keep_corpus": bool(self.keep_corpus),
                "beam": self.beam,
            },
            arrays,
        )

    @classmethod
    def load(cls, path: str) -> "RQIndex":
        kind, config, arrays = _from_npz(path)
        if kind != "rq_index":
            raise InvalidData(f"expected an rq_index checkpoint, got {kind!r}")
        rq = ResidualQuantizer(codebooks=arrays["codebooks"])
        idx = cls(
            rq,
            metric=config["metric"],
            keep_corpus=config["keep_corpus"],
            beam=config.get("beam", 1),
        )
        if arrays["codes"].shape[0]:
            idx._codes = jnp.asarray(arrays["codes"])
            idx._row_sqn = jnp.asarray(arrays["row_sqn"])
        if "corpus" in arrays:
            idx._corpus = jnp.asarray(arrays["corpus"])
        return idx

    def __repr__(self) -> str:
        return (
            f"RQIndex(ntotal={self.ntotal}, stages={self.rq.num_stages}, "
            f"k={self.rq.num_centroids}, metric={self.metric!r}, "
            f"beam={self.beam})"
        )
