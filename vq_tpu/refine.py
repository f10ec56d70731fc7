"""Refinement rerank layer: exact-ish re-scoring from compact second codes.

The faiss ``IndexRefine`` / ``IndexRefineFlat`` / ``IndexIVFPQR`` role,
TPU-native. A coarse base index (PQ / IVF-PQ / binary / anything in the
zoo) fetches ``k_factor * k`` candidates; a *refinement codec* stored
alongside re-scores them from a second, higher-fidelity code — so rerank
quality no longer requires keeping the raw f32 corpus in HBM
(``keep_corpus=True``), only ``refine-bytes/vector`` more storage:

========  ======================  ==========================  =========
refiner   codes                   reranks with                bytes/vec
========  ======================  ==========================  =========
"flat"    raw rows at a dtype     exact distances (f32) or    4d/2d
          (f32 / bf16 / f16)      near-exact (half widths)
"sq8"     per-dim scalar codes    SQ-decoded distances        d
PQ        residual-of-base-       base recon + PQ-decoded     m₂
          reconstruction codes    residual (IVFPQR)
========  ======================  ==========================  =========

The whole search (base fetch → gather refine codes → decode → exact
scores → top-k) is ONE traceable function: :meth:`_search_core` composes
the base's ``_search_core`` with the decode, so it jits as a single
program, pipelines through :class:`vq_tpu.serving.BatchPipeline`, and
the re-scoring is pure VPU/MXU work on a ``[Q, fetch, d]`` tile.

Residual refinement (a :class:`~vq_tpu.models.pq.ProductQuantizer`
refiner, the ``IndexIVFPQR`` shape) additionally needs the base's
reconstruction at search time; bases expose that as a traceable
``_reconstruct_core`` (PQIndex / SQIndex / RQIndex / IVFPQIndex).

The reference has no refinement layer (its rerank story is
``keep_corpus``-style exact re-scoring only); this extends the
north-star index zoo (SURVEY.md §2.3).
"""

from __future__ import annotations

import math
import os
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

__all__ = ["RefineIndex"]

_STORE_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def _base_metric(base) -> str:
    """Map any zoo index's metric onto a vq metric name for the exact
    re-scoring stage (smaller-is-better internally; ``dot`` negated)."""
    m = getattr(base, "metric", None)
    if m == "l2":
        return "squared_euclidean"
    if m in (
        "squared_euclidean", "euclidean", "cosine", "manhattan", "dot"
    ):
        return m
    pq = getattr(base, "pq", None)
    if pq is not None and hasattr(pq, "distance_metric"):
        return str(pq.distance_metric)
    return "squared_euclidean"  # BinaryIndex / GraphIndex / IVFBinary


def _exact_scores(q, rec, metric: str) -> jnp.ndarray:
    """Smaller-is-better scores of ``rec [Q, R, d]`` against ``q [Q, d]``
    (same formulas as :mod:`vq_tpu.ops.distance`; ``dot`` negated)."""
    q = q[:, None, :].astype(jnp.float32)
    rec = rec.astype(jnp.float32)
    if metric == "dot":
        return -jnp.sum(rec * q, axis=-1)
    if metric == "manhattan":
        return jnp.sum(jnp.abs(rec - q), axis=-1)
    if metric == "cosine":
        num = jnp.sum(rec * q, axis=-1)
        den = jnp.maximum(
            jnp.sqrt(jnp.sum(rec * rec, axis=-1))
            * jnp.sqrt(jnp.sum(q * q, axis=-1)),
            1e-10,
        )
        return 1.0 - jnp.clip(num / den, -1.0, 1.0)
    d2 = jnp.sum((rec - q) ** 2, axis=-1)
    if metric == "euclidean":
        return jnp.sqrt(d2)
    return d2  # squared_euclidean


class RefineIndex:
    """Rerank any base index from a compact refinement code.

    ::

        base = index_factory(128, "IVF256,PQ8").train(x)   # 8 B/vec
        idx = RefineIndex(base, refiner="sq8")             # +128 B/vec
        idx.add(x)
        ids, d = idx.search(q, k=10, k_factor=4, nprobe=8)

    ``refiner``:

    * ``"flat"`` — store raw rows at ``store_dtype`` (f32 exact; bf16/f16
      half the bytes, near-exact). The faiss ``IndexRefineFlat`` analog.
    * ``"sq8"`` — per-dimension scalar codes (1 B/dim), ranges fitted on
      the FIRST :meth:`add` batch (later batches clamp into them — add a
      representative batch first, or pass ``sq_train_data``).
    * a trained :class:`~vq_tpu.models.pq.ProductQuantizer` — codes the
      residual ``x − base_reconstruction(x)`` (the faiss ``IndexIVFPQR``
      shape); build one with :meth:`train_pq`. Requires a base exposing
      ``_reconstruct_core`` (PQIndex / SQIndex / RQIndex / IVFPQIndex).

    Search values are exact distances to the refined reconstruction under
    the base's metric (``dot`` returns descending scores, ``-inf`` pads).

    Caveat (residual refiners): the codes are residuals of the base's
    STORED reconstructions — operations that re-encode the base in place
    (e.g. :meth:`vq_tpu.ivf.IVFPQIndex.rebalance`, which re-codes moved
    vectors against their new coarse centroids) silently stale them.
    Rebalance the base BEFORE wrapping, or re-add through the wrapper.
    """

    def __init__(
        self,
        base,
        refiner="flat",
        *,
        store_dtype: str = "float32",
        levels: int = 256,
        sq_train_data=None,
        metric: Optional[str] = None,
    ):
        if not hasattr(base, "_search_core"):
            raise InvalidParameter(
                "base",
                f"{type(base).__name__} does not expose a traceable "
                "search core",
            )
        self.base = base
        self.metric = metric if metric is not None else _base_metric(base)
        if self.metric not in (
            "squared_euclidean", "euclidean", "cosine", "manhattan", "dot"
        ):
            raise InvalidParameter("metric", f"unknown metric {self.metric!r}")
        self._codes: Optional[jnp.ndarray] = None
        self.sq = None
        self.refine_pq = None
        if refiner == "flat":
            self.kind = "flat"
            self.residual = False
            if store_dtype not in _STORE_DTYPES:
                raise InvalidParameter(
                    "store_dtype",
                    f"must be one of {sorted(_STORE_DTYPES)}",
                )
            self.store_dtype = store_dtype
        elif refiner == "sq8":
            from vq_tpu.models.sq import PerDimScalarQuantizer

            self.kind = "sq8"
            self.residual = False
            self.store_dtype = None
            self.levels = int(levels)
            if sq_train_data is not None:
                self.sq = PerDimScalarQuantizer.from_data(
                    sq_train_data, self.levels
                )
        elif hasattr(refiner, "encode") and hasattr(refiner, "decode"):
            if not hasattr(base, "_reconstruct_core"):
                raise InvalidParameter(
                    "base",
                    "residual (PQ) refinement needs a base with a "
                    "traceable _reconstruct_core (PQIndex / SQIndex / "
                    f"RQIndex / IVFPQIndex), not {type(base).__name__}",
                )
            self.kind = "pq"
            self.residual = True
            self.store_dtype = None
            self.refine_pq = refiner
            if refiner.dim != self.dim:
                raise DimensionMismatch(
                    expected=self.dim, found=refiner.dim
                )
        else:
            raise InvalidParameter(
                "refiner",
                "must be 'flat', 'sq8', or a trained ProductQuantizer",
            )
        if base.ntotal:
            raise InvalidData(
                "base index already holds vectors — RefineIndex must see "
                "every add() to store the matching refinement codes"
            )

    # -- construction --------------------------------------------------------

    @classmethod
    def train_pq(
        cls,
        base,
        training_data,
        num_subspaces: int = 16,
        num_centroids: int = 256,
        *,
        max_iters: int = 10,
        seed: int = 42,
        metric: Optional[str] = None,
    ) -> "RefineIndex":
        """Fit an IVFPQR-style residual refiner: a PQ trained on
        ``x − base_coding(x)`` over ``training_data`` (the base must be
        trained and empty). ``num_subspaces`` is the faiss ``M_refine``
        — e.g. ``IVF256,PQ8`` + ``train_pq(..., 16)`` ≈ the factory spec
        ``"IVF256,PQ8+16"``."""
        from vq_tpu.models.pq import ProductQuantizer, pq_train

        x = jnp.asarray(training_data, jnp.float32)
        res = x - _codec_approx(base, x)
        cbs = pq_train(
            res, num_subspaces, num_centroids,
            max_iters=max_iters, seed=seed,
        )
        pq = ProductQuantizer(
            codebooks=cbs, distance="squared_euclidean"
        )
        return cls(base, pq, metric=metric)

    # -- delegated surface ---------------------------------------------------

    @property
    def dim(self) -> int:
        return int(self.base.dim)

    @property
    def ntotal(self) -> int:
        return int(self.base.ntotal)

    @property
    def code_bytes_per_vector(self) -> int:
        """Refinement bytes per vector (on top of the base's codes)."""
        if self.kind == "flat":
            return self.dim * (4 if self.store_dtype == "float32" else 2)
        if self.kind == "sq8":
            return self.dim
        return self.refine_pq.num_subspaces

    # -- data ----------------------------------------------------------------

    def add(self, vectors) -> None:
        """Add to the base index and store the refinement codes for the
        same rows (positions stay aligned by construction)."""
        x = jnp.asarray(vectors, jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x.shape[1])
        n0 = self.base.ntotal
        self.base.add(vectors)
        if self.residual:
            # Code the residual of what the base actually stored — decode
            # the just-added rows so refine codes are exactly consistent.
            rec = self.base.reconstruct(jnp.arange(n0, self.base.ntotal))
            target = x - rec
        else:
            target = x
        codes = self._encode(target)
        self._codes = (
            codes if self._codes is None
            else jnp.concatenate([self._codes, codes], axis=0)
        )

    def _encode(self, target: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "flat":
            return target.astype(_STORE_DTYPES[self.store_dtype])
        if self.kind == "sq8":
            if self.sq is None:
                from vq_tpu.models.sq import PerDimScalarQuantizer

                self.sq = PerDimScalarQuantizer.from_data(
                    target, self.levels
                )
            return self.sq.quantize(target)
        return self.refine_pq.encode(target)

    def remove_ids(self, ids) -> int:
        """Positional removal with sequential renumbering; refine codes
        stay aligned with the base."""
        from vq_tpu.search import _compact_rows, _removal_keep_mask

        if self._codes is None:
            raise EmptyInput("index is empty")
        mask = _removal_keep_mask(ids, self.ntotal)
        removed = self.base.remove_ids(ids)
        (self._codes,) = _compact_rows(mask, self._codes)
        return removed

    def merge_from(self, other: "RefineIndex") -> int:
        """Move ``other``'s vectors (and refine codes) into this index —
        same refiner kind and fitted state required."""
        from vq_tpu.search import _concat_rows, _merge_check

        arrays = []
        if self.kind == "sq8":
            if self.sq is None and other.sq is not None:
                # Unfitted (necessarily empty) self adopts the fitted
                # quantizer — other's codes must decode with THEIR ranges.
                self.sq = other.sq
            if self.sq is not None and other.sq is not None:
                arrays = [
                    ("SQ mins", self.sq.mins, other.sq.mins),
                    ("SQ steps", self.sq.steps, other.sq.steps),
                ]
            elif other._codes is not None:
                raise InvalidData(
                    "cannot merge: other holds SQ codes but no fitted "
                    "quantizer"
                )
        elif self.kind == "pq":
            arrays = [(
                "refine PQ codebooks",
                self.refine_pq.codebooks,
                other.refine_pq.codebooks,
            )]
        _merge_check(
            self, other,
            attrs=("kind", "residual", "store_dtype", "metric"),
            arrays=arrays,
        )
        moved = self.base.merge_from(other.base)
        self._codes = _concat_rows(self._codes, other._codes)
        other._codes = None
        return moved

    def reconstruct(self, ids) -> jnp.ndarray:
        """The REFINED reconstruction (strictly better than the base's:
        raw/SQ rows, or base recon + decoded residual)."""
        if self._codes is None:
            raise EmptyInput("index is empty")
        ids = jnp.asarray(ids, jnp.int32)
        rec = self._decode(jnp.take(self._codes, ids, axis=0))
        if self.residual:
            rec = rec + self.base.reconstruct(ids)
        return rec

    def _decode(self, codes) -> jnp.ndarray:
        if self.kind == "flat":
            return codes.astype(jnp.float32)
        if self.kind == "sq8":
            return self.sq.dequantize(codes)
        return self.refine_pq.decode(codes)

    def search_and_reconstruct(self, queries, k: int = 10, **kw):
        from vq_tpu.search import _search_and_reconstruct

        return _search_and_reconstruct(self, queries, k, **kw)

    # -- search --------------------------------------------------------------

    def search(
        self,
        queries,
        k: int = 10,
        *,
        k_factor: float = 4.0,
        **base_params,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fetch ``ceil(k_factor * k)`` candidates from the base, re-score
        them against the refined reconstructions, return the exact(-ish)
        top-k. ``base_params`` pass through to the base search (e.g.
        ``nprobe=...``)."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=q.shape[1])
        fn, arrays = self._search_core(
            int(k), k_factor=k_factor, **base_params
        )
        return fn(q, *arrays)

    def _search_core(
        self, k: int, *, k_factor: float = 4.0, **base_params
    ):
        """The refined search as a traceable ``(fn, arrays)`` pair — one
        program: base fetch → refine-code gather → decode → exact scores
        → top-k. :meth:`search` is one eager call of it and
        :class:`vq_tpu.serving.BatchPipeline` scans it over batches."""
        if self._codes is None:
            raise EmptyInput("index is empty — add() vectors first")
        if self._codes.shape[0] != self.base.ntotal:
            raise InvalidData(
                "refine codes out of sync with the base index — add "
                "vectors only through RefineIndex.add"
            )
        k = int(k)
        if float(k_factor) < 1.0:
            raise InvalidParameter("k_factor", "must be >= 1")
        fetch = max(k, int(math.ceil(float(k_factor) * k)))
        base_fn, base_arrays = self.base._search_core(fetch, **base_params)
        arrays = tuple(base_arrays) + (self._codes,)
        rec_fn = None
        if self.residual:
            rec_fn, rec_arrays = self.base._reconstruct_core()
            arrays = arrays + tuple(rec_arrays)
        fn = _build_refine_fn(
            base_fn, len(base_arrays), self._decode, rec_fn,
            self.metric, k,
        )
        return fn, arrays

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> str:
        if not path.endswith(".npz"):
            path = path + ".npz"
        base_path = self.base.save(path[: -len(".npz")] + ".base.npz")
        codes = np.asarray(
            self._codes if self._codes is not None
            else np.zeros((0, self.dim), np.float32)
        )
        if self.store_dtype == "bfloat16":
            codes = codes.view(np.uint16)  # npz has no bf16 dtype
        arrays = {"codes": codes}
        config = {
            "kind": self.kind,
            "metric": self.metric,
            "store_dtype": self.store_dtype,
            "base_file": os.path.basename(base_path),
        }
        if self.kind == "sq8":
            config["levels"] = self.levels
            config["sq_fitted"] = self.sq is not None
            if self.sq is not None:
                arrays["sq_mins"] = np.asarray(self.sq.mins)
                arrays["sq_maxs"] = np.asarray(self.sq.maxs)
        elif self.kind == "pq":
            arrays["refine_codebooks"] = np.asarray(
                self.refine_pq.codebooks
            )
        return _to_npz(path, "refine_index", config, arrays)

    @classmethod
    def load(cls, path: str) -> "RefineIndex":
        from vq_tpu.factory import load_index

        if not path.endswith(".npz"):
            path = path + ".npz"
        kind, config, arrays = _from_npz(path)
        if kind != "refine_index":
            raise InvalidData(
                f"expected a refine_index checkpoint, got {kind!r}"
            )
        base = load_index(
            os.path.join(os.path.dirname(path), config["base_file"])
        )
        codes = arrays["codes"]
        n = base.ntotal
        if config["kind"] == "pq":
            from vq_tpu.models.pq import ProductQuantizer

            refiner = ProductQuantizer(
                codebooks=arrays["refine_codebooks"],
                distance="squared_euclidean",
            )
        elif config["kind"] == "sq8":
            refiner = "sq8"
        else:
            refiner = "flat"
        self = cls.__new__(cls)
        self.base = base
        self.metric = config["metric"]
        self.kind = config["kind"]
        self.residual = self.kind == "pq"
        self.store_dtype = config.get("store_dtype")
        self.sq = None
        self.refine_pq = refiner if self.kind == "pq" else None
        if self.kind == "sq8":
            self.levels = int(config.get("levels", 256))
            if config.get("sq_fitted"):
                from vq_tpu.models.sq import PerDimScalarQuantizer

                self.sq = PerDimScalarQuantizer(
                    arrays["sq_mins"], arrays["sq_maxs"], self.levels
                )
        if codes.shape[0]:
            if self.store_dtype == "bfloat16":
                codes = codes.view(jnp.bfloat16.dtype)
            c = jnp.asarray(codes)
            if self.kind == "flat":
                c = c.astype(_STORE_DTYPES[self.store_dtype])
            self._codes = c
        else:
            self._codes = None
        if (0 if self._codes is None else self._codes.shape[0]) != n:
            raise InvalidData(
                "refine checkpoint out of sync with its base checkpoint"
            )
        return self

    def __repr__(self) -> str:
        return (
            f"RefineIndex(kind={self.kind!r}, base={self.base!r}, "
            f"ntotal={self.ntotal}, metric={self.metric!r})"
        )


def _build_refine_fn(base_fn, nb, decode, rec_fn, metric, k):
    """The traceable refine re-score: base fetch → code gather → decode
    (+ base reconstruction when ``rec_fn`` is given) → exact scores →
    top-k with the family's −1/inf padding contract. Shared by the
    single-device ``_search_core`` and the multi-chip core
    (:func:`vq_tpu.parallel.refine.sharded_refine_search_core`)."""

    def fn(q, *arrs):
        ids, _ = base_fn(q, *arrs[:nb])  # [Q, F] (-1 pads)
        safe = jnp.maximum(ids, 0)
        flat = safe.reshape(-1)
        rec = decode(jnp.take(arrs[nb], flat, axis=0))
        if rec_fn is not None:
            rec = rec + rec_fn(flat, *arrs[nb + 1:])
        rec = rec.reshape(ids.shape + (rec.shape[-1],))
        exact = _exact_scores(q, rec, metric)
        exact = jnp.where(ids >= 0, exact, jnp.inf)
        kk = min(k, exact.shape[1])
        neg, pos = jax.lax.top_k(-exact, kk)
        out_i = jnp.take_along_axis(ids, pos, axis=1)
        out_d = -neg
        out_i = jnp.where(jnp.isinf(out_d), -1, out_i)
        if kk < k:  # candidate pool smaller than k: pad the contract
            out_i = jnp.pad(
                out_i, ((0, 0), (0, k - kk)), constant_values=-1
            )
            out_d = jnp.pad(
                out_d, ((0, 0), (0, k - kk)), constant_values=jnp.inf
            )
        if metric == "dot":
            out_d = -out_d  # descending scores; pads become -inf
        return out_i, out_d

    return fn


def _codec_approx(base, x: jnp.ndarray) -> jnp.ndarray:
    """The base index's coding of ``x`` WITHOUT adding it — used to build
    residual training sets for :meth:`RefineIndex.train_pq`."""
    from vq_tpu.ivf import IVFPQIndex
    from vq_tpu.search import PQIndex, RQIndex, SQIndex

    if isinstance(base, IVFPQIndex):
        from vq_tpu.ops.kmeans import assign

        lists, _ = assign(x, base.coarse)
        c = jnp.take(base.coarse, lists, axis=0)
        enc = x - c if base.by_residual else x
        rec = base.pq.decode(base.pq.encode(enc))
        return rec + c if base.by_residual else rec
    if isinstance(base, PQIndex):
        return base.pq.decode(base.pq.encode(x))
    if isinstance(base, RQIndex):
        return base.rq.decode(base.rq.encode(x, beam=base.beam))
    if isinstance(base, SQIndex):
        return base.sq.dequantize(base.sq.quantize(x))
    raise InvalidParameter(
        "base",
        "residual refinement supports PQIndex / SQIndex / RQIndex / "
        f"IVFPQIndex bases, not {type(base).__name__}",
    )
