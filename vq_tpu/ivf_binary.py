"""IVF-Binary: inverted-file index over packed sign bits.

The faiss ``IndexBinaryIVF`` analog, completing the IVF coding ladder at
its smallest code size (d/8 bytes/vector, 32 bits per u32 lane). The
reference's BQ stores one byte per element (src/bq.rs:94-105 — only 4×
compression); this index pairs the framework's true bit-packing
(:mod:`vq_tpu.models.bq`) with the shared IVF probe structure:

* **Coarse partition** — float k-means over the input vectors, probed
  with one ``[Q, nlist]`` L2 MXU matmul (faiss clusters in Hamming
  space with a binary k-means; on TPU the float coarse scan is one
  matmul and avoids a majority-vote update with no MXU mapping, and
  queries arrive as floats in this framework anyway).
* **Buckets** — packed codes in ``ceil(d/32)``-u32 rows through the
  same chunk-pool storage as every other IVF variant
  (:mod:`vq_tpu.ivf_pool`: static shapes, −1 id pads, device-resident,
  in-place appends).
* **Probe scan** — per probe rank: gather ``[Q, cap, words]``, XOR with
  the packed query, ``lax.population_count`` + lane-sum on the VPU.
  Code bytes are d/8 so the gather traffic is 32× smaller than
  IVF-Flat's — no fused kernel needed at these sizes.
* **Rerank** — optional exact-L2 rerank against a kept float corpus,
  same contract as :class:`~vq_tpu.search.BinaryIndex`.

Returned values are Hamming distances as f32 (ascending, ``inf`` pads —
the IVF family contract), or exact squared-L2 after rerank.
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
)
from vq_tpu.ivf_flat import (
    _IVFScanBase,
    _coarse_probe,
    _merge_probe_topk,
    _range_merge,
)
from vq_tpu.ivf_pool import take_list_ids, take_list_payload
from vq_tpu.models.bq import BinaryQuantizer, packed_width
from vq_tpu.ops.kmeans import assign, lloyd
from vq_tpu.utils.serialize import _from_npz, _to_npz

__all__ = ["IVFBinaryIndex"]


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "cap"))
def _ivf_binary_search_jit(
    q: jnp.ndarray,  # [Q, d] f32 (for the coarse probe)
    qp: jnp.ndarray,  # [Q, words] u32 packed query bits
    coarse: jnp.ndarray,  # [nlist, d]
    pool_codes: jnp.ndarray,  # [n_chunks, CH, words] u32
    slot_ids: jnp.ndarray,  # [n_chunks, CH] int32, -1 empty
    chains_s: jnp.ndarray,  # [nlist, maxc_s] int32 chunk chains
    nprobe: int,
    k: int,
    cap: int,
):
    Q = q.shape[0]
    probe, _ = _coarse_probe(q, coarse, nprobe, "l2")

    body = _binary_scan_body(qp, pool_codes, slot_ids, chains_s, cap)
    return _merge_probe_topk(
        lambda p: body(p, p), Q, nprobe, k, probe.T
    )


def _binary_scan_body(qp, pool_codes, slot_ids, chains_s, cap):
    def body(pg, pl):  # [Q] list ids at one probe rank
        del pg
        codes = take_list_payload(pool_codes, chains_s, pl)  # [Q, ce, w]
        ids = take_list_ids(slot_ids, chains_s, pl, cap)  # [Q, ce]
        x = jnp.bitwise_xor(codes, qp[:, None, :])
        ham = jnp.sum(
            jax.lax.population_count(x).astype(jnp.int32), axis=-1
        )
        return jnp.where(ids >= 0, ham.astype(jnp.float32), jnp.inf), ids

    return body


@functools.partial(jax.jit, static_argnames=("nprobe", "fetch", "cap"))
def _ivf_binary_range_jit(
    q, qp, coarse, pool_codes, slot_ids, chains_s,
    nprobe: int, fetch: int, cap: int, radius,
):
    Q = q.shape[0]
    probe, _ = _coarse_probe(q, coarse, nprobe, "l2")
    body = _binary_scan_body(qp, pool_codes, slot_ids, chains_s, cap)
    return _range_merge(body, Q, nprobe, fetch, radius, probe.T)


class IVFBinaryIndex(_IVFScanBase):
    """Inverted-file Hamming index over packed sign bits (the faiss
    ``IndexBinaryIVF`` analog): d/8 bytes/vector, coarse-probed popcount
    scans, optional exact rerank from a kept float corpus."""

    def __init__(
        self,
        coarse_centroids,
        *,
        threshold: float = 0.0,
        max_list_size: Optional[int] = None,
        keep_corpus: bool = False,
    ):
        super().__init__(
            coarse_centroids, metric="l2", max_list_size=max_list_size
        )
        self.bq = BinaryQuantizer(threshold)
        self.keep_corpus = bool(keep_corpus)

    def _payload_specs(self) -> dict:
        specs = {"codes": ((self.code_words,), jnp.uint32)}
        if self.keep_corpus:
            specs["corpus"] = ((self.dim,), jnp.float32)
        return specs

    @classmethod
    def train(
        cls,
        training_data,
        nlist: int,
        *,
        threshold: float = 0.0,
        max_iters: int = 10,
        seed: int = 42,
        max_list_size: Optional[int] = None,
        keep_corpus: bool = False,
        spherical: bool = False,
    ) -> "IVFBinaryIndex":
        """Fit the coarse partition (k-means++-seeded Lloyd's on the raw
        float vectors)."""
        x = jnp.asarray(training_data, jnp.float32)
        res = lloyd(x, nlist, max_iters=max_iters, seed=seed,
                    init="kmeans++", spherical=spherical)
        return cls(
            res.centroids, threshold=threshold,
            max_list_size=max_list_size, keep_corpus=keep_corpus,
        )

    @property
    def code_words(self) -> int:
        return packed_width(self.dim)

    def add(self, vectors) -> None:
        """Coarse-assign, sign-pack, and append a batch of vectors."""
        x = jnp.asarray(vectors, jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[1] != self.dim:
            raise DimensionMismatch(expected=self.dim, found=x.shape[1])
        lists, _ = assign(x, self.coarse)
        payloads = {"codes": self.bq.quantize_packed(x)}
        if self.keep_corpus:
            payloads["corpus"] = x
        self._pool_append(lists, payloads)
        self._append_lists(lists)

    def merge_from(self, other) -> int:
        if isinstance(other, IVFBinaryIndex) and (
            self.bq._threshold != other.bq._threshold
        ):
            raise InvalidData("cannot merge: thresholds differ")
        if isinstance(other, IVFBinaryIndex) and (
            self.keep_corpus != other.keep_corpus
        ):
            raise InvalidData("cannot merge: keep_corpus differs")
        return super().merge_from(other)

    def rebalance(self, **kwargs) -> dict:
        # Splitting needs the members in the same space as the coarse
        # centroids; decoded low/high bits are not that space, so a kept
        # float corpus is required (re-encoding itself would be a no-op —
        # binary coding is non-residual).
        if not self.keep_corpus:
            raise InvalidData(
                "rebalance requires keep_corpus=True for binary codes"
            )
        return super().rebalance(**kwargs)

    def _member_vectors(self, rows_idx: np.ndarray) -> jnp.ndarray:
        return self._pool.gather_rows(
            "corpus", jnp.asarray(rows_idx, jnp.int32)
        )

    _reencode_needs_x = False

    def _reencode_rows(self, rows_idx, x, new_lists, coarse_new):
        return None  # packed bits don't depend on their list assignment

    def _build_buckets(self) -> dict:
        if self._buckets is None:
            self._buckets = {
                "codes": self._pool.data["codes"],
                "ids": self._pool.slot_ids,
                "chains": self._pool.chains_search(),
            }
        return self._buckets

    def _scan(self, q, buckets, nprobe, k, use_pallas=False, interpret=False):
        # Popcount scans are VPU work over d/8-byte codes — the XLA gather
        # path is already tiny next to the float variants, so use_pallas
        # is accepted for interface parity and ignored.
        del use_pallas, interpret
        qp = self.bq.quantize_packed(q)
        return _ivf_binary_search_jit(
            q, qp, self.coarse, buckets["codes"], buckets["ids"],
            buckets["chains"], nprobe, k, self._pool.cap,
        )

    def search(
        self,
        queries,
        k: int = 10,
        *,
        nprobe: int = 8,
        rerank: int = 0,
        use_pallas: Optional[bool] = None,
        interpret: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k ``(ids, hamming)`` over the probed lists (f32 ascending,
        ``inf`` pad, −1 ids when fewer than k candidates). With
        ``rerank=R``: fetch R Hamming candidates, rerank by exact
        squared-L2 against the kept corpus, return the top-k of those
        (requires ``keep_corpus=True``)."""
        q = self._check_query(queries)
        fn, arrays = self._search_core(
            int(k), nprobe=nprobe, rerank=rerank,
            use_pallas=use_pallas, interpret=interpret,
        )
        return fn(q, *arrays)

    def _search_core(
        self,
        k: int,
        *,
        nprobe: int = 8,
        rerank: int = 0,
        use_pallas: Optional[bool] = None,
        interpret: bool = False,
    ):
        if not rerank:
            return super()._search_core(
                k, nprobe=nprobe, use_pallas=use_pallas, interpret=interpret
            )
        if not self.keep_corpus:
            raise InvalidData(
                "rerank requires keep_corpus=True at index construction"
            )
        k = int(k)
        fetch = max(k, int(rerank))
        base_fn, base_arrays = super()._search_core(
            fetch, nprobe=nprobe, use_pallas=use_pallas, interpret=interpret
        )
        nb = len(base_arrays)

        def fn(q, *arrs):
            ids, _ = base_fn(q, *arrs[:nb])
            corpus_pool, pos = arrs[nb], arrs[nb + 1]
            corpus = corpus_pool.reshape(-1, corpus_pool.shape[-1])
            slot = jnp.take(pos, jnp.maximum(ids, 0))
            cand = jnp.take(corpus, slot, axis=0)  # [Q, R, d]
            exact = jnp.sum((cand - q[:, None, :]) ** 2, axis=-1)  # [Q, R]
            exact = jnp.where(ids >= 0, exact, jnp.inf)
            neg, pos = jax.lax.top_k(-exact, min(k, fetch))
            out_i = jnp.take_along_axis(ids, pos, axis=1)
            out_d = -neg
            out_i = jnp.where(jnp.isinf(out_d), -1, out_i)
            if out_i.shape[1] < k:
                pad = k - out_i.shape[1]
                out_i = jnp.pad(
                    out_i, ((0, 0), (0, pad)), constant_values=-1
                )
                out_d = jnp.pad(
                    out_d, ((0, 0), (0, pad)), constant_values=jnp.inf
                )
            return out_i, out_d

        return fn, (
            *base_arrays, self._pool.data["corpus"], self._pool.pos
        )

    def _range(self, q, buckets, nprobe, fetch, radius):
        # Hamming radius: hits are popcount <= radius among probed lists.
        qp = self.bq.quantize_packed(q)
        return _ivf_binary_range_jit(
            q, qp, self.coarse, buckets["codes"], buckets["ids"],
            buckets["chains"], nprobe, fetch, self._pool.cap, radius,
        )

    def reconstruct(self, ids) -> jnp.ndarray:
        """Decoded low/high vectors (or exact rows when the corpus is
        kept)."""
        if self._pool is None or self._pool.n_rows == 0:
            raise EmptyInput("index is empty")
        idx = jnp.asarray(ids, jnp.int32)
        if self.keep_corpus:
            return self._pool.gather_rows("corpus", idx)
        return self.bq.dequantize_packed(
            self._pool.gather_rows("codes", idx), self.dim
        )

    def save(self, path: str) -> str:
        empty = self._pool is None or self._pool.n_rows == 0
        flats = {} if empty else self._pool.to_flat()
        return _to_npz(
            path,
            "ivfbinary_index",
            {
                "threshold": self.bq.threshold,
                "max_list_size": self.max_list_size,
                "keep_corpus": self.keep_corpus,
                "dim": self.dim,
            },
            {
                "coarse": np.asarray(self.coarse),
                "packed": (
                    np.zeros((0, self.code_words), np.uint32) if empty
                    else np.asarray(flats["codes"])
                ),
                "lists": (
                    np.zeros((0,), np.int32) if empty
                    else np.asarray(self._flat_lists)
                ),
                "corpus": (
                    np.asarray(flats["corpus"])
                    if not empty and self.keep_corpus
                    else np.zeros((0, self.dim), np.float32)
                ),
            },
        )

    @classmethod
    def load(cls, path: str) -> "IVFBinaryIndex":
        kind, config, arrays = _from_npz(path)
        if kind != "ivfbinary_index":
            raise InvalidData(
                f"expected an ivfbinary_index checkpoint, got {kind!r}"
            )
        idx = cls(
            arrays["coarse"],
            threshold=config["threshold"],
            max_list_size=config.get("max_list_size"),
            keep_corpus=config.get("keep_corpus", False),
        )
        if arrays["packed"].shape[0]:
            lists = jnp.asarray(arrays["lists"])
            payloads = {"codes": jnp.asarray(arrays["packed"])}
            if idx.keep_corpus and arrays["corpus"].shape[0]:
                payloads["corpus"] = jnp.asarray(arrays["corpus"])
            idx._pool_append(lists, payloads)
            idx._flat_lists = lists
        return idx

    def __repr__(self) -> str:
        return (
            f"IVFBinaryIndex(nlist={self.nlist}, ntotal={self.ntotal}, "
            f"dim={self.dim}, words={self.code_words}, "
            f"keep_corpus={self.keep_corpus})"
        )
