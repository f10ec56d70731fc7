"""Search indexes — the serving layer over the quantizers.

The reference is a quantization library only; a user deploying it for
vector search must hand-roll storage and scanning. vq_tpu ships the two
standard memory-resident index types its quantizers imply:

* :class:`PQIndex` — PQ codes + ADC scan (+ optional exact rerank when the
  raw corpus is kept). 16 bytes/vector at the 8x256 config.
* :class:`BinaryIndex` — packed sign bits + Hamming scan via popcount.
  4 bytes/vector at 128-d (+ optional exact rerank).

Both are append-only, batch-first, and jit-backed; ``save``/``load``
round-trip through the same single-file `.npz` scheme as the quantizers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.errors import DimensionMismatch, EmptyInput, InvalidData
from vq_tpu.models.bq import BinaryQuantizer, hamming_distance
from vq_tpu.models.pq import ProductQuantizer
from vq_tpu.utils.serialize import _from_npz, _to_npz

__all__ = ["PQIndex", "BinaryIndex"]


class PQIndex:
    """Flat ADC index over PQ codes.

    ``keep_corpus=True`` retains the raw vectors (on device) to enable
    exact reranking: ``search(..., rerank=R)`` re-scores a top-R ADC
    shortlist with exact distances under the quantizer's metric.
    """

    def __init__(self, quantizer: ProductQuantizer, *, keep_corpus: bool = False):
        self.pq = quantizer
        self.keep_corpus = keep_corpus
        self._codes: Optional[jnp.ndarray] = None  # [n, m]
        self._corpus: Optional[jnp.ndarray] = None  # [n, d] if kept

    @property
    def ntotal(self) -> int:
        return 0 if self._codes is None else int(self._codes.shape[0])

    @property
    def code_bytes_per_vector(self) -> int:
        itemsize = 1 if self.pq.num_centroids <= 256 else 4
        return self.pq.num_subspaces * itemsize

    def add(self, vectors) -> None:
        """Encode and append a batch of raw vectors.

        f16/bf16 batches stay half-width: encode upcasts per-tile and a
        kept corpus is stored half (rerank upcasts candidates only).
        """
        x = jnp.asarray(vectors)
        if x.dtype not in (jnp.float16, jnp.bfloat16):
            x = x.astype(jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.shape[1] != self.pq.dim:
            raise DimensionMismatch(expected=self.pq.dim, found=x.shape[1])
        codes = self.pq.encode(x)
        self._codes = (
            codes if self._codes is None
            else jnp.concatenate([self._codes, codes], axis=0)
        )
        if self.keep_corpus:
            self._corpus = (
                x if self._corpus is None
                else jnp.concatenate([self._corpus, x], axis=0)
            )

    def search(
        self, queries, k: int = 10, *, rerank: int = 0
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k ids + distances for each query row."""
        if self._codes is None:
            raise EmptyInput("index is empty — add() vectors first")
        if rerank and self._corpus is None:
            raise InvalidData(
                "rerank requires keep_corpus=True at index construction"
            )
        k = min(k, self.ntotal)
        return self.pq.adc_search(
            queries, self._codes, k=k, rerank=rerank, corpus=self._corpus
        )

    def reconstruct(self, ids) -> jnp.ndarray:
        """Approximate vectors for stored ids (decoded from codes)."""
        if self._codes is None:
            raise EmptyInput("index is empty")
        ids = jnp.asarray(ids, jnp.int32)
        return self.pq.decode(jnp.take(self._codes, ids, axis=0))

    def save(self, path: str) -> str:
        arrays = {
            "codebooks": np.asarray(self.pq.codebooks),
            "codes": np.asarray(
                self._codes if self._codes is not None
                else np.zeros((0, self.pq.num_subspaces), np.uint8)
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
        idx = cls(pq, keep_corpus=config["keep_corpus"])
        if arrays["codes"].shape[0]:
            idx._codes = jnp.asarray(arrays["codes"])
        if "corpus" in arrays:
            idx._corpus = jnp.asarray(arrays["corpus"])
        return idx

    def __repr__(self) -> str:
        return (
            f"PQIndex(ntotal={self.ntotal}, m={self.pq.num_subspaces}, "
            f"k={self.pq.num_centroids}, metric={self.pq.distance_metric!r})"
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

    def search(
        self, queries, k: int = 10, *, rerank: int = 0
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k ids + Hamming distances (or exact L2 when reranked)."""
        if self._packed is None:
            raise EmptyInput("index is empty — add() vectors first")
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if rerank and self._corpus is None:
            # Same contract as PQIndex.search — silently falling back to
            # unreranked Hamming results would hide the misuse.
            raise InvalidData(
                "rerank requires keep_corpus=True at index construction"
            )
        qp = self.bq.quantize_packed(q)
        ham = hamming_distance(qp, self._packed)  # [Q, n] int32
        k = min(k, self.ntotal)
        if rerank and self._corpus is not None:
            from vq_tpu.ops.distance import pairwise

            r = min(int(rerank), self.ntotal)
            _, short = jax.lax.top_k(-ham, r)
            cand = jnp.take(self._corpus, short, axis=0)  # [Q, R, d]
            exact = jax.vmap(
                lambda qv, cv: jnp.sum((cv - qv[None, :]) ** 2, axis=-1)
            )(q, cand)
            neg_top, pos = jax.lax.top_k(-exact, min(k, r))
            idx = jnp.take_along_axis(short, pos, axis=1)
            return idx, -neg_top
        neg_top, idx = jax.lax.top_k(-ham.astype(jnp.float32), k)
        return idx, -neg_top

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
