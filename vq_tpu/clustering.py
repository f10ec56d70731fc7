"""High-level k-means trainer — the faiss ``Kmeans``/``Clustering`` analog.

The reference exposes only the raw trainer (``lbg_quantize``,
/root/reference/src/core/vector.rs:390-461); production clustering needs the
harness around it: multiple seeded restarts keeping the best objective
(``nredo``), training-set subsampling so huge corpora don't pay full-corpus
Lloyd cost (``max_points_per_centroid``), spherical projection for
cosine/MIPS coarse quantizers, and an assignment surface for downstream use.
This module wraps :func:`vq_tpu.ops.kmeans.lloyd` with exactly that harness,
keeping every step on device (the subsample is drawn with ``jax.random`` so
the corpus never crosses the host boundary — mandatory through a ~MB/s
tunnel).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from vq_tpu.errors import EmptyInput, InvalidParameter
from vq_tpu.models.base import check_training_matrix
from vq_tpu.ops.kmeans import KMeansResult, assign, lloyd

__all__ = ["Kmeans"]


class Kmeans:
    """Seeded multi-restart k-means with on-device subsampling.

    Mirrors the ``faiss.Kmeans`` surface (``d``, ``k``, ``niter``,
    ``nredo``, ``spherical``, ``seed``, ``max_points_per_centroid``;
    ``train`` / ``assign`` / ``centroids`` / ``obj``) on top of the
    reference-semantics Lloyd trainer (empty-cluster reseeding, epsilon
    convergence, lowest-index ties — src/core/vector.rs:390-461).

    ``nredo`` runs independent seeded restarts (PRNG ``fold_in(seed, r)``)
    and keeps the centroids with the lowest inertia **measured on the same
    training set**, so the choice is deterministic for a fixed seed.

    >>> import numpy as np
    >>> pts = np.array([[0.], [0.1], [10.], [10.1]], np.float32)
    >>> km = Kmeans(d=1, k=2, seed=3)
    >>> _ = km.train(pts)
    >>> sorted(round(float(c), 2) for c in np.asarray(km.centroids).ravel())
    [0.05, 10.05]

    ``max_points_per_centroid`` bounds the training set at
    ``k * max_points_per_centroid`` rows (the faiss default is 256); when
    the input is larger, a seeded uniform sample without replacement is
    drawn on device. ``0`` disables subsampling.
    """

    def __init__(
        self,
        d: int,
        k: int,
        *,
        niter: int = 25,
        nredo: int = 1,
        seed: int = 0,
        spherical: bool = False,
        init: str = "sample",
        max_points_per_centroid: int = 256,
    ):
        self.d = int(d)
        self.k = int(k)
        if self.d <= 0:
            raise InvalidParameter("d", "dimension must be positive")
        if self.k <= 0:
            raise InvalidParameter("k", "k must be positive")
        if int(niter) < 0:
            raise InvalidParameter("niter", "niter must be >= 0")
        if int(nredo) < 1:
            raise InvalidParameter("nredo", "nredo must be >= 1")
        if int(max_points_per_centroid) < 0:
            raise InvalidParameter(
                "max_points_per_centroid", "must be >= 0 (0 disables)"
            )
        self.niter = int(niter)
        self.nredo = int(nredo)
        self.seed = int(seed)
        self.spherical = bool(spherical)
        self.init = str(init)
        self.max_points_per_centroid = int(max_points_per_centroid)
        self.centroids: Optional[jnp.ndarray] = None  # [k, d] f32
        self.obj: Optional[float] = None  # best final inertia
        self.all_objs: List[float] = []  # per-redo final inertias
        self.result: Optional[KMeansResult] = None  # best redo's full result

    # -- training ------------------------------------------------------------

    def _subsample(self, data: jnp.ndarray, weights=None):
        cap = self.k * self.max_points_per_centroid
        n = data.shape[0]
        if self.max_points_per_centroid == 0 or n <= cap:
            return data, weights
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), 0x5AB5)
        idx = jax.random.choice(key, n, shape=(cap,), replace=False)
        return jnp.take(data, idx, axis=0), (
            None if weights is None else jnp.take(weights, idx)
        )

    def train(self, data, *, init_centroids=None, weights=None) -> float:
        """Run ``nredo`` seeded restarts; keep the lowest-inertia centroids.

        Returns the best objective (sum of squared distances on the
        training sample). The trained centroids are in ``self.centroids``.

        ``init_centroids`` (``[k, d]``) warm-starts the refinement from
        explicit centroids (incremental re-training); the start is then
        deterministic, so a single run replaces the ``nredo`` restarts.

        ``weights`` ([n], non-negative) are per-sample importances (the
        faiss ``Clustering`` weight semantics; see
        :func:`vq_tpu.ops.kmeans.lloyd`); the training subsample carries
        its points' weights.
        """
        data = check_training_matrix(data)
        if data.shape[1] != self.d:
            raise InvalidParameter(
                "data", f"expected dim {self.d}, got {data.shape[1]}"
            )
        if data.shape[0] < self.k:
            raise InvalidParameter(
                "data", f"need at least k={self.k} rows, got {data.shape[0]}"
            )
        if weights is not None:
            weights = jnp.asarray(weights, jnp.float32).reshape(-1)
            if weights.shape[0] != data.shape[0]:
                raise InvalidParameter(
                    "weights",
                    f"expected [{data.shape[0]}], got [{weights.shape[0]}]",
                )
        sample, weights = self._subsample(data, weights)
        base = jax.random.PRNGKey(self.seed)
        best: Optional[KMeansResult] = None
        self.all_objs = []
        redos = 1 if init_centroids is not None else self.nredo
        for r in range(redos):
            res = lloyd(
                sample,
                self.k,
                max_iters=self.niter,
                key=jax.random.fold_in(base, r),
                init=self.init,
                spherical=self.spherical,
                init_centroids=init_centroids,
                weights=weights,
            )
            obj = float(res.inertia)
            self.all_objs.append(obj)
            if best is None or obj < float(best.inertia):
                best = res
        assert best is not None
        self.result = best
        self.centroids = best.centroids
        self.obj = float(best.inertia)
        return self.obj

    # -- inference -----------------------------------------------------------

    def _require_trained(self) -> jnp.ndarray:
        if self.centroids is None:
            raise InvalidParameter(
                "centroids", "Kmeans is untrained — call train(data) first"
            )
        return self.centroids

    def assign(self, data) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Nearest-centroid assignment: ``(sq_distances [n], labels [n])``.

        The faiss idiom ``kmeans.index.search(x, 1)`` collapsed to one call;
        squared-L2 with lowest-index tie-breaking, like training.
        """
        centroids = self._require_trained()
        data = jnp.asarray(data, jnp.float32)
        if data.ndim != 2 or data.shape[1] != self.d:
            raise InvalidParameter(
                "data", f"expected [n, {self.d}] queries, got {data.shape}"
            )
        if data.shape[0] == 0:
            raise EmptyInput()
        labels, dists = assign(data, centroids)
        return dists, labels

    @property
    def index(self):
        """A :class:`vq_tpu.FlatIndex` over the trained centroids
        (the faiss ``kmeans.index`` surface) — ``search(x, k)`` returns
        ``(ids, sq_distances)`` for k-nearest-centroid queries."""
        from vq_tpu.search import FlatIndex

        centroids = self._require_trained()
        idx = FlatIndex(self.d, metric="squared_euclidean")
        idx.add(centroids)
        return idx

    # -- persistence ----------------------------------------------------------

    def save(self, path: str) -> str:
        """Single-file `.npz` checkpoint (config + trained centroids)."""
        import numpy as np

        from vq_tpu.utils.serialize import _to_npz

        arrays = {}
        if self.centroids is not None:
            arrays["centroids"] = np.asarray(self.centroids)
        return _to_npz(
            path,
            "kmeans_harness",
            {
                "d": self.d,
                "k": self.k,
                "niter": self.niter,
                "nredo": self.nredo,
                "seed": self.seed,
                "spherical": self.spherical,
                "init": self.init,
                "max_points_per_centroid": self.max_points_per_centroid,
                "obj": self.obj,
                "all_objs": self.all_objs,
            },
            arrays,
        )

    @classmethod
    def load(cls, path: str) -> "Kmeans":
        from vq_tpu.errors import InvalidData
        from vq_tpu.utils.serialize import _from_npz

        kind, config, arrays = _from_npz(path)
        if kind != "kmeans_harness":
            raise InvalidData(
                f"expected a kmeans_harness checkpoint, got {kind!r}"
            )
        km = cls(
            config["d"], config["k"], niter=config["niter"],
            nredo=config["nredo"], seed=config["seed"],
            spherical=config["spherical"], init=config["init"],
            max_points_per_centroid=config["max_points_per_centroid"],
        )
        if "centroids" in arrays:
            km.centroids = jnp.asarray(arrays["centroids"], jnp.float32)
            km.obj = config.get("obj")
            km.all_objs = list(config.get("all_objs") or [])
        return km

    def __repr__(self) -> str:
        state = "trained" if self.centroids is not None else "untrained"
        return (
            f"Kmeans(d={self.d}, k={self.k}, niter={self.niter}, "
            f"nredo={self.nredo}, spherical={self.spherical}, {state})"
        )
