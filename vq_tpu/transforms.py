"""Vector transforms + pre-transformed indexes (faiss ``VectorTransform``
/ ``IndexPreTransform`` analogs).

The reference has no transform layer; these are the standard preprocessing
stages every production retrieval stack puts in front of a quantizer:

* :class:`PCATransform` — device-side PCA (mean + covariance eigh on the
  MXU), optional whitening and output-dimension reduction.
* :class:`RotationTransform` — fixed orthonormal rotation (seeded random,
  or a learned OPQ rotation via :func:`vq_tpu.models.opq.opq_train`).
* :class:`NormalizeTransform` — row L2 normalization (turns cosine
  retrieval into dot/L2 retrieval).
* :class:`CenteringTransform` — mean subtraction.
* :class:`TransformedIndex` — chains transforms in front of any index:
  ``add``/``search`` map through the chain; ``reconstruct`` maps back
  through each transform's inverse where defined.

All transforms are jitted batch maps; ``fit`` runs entirely on device.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.errors import (
    DimensionMismatch,
    EmptyInput,
    InvalidData,
    InvalidParameter,
)
from vq_tpu.ops.distance import COSINE_NORM_EPS
from vq_tpu.utils.serialize import _from_npz, _to_npz

__all__ = [
    "VectorTransform",
    "PCATransform",
    "RotationTransform",
    "NormalizeTransform",
    "CenteringTransform",
    "TransformedIndex",
    "itq_train",
]


def _check_2d(x, d_in: int, name: str = "x") -> jnp.ndarray:
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
    if x.ndim != 2:
        raise InvalidParameter(name, f"must be 1-D or 2-D, got {x.ndim}-D")
    if x.shape[1] != d_in:
        raise DimensionMismatch(expected=d_in, found=x.shape[1])
    return x


class VectorTransform:
    """Base class: a (possibly fitted) map from ``d_in`` to ``d_out``."""

    d_in: int
    d_out: int

    @property
    def is_fitted(self) -> bool:
        return True

    def fit(self, data) -> "VectorTransform":
        """Fit from data (no-op for parameter-free transforms)."""
        return self

    def apply(self, x) -> jnp.ndarray:
        raise NotImplementedError

    def reverse(self, y) -> jnp.ndarray:
        """Inverse map (exact or pseudo-inverse); raises
        :class:`InvalidData` for non-invertible transforms."""
        raise InvalidData(
            f"{type(self).__name__} has no inverse"
        )

    # -- serialization hooks (used by TransformedIndex.save/load) ---------
    def _state(self) -> Tuple[str, Dict[str, Any], Dict[str, np.ndarray]]:
        raise NotImplementedError

    @staticmethod
    def _from_state(
        kind: str, config: Dict[str, Any], arrays: Dict[str, np.ndarray]
    ) -> "VectorTransform":
        cls = _TRANSFORM_KINDS.get(kind)
        if cls is None:
            raise InvalidData(f"unknown transform kind {kind!r}")
        return cls._restore(config, arrays)


class CenteringTransform(VectorTransform):
    """Subtract the (fitted) mean; exactly invertible."""

    def __init__(self, dim: int, mean=None):
        self.d_in = self.d_out = int(dim)
        self._mean: Optional[jnp.ndarray] = (
            None if mean is None else jnp.asarray(mean, jnp.float32)
        )
        if self._mean is not None and self._mean.shape != (self.d_in,):
            raise DimensionMismatch(
                expected=self.d_in, found=self._mean.shape[-1]
            )

    @property
    def is_fitted(self) -> bool:
        return self._mean is not None

    def fit(self, data) -> "CenteringTransform":
        x = _check_2d(data, self.d_in, "data")
        if x.shape[0] == 0:
            raise EmptyInput("cannot fit on an empty batch")
        self._mean = jnp.mean(x, axis=0)
        return self

    def apply(self, x) -> jnp.ndarray:
        if self._mean is None:
            raise InvalidData("CenteringTransform is not fitted")
        return _check_2d(x, self.d_in) - self._mean[None, :]

    def reverse(self, y) -> jnp.ndarray:
        if self._mean is None:
            raise InvalidData("CenteringTransform is not fitted")
        return _check_2d(y, self.d_out) + self._mean[None, :]

    def _state(self):
        return (
            "center",
            {"dim": self.d_in},
            {"mean": np.asarray(self._mean)},
        )

    @classmethod
    def _restore(cls, config, arrays):
        return cls(config["dim"], mean=arrays["mean"])

    def __repr__(self) -> str:
        return f"CenteringTransform(dim={self.d_in}, fitted={self.is_fitted})"


class NormalizeTransform(VectorTransform):
    """Row L2 normalization (zero rows pass through unchanged, mirroring
    the cosine-metric zero-norm guard). Not invertible."""

    def __init__(self, dim: int):
        self.d_in = self.d_out = int(dim)

    def apply(self, x) -> jnp.ndarray:
        x = _check_2d(x, self.d_in)
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return jnp.where(n < COSINE_NORM_EPS, x, x / n)

    def _state(self):
        return ("l2norm", {"dim": self.d_in}, {})

    @classmethod
    def _restore(cls, config, arrays):
        return cls(config["dim"])

    def __repr__(self) -> str:
        return f"NormalizeTransform(dim={self.d_in})"


class RotationTransform(VectorTransform):
    """Fixed orthonormal map ``x @ R`` (``R: [d_in, d_out]``, orthonormal
    columns). Exactly invertible when square (``y @ R.T``); a column-
    orthonormal reduction reverses by projection (pseudo-inverse)."""

    def __init__(self, matrix):
        r = jnp.asarray(matrix, jnp.float32)
        if r.ndim != 2:
            raise InvalidParameter("matrix", "must be a 2-D array")
        self._r = r
        self.d_in, self.d_out = int(r.shape[0]), int(r.shape[1])

    @classmethod
    def random(
        cls, dim: int, seed: int = 42, d_out: Optional[int] = None
    ) -> "RotationTransform":
        """Seeded random orthonormal rotation (QR of a Gaussian);
        ``d_out < dim`` keeps the first columns — a random orthonormal
        projection (the faiss ``RandomRotationMatrix`` used by LSH)."""
        dim = int(dim)
        d_out = dim if d_out is None else int(d_out)
        if not 1 <= d_out <= dim:
            raise InvalidParameter("d_out", "must be in [1, dim]")
        g = jax.random.normal(
            jax.random.PRNGKey(seed), (dim, dim), jnp.float32
        )
        q, r = jnp.linalg.qr(g)
        # sign-fix so the rotation is a deterministic function of the seed
        q = q * jnp.sign(jnp.diagonal(r))[None, :]
        return cls(q[:, :d_out])

    @property
    def matrix(self) -> jnp.ndarray:
        return self._r

    def apply(self, x) -> jnp.ndarray:
        return _check_2d(x, self.d_in) @ self._r

    def reverse(self, y) -> jnp.ndarray:
        return _check_2d(y, self.d_out) @ self._r.T

    def _state(self):
        return ("rotation", {}, {"matrix": np.asarray(self._r)})

    @classmethod
    def _restore(cls, config, arrays):
        return cls(arrays["matrix"])

    def __repr__(self) -> str:
        return f"RotationTransform({self.d_in} -> {self.d_out})"


@functools.partial(jax.jit, static_argnames=("iters",))
def _itq_rotation_jit(v: jnp.ndarray, r0: jnp.ndarray, iters: int = 50):
    """ITQ alternation on PCA-projected data ``v [n, b]``: fix the sign
    codes, solve the orthogonal Procrustes for the rotation (SVD of
    ``v.T @ sign(v r)``), repeat. One jit — the per-iteration ``[b, b]``
    SVD is tiny next to the ``[n, b]`` matmuls."""

    def step(_, r):
        # HIGHEST precision: a bf16 default-precision projection can flip
        # signs near zero, changing the learned rotation across backends.
        z = jax.lax.dot_general(
            v, r, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        b = jnp.where(z >= 0, 1.0, -1.0)  # [n, b] sign codes
        m = jax.lax.dot_general(
            v, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [b, b] = v.T @ b
        u, _, wt = jnp.linalg.svd(m, full_matrices=False)
        return u @ wt

    return jax.lax.fori_loop(0, iters, step, r0)


def itq_train(
    data,
    d_out: Optional[int] = None,
    *,
    iters: int = 50,
    seed: int = 42,
) -> List[VectorTransform]:
    """Iterative Quantization (ITQ): the faiss ``ITQMatrix`` analog.

    Fits ``[PCATransform(d -> d_out), RotationTransform]`` where the
    rotation minimizes the binarization error ``||sign(VR) − VR||²`` by
    alternating sign-code assignment with an orthogonal-Procrustes solve
    (Gong & Lazebnik). Put the returned chain in front of a
    :class:`~vq_tpu.search.BinaryIndex` (or use the factory spec
    ``"ITQ64,BFlat"``) for markedly better Hamming recall than a random
    rotation on correlated data.
    """
    chain, _ = _itq_fit(data, d_out, iters=iters, seed=seed)
    return chain


def _itq_fit(data, d_out, *, iters, seed):
    """ITQ fit returning ``(chain, projected_data)`` — the factory uses
    the projection it already paid for instead of re-applying the PCA."""
    x = jnp.asarray(data, jnp.float32)
    if x.ndim != 2 or x.shape[0] == 0:
        raise InvalidParameter("data", "expected a non-empty [n, d] matrix")
    d = int(x.shape[1])
    d_out = d if d_out is None else int(d_out)
    if not 1 <= d_out <= d:
        raise InvalidParameter("d_out", "must be in [1, dim]")
    if int(iters) < 1:
        raise InvalidParameter("iters", "must be >= 1")
    pca = PCATransform(d, d_out).fit(x)
    v = pca.apply(x)
    r0 = RotationTransform.random(d_out, seed=seed).matrix
    r = _itq_rotation_jit(v, r0, int(iters))
    return [pca, RotationTransform(r)], v


class PCATransform(VectorTransform):
    """PCA projection fitted on device: mean, covariance (one
    ``[d, n] x [n, d]`` MXU matmul), and ``jnp.linalg.eigh``.

    ``d_out < d_in`` keeps the top-variance components;
    ``whiten=True`` rescales each component to unit variance (the faiss
    ``PCAW`` behavior). ``reverse`` maps back through the component basis
    (exact for full-rank unwhitened PCA; the least-squares reconstruction
    otherwise).
    """

    def __init__(
        self,
        d_in: int,
        d_out: Optional[int] = None,
        *,
        whiten: bool = False,
        eps: float = 1e-8,
    ):
        self.d_in = int(d_in)
        self.d_out = int(d_out) if d_out is not None else self.d_in
        if not 1 <= self.d_out <= self.d_in:
            raise InvalidParameter(
                "d_out", f"must be in [1, {self.d_in}]"
            )
        self.whiten = bool(whiten)
        self.eps = float(eps)
        self._mean: Optional[jnp.ndarray] = None  # [d_in]
        self._components: Optional[jnp.ndarray] = None  # [d_in, d_out]
        self._eigvals: Optional[jnp.ndarray] = None  # [d_out] descending

    @property
    def is_fitted(self) -> bool:
        return self._components is not None

    def fit(self, data) -> "PCATransform":
        x = _check_2d(data, self.d_in, "data")
        n = x.shape[0]
        if n < 2:
            raise InvalidData("PCA needs at least 2 rows")
        self._mean = jnp.mean(x, axis=0)
        xc = x - self._mean[None, :]
        cov = jax.lax.dot_general(
            xc, xc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / (n - 1)
        w, v = jnp.linalg.eigh(cov)  # ascending
        order = jnp.argsort(-w)[: self.d_out]
        self._eigvals = jnp.maximum(jnp.take(w, order), 0.0)
        self._components = jnp.take(v, order, axis=1)  # [d_in, d_out]
        return self

    def _require_fit(self):
        if self._components is None:
            raise InvalidData("PCATransform is not fitted — call fit(data)")

    @property
    def explained_variance(self) -> jnp.ndarray:
        self._require_fit()
        return self._eigvals

    def apply(self, x) -> jnp.ndarray:
        self._require_fit()
        y = (_check_2d(x, self.d_in) - self._mean[None, :]) @ self._components
        if self.whiten:
            y = y / jnp.sqrt(self._eigvals + self.eps)[None, :]
        return y

    def reverse(self, y) -> jnp.ndarray:
        self._require_fit()
        y = _check_2d(y, self.d_out)
        if self.whiten:
            y = y * jnp.sqrt(self._eigvals + self.eps)[None, :]
        return y @ self._components.T + self._mean[None, :]

    def _state(self):
        self._require_fit()
        return (
            "pca",
            {
                "d_in": self.d_in,
                "d_out": self.d_out,
                "whiten": self.whiten,
                "eps": self.eps,
            },
            {
                "mean": np.asarray(self._mean),
                "components": np.asarray(self._components),
                "eigvals": np.asarray(self._eigvals),
            },
        )

    @classmethod
    def _restore(cls, config, arrays):
        t = cls(
            config["d_in"], config["d_out"],
            whiten=config["whiten"], eps=config["eps"],
        )
        t._mean = jnp.asarray(arrays["mean"])
        t._components = jnp.asarray(arrays["components"])
        t._eigvals = jnp.asarray(arrays["eigvals"])
        return t

    def __repr__(self) -> str:
        return (
            f"PCATransform({self.d_in} -> {self.d_out}, "
            f"whiten={self.whiten}, fitted={self.is_fitted})"
        )


_TRANSFORM_KINDS = {
    "center": CenteringTransform,
    "l2norm": NormalizeTransform,
    "rotation": RotationTransform,
    "pca": PCATransform,
}


class TransformedIndex:
    """An index behind a chain of vector transforms (faiss
    ``IndexPreTransform`` analog).

    ``add``/``search``/``range_search`` map inputs through the chain in
    order before hitting the base index; ``reconstruct`` maps the base
    reconstruction back through each transform's ``reverse`` in reverse
    order (raises :class:`InvalidData` if any stage is non-invertible).

    ``save``/``load`` write the chain into the main checkpoint and the
    base index into a sibling ``<path>.base.npz`` (loaded back through
    :func:`vq_tpu.factory.load_index`).
    """

    def __init__(self, transforms: Sequence[VectorTransform], base):
        ts = list(transforms)
        if not ts:
            raise InvalidParameter("transforms", "need at least one")
        for a, b in zip(ts, ts[1:]):
            if a.d_out != b.d_in:
                raise DimensionMismatch(expected=a.d_out, found=b.d_in)
        base_dim = getattr(base, "dim", None)
        if base_dim is not None and ts[-1].d_out != base_dim:
            raise DimensionMismatch(expected=ts[-1].d_out, found=base_dim)
        self.transforms: List[VectorTransform] = ts
        self.base = base

    @property
    def dim(self) -> int:
        return self.transforms[0].d_in

    @property
    def ntotal(self) -> int:
        return self.base.ntotal

    def _chain(self, x) -> jnp.ndarray:
        y = x
        for t in self.transforms:
            y = t.apply(y)
        return y

    def fit_transforms(self, data) -> "TransformedIndex":
        """Fit every transform in order, each on the previous stage's
        output."""
        y = jnp.asarray(data, jnp.float32)
        for t in self.transforms:
            t.fit(y)
            y = t.apply(y)
        return self

    def add(self, vectors) -> None:
        self.base.add(self._chain(vectors))

    def search(self, queries, k: int = 10, **kw):
        return self.base.search(self._chain(queries), k, **kw)

    def _search_core(self, k: int, **kw):
        """Pipelined-serving hook: the base's core with the (jittable)
        transform chain applied to each query batch inside the program."""
        base_fn, arrays = self.base._search_core(int(k), **kw)
        chain = self._chain

        def fn(q, *arrs):
            return base_fn(chain(q), *arrs)

        return fn, arrays

    def range_search(self, queries, radius: float, **kw):
        if not hasattr(self.base, "range_search"):
            raise InvalidData(
                f"{type(self.base).__name__} does not support range_search"
            )
        return self.base.range_search(self._chain(queries), radius, **kw)

    def remove_ids(self, ids) -> int:
        return self.base.remove_ids(ids)

    def reconstruct(self, ids) -> jnp.ndarray:
        y = self.base.reconstruct(ids)
        for t in reversed(self.transforms):
            y = t.reverse(y)
        return y

    def search_and_reconstruct(self, queries, k: int = 10, **kw):
        """Search in the transformed space, reconstruct hits back in the
        INPUT space (transforms reversed) — ``(ids, values,
        vectors [Q, k, d_in])``."""
        if not hasattr(self.base, "search_and_reconstruct"):
            raise InvalidData(
                f"{type(self.base).__name__} does not support "
                "search_and_reconstruct"
            )
        ids, vals, rec = self.base.search_and_reconstruct(
            self._chain(queries), k, **kw
        )
        y = rec.reshape(-1, rec.shape[-1])
        for t in reversed(self.transforms):
            y = t.reverse(y)
        return ids, vals, y.reshape(*rec.shape[:-1], y.shape[-1])

    def merge_from(self, other: "TransformedIndex") -> int:
        """Move every vector of ``other.base`` into this pipeline's base.
        Requires identical fitted transforms (same kinds, configs, and
        fitted arrays) — otherwise the two bases hold vectors from
        different spaces."""
        if type(other) is not TransformedIndex or len(self.transforms) != (
            len(other.transforms)
        ):
            raise InvalidParameter(
                "other", "can only merge an identical TransformedIndex chain"
            )
        for a, b in zip(self.transforms, other.transforms):
            ka, ca, aa = a._state()
            kb, cb, ab = b._state()
            if ka != kb or ca != cb or set(aa) != set(ab) or any(
                not np.array_equal(np.asarray(aa[k]), np.asarray(ab[k]))
                for k in aa
            ):
                raise InvalidData("cannot merge: fitted transforms differ")
        return self.base.merge_from(other.base)

    def save(self, path: str) -> str:
        if not path.endswith(".npz"):
            path = path + ".npz"
        base_path = self.base.save(path[: -len(".npz")] + ".base.npz")
        specs, arrays = [], {}
        for i, t in enumerate(self.transforms):
            kind, config, arrs = t._state()
            specs.append({"kind": kind, "config": config})
            for k, v in arrs.items():
                arrays[f"t{i}_{k}"] = v
        import os

        return _to_npz(
            path,
            "transformed_index",
            {"transforms": specs, "base_file": os.path.basename(base_path)},
            arrays,
        )

    @classmethod
    def load(cls, path: str) -> "TransformedIndex":
        import os

        from vq_tpu.factory import load_index

        if not path.endswith(".npz"):
            path = path + ".npz"
        kind, config, arrays = _from_npz(path)
        if kind != "transformed_index":
            raise InvalidData(
                f"expected a transformed_index checkpoint, got {kind!r}"
            )
        ts = []
        for i, spec in enumerate(config["transforms"]):
            prefix = f"t{i}_"
            arrs = {
                k[len(prefix):]: v
                for k, v in arrays.items()
                if k.startswith(prefix)
            }
            ts.append(
                VectorTransform._from_state(spec["kind"], spec["config"], arrs)
            )
        base = load_index(
            os.path.join(os.path.dirname(path), config["base_file"])
        )
        return cls(ts, base)

    def __repr__(self) -> str:
        chain = " -> ".join(type(t).__name__ for t in self.transforms)
        return f"TransformedIndex({chain} -> {self.base!r})"
