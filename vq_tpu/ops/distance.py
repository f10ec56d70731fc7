"""Batched distance computation — the TPU-native replacement for hsdlib.

The reference computes one scalar distance per call through a C SIMD library
(reference: src/core/distance.rs:48-64 dispatching to src/core/hsdlib_ffi.rs).
On TPU the unit of work is a *batch*: distances between ``[n, d]`` queries and
``[k, d]`` codebooks are one ``[n, k]`` matmul on the MXU (squared-L2 in the
``‖x‖² + ‖c‖² - 2 x·cᵀ`` form) or a tiled
broadcast reduction on the VPU (Manhattan). Pair (1-vector) distances are the
``n == 1`` special case of the same code paths.

Numerics preserved from the reference:

* ``SquaredEuclidean`` / ``Euclidean`` / ``Manhattan`` straightforward
  (src/core/distance.rs:67-95).
* Cosine distance is ``1 - cosine_similarity`` with a zero-norm guard
  (``norm < 1e-10`` on either side -> distance 1.0) and the result clamped to
  ``[0, 1]`` (src/core/distance.rs:97-120).
* Dimension mismatch raises :class:`~vq_tpu.errors.DimensionMismatch`
  (src/core/distance.rs:48-54).

Assignment computations (``nearest``) use squared-L2 matmuls in f32 (never
bf16) so that k-means assignments don't flip near ties, and ties break to the
lowest index exactly like the reference's strict ``<`` scans
(src/core/vector.rs:352-363, src/pq.rs:183-191).
"""

from __future__ import annotations

import enum
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.errors import DimensionMismatch, InvalidParameter

COSINE_NORM_EPS = 1e-10  # reference: src/core/distance.rs:112


class Metric(str, enum.Enum):
    """Distance metric identifiers (reference: src/core/distance.rs:8-17).

    Values match the reference's ``Distance::name()`` strings
    (src/core/distance.rs:21-28) so string round-trips are compatible with
    pyvq's ``Distance("euclidean")`` constructor (pyvq/src/distance.rs:32-46).
    """

    SQUARED_EUCLIDEAN = "squared_euclidean"
    EUCLIDEAN = "euclidean"
    MANHATTAN = "manhattan"
    COSINE = "cosine"

    @classmethod
    def parse(cls, value: "Metric | str | None") -> "Metric":
        if value is None:
            return cls.EUCLIDEAN
        if isinstance(value, Metric):
            return value
        try:
            return cls(str(value))
        except ValueError:
            valid = ", ".join(m.value for m in cls)
            raise InvalidParameter(
                "metric", f"unknown metric '{value}'; expected one of: {valid}"
            ) from None


def _as_f32_matrix(x, name: str) -> jnp.ndarray:
    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
    if x.ndim != 2:
        raise InvalidParameter(name, f"must be 1-D or 2-D, got {x.ndim}-D")
    return x


def _check_dims(d_a: int, d_b: int) -> None:
    if d_a != d_b:
        raise DimensionMismatch(expected=d_a, found=d_b)


# ---------------------------------------------------------------------------
# Jitted pairwise kernels. All take [n, d] x [k, d] -> [n, k] in f32.
# ---------------------------------------------------------------------------


@jax.jit
def _sqeuclidean_pairwise(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    # ||x - c||^2 = ||x||^2 + ||c||^2 - 2 x.cT  -- one MXU matmul instead of
    # the reference's per-pair scalar loop (src/core/distance.rs:76-83).
    xx = jnp.sum(x * x, axis=-1, keepdims=True)  # [n, 1]
    cc = jnp.sum(c * c, axis=-1)  # [k]
    xc = jax.lax.dot_general(
        x, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # [n, k]
    return jnp.maximum(xx + cc[None, :] - 2.0 * xc, 0.0)


@jax.jit
def _manhattan_pairwise(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    # L1 has no matmul form; broadcast-reduce on the VPU.
    return jnp.sum(jnp.abs(x[:, None, :] - c[None, :, :]), axis=-1)


@jax.jit
def _cosine_pairwise(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    # 1 - (x.c)/(|x||c|); zero-norm -> 1.0; clamp to [0,1]
    # (reference: src/core/distance.rs:107-119).
    dot = jax.lax.dot_general(
        x, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    nx = jnp.sqrt(jnp.sum(x * x, axis=-1))  # [n]
    nc = jnp.sqrt(jnp.sum(c * c, axis=-1))  # [k]
    sim = dot / jnp.maximum(nx[:, None] * nc[None, :], COSINE_NORM_EPS)
    dist = jnp.clip(1.0 - sim, 0.0, 1.0)
    degenerate = (nx[:, None] < COSINE_NORM_EPS) | (nc[None, :] < COSINE_NORM_EPS)
    return jnp.where(degenerate, 1.0, dist)


_PAIRWISE = {
    Metric.SQUARED_EUCLIDEAN: _sqeuclidean_pairwise,
    Metric.EUCLIDEAN: jax.jit(lambda x, c: jnp.sqrt(_sqeuclidean_pairwise(x, c))),
    Metric.MANHATTAN: _manhattan_pairwise,
    Metric.COSINE: _cosine_pairwise,
}


def pairwise(x, c, metric: Metric | str = Metric.EUCLIDEAN) -> jnp.ndarray:
    """All-pairs distances between ``x`` ([n, d] or [d]) and ``c`` ([k, d] or [d]).

    Returns an ``[n, k]`` f32 matrix. Batched generalization of the
    reference's ``Distance::compute`` (src/core/distance.rs:48-64).
    """
    metric = Metric.parse(metric)
    x = _as_f32_matrix(x, "x")
    c = _as_f32_matrix(c, "c")
    _check_dims(x.shape[1], c.shape[1])
    return _PAIRWISE[metric](x, c)


def distance(a, b, metric: Metric | str = Metric.EUCLIDEAN) -> float:
    """Distance between two single vectors — the reference's scalar API
    (src/core/distance.rs:48-64). Prefer :func:`pairwise` for batches."""
    metric = Metric.parse(metric)
    a = jnp.asarray(a, dtype=jnp.float32)
    b = jnp.asarray(b, dtype=jnp.float32)
    if a.ndim != 1 or b.ndim != 1:
        raise InvalidParameter("a/b", "distance() expects 1-D vectors")
    _check_dims(a.shape[0], b.shape[0])
    return float(_PAIRWISE[metric](a[None, :], b[None, :])[0, 0])


# ---------------------------------------------------------------------------
# Nearest-centroid assignment (the k-means / PQ-encode hot path).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("metric",))
def _nearest_jit(
    x: jnp.ndarray, c: jnp.ndarray, metric: Metric
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    d = _PAIRWISE[metric](x, c)
    codes = jnp.argmin(d, axis=-1).astype(jnp.int32)  # ties -> lowest index
    dists = jnp.min(d, axis=-1)
    return codes, dists


def nearest(
    x, c, metric: Metric | str = Metric.SQUARED_EUCLIDEAN
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Index of (and distance to) the nearest row of ``c`` for every row of ``x``.

    Batched analog of ``find_nearest_centroid`` (src/core/vector.rs:352-363);
    ties break to the lowest index like the reference's strict ``<`` scan.
    Returns ``(codes [n] int32, dists [n] f32)``.
    """
    metric = Metric.parse(metric)
    x = _as_f32_matrix(x, "x")
    c = _as_f32_matrix(c, "c")
    _check_dims(x.shape[1], c.shape[1])
    return _nearest_jit(x, c, metric)


@functools.partial(jax.jit, static_argnames=("metric",))
def _rowwise_jit(x: jnp.ndarray, y: jnp.ndarray, metric: Metric) -> jnp.ndarray:
    if metric in (Metric.SQUARED_EUCLIDEAN, Metric.EUCLIDEAN):
        d = jnp.sum((x - y) ** 2, axis=-1)
        return jnp.sqrt(d) if metric == Metric.EUCLIDEAN else d
    if metric == Metric.MANHATTAN:
        return jnp.sum(jnp.abs(x - y), axis=-1)
    dot = jnp.sum(x * y, axis=-1)
    nx = jnp.sqrt(jnp.sum(x * x, axis=-1))
    ny = jnp.sqrt(jnp.sum(y * y, axis=-1))
    sim = dot / jnp.maximum(nx * ny, COSINE_NORM_EPS)
    dist = jnp.clip(1.0 - sim, 0.0, 1.0)
    degenerate = (nx < COSINE_NORM_EPS) | (ny < COSINE_NORM_EPS)
    return jnp.where(degenerate, 1.0, dist)


def rowwise(x, y, metric: Metric | str = Metric.EUCLIDEAN) -> jnp.ndarray:
    """Row-aligned distances: ``x [n, d]`` vs ``y [n, d]`` -> ``[n]``.

    The vectorized form of calling ``Distance::compute`` once per row pair
    (used by TSVQ traversal, reference src/tsvq.rs:117-132).
    """
    metric = Metric.parse(metric)
    x = _as_f32_matrix(x, "x")
    y = _as_f32_matrix(y, "y")
    _check_dims(x.shape[1], y.shape[1])
    return _rowwise_jit(x, y, metric)


class Distance:
    """pyvq-compatible distance object (reference: pyvq/src/distance.rs).

    Construct from a metric name or via the static factories; ``compute``
    evaluates a single pair like ``Distance.compute`` in the reference
    (pyvq/src/distance.rs:91-97) while ``pairwise`` exposes the batch path.

    >>> import numpy as np
    >>> a = np.array([0., 3.], np.float32)
    >>> b = np.array([4., 0.], np.float32)
    >>> float(Distance.euclidean().compute(a, b))
    5.0
    >>> float(Distance("manhattan").compute(a, b))
    7.0
    """

    __slots__ = ("metric",)

    def __init__(self, metric: str | Metric = Metric.EUCLIDEAN):
        self.metric = Metric.parse(metric)

    @staticmethod
    def euclidean() -> "Distance":
        return Distance(Metric.EUCLIDEAN)

    @staticmethod
    def squared_euclidean() -> "Distance":
        return Distance(Metric.SQUARED_EUCLIDEAN)

    @staticmethod
    def manhattan() -> "Distance":
        return Distance(Metric.MANHATTAN)

    @staticmethod
    def cosine() -> "Distance":
        return Distance(Metric.COSINE)

    @property
    def name(self) -> str:
        return self.metric.value

    def compute(self, a, b) -> float:
        return distance(a, b, self.metric)

    def pairwise(self, x, c) -> jnp.ndarray:
        return pairwise(x, c, self.metric)

    def __repr__(self) -> str:
        return f"Distance({self.metric.value!r})"

    def __eq__(self, other) -> bool:
        if isinstance(other, Distance):
            return self.metric == other.metric
        if isinstance(other, (Metric, str)):
            return self.metric == Metric.parse(other)
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self.metric)
