"""LBG / Lloyd's k-means, TPU-native.

The reference's ``lbg_quantize`` (src/core/vector.rs:390-461) is a scalar
Rust loop whose assignment step is Rayon-parallel. Here each Lloyd iteration
is a fixed dataflow XLA compiles onto the MXU:

* **Assign**: squared-L2 distances as one ``[block, k]`` matmul per data tile
  (f32, so assignments don't flip near ties), ``argmin`` with lowest-index
  tie-breaking like the reference's strict ``<`` scan
  (src/core/vector.rs:352-363).
* **Accumulate**: per-cluster ``(sum, count)`` via one-hot matmuls inside a
  ``lax.scan`` over data tiles, so the full ``[n, k]`` distance matrix never
  materializes in HBM. The same (sum, count) accumulators are what the
  multi-host path merges with ``psum`` (see vq_tpu.parallel.kmeans).
* **Update**: ``mean = sum / count``; empty clusters are reseeded from random
  data points (src/core/vector.rs:449-452) using pre-split PRNG keys — a
  jit-pure reformulation of the reference's data-dependent ``rng.choose``.
* **Converge**: stop when every non-empty centroid moved < ``eps = 1e-6``
  elementwise (the reference's ``approx_eq`` check,
  src/core/vector.rs:437-453). Deliberate deviation (documented): a reseed
  counts as "changed" so a reseeded centroid always gets at least one
  refinement iteration; the reference can exit immediately after a reseed.

Semantics preserved from the reference's validation (src/core/vector.rs:396-410):
empty data, ``k == 0``, and ``n < k`` raise the matching errors. ``max_iters``
of 0 returns the seeded random-sample initialization untouched, like the
reference's ``for _ in 0..max_iters`` loop.

Determinism: fixed ``seed`` => fixed result (property-tested, matching
reference tests/property_tests.rs:194-206). Bitwise parity with the Rust RNG
is impossible; parity is defined at the metric level (inertia / MSE / recall),
per SURVEY.md §7.3.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vq_tpu.errors import EmptyInput, InvalidParameter
from vq_tpu.models.base import check_training_matrix

__all__ = [
    "KMeansResult",
    "lloyd",
    "lloyd_batched",
    "assign",
    "kmeans_plusplus_init_device",
    "CONVERGENCE_EPS",
]

CONVERGENCE_EPS = 1e-6  # reference: src/core/vector.rs:439


class KMeansResult(NamedTuple):
    """Outcome of a Lloyd's run (all fields are device arrays)."""

    centroids: jnp.ndarray  # [k, d] f32
    assignments: jnp.ndarray  # [n] int32 — final nearest-centroid per point
    inertia: jnp.ndarray  # [] f32 — sum of squared distances to assigned centroid
    iterations: jnp.ndarray  # [] int32 — Lloyd iterations actually executed
    converged: jnp.ndarray  # [] bool — stopped before max_iters


def default_block_rows(n: int, k: int, d: int) -> int:
    """Pick a data-tile height so the [block, k] score matrix stays ~8 MiB."""
    target_elems = 2 * 1024 * 1024
    block = max(256, target_elems // max(k, 1))
    block = min(block, n)
    # Round to a multiple of 8 (f32 sublane) without dropping below 8.
    return max(8, (block // 8) * 8)


def _block_scores(x: jnp.ndarray, centroids: jnp.ndarray, cc: jnp.ndarray):
    """[block, k] squared-L2 scores sans the ||x||^2 term (argmin-invariant)."""
    xc = jax.lax.dot_general(
        x, centroids, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return cc[None, :] - 2.0 * xc


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _assign_accumulate(
    data: jnp.ndarray, centroids: jnp.ndarray, block_rows: int,
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pass over data -> (sums [k, d], counts [k], inertia []).

    With ``weights [n]`` the accumulators become Σ w·x / Σ w / Σ w·d²
    (the faiss ``Clustering`` sample-weight semantics) — assignment is
    unaffected."""
    n, d = data.shape
    k = centroids.shape[0]
    cc = jnp.sum(centroids * centroids, axis=-1)  # [k]

    pad = (-n) % block_rows
    padded = jnp.pad(data, ((0, pad), (0, 0)))
    nblocks = padded.shape[0] // block_rows
    tiles = padded.reshape(nblocks, block_rows, d)
    base_valid = jnp.arange(block_rows, dtype=jnp.int32)
    wtiles = (
        None if weights is None
        else jnp.pad(weights, (0, pad)).reshape(nblocks, block_rows)
    )

    def body(carry, inp):
        sums, counts, inertia = carry
        if weights is None:
            tile, bidx = inp
            wtile = None
        else:
            tile, bidx, wtile = inp
        valid = (base_valid + bidx * block_rows) < n  # [block]
        scores = _block_scores(tile, centroids, cc)  # [block, k]
        codes = jnp.argmin(scores, axis=-1)  # lowest index wins on ties
        xx = jnp.sum(tile * tile, axis=-1)
        mind = jnp.maximum(jnp.min(scores, axis=-1) + xx, 0.0)
        w = valid.astype(jnp.float32)
        if wtile is not None:
            w = w * wtile
        onehot = jax.nn.one_hot(codes, k, dtype=jnp.float32) * w[:, None]
        sums = sums + jax.lax.dot_general(
            onehot, tile, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        counts = counts + jnp.sum(onehot, axis=0)
        inertia = inertia + jnp.sum(mind * w)
        return (sums, counts, inertia), None

    init = (
        jnp.zeros((k, d), jnp.float32),
        jnp.zeros((k,), jnp.float32),
        jnp.float32(0.0),
    )
    xs = (tiles, jnp.arange(nblocks, dtype=jnp.int32))
    if wtiles is not None:
        xs = xs + (wtiles,)
    (sums, counts, inertia), _ = jax.lax.scan(body, init, xs)
    return sums, counts, inertia


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _assign_codes(
    data: jnp.ndarray, centroids: jnp.ndarray, block_rows: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blockwise nearest-centroid codes + squared distances for all rows."""
    n, d = data.shape
    cc = jnp.sum(centroids * centroids, axis=-1)
    pad = (-n) % block_rows
    padded = jnp.pad(data, ((0, pad), (0, 0)))
    tiles = padded.reshape(-1, block_rows, d)

    def one(tile):
        tile = tile.astype(jnp.float32)  # upcast per-tile (half corpora)
        scores = _block_scores(tile, centroids, cc)
        codes = jnp.argmin(scores, axis=-1).astype(jnp.int32)
        xx = jnp.sum(tile * tile, axis=-1)
        return codes, jnp.maximum(jnp.min(scores, axis=-1) + xx, 0.0)

    codes, dists = jax.lax.map(one, tiles)
    return codes.reshape(-1)[:n], dists.reshape(-1)[:n]


def assign(
    data, centroids, block_rows: Optional[int] = None,
    use_pallas: Optional[bool] = None,
):
    """Nearest-centroid assignment under squared-L2 (the k-means metric).

    Reference always assigns with squared Euclidean regardless of the user's
    encode-time Distance (src/core/vector.rs:352-363 via Vector::distance2).
    Returns ``(codes [n] int32, sq_dists [n] f32)``. On TPU this runs the
    fused Pallas distance+argmin kernel by default (identical codes).
    f16/bf16 data stays half-width in HBM; tiles upcast to f32 in compute.
    """
    data = jnp.asarray(data)
    if data.dtype not in (jnp.float16, jnp.bfloat16):
        data = data.astype(jnp.float32)
    centroids = jnp.asarray(centroids, jnp.float32)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from vq_tpu.ops.pallas_kernels import assign_block_cap, assign_fused

        if assign_block_cap(centroids.shape[0], data.shape[1]) > 0:
            return assign_fused(
                data, centroids, block_rows=min(block_rows or 1024, 1024)
            )
        # Only a dimension too deep for even one 128-centroid chunk
        # lands here (large k itself now k-chunks inside assign_fused).
    if block_rows is None:
        block_rows = default_block_rows(
            data.shape[0], centroids.shape[0], data.shape[1]
        )
    return _assign_codes(data, centroids, block_rows)


def _fused_accumulate_block_cap(k: int, d: int) -> int:
    """Largest safe data-tile height for the fused Lloyd accumulate.

    The kernel materializes a ``[TN, k_pad]`` one-hot in VMEM next to the
    ``[k_pad, d]`` sums/centroids blocks; at large k a fixed TN=1024
    blows the ~16 MB scoped-vmem limit (observed: k=2000, d=128 fails
    compile with a 19.6 MB stack allocation). Returns 0 when no tile
    height fits (caller falls back to the XLA scan).
    """
    k_pad = -(-max(int(k), 128) // 128) * 128
    fixed = 2 * k_pad * d * 4  # sums + centroids resident blocks
    budget = 10 * 1024 * 1024 - fixed
    if budget <= 0:
        return 0
    per_row = (k_pad + 512 + d) * 8  # onehot + score tile + x, 2x slack
    tn = budget // per_row
    if tn < 64:
        return 0
    return int(min(1024, tn // 8 * 8))


def _accumulate_dispatch(
    data, centroids, block_rows, use_pallas: bool, weights=None
):
    """Pick the accumulate implementation: fused Pallas kernel on TPU, the
    XLA scan elsewhere. Both return (sums [k, d], counts [k], inertia [])
    with identical assignments (HIGHEST-precision matmuls in both).
    Sample weights route to the XLA scan (the fused kernel is
    unweighted)."""
    if use_pallas and weights is None:
        cap = _fused_accumulate_block_cap(
            centroids.shape[0], data.shape[1]
        )
        if cap:
            from vq_tpu.ops.pallas_kernels import lloyd_accumulate_fused

            return lloyd_accumulate_fused(
                data, centroids, block_rows=min(block_rows, cap)
            )
        # k·d too large for the one-hot accumulate in VMEM.
    return _assign_accumulate(data, centroids, block_rows, weights)


def _normalize_rows(c: jnp.ndarray) -> jnp.ndarray:
    """Project rows onto the unit sphere (zero rows pass through)."""
    norm = jnp.sqrt(jnp.sum(c * c, axis=-1, keepdims=True))
    return c / jnp.maximum(norm, 1e-12)


def _lloyd_body_factory(
    data, k, eps, block_rows, use_pallas=False, spherical=False,
    weights=None,
):
    n = data.shape[0]
    # Weighted empty-cluster reseeds draw ∝ w (inverse-CDF) so a
    # zero-weight point can never become a centroid — the documented
    # weight contract.
    cw = None if weights is None else jnp.cumsum(weights)

    def body(state):
        centroids, key, it, _changed = state
        key, reseed_key = jax.random.split(key)
        sums, counts, _ = _accumulate_dispatch(
            data, centroids, block_rows, use_pallas, weights
        )
        nonempty = counts > 0
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        if cw is None:
            reseed_idx = jax.random.randint(reseed_key, (k,), 0, n)
        else:
            u = jax.random.uniform(
                reseed_key, (k,), dtype=jnp.float32
            ) * cw[-1]
            reseed_idx = jnp.clip(jnp.searchsorted(cw, u), 0, n - 1)
        reseeded = jnp.take(data, reseed_idx, axis=0)
        new_c = jnp.where(nonempty[:, None], means, reseeded)
        if spherical:
            # faiss Clustering(spherical=True): project centroids back to
            # the unit sphere after every update so squared-L2 assignment
            # of unit-norm data ranks by cosine/inner product.
            new_c = _normalize_rows(new_c)
        moved = jnp.any(jnp.abs(new_c - centroids) >= eps, axis=-1)
        changed = jnp.any(jnp.where(nonempty, moved, True))
        return new_c, key, it + 1, changed

    return body


@functools.partial(
    jax.jit,
    static_argnames=("k", "max_iters", "block_rows", "use_pallas", "spherical"),
)
def _lloyd_jit(
    data: jnp.ndarray,
    key: jnp.ndarray,
    k: int,
    max_iters: int,
    eps: float,
    block_rows: int,
    use_pallas: bool = False,
    spherical: bool = False,
):
    n = data.shape[0]
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centroids0 = jnp.take(data, init_idx, axis=0)
    if spherical:
        centroids0 = _normalize_rows(centroids0)
    key, loop_key = jax.random.split(key)

    body = _lloyd_body_factory(
        data, k, eps, block_rows, use_pallas, spherical
    )

    def cond(state):
        _, _, it, changed = state
        return jnp.logical_and(it < max_iters, changed)

    centroids, _, iterations, changed = jax.lax.while_loop(
        cond, body, (centroids0, loop_key, jnp.int32(0), jnp.bool_(True))
    )
    assignments, sq_dists = _assign_codes(data, centroids, block_rows)
    inertia = jnp.sum(sq_dists)
    converged = jnp.logical_not(changed)
    return centroids, assignments, inertia, iterations, converged


@functools.partial(jax.jit, static_argnames=("k", "sample"))
def _kpp_init_jit(
    data: jnp.ndarray, key: jnp.ndarray, k: int, sample: int,
    weights: Optional[jnp.ndarray] = None,
):
    """Device-side k-means++ (Arthur & Vassilvitskii 2007): sequential
    D²-weighted seed draws via inverse-CDF sampling on the device.

    Everything stays on-device — no host round-trip of the corpus (on the
    tunneled TPU a 1M x 128 pull is ~512 MB at ~MB/s; round-1's host sampler
    made ``init="kmeans++"`` a latency trap). One [n, d] matvec per seed:
    O(nkd) total, the cost of a single Lloyd assignment pass.
    """
    n = data.shape[0]
    if n > sample:
        key, sub = jax.random.split(key)
        idx = jax.random.choice(sub, n, (sample,), replace=False)
        data = jnp.take(data, idx, axis=0)
        if weights is not None:
            weights = jnp.take(weights, idx)
        n = sample
    xx = jnp.sum(data * data, axis=-1)  # [n]

    def sqdist_to(s):
        xs = jax.lax.dot_general(
            data, s[None, :], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0]
        return jnp.maximum(xx + jnp.dot(s, s) - 2.0 * xs, 0.0)

    key, k0 = jax.random.split(key)
    if weights is None:
        seed0 = data[jax.random.randint(k0, (), 0, n)]
    else:
        # First seed ∝ w (faiss Clustering weight semantics); later draws
        # use the weighted D² mass w·D².
        cw = jnp.cumsum(weights)
        u0 = jax.random.uniform(k0, dtype=jnp.float32) * cw[-1]
        seed0 = data[jnp.clip(jnp.searchsorted(cw, u0), 0, n - 1)]
    if k == 1:
        return seed0[None]

    def step(d2, kk):
        mass = d2 if weights is None else d2 * weights
        total = jnp.sum(mass)
        ku, kf = jax.random.split(kk)
        u = jax.random.uniform(ku, dtype=jnp.float32) * total
        widx = jnp.clip(jnp.searchsorted(jnp.cumsum(mass), u), 0, n - 1)
        # All residual D² mass zero (every point equals a seed): fall back
        # to a uniform draw, like the host sampler.
        idx = jnp.where(total > 0, widx, jax.random.randint(kf, (), 0, n))
        s = data[idx]
        return jnp.minimum(d2, sqdist_to(s)), s

    _, rest = jax.lax.scan(step, sqdist_to(seed0), jax.random.split(key, k - 1))
    return jnp.concatenate([seed0[None], rest], axis=0)


def kmeans_plusplus_init_device(
    data, k: int, seed: int = 0, *, key: Optional[jnp.ndarray] = None,
    sample: int = 100_000, weights=None,
) -> jnp.ndarray:
    """k-means++ seeding fully on-device; returns ``[k, d]`` f32 seeds.

    ``sample`` caps the candidate pool (uniform on-device subsample) so the
    sequential D² scan stays cheap for huge corpora.
    """
    data = jnp.asarray(data, jnp.float32)
    n = data.shape[0]
    if k <= 0:
        raise InvalidParameter("k", "must be greater than 0")
    if n < k:
        raise InvalidParameter(
            "k", f"not enough data points ({n}) for {k} clusters"
        )
    if key is None:
        key = jax.random.PRNGKey(int(seed))
    weights = _validate_weights(weights, n)
    return _kpp_init_jit(
        data, key, int(k), int(min(n, max(sample, k))), weights
    )


def _validate_weights(weights, n: int, k: Optional[int] = None):
    """Shared sample-weight validation -> f32 [n] array (or None)."""
    if weights is None:
        return None
    w = jnp.asarray(weights, jnp.float32).reshape(-1)
    if w.shape[0] != n:
        raise InvalidParameter(
            "weights", f"expected [{n}], got [{w.shape[0]}]"
        )
    if bool(jnp.any(~jnp.isfinite(w)) | jnp.any(w < 0)):
        raise InvalidParameter("weights", "must be finite and non-negative")
    if not bool(jnp.sum(w) > 0):
        raise InvalidParameter("weights", "must have positive mass")
    if k is not None and int(jnp.sum(w > 0)) < k:
        raise InvalidParameter(
            "weights", f"need at least k={k} positive-weight rows"
        )
    return w


def _validate_kmeans_args(n: int, k: int, max_iters: int) -> None:
    # reference: src/core/vector.rs:396-410
    if k <= 0:
        raise InvalidParameter("k", "must be greater than 0")
    if n < k:
        raise InvalidParameter(
            "k", f"not enough data points ({n}) for {k} clusters"
        )
    if max_iters < 0:
        raise InvalidParameter("max_iters", "must be non-negative")


def lloyd(
    data,
    k: int,
    max_iters: int = 10,
    seed: int = 0,
    *,
    key: Optional[jnp.ndarray] = None,
    eps: float = CONVERGENCE_EPS,
    block_rows: Optional[int] = None,
    use_pallas: Optional[bool] = None,
    init: str = "sample",
    spherical: bool = False,
    init_centroids=None,
    weights=None,
) -> KMeansResult:
    """Train ``k`` centroids with Lloyd's algorithm (reference
    ``lbg_quantize``, src/core/vector.rs:390-461).

    ``data`` is ``[n, d]`` f32; returns a :class:`KMeansResult`. Pass either
    an integer ``seed`` (reference-style) or an explicit JAX PRNG ``key``.
    ``block_rows`` tiles the data axis so the per-tile score matrix stays in
    VMEM-sized chunks; ``None`` picks a size automatically. ``use_pallas``
    selects the fused VMEM-resident accumulate kernel (defaults to on for
    the TPU backend); both paths produce identical assignments.

    ``init``: ``"sample"`` (reference semantics — k distinct random rows,
    src/core/vector.rs:412-413) or ``"kmeans++"`` (D²-weighted seeding;
    better minima, deviation from the reference documented).

    >>> import numpy as np
    >>> pts = np.array([[0.], [0.1], [10.], [10.1]], np.float32)
    >>> res = lloyd(pts, k=2, max_iters=5, seed=0)
    >>> sorted(round(float(c), 2) for c in np.asarray(res.centroids).ravel())
    [0.05, 10.05]

    ``spherical=True`` (faiss ``Clustering`` spherical option, no
    reference counterpart) projects the centroids back onto the unit
    sphere after every update, so squared-L2 assignment of unit-norm
    data ranks by cosine / inner product — the right coarse quantizer
    for cosine retrieval and normalized-MIPS IVF.

    ``init_centroids`` (``[k, d]``) warm-starts Lloyd refinement from
    explicit centroids (the faiss ``Clustering`` init-centroids path —
    incremental re-training, OPQ-style outer loops), overriding ``init``.

    ``weights`` (``[n]``, non-negative, ≥k strictly positive) are
    per-sample importances (the faiss ``Clustering`` sample-weight
    semantics): centroid updates become Σ w·x / Σ w, inertia Σ w·d²,
    seeding and empty-cluster reseeds draw ∝ w (k-means++ ∝ w·D²), so a
    zero-weight point never influences the solution. Assignment is
    unchanged. The weighted accumulate runs the XLA path (the fused
    Pallas kernel is unweighted). The weighted samplers use different
    key streams than the unweighted ones — pass ``init_centroids`` for
    exact weighted/unweighted A/B comparisons.
    """
    data = check_training_matrix(data)
    n, d = data.shape
    k = int(k)
    max_iters = int(max_iters)
    _validate_kmeans_args(n, k, max_iters)
    weights = _validate_weights(weights, n, k)
    if weights is not None:
        use_pallas = False  # the fused accumulate is unweighted
    if key is None:
        key = jax.random.PRNGKey(int(seed))
    if block_rows is None:
        block_rows = default_block_rows(n, k, d)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # The fused kernel caps its tile height by the VMEM budget.
        block_rows = min(int(block_rows), 1024)
    if init_centroids is not None:
        seeds = jnp.asarray(init_centroids, jnp.float32)
        if seeds.ndim != 2 or seeds.shape != (k, d):
            raise InvalidParameter(
                "init_centroids",
                f"expected [k={k}, d={d}], got {tuple(seeds.shape)}",
            )
        centroids, assignments, inertia, iterations, converged = (
            _lloyd_from_init_jit(
                data, seeds, key, max_iters, float(eps),
                int(block_rows), bool(use_pallas), bool(spherical),
                weights,
            )
        )
        return KMeansResult(
            centroids, assignments, inertia, iterations, converged
        )
    if init == "kmeans++":
        # Fully on-device D² sampler — the corpus never leaves HBM
        # (round-2 fix: the host sampler pulled the whole corpus through
        # the ~MB/s tunnel before subsampling).
        key, kpp_key = jax.random.split(key)
        seeds = _kpp_init_jit(
            data, kpp_key, k, int(min(n, 100_000)), weights
        )
        centroids, assignments, inertia, iterations, converged = (
            _lloyd_from_init_jit(
                data, seeds, key, max_iters, float(eps),
                int(block_rows), bool(use_pallas), bool(spherical),
                weights,
            )
        )
        return KMeansResult(
            centroids, assignments, inertia, iterations, converged
        )
    if init != "sample":
        raise InvalidParameter(
            "init", f"expected 'sample' or 'kmeans++', got {init!r}"
        )
    if weights is not None:
        # Weighted sample init: k distinct rows ∝ w via Gumbel top-k
        # (log(0) = -inf, so zero-weight rows are never seeds — the
        # documented weight contract; parity with the unweighted key
        # stream is deliberately traded for it, pass init_centroids for
        # exact A/B comparisons).
        key, init_key = jax.random.split(key)
        g = -jnp.log(-jnp.log(
            jax.random.uniform(init_key, (n,), jnp.float32, 1e-12, 1.0)
        ))
        _, init_idx = jax.lax.top_k(jnp.log(weights) + g, k)
        seeds = jnp.take(data, init_idx, axis=0)
        centroids, assignments, inertia, iterations, converged = (
            _lloyd_from_init_jit(
                data, seeds, key, max_iters, float(eps),
                int(block_rows), False, bool(spherical), weights,
            )
        )
        return KMeansResult(
            centroids, assignments, inertia, iterations, converged
        )
    centroids, assignments, inertia, iterations, converged = _lloyd_jit(
        data, key, k, max_iters, float(eps), int(block_rows),
        bool(use_pallas), bool(spherical),
    )
    return KMeansResult(centroids, assignments, inertia, iterations, converged)


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "block_rows", "use_pallas", "spherical"),
)
def _lloyd_from_init_jit(
    data: jnp.ndarray,
    centroids0: jnp.ndarray,
    key: jnp.ndarray,
    max_iters: int,
    eps: float,
    block_rows: int,
    use_pallas: bool = False,
    spherical: bool = False,
    weights: Optional[jnp.ndarray] = None,
):
    """Lloyd refinement from explicit initial centroids."""
    k = centroids0.shape[0]
    if spherical:
        centroids0 = _normalize_rows(centroids0)
    _, loop_key = jax.random.split(key)
    body = _lloyd_body_factory(
        data, k, eps, block_rows, use_pallas, spherical, weights
    )

    def cond(state):
        _, _, it, changed = state
        return jnp.logical_and(it < max_iters, changed)

    centroids, _, iterations, changed = jax.lax.while_loop(
        cond, body, (centroids0, loop_key, jnp.int32(0), jnp.bool_(True))
    )
    assignments, sq_dists = _assign_codes(data, centroids, block_rows)
    if weights is not None:
        sq_dists = sq_dists * weights
    return centroids, assignments, jnp.sum(sq_dists), iterations, (
        jnp.logical_not(changed)
    )



@functools.partial(jax.jit, static_argnames=("block_rows",))
def _pq_accumulate_xla(x: jnp.ndarray, cb: jnp.ndarray, block_rows: int):
    """XLA fallback for the fused multi-subspace accumulate: one scan over
    data tiles with batched einsums (same tile order as the Pallas kernel's
    sequential grid). x: [n, m*s]; cb: [m, k, s] ->
    (sums [m, k, s], counts [m, k], inertia [])."""
    n, d = x.shape
    m, k, s = cb.shape
    cc = jnp.sum(cb * cb, axis=-1)  # [m, k]
    pad = (-n) % block_rows
    padded = jnp.pad(x.reshape(n, m, s), ((0, pad), (0, 0), (0, 0)))
    tiles = padded.reshape(-1, block_rows, m, s)
    base = jnp.arange(block_rows, dtype=jnp.int32)

    def body(carry, inp):
        sums, counts, inertia = carry
        tile, bidx = inp  # [B, m, s]
        valid = ((base + bidx * block_rows) < n).astype(jnp.float32)
        xc = jnp.einsum(
            "bms,mks->bmk", tile, cb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        scores = cc[None] - 2.0 * xc
        codes = jnp.argmin(scores, axis=-1)  # [B, m]
        xx = jnp.sum(tile * tile, axis=-1)
        mind = jnp.maximum(jnp.min(scores, axis=-1) + xx, 0.0)
        onehot = jax.nn.one_hot(codes, k, dtype=jnp.float32) * valid[:, None, None]
        sums = sums + jnp.einsum(
            "bmk,bms->mks", onehot, tile,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        counts = counts + jnp.sum(onehot, axis=0)
        inertia = inertia + jnp.sum(mind * valid[:, None])
        return (sums, counts, inertia), None

    init = (
        jnp.zeros((m, k, s), jnp.float32),
        jnp.zeros((m, k), jnp.float32),
        jnp.float32(0.0),
    )
    (sums, counts, inertia), _ = jax.lax.scan(
        body, init, (tiles, jnp.arange(tiles.shape[0], dtype=jnp.int32))
    )
    return sums, counts, inertia


@functools.partial(
    jax.jit,
    static_argnames=("k", "max_iters", "block_rows", "has_init", "use_pallas"),
)
def _pq_lloyd_fused_jit(
    x: jnp.ndarray,  # [n, m*s] PQ-interleaved data
    keys: jnp.ndarray,  # [m] per-subspace PRNG keys
    k: int,
    max_iters: int,
    eps: float,
    block_rows: int,
    init: Optional[jnp.ndarray] = None,  # [m, k, s] warm start
    has_init: bool = False,
    use_pallas: bool = True,
):
    """PQ training driver: fused multi-subspace Pallas accumulate on TPU,
    batched-einsum XLA accumulate elsewhere (same tile order).

    Same per-lane key stream, init, update rule, and lane-freezing as the
    old vmapped path; the assignment+accumulate for all m subspaces is one
    pass per iteration (one HBM read of x).
    """
    if use_pallas:
        from vq_tpu.ops.pallas_kernels import pq_lloyd_accumulate_fused

        def accumulate(x_, cb_):
            return pq_lloyd_accumulate_fused(x_, cb_, block_rows=block_rows)
    else:
        def accumulate(x_, cb_):
            return _pq_accumulate_xla(x_, cb_, block_rows)

    n, d = x.shape
    m = keys.shape[0]
    s = d // m

    def col_block(rows, i):
        # rows: [k] indices; -> [k, s] from subspace i's column block.
        picked = jnp.take(x, rows, axis=0)  # [k, d]
        return jax.lax.dynamic_slice_in_dim(picked, i * s, s, axis=1)

    def init_one(sub_key, i):
        idx = jax.random.choice(sub_key, n, (k,), replace=False)
        return col_block(idx, i)

    if has_init:
        cb0 = init  # warm start (e.g. OPQ's outer iterations)
    else:
        cb0 = jax.vmap(init_one)(keys, jnp.arange(m))  # [m, k, s]
    loop_keys = jax.vmap(lambda kk: jax.random.split(kk)[1])(keys)

    def body(state):
        cb, lkeys, it, changed = state
        splits = jax.vmap(jax.random.split)(lkeys)  # [m, 2, 2]
        new_keys, reseed_keys = splits[:, 0], splits[:, 1]
        sums, counts, _ = accumulate(x, cb)
        nonempty = counts > 0  # [m, k]
        means = sums / jnp.maximum(counts, 1.0)[..., None]
        ridx = jax.vmap(
            lambda rk: jax.random.randint(rk, (k,), 0, n)
        )(reseed_keys)  # [m, k]
        reseeded = jax.vmap(col_block)(ridx, jnp.arange(m))  # [m, k, s]
        new_cb = jnp.where(nonempty[..., None], means, reseeded)
        moved = jnp.any(jnp.abs(new_cb - cb) >= eps, axis=-1)  # [m, k]
        lane_changed = jnp.any(jnp.where(nonempty, moved, True), axis=-1)
        # Freeze converged lanes exactly like the vmapped path.
        cb = jnp.where(changed[:, None, None], new_cb, cb)
        lkeys = jnp.where(changed[:, None], new_keys, lkeys)
        it = jnp.where(changed, it + 1, it)
        return cb, lkeys, it, jnp.logical_and(changed, lane_changed)

    def cond(state):
        _, _, it, changed = state
        return jnp.any(jnp.logical_and(it < max_iters, changed))

    cb, _, iterations, changed = jax.lax.while_loop(
        cond,
        body,
        (
            cb0,
            loop_keys,
            jnp.zeros((m,), jnp.int32),
            jnp.ones((m,), jnp.bool_),
        ),
    )
    return cb, iterations, jnp.logical_not(changed)


def lloyd_batched(
    data,
    k: int,
    max_iters: int = 10,
    seed: int = 0,
    *,
    eps: float = CONVERGENCE_EPS,
    block_rows: Optional[int] = None,
    init_centroids=None,
):
    """Train independent codebooks for a batch of sub-problems at once.

    ``data`` is ``[m, n, d]``; returns ``(centroids [m, k, d],
    iterations [m], converged [m])``. Sub-problem ``i`` uses PRNG
    ``fold_in(seed, i)`` — the analog of the reference PQ's per-subspace
    ``seed + i`` (src/pq.rs:130). Pass ``init_centroids [m, k, d]`` to warm
    start (e.g. OPQ's outer loop) instead of seeded sampling.
    """
    data = jnp.asarray(data, jnp.float32)
    if data.ndim != 3:
        raise InvalidParameter("data", f"expected [m, n, d], got {data.ndim}-D")
    m, n, d = data.shape
    if n == 0 or d == 0 or m == 0:
        raise EmptyInput("training data must not be empty")
    k = int(k)
    _validate_kmeans_args(n, k, int(max_iters))
    base = jax.random.PRNGKey(int(seed))
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(m))
    if block_rows is None:
        block_rows = default_block_rows(n, k, d)
    has_init = init_centroids is not None
    if has_init:
        init = jnp.asarray(init_centroids, jnp.float32)
        if init.shape != (m, k, d):
            raise InvalidParameter(
                "init_centroids", f"expected {(m, k, d)}, got {init.shape}"
            )
    else:
        init = jnp.zeros((m, k, d), jnp.float32)
    # Shared driver over the PQ-interleaved layout; fused Pallas accumulate
    # on TPU, batched-einsum XLA elsewhere (the old vmapped while_loop was
    # pathologically slow — 355x slower than the fused kernel at 1M rows).
    x = jnp.moveaxis(data, 0, 1).reshape(n, m * d)
    use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from vq_tpu.ops.pallas_kernels import pq_fused_block_cap

        if pq_fused_block_cap(m, k, d) <= 0:
            use_pallas = False  # VMEM budget: keep the XLA accumulate
    return _pq_lloyd_fused_jit(
        x, keys, k, int(max_iters), float(eps),
        min(int(block_rows), 1024) if use_pallas else int(block_rows),
        init, has_init, use_pallas,
    )
