"""Anisotropic (score-aware) k-means for maximum-inner-product search.

Plain k-means minimizes ``||x - c||^2``, but for MIPS what matters is the
error in the *score* ``q.x``: quantization error parallel to the datapoint
changes every query's score for that point, while orthogonal error only
matters for queries pointing that way. Weighting parallel error more
(Guo et al. 2020, "Accelerating Large-Scale Inference with Anisotropic
Vector Quantization" — the ScaNN codebook loss) gives markedly better
inner-product recall at the same codebook budget.

Loss per point: with residual ``r = x - c`` and unit direction
``x_hat = x / ||x||``,

    L(x, c) = eta * (r . x_hat)^2 + (||r||^2 - (r . x_hat)^2)
            = ||r||^2 + (eta - 1) * (||x|| - c . x_hat)^2

so the assignment score is one extra rank-1 term on top of the standard
``||x||^2 + ||c||^2 - 2 x.c`` matmul — same MXU dataflow as plain Lloyd's
(one ``[n, k]`` matmul per block).

The optimal cluster update solves, per cluster,

    c* = (N I + (eta-1) sum x_hat x_hat^T)^{-1} (sum x + (eta-1) sum ||x|| x_hat)

— accumulated with one-hot matmuls (the ``sum x_hat x_hat^T`` term is a
``[k, n] x [n, d^2]`` matmul) and solved as ``k`` batched ``d x d``
Cholesky factorizations on device. Everything is jit-pure; empty clusters
reseed like the plain trainer.

No counterpart exists in the reference library (it has no MIPS support at
all); this extends the framework the way its CPU contemporaries (ScaNN,
FAISS's ``IndexIVFPQFastScan`` users) extended PQ.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vq_tpu.errors import InvalidParameter
from vq_tpu.models.base import check_training_matrix
from vq_tpu.ops.kmeans import KMeansResult, _validate_kmeans_args

__all__ = ["lloyd_anisotropic", "anisotropic_eta", "anisotropic_assign"]


def anisotropic_eta(threshold: float, dim: int) -> float:
    """Parallel-error weight from ScaNN's score threshold ``T``.

    For the thresholded loss (only score errors above ``T * ||x||``
    matter), the optimal weight ratio is
    ``eta = (d - 1) * T^2 / (1 - T^2)`` (Guo et al. 2020, Thm 3.2 under
    the uniform-query assumption).
    """
    t = float(threshold)
    if not 0.0 <= t < 1.0:
        raise InvalidParameter("threshold", "must be in [0, 1)")
    if t == 0.0:
        return 1.0  # plain L2
    # Floor at 1: below it the loss would *down*-weight parallel error,
    # which only happens for tiny d·T^2 where plain L2 is already optimal.
    return max(1.0, (int(dim) - 1) * t * t / (1.0 - t * t))


@functools.partial(jax.jit, static_argnames=())
def _aniso_scores(x, xx, xnorm, centroids, eta):
    """[n, k] anisotropic loss, from one x.c^T matmul.

    ``L = xx + cc - 2 xc + (eta - 1) (xnorm - xc / xnorm)^2``; rows with
    ``||x|| = 0`` fall back to plain L2 (their direction is undefined).
    """
    cc = jnp.sum(centroids * centroids, axis=-1)
    xc = jax.lax.dot_general(
        x, centroids, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    l2 = xx[:, None] + cc[None, :] - 2.0 * xc
    safe = jnp.maximum(xnorm, 1e-20)
    par = xnorm[:, None] - xc / safe[:, None]
    extra = (eta - 1.0) * par * par
    return l2 + jnp.where((xnorm > 0)[:, None], extra, 0.0)


def anisotropic_assign(data, centroids, eta: float):
    """Nearest centroid under the anisotropic loss -> (codes, losses)."""
    x = jnp.asarray(data, jnp.float32)
    c = jnp.asarray(centroids, jnp.float32)
    xx = jnp.sum(x * x, axis=-1)
    scores = _aniso_scores(x, xx, jnp.sqrt(xx), c, float(eta))
    return (
        jnp.argmin(scores, axis=-1).astype(jnp.int32),
        jnp.min(scores, axis=-1),
    )


@functools.partial(jax.jit, static_argnames=("k", "max_iters"))
def _lloyd_aniso_jit(data, key, k: int, max_iters: int, eta, ridge):
    n, d = data.shape
    xx = jnp.sum(data * data, axis=-1)  # [n]
    xnorm = jnp.sqrt(xx)
    safe = jnp.maximum(xnorm, 1e-20)
    xhat = data / safe[:, None]  # [n, d] (zero rows -> zero direction)
    # Outer products for the normal matrix, flattened for one-hot matmuls.
    outer = (xhat[:, :, None] * xhat[:, None, :]).reshape(n, d * d)
    bvec = data + (eta - 1.0) * xnorm[:, None] * xhat  # [n, d]

    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centroids0 = jnp.take(data, init_idx, axis=0)
    key, loop_key = jax.random.split(key)

    eye = jnp.eye(d, dtype=jnp.float32)

    def body(state):
        centroids, kk, it, _ = state
        kk, reseed_key = jax.random.split(kk)
        scores = _aniso_scores(data, xx, xnorm, centroids, eta)
        codes = jnp.argmin(scores, axis=-1)
        onehot = jax.nn.one_hot(codes, k, dtype=jnp.float32)  # [n, k]
        counts = jnp.sum(onehot, axis=0)  # [k]
        # Normal matrix per cluster: N I + (eta-1) sum xhat xhat^T.
        A = jax.lax.dot_general(
            onehot, outer, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(k, d, d)
        A = counts[:, None, None] * eye[None] + (eta - 1.0) * A
        b = jax.lax.dot_general(
            onehot, bvec, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [k, d]
        A = A + ridge * eye[None]
        new_c = jax.vmap(
            lambda Ai, bi: jax.scipy.linalg.solve(Ai, bi, assume_a="pos")
        )(A, b)
        nonempty = counts > 0
        reseed_idx = jax.random.randint(reseed_key, (k,), 0, n)
        reseeded = jnp.take(data, reseed_idx, axis=0)
        new_c = jnp.where(nonempty[:, None], new_c, reseeded)
        changed = jnp.any(jnp.abs(new_c - centroids) >= 1e-6)
        return new_c, kk, it + 1, changed

    def cond(state):
        _, _, it, changed = state
        return jnp.logical_and(it < max_iters, changed)

    centroids, _, iterations, changed = jax.lax.while_loop(
        cond, body, (centroids0, loop_key, jnp.int32(0), jnp.bool_(True))
    )
    scores = _aniso_scores(data, xx, xnorm, centroids, eta)
    codes = jnp.argmin(scores, axis=-1).astype(jnp.int32)
    loss = jnp.sum(jnp.min(scores, axis=-1))
    return centroids, codes, loss, iterations, jnp.logical_not(changed)


def lloyd_anisotropic(
    data,
    k: int,
    max_iters: int = 10,
    seed: int = 0,
    *,
    eta: Optional[float] = None,
    threshold: float = 0.2,
    key: Optional[jnp.ndarray] = None,
    ridge: float = 1e-6,
) -> KMeansResult:
    """Score-aware k-means: better MIPS recall at the same codebook size.

    ``eta`` weights parallel (score-direction) error; pass it directly or
    derive it from a score ``threshold`` via :func:`anisotropic_eta`
    (default T=0.2). ``eta=1`` reduces exactly to plain Lloyd's objective.
    Returns a :class:`KMeansResult` whose ``inertia`` is the anisotropic
    loss.
    """
    data = check_training_matrix(data)
    n, d = data.shape
    k = int(k)
    _validate_kmeans_args(n, k, int(max_iters))
    if eta is None:
        eta = anisotropic_eta(threshold, d)
    eta = float(eta)
    if eta < 1.0:
        raise InvalidParameter("eta", "must be >= 1 (1 = plain L2)")
    if key is None:
        key = jax.random.PRNGKey(int(seed))
    centroids, codes, loss, iters, conv = _lloyd_aniso_jit(
        data, key, k, int(max_iters), jnp.float32(eta), jnp.float32(ridge)
    )
    return KMeansResult(centroids, codes, loss, iters, conv)
