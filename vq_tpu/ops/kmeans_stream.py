"""Streaming / mini-batch k-means — corpora larger than device memory.

The reference lists "streaming support" as an unimplemented roadmap item
(reference ROADMAP.md §3); vq_tpu implements it as mini-batch k-means
(Sculley 2010, web-scale k-means): each step assigns one mini-batch with the
same fused distance+argmin dataflow as full Lloyd's and moves only the
touched centroids with per-center learning rates ``1 / count_so_far`` — the
online-mean update. Converges to within a small factor of full Lloyd's
inertia at a fraction of the passes, and the batch never exceeds device
memory.

The update step is one jitted function; the batch loop is host-side so data
can stream from any source (generator, mmap, sharded files).
"""

from __future__ import annotations

import functools
from typing import Iterable, Iterator, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.errors import EmptyInput, InvalidParameter
from vq_tpu.ops.kmeans import KMeansResult, _assign_codes, default_block_rows

__all__ = [
    "lloyd_minibatch",
    "minibatch_update",
    "pq_minibatch_update",
    "kmeans_plusplus_init",
]


def kmeans_plusplus_init(
    data: np.ndarray, k: int, rng: np.random.Generator, sample: int = 100_000
) -> np.ndarray:
    """k-means++ seeding (Arthur & Vassilvitskii 2007) on a subsample.

    D²-weighted sequential selection: each next seed is drawn with
    probability proportional to its squared distance to the nearest seed so
    far. Mini-batch k-means has no empty-cluster reseeding, so good seeding
    is what guarantees every mode gets a centroid — the full-Lloyd path
    (vq_tpu.ops.kmeans) recovers from bad seeds via reseeding instead.
    """
    n = data.shape[0]
    if n > sample:
        data = data[rng.choice(n, size=sample, replace=False)]
        n = sample
    seeds = np.empty((k, data.shape[1]), dtype=np.float32)
    seeds[0] = data[rng.integers(n)]
    d2 = np.sum((data - seeds[0]) ** 2, axis=1)
    for i in range(1, k):
        total = float(d2.sum())
        if total <= 0:  # all points identical to a seed
            seeds[i:] = data[rng.integers(n, size=k - i)]
            break
        seeds[i] = data[rng.choice(n, p=d2 / total)]
        d2 = np.minimum(d2, np.sum((data - seeds[i]) ** 2, axis=1))
    return seeds


@functools.partial(jax.jit, static_argnames=("k",))
def minibatch_update(centroids, counts, batch, k: int):
    """One mini-batch step: assign ``batch`` and move touched centroids.

    ``centroids``: [k, d]; ``counts``: [k] f32 running per-center counts;
    ``batch``: [b, d]. Returns (new_centroids, new_counts, batch_inertia).
    The per-center learning rate is ``m_c / (counts_c + m_c)`` where ``m_c``
    is the batch mass of center c — the exact online mean.
    """
    cc = jnp.sum(centroids * centroids, axis=-1)
    xc = jax.lax.dot_general(
        batch, centroids, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    scores = cc[None, :] - 2.0 * xc
    codes = jnp.argmin(scores, axis=-1)
    xx = jnp.sum(batch * batch, axis=-1)
    inertia = jnp.sum(jnp.maximum(jnp.min(scores, axis=-1) + xx, 0.0))

    onehot = jax.nn.one_hot(codes, k, dtype=jnp.float32)  # [b, k]
    batch_mass = jnp.sum(onehot, axis=0)  # [k]
    batch_sum = jax.lax.dot_general(
        onehot, batch, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # [k, d]
    new_counts = counts + batch_mass
    # Online mean: c <- c + (batch_mean_c - c) * batch_mass / new_count.
    safe_mass = jnp.maximum(batch_mass, 1.0)
    batch_mean = batch_sum / safe_mass[:, None]
    rate = jnp.where(new_counts > 0, batch_mass / jnp.maximum(new_counts, 1.0), 0.0)
    new_centroids = centroids + (batch_mean - centroids) * rate[:, None]
    return new_centroids, new_counts, inertia


def pq_minibatch_update(centroids, counts, batch):
    """One mini-batch step over ALL PQ subspaces at once.

    ``centroids``: ``[m, k, s]``; ``counts``: ``[m, k]`` running
    per-center masses; ``batch``: ``[b, m*s]``. Returns
    ``(new_centroids, new_counts, inertia [m])`` — a vmap of
    :func:`minibatch_update` over the subspace axis, so semantics (exact
    online-mean learning rate, squared-L2 assignment) are identical per
    subspace. Fully traceable: the 100M-scale streaming harness
    (benchmarks/stream_100M.py) runs it inside a ``lax.scan`` over
    on-device-generated blocks, one dispatch per superblock — nothing
    corpus-sized ever exists, on host or device (SURVEY §7.3 "multi-host
    input pipeline"; BASELINE configs[4]).
    """
    m, k, s = centroids.shape
    if batch.ndim != 2 or batch.shape[1] != m * s:
        raise InvalidParameter(
            "batch", f"expected [b, {m * s}] rows, got {batch.shape}"
        )
    xb = jnp.asarray(batch, jnp.float32).reshape(
        batch.shape[0], m, s
    ).transpose(1, 0, 2)  # [m, b, s]
    return jax.vmap(
        lambda c, ct, x: minibatch_update(c, ct, x, int(k))
    )(jnp.asarray(centroids, jnp.float32), jnp.asarray(counts, jnp.float32), xb)


def lloyd_minibatch(
    data: Union[np.ndarray, Iterable],
    k: int,
    batch_size: int = 8192,
    epochs: int = 1,
    seed: int = 0,
    *,
    init: Optional[np.ndarray] = None,
    shuffle: bool = True,
) -> KMeansResult:
    """Mini-batch k-means over an array or an iterable of batches.

    ``data`` may be a ``[n, d]`` array (sliced into mini-batches, optionally
    shuffled per epoch) or any iterable yielding ``[b, d]`` arrays (streamed;
    ``epochs`` must be 1 and ``init`` must be given, since a stream can't be
    sampled for initialization). Array input defaults to k-means++ seeding
    (:func:`kmeans_plusplus_init`) — online updates can't recover an
    uncovered mode, so seeding quality matters more than in full Lloyd's.
    """
    k = int(k)
    if k <= 0:
        raise InvalidParameter("k", "must be greater than 0")

    rng = np.random.default_rng(int(seed))

    if isinstance(data, (np.ndarray, jnp.ndarray)):
        arr = np.asarray(data, dtype=np.float32)
        if arr.ndim != 2 or arr.shape[0] == 0:
            raise EmptyInput("training data must not be empty")
        n = arr.shape[0]
        if n < k:
            raise InvalidParameter(
                "k", f"not enough data points ({n}) for {k} clusters"
            )
        if init is None:
            init = kmeans_plusplus_init(arr, k, rng)

        def batches() -> Iterator[np.ndarray]:
            for _ in range(int(epochs)):
                order = rng.permutation(n) if shuffle else np.arange(n)
                for lo in range(0, n, int(batch_size)):
                    yield arr[order[lo : lo + int(batch_size)]]

        stream = batches()
        final_data = arr
    else:
        if init is None:
            raise InvalidParameter(
                "init", "streamed input requires explicit initial centroids"
            )
        if int(epochs) != 1:
            raise InvalidParameter("epochs", "streamed input supports 1 epoch")
        stream = iter(data)
        final_data = None

    centroids = jnp.asarray(init, jnp.float32)
    if centroids.shape[0] != k:
        raise InvalidParameter("init", f"expected {k} initial centroids")
    counts = jnp.zeros((k,), jnp.float32)
    steps = 0
    inertia = jnp.float32(0.0)
    for batch in stream:
        batch = jnp.asarray(batch, jnp.float32)
        if batch.shape[0] == 0:
            continue
        centroids, counts, inertia = minibatch_update(centroids, counts, batch, k)
        steps += 1
    if steps == 0:
        raise EmptyInput("training stream produced no batches")

    if final_data is not None:
        block = default_block_rows(final_data.shape[0], k, final_data.shape[1])
        assignments, sq = _assign_codes(
            jnp.asarray(final_data), centroids, block
        )
        inertia = jnp.sum(sq)
    else:
        assignments = jnp.zeros((0,), jnp.int32)

    return KMeansResult(
        centroids=centroids,
        assignments=assignments,
        inertia=inertia,
        iterations=jnp.int32(steps),
        converged=jnp.bool_(False),
    )
