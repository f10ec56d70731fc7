"""Multi-host STREAMING PQ training: sharded mini-batch updates.

Completes the config-5 story (BASELINE configs[4]) across hosts: the
single-chip streaming harness (benchmarks/stream_100M.py,
:func:`vq_tpu.ops.kmeans_stream.pq_minibatch_update`) scales to a mesh
by sharding each incoming batch over the data axis — every device
accumulates its shard's per-center ``(mass [m, k], sum [m, k, s],
inertia)``, the accumulators psum-merge over ``DATA_AXIS`` (the same
``m·k·(s+1)·4``-byte payload as one full-Lloyd iteration —
docs/distributed.md communication model), and the exact online-mean
update applies replicated. The result is numerically the single-device
:func:`pq_minibatch_update` on the concatenated global batch, up to f32
reduction order.

The reference has no streaming or distributed training at all
(reference ROADMAP.md §3 unimplemented; SURVEY.md §2.3 — its only
parallelism is a Rayon thread pool).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vq_tpu.errors import InvalidParameter
from vq_tpu.parallel.mesh import DATA_AXIS, make_mesh

__all__ = ["sharded_pq_minibatch_update"]


def _local_stats(cents, xs):
    """Per-subspace shard stats: (mass [k], sum [k, s], inertia [])."""
    k = cents.shape[0]
    cc = jnp.sum(cents * cents, axis=-1)
    xc = jax.lax.dot_general(
        xs, cents, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    scores = cc[None, :] - 2.0 * xc
    codes = jnp.argmin(scores, axis=-1)
    xx = jnp.sum(xs * xs, axis=-1)
    inertia = jnp.sum(jnp.maximum(jnp.min(scores, axis=-1) + xx, 0.0))
    onehot = jax.nn.one_hot(codes, k, dtype=jnp.float32)
    mass = jnp.sum(onehot, axis=0)
    bsum = jax.lax.dot_general(
        onehot, xs, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return mass, bsum, inertia


def sharded_pq_minibatch_update(
    centroids, counts, batch, mesh: Optional[Mesh] = None,
    overlap: bool = True,
):
    """One streaming mini-batch step with ``batch`` sharded over the mesh.

    ``centroids [m, k, s]`` / ``counts [m, k]`` replicated,
    ``batch [b, m*s]`` row-sharded (``b`` must divide the data-axis
    size). Returns replicated ``(centroids', counts', inertia [m])`` —
    the same contract as
    :func:`vq_tpu.ops.kmeans_stream.pq_minibatch_update` on the whole
    batch (exact online-mean learning rate; f32 reduction order is the
    only difference). Chain it over generated/loaded block shards
    (:func:`vq_tpu.parallel.sharded_from_callback`) for corpora that
    never exist on one host.

    ``overlap`` (default on — the north star's collective/compute
    overlap requirement, same split as the sharded Lloyd accumulate in
    :mod:`vq_tpu.parallel.kmeans`): the local shard is swept in two
    halves and the first half's accumulator ``psum`` is issued before
    the second half's distance matmuls, which have no data dependence on
    it — XLA's latency-hiding scheduler can run the codebook-sized
    all-reduce under the second half's compute. Counts are exactly equal
    either way (whole numbers below 2^24); centroid sums differ only in
    f32 summation order.
    """
    if mesh is None:
        mesh = make_mesh()
    centroids = jnp.asarray(centroids, jnp.float32)
    counts = jnp.asarray(counts, jnp.float32)
    batch = jnp.asarray(batch, jnp.float32)
    m, k, s = centroids.shape
    if batch.ndim != 2 or batch.shape[0] == 0 or batch.shape[1] != m * s:
        raise InvalidParameter(
            "batch",
            f"expected non-empty [b, {m * s}] rows, got {batch.shape}"
        )
    n_data = mesh.shape[DATA_AXIS]
    if batch.shape[0] % n_data != 0:
        raise InvalidParameter(
            "batch",
            f"rows ({batch.shape[0]}) must be divisible by the "
            f"data-axis size ({n_data})",
        )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS, None)),
        out_specs=(P(), P(), P()),
    )
    def step(cents, cts, xb_local):
        xs = xb_local.reshape(-1, m, s).transpose(1, 0, 2)  # [m, bl, s]
        bl = xs.shape[1]
        half = bl // 2
        if overlap and 0 < half < bl:
            m1, b1, i1 = jax.vmap(_local_stats)(cents, xs[:, :half])
            # First half's all-reduce issues here; the second half's
            # matmuls don't depend on it, so the scheduler overlaps.
            m1 = jax.lax.psum(m1, DATA_AXIS)
            b1 = jax.lax.psum(b1, DATA_AXIS)
            i1 = jax.lax.psum(i1, DATA_AXIS)
            m2, b2, i2 = jax.vmap(_local_stats)(cents, xs[:, half:])
            mass = m1 + jax.lax.psum(m2, DATA_AXIS)  # [m, k]
            bsum = b1 + jax.lax.psum(b2, DATA_AXIS)  # [m, k, s]
            inert = i1 + jax.lax.psum(i2, DATA_AXIS)  # [m]
        else:
            mass, bsum, inert = jax.vmap(_local_stats)(cents, xs)
            mass = jax.lax.psum(mass, DATA_AXIS)  # [m, k]
            bsum = jax.lax.psum(bsum, DATA_AXIS)  # [m, k, s]
            inert = jax.lax.psum(inert, DATA_AXIS)  # [m]
        new_counts = cts + mass
        safe_mass = jnp.maximum(mass, 1.0)
        batch_mean = bsum / safe_mass[..., None]
        rate = jnp.where(
            new_counts > 0, mass / jnp.maximum(new_counts, 1.0), 0.0
        )
        new_cents = cents + (batch_mean - cents) * rate[..., None]
        return new_cents, new_counts, inert

    # Re-placement is a no-op when the batch already carries the target
    # sharding; replicated inputs place once.
    batch = jax.device_put(batch, NamedSharding(mesh, P(DATA_AXIS, None)))
    centroids = jax.device_put(centroids, NamedSharding(mesh, P()))
    counts = jax.device_put(counts, NamedSharding(mesh, P()))
    return step(centroids, counts, batch)
