"""Host-stepped Lloyd's k-means: observable, checkpointable, resumable.

``lloyd`` (vq_tpu/ops/kmeans.py) runs the whole optimization inside one jitted
``while_loop`` — fastest, but opaque. ``lloyd_stepped`` runs the same
per-iteration dataflow (identical jitted assign+accumulate; identical update
rule, reference semantics per src/core/vector.rs:437-453) with the loop on the
host, which buys the three capabilities SURVEY.md §5 requires:

* **Metrics**: per-iteration inertia, cluster occupancy, reseed count,
  max centroid movement, and step wall-time to a :class:`MetricsLogger`.
* **Checkpointing**: optional per-iteration ``KMeansCheckpoint`` writes —
  resumable training for long multi-host runs (failure recovery = reload
  the last checkpoint and continue).
* **Profiler legibility**: each phase is wrapped in a TraceAnnotation.

The jitted-loop and stepped paths share the update math; given the same key
stream they produce the same trajectory.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp

from vq_tpu.errors import InvalidParameter
from vq_tpu.models.base import check_training_matrix
from vq_tpu.ops.kmeans import (
    CONVERGENCE_EPS,
    KMeansResult,
    _accumulate_dispatch,
    _assign_codes,
    _validate_kmeans_args,
    default_block_rows,
)
from vq_tpu.utils.metrics import MetricsLogger, trace

__all__ = ["lloyd_stepped"]


@functools.partial(jax.jit, static_argnames=("k",))
def _update_step(sums, counts, centroids, data, reseed_key, eps, k: int):
    """One centroid update with empty-cluster reseeding (jitted)."""
    n = data.shape[0]
    nonempty = counts > 0
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    reseed_idx = jax.random.randint(reseed_key, (k,), 0, n)
    reseeded = jnp.take(data, reseed_idx, axis=0)
    new_c = jnp.where(nonempty[:, None], means, reseeded)
    movement = jnp.max(jnp.abs(new_c - centroids), axis=-1)  # [k]
    moved = jnp.any(jnp.abs(new_c - centroids) >= eps, axis=-1)
    changed = jnp.any(jnp.where(nonempty, moved, True))
    return new_c, changed, movement, jnp.sum(~nonempty)


def lloyd_stepped(
    data,
    k: int,
    max_iters: int = 10,
    seed: int = 0,
    *,
    eps: float = CONVERGENCE_EPS,
    block_rows: Optional[int] = None,
    logger: Optional[MetricsLogger] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    resume_from: Optional[str] = None,
) -> KMeansResult:
    """Lloyd's k-means with per-iteration observability and checkpointing.

    Same contract as :func:`vq_tpu.ops.kmeans.lloyd`, plus:

    * ``logger`` — receives one ``kmeans_iter`` event per iteration.
    * ``checkpoint_path`` — write a resumable checkpoint every
      ``checkpoint_every`` iterations.
    * ``resume_from`` — continue a previous run from its checkpoint file.
    """
    from vq_tpu.utils.serialize import (
        KMeansCheckpoint,
        load_kmeans_state,
        save_kmeans_state,
    )

    data = check_training_matrix(data)
    n, d = data.shape
    k = int(k)
    max_iters = int(max_iters)
    _validate_kmeans_args(n, k, max_iters)
    if block_rows is None:
        block_rows = default_block_rows(n, k, d)
    use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        block_rows = min(int(block_rows), 1024)

    key = jax.random.PRNGKey(int(seed))
    start_iter = 0
    if resume_from is not None:
        st = load_kmeans_state(resume_from)
        if st.centroids.shape != (k, d):
            raise InvalidParameter(
                "resume_from",
                f"checkpoint centroids {st.centroids.shape} != ({k}, {d})",
            )
        centroids = jnp.asarray(st.centroids)
        start_iter = st.iteration
        # Fast-forward the key stream so the resumed run continues the same
        # reseed trajectory it would have had uninterrupted.
        key, _ = jax.random.split(key)  # past the init consumption
        for _ in range(start_iter):
            key, _ = jax.random.split(key)
    else:
        init_idx = jax.random.choice(key, n, (k,), replace=False)
        centroids = jnp.take(data, init_idx, axis=0)
        key, _ = jax.random.split(key)

    changed = True
    it = start_iter
    while it < max_iters and changed:
        t0 = time.perf_counter()
        key, reseed_key = jax.random.split(key)
        with trace("vq_tpu.lloyd.assign_accumulate"):
            sums, counts, inertia = _accumulate_dispatch(
                data, centroids, block_rows, use_pallas
            )
        with trace("vq_tpu.lloyd.update"):
            centroids, changed_dev, movement, n_empty = _update_step(
                sums, counts, centroids, data, reseed_key, float(eps), k
            )
        changed = bool(changed_dev)
        it += 1
        if logger is not None:
            c = jax.device_get(counts)
            logger.log(
                "kmeans_iter",
                iteration=it,
                inertia=float(inertia),
                occupancy_min=int(c.min()),
                occupancy_max=int(c.max()),
                empty_reseeded=int(n_empty),
                max_movement=float(jnp.max(movement)),
                step_s=round(time.perf_counter() - t0, 6),
            )
        if checkpoint_path is not None and it % max(1, checkpoint_every) == 0:
            save_kmeans_state(
                checkpoint_path,
                KMeansCheckpoint(centroids=centroids, iteration=it, seed=seed),
            )

    with trace("vq_tpu.lloyd.final_assign"):
        assignments, sq_dists = _assign_codes(data, centroids, block_rows)
    return KMeansResult(
        centroids=centroids,
        assignments=assignments,
        inertia=jnp.sum(sq_dists),
        iterations=jnp.int32(it),
        converged=jnp.logical_not(jnp.bool_(changed)),
    )
