"""Multi-device sharded k-means / PQ training.

This is the capability BASELINE.json's north star mandates and the reference
lacks entirely (SURVEY.md §2.3): Lloyd's k-means over a corpus sharded along
the vector axis N across a device mesh, with codebooks replicated and the
per-iteration per-cluster ``(sum, count)`` accumulators merged with
``jax.lax.psum``. The communication per iteration is O(m·k·d) — codebook
sized — never the raw vectors, so scaling efficiency is bounded by
``psum([m,k,d]) / compute(n_local · k · d)``, which stays tiny for any
realistic shard size.

Structure:

* ``shard_map`` runs the blockwise assign+accumulate from
  ``vq_tpu.ops.kmeans`` on each device's local rows; ``psum`` over the
  ``"data"`` axis produces the global accumulators on every device.
* The centroid update (mean, empty-cluster reseed, eps-convergence test,
  reference semantics per src/core/vector.rs:437-453) runs replicated —
  identical on every device, so codebooks never need broadcasting.
* PQ's m subspaces are carried as a leading batch axis, optionally sharded
  over the mesh's ``"sub"`` axis (subspaces are independent — zero
  collectives between them). Plain k-means is the ``m == 1`` case.

The inner while_loop masks converged subspace lanes exactly like
``lloyd_batched`` (vq_tpu/ops/kmeans.py) so single-device and sharded paths
produce the same trajectory given the same keys.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vq_tpu.errors import InvalidParameter
from vq_tpu.models.base import check_training_matrix
from vq_tpu.ops.kmeans import CONVERGENCE_EPS, default_block_rows, _validate_kmeans_args
from vq_tpu.parallel.mesh import DATA_AXIS, SUBSPACE_AXIS, make_mesh

__all__ = ["ShardedKMeansResult", "sharded_lloyd", "sharded_pq_train"]


class ShardedKMeansResult(NamedTuple):
    centroids: jnp.ndarray  # [k, d] (sharded_lloyd) or [m, k, d] (pq)
    iterations: jnp.ndarray  # [] or [m] int32
    converged: jnp.ndarray  # [] or [m] bool
    inertia: jnp.ndarray  # [] f32 — global sum of squared assignment dists


def _local_accumulate(
    xs, cb, block_rows, row_offset=0, total_rows=None, ws=None
):
    """Per-device blockwise assign+accumulate over subspace-batched data.

    xs: [n_local, m_l, s]; cb: [m_l, k, s]
    -> sums [m_l, k, s], counts [m_l, k], inertia [].
    ``row_offset``/``total_rows`` let a caller accumulate a slice of the
    local shard (used by the overlapped step) while masking pad rows
    against the true local row count. ``ws [n_local]`` are per-sample
    weights (faiss ``Clustering`` semantics): accumulators become
    Σ w·x / Σ w / Σ w·d²; assignment is unaffected.
    """
    n, m, s = xs.shape
    if total_rows is None:
        total_rows = n
    k = cb.shape[1]
    cc = jnp.sum(cb * cb, axis=-1)  # [m_l, k]
    pad = (-n) % block_rows
    padded = jnp.pad(xs, ((0, pad), (0, 0), (0, 0)))
    tiles = padded.reshape(-1, block_rows, m, s)
    wtiles = (
        None if ws is None
        else jnp.pad(ws, (0, pad)).reshape(-1, block_rows)
    )
    base = jnp.arange(block_rows, dtype=jnp.int32) + row_offset

    def body(carry, inp):
        sums, counts, inertia = carry
        if ws is None:
            tile, bidx = inp  # [B, m_l, s]
            wtile = None
        else:
            tile, bidx, wtile = inp
        valid = (base + bidx * block_rows) < total_rows
        xc = jnp.einsum(
            "bms,mks->bmk", tile, cb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        scores = cc[None] - 2.0 * xc  # [B, m_l, k]
        codes = jnp.argmin(scores, axis=-1)  # [B, m_l]
        xx = jnp.sum(tile * tile, axis=-1)  # [B, m_l]
        mind = jnp.maximum(jnp.min(scores, axis=-1) + xx, 0.0)
        w = valid.astype(jnp.float32)
        if wtile is not None:
            w = w * wtile
        onehot = jax.nn.one_hot(codes, k, dtype=jnp.float32) * w[:, None, None]
        sums = sums + jnp.einsum(
            "bmk,bms->mks", onehot, tile,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        counts = counts + jnp.sum(onehot, axis=0)
        inertia = inertia + jnp.sum(mind * w[:, None])
        return (sums, counts, inertia), None

    # Inits derived from the (device-varying) inputs so the scan carry has
    # matching varying-axis types under shard_map.
    init = (
        jnp.zeros_like(cb),
        jnp.zeros_like(cc),
        jnp.sum(xs[0, 0, :1]) * 0.0,
    )
    xs_scan = (tiles, jnp.arange(tiles.shape[0], dtype=jnp.int32))
    if wtiles is not None:
        xs_scan = xs_scan + (wtiles,)
    (sums, counts, inertia), _ = jax.lax.scan(body, init, xs_scan)
    return sums, counts, inertia


def _make_sharded_step(
    mesh: Mesh, block_rows: int, overlap: bool = True,
    weighted: bool = False,
):
    """shard_map'd global accumulate: data-sharded in, psum-merged out.

    With ``overlap`` (the default, and the north star's collective/compute
    overlap requirement) the local sweep is split in two halves and the
    first half's accumulator ``psum`` is issued *before* the second half's
    compute — the data dependence allows XLA's latency-hiding scheduler to
    run the codebook-sized all-reduce concurrently with the second half's
    distance matmuls, instead of serializing one big psum after all local
    work. Results are identical up to f32 summation order.

    ``weighted`` adds a data-sharded per-sample weight vector (signature
    ``step(xs, ws, cb)``).
    """
    in_specs = (P(DATA_AXIS, SUBSPACE_AXIS, None),)
    if weighted:
        in_specs = in_specs + (P(DATA_AXIS),)
    in_specs = in_specs + (P(SUBSPACE_AXIS, None, None),)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(
            P(SUBSPACE_AXIS, None, None),
            P(SUBSPACE_AXIS, None),
            P(),
        ),
    )
    def step(xs_local, *rest):
        if weighted:
            ws_local, cb_local = rest
        else:
            (cb_local,) = rest
            ws_local = None
        # cb is only sub-sharded; mark it varying over the data axis too so
        # every intermediate (and the scan carry) has one consistent
        # varying-axis type.
        cb_local = jax.lax.pcast(cb_local, (DATA_AXIS,), to="varying")
        n_local = xs_local.shape[0]
        half = ((n_local // 2) // block_rows) * block_rows
        if overlap and 0 < half < n_local:
            s1, c1, i1 = _local_accumulate(
                xs_local[:half], cb_local, block_rows,
                row_offset=0, total_rows=n_local,
                ws=None if ws_local is None else ws_local[:half],
            )
            # psum of the first half's accumulators starts here; the second
            # half's matmuls have no data dependence on it.
            s1 = jax.lax.psum(s1, DATA_AXIS)
            c1 = jax.lax.psum(c1, DATA_AXIS)
            i1 = jax.lax.psum(i1, DATA_AXIS)
            s2, c2, i2 = _local_accumulate(
                xs_local[half:], cb_local, block_rows,
                row_offset=half, total_rows=n_local,
                ws=None if ws_local is None else ws_local[half:],
            )
            sums = s1 + jax.lax.psum(s2, DATA_AXIS)
            counts = c1 + jax.lax.psum(c2, DATA_AXIS)
            inertia = i1 + jax.lax.psum(i2, DATA_AXIS)
        else:
            sums, counts, inertia = _local_accumulate(
                xs_local, cb_local, block_rows, ws=ws_local
            )
            sums = jax.lax.psum(sums, DATA_AXIS)
            counts = jax.lax.psum(counts, DATA_AXIS)
            inertia = jax.lax.psum(inertia, DATA_AXIS)
        return sums, counts, jax.lax.psum(inertia, SUBSPACE_AXIS)

    return step


def _init_codebooks(xs: jnp.ndarray, k: int, base_key) -> jnp.ndarray:
    """Sample k distinct global rows per subspace (reference seeded init,
    src/core/vector.rs:412-413, per-subspace key like src/pq.rs:130)."""
    n, m, s = xs.shape

    def one(i):
        key = jax.random.fold_in(base_key, i)
        idx = jax.random.choice(key, n, (k,), replace=False)
        return jnp.take(xs[:, i, :], idx, axis=0)  # global gather

    return jax.lax.map(one, jnp.arange(m))  # [m, k, s]


@functools.partial(
    jax.jit, static_argnames=("k", "max_iters", "block_rows", "mesh")
)
def _sharded_train_jit(
    xs: jnp.ndarray,  # [n, m, s] global, sharded P(data, sub, None)
    base_key,
    k: int,
    max_iters: int,
    eps: float,
    block_rows: int,
    mesh: Mesh,
    ws: Optional[jnp.ndarray] = None,  # [n] global, sharded P(data)
    cb_init: Optional[jnp.ndarray] = None,  # [m, k, s] warm start
):
    n, m, s = xs.shape
    raw_step = _make_sharded_step(
        mesh, block_rows, weighted=ws is not None
    )
    step = (
        raw_step if ws is None
        else (lambda xs_, cb_: raw_step(xs_, ws, cb_))
    )
    cb0 = _init_codebooks(xs, k, base_key) if cb_init is None else cb_init
    cb0 = jax.lax.with_sharding_constraint(
        cb0, NamedSharding(mesh, P(SUBSPACE_AXIS, None, None))
    )
    _, loop_key = jax.random.split(base_key)

    def body(state):
        cb, key, it, changed = state  # changed: [m] bool
        key, reseed_key = jax.random.split(key)
        sums, counts, _inertia = step(xs, cb)
        nonempty = counts > 0  # [m, k]
        means = sums / jnp.maximum(counts, 1.0)[..., None]
        # Reseed empty clusters from random global rows (per subspace).
        ridx = jax.random.randint(reseed_key, (m, k), 0, n)

        def reseed_one(idx_row, i):
            return jnp.take(xs, idx_row, axis=0)[:, i, :]  # [k, s]

        reseeded = jax.vmap(reseed_one, in_axes=(0, 0))(
            ridx, jnp.arange(m)
        )  # [m, k, s]
        new_cb = jnp.where(nonempty[..., None], means, reseeded)
        moved = jnp.any(jnp.abs(new_cb - cb) >= eps, axis=-1)  # [m, k]
        lane_changed = jnp.any(jnp.where(nonempty, moved, True), axis=-1)  # [m]
        # Freeze lanes that already converged.
        new_cb = jnp.where(changed[:, None, None], new_cb, cb)
        new_it = jnp.where(changed, it + 1, it)
        return (
            new_cb,
            key,
            new_it,
            jnp.logical_and(changed, lane_changed),
        )

    def cond(state):
        _, _, it, changed = state
        return jnp.any(jnp.logical_and(it < max_iters, changed))

    cb, _, iterations, changed = jax.lax.while_loop(
        cond,
        body,
        (cb0, loop_key, jnp.zeros((m,), jnp.int32), jnp.ones((m,), jnp.bool_)),
    )
    _, _, inertia = step(xs, cb)
    return cb, iterations, jnp.logical_not(changed), inertia


def _prepare(data, mesh: Optional[Mesh]):
    data = check_training_matrix(data)
    if mesh is None:
        mesh = make_mesh()
    return data, mesh


def sharded_pq_train(
    data,
    num_subspaces: int,
    num_centroids: int,
    max_iters: int = 10,
    seed: int = 42,
    *,
    mesh: Optional[Mesh] = None,
    eps: float = CONVERGENCE_EPS,
    block_rows: Optional[int] = None,
    weights=None,
    init_codebooks=None,
) -> ShardedKMeansResult:
    """Train PQ codebooks over a corpus sharded across the mesh.

    ``data`` is ``[n, d]`` (host array or already-sharded global array);
    returns codebooks ``[m, k, sub]`` replicated along data, sharded along
    the mesh's subspace axis. Validation matches ``pq_train``.
    ``weights [n]`` are per-sample importances (see
    :func:`vq_tpu.ops.kmeans.lloyd`), sharded with the data rows.
    ``init_codebooks [m, k, sub]`` warm-starts the refinement (the
    sharded analog of ``lloyd(init_centroids=...)``; used by
    :func:`sharded_opq_train`'s alternation).
    """
    data, mesh = _prepare(data, mesh)
    n, dim = data.shape
    m, k = int(num_subspaces), int(num_centroids)
    if m <= 0:
        raise InvalidParameter("num_subspaces", "must be greater than 0")
    if dim % m != 0:
        raise InvalidParameter(
            "num_subspaces", f"dimension ({dim}) must be divisible by m"
        )
    _validate_kmeans_args(n, k, int(max_iters))
    data_shards = mesh.shape[DATA_AXIS]
    sub_shards = mesh.shape[SUBSPACE_AXIS]
    if n % data_shards != 0:
        raise InvalidParameter(
            "data",
            f"corpus rows ({n}) must divide evenly over {data_shards} "
            "data shards (pad the corpus)",
        )
    if m % sub_shards != 0:
        raise InvalidParameter(
            "num_subspaces",
            f"({m}) must divide evenly over {sub_shards} subspace shards",
        )
    sub = dim // m
    xs = jnp.asarray(data, jnp.float32).reshape(n, m, sub)
    xs = jax.device_put(
        xs, NamedSharding(mesh, P(DATA_AXIS, SUBSPACE_AXIS, None))
    )
    from vq_tpu.ops.kmeans import _validate_weights

    ws = _validate_weights(weights, n, k)
    if ws is not None:
        ws = jax.device_put(ws, NamedSharding(mesh, P(DATA_AXIS)))
    if block_rows is None:
        block_rows = default_block_rows(max(1, n // data_shards), k, sub)
    cb_init = None
    if init_codebooks is not None:
        cb_init = jnp.asarray(init_codebooks, jnp.float32)
        if cb_init.shape != (m, k, sub):
            raise InvalidParameter(
                "init_codebooks",
                f"expected [{m}, {k}, {sub}], got {tuple(cb_init.shape)}",
            )
    key = jax.random.PRNGKey(int(seed))
    cb, iterations, converged, inertia = _sharded_train_jit(
        xs, key, k, int(max_iters), float(eps), int(block_rows), mesh,
        ws, cb_init,
    )
    return ShardedKMeansResult(cb, iterations, converged, inertia)


def sharded_lloyd(
    data,
    k: int,
    max_iters: int = 10,
    seed: int = 0,
    *,
    mesh: Optional[Mesh] = None,
    eps: float = CONVERGENCE_EPS,
    block_rows: Optional[int] = None,
    weights=None,
) -> ShardedKMeansResult:
    """Plain sharded k-means: the ``m == 1`` case of :func:`sharded_pq_train`.

    Returns centroids ``[k, d]``.
    """
    res = sharded_pq_train(
        data, 1, k, max_iters=max_iters, seed=seed, mesh=mesh, eps=eps,
        block_rows=block_rows, weights=weights,
    )
    return ShardedKMeansResult(
        res.centroids[0], res.iterations[0], res.converged[0], res.inertia
    )
