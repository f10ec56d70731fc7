"""Sharded input pipeline — build global arrays without gathering them.

SURVEY.md §7.3: the 100M x 1536 north-star corpus is 600 GB — it must never
exist on one host. These helpers construct globally-sharded `jax.Array`s
where each device (or host) materializes only its own shard:

* :func:`sharded_synthetic_corpus` — seeded uniform corpus, generated
  per-shard from `fold_in(seed, shard_row_start)` so the global content is
  independent of the mesh layout (the same (n, d, seed) yields the same
  logical corpus on 1 device or 64).
* :func:`sharded_from_callback` — the general form: any row-range loader
  (mmap slice, file shard, DB cursor) becomes a sharded global array.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vq_tpu.errors import InvalidParameter
from vq_tpu.parallel.mesh import DATA_AXIS, make_mesh

__all__ = ["sharded_synthetic_corpus", "sharded_from_callback"]


def sharded_from_callback(
    n: int,
    d: int,
    load_rows: Callable[[int, int], np.ndarray],
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """Build an ``[n, d]`` global array sharded over the mesh's data axis.

    ``load_rows(start, stop)`` returns host rows ``[start:stop]`` as an
    ``[stop-start, d]`` f32 ndarray; it is called once per local shard, so a
    host only ever touches its own slice of the corpus.
    """
    if mesh is None:
        mesh = make_mesh()
    shards = mesh.shape[DATA_AXIS]
    if n % shards != 0:
        raise InvalidParameter(
            "n", f"({n}) must divide evenly over {shards} data shards"
        )
    sharding = NamedSharding(mesh, P(DATA_AXIS, None))

    def cb(index) -> np.ndarray:
        rows = index[0]
        start = rows.start or 0
        stop = rows.stop if rows.stop is not None else n
        out = np.asarray(load_rows(start, stop), dtype=np.float32)
        if out.shape != (stop - start, d):
            raise InvalidParameter(
                "load_rows",
                f"returned {out.shape}, expected {(stop - start, d)}",
            )
        return out

    return jax.make_array_from_callback((n, d), sharding, cb)


def sharded_synthetic_corpus(
    n: int,
    d: int,
    seed: int = 0,
    mesh: Optional[Mesh] = None,
    chunk_rows: int = 16384,
) -> jax.Array:
    """Seeded uniform[0,1) corpus, per-shard generation, layout-independent.

    Row block ``[r0, r0+chunk)`` is always generated from
    ``default_rng((seed, r0 // chunk_rows))``, so the logical corpus depends
    only on ``(n, d, seed)`` — resharding or changing the mesh never changes
    the data (chunks are aligned to ``chunk_rows``; shard boundaries fall on
    row numbers, which indexes into the right chunk deterministically).
    """

    def load_rows(start: int, stop: int) -> np.ndarray:
        out = np.empty((stop - start, d), dtype=np.float32)
        pos = start
        while pos < stop:
            chunk_id = pos // chunk_rows
            c0 = chunk_id * chunk_rows
            c1 = min(c0 + chunk_rows, n)
            rng = np.random.default_rng((seed, chunk_id))
            chunk = rng.random((c1 - c0, d), dtype=np.float32)
            take0 = pos - c0
            take1 = min(stop, c1) - c0
            out[pos - start : pos - start + (take1 - take0)] = chunk[take0:take1]
            pos += take1 - take0
        return out

    return sharded_from_callback(n, d, load_rows, mesh)
