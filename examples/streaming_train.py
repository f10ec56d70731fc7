"""Streaming mini-batch k-means: train on data that never fits in memory.

Simulates an unbounded embedding stream (a generator of [batch, d] blocks)
and trains a codebook online with per-center learning-rate decay
(Sculley-style web-scale k-means). Compare the final inertia against full
Lloyd's on the same (materialized) data.

This is the toy-scale tour; the full ladder:

* PQ streaming (all subspaces per step): ``pq_minibatch_update``
  scanned over generated blocks — `benchmarks/stream_100M.py` trains
  PQ 16x256 over 100M x 1536 at ~6.1M rows/s sustained with mid-run
  kill + checkpoint resume (the corpus never exists anywhere).
* Multi-host: ``vq_tpu.parallel.sharded_pq_minibatch_update`` shards
  each batch over a device mesh with a codebook-sized psum per step
  (docs/distributed.md "Streaming across hosts").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from vq_tpu import lloyd, lloyd_minibatch  # noqa: E402
from vq_tpu.ops.kmeans_stream import kmeans_plusplus_init  # noqa: E402


def embedding_stream(n_batches: int, batch: int, d: int, seed: int):
    """A stand-in for reading shards off disk / a message queue."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 2.0, (32, d)).astype(np.float32)
    for _ in range(n_batches):
        which = rng.integers(0, len(centers), batch)
        yield (centers[which] + rng.normal(0, 0.2, (batch, d))).astype(
            np.float32
        )


def main() -> None:
    d, k = 64, 32
    batches = list(embedding_stream(n_batches=50, batch=2048, d=d, seed=7))

    # Streamed: k-means++ seeds from the first batch, then one pass.
    init = kmeans_plusplus_init(batches[0], k, np.random.default_rng(0))
    res_stream = lloyd_minibatch(iter(batches), k, init=init)
    print(f"streamed:  {int(res_stream.iterations)} mini-batch steps")

    # Reference: full Lloyd's on the materialized corpus.
    corpus = np.concatenate(batches)
    res_full = lloyd(corpus, k, max_iters=20, seed=0)

    # Evaluate both codebooks on the full corpus.
    from vq_tpu.ops.kmeans import assign

    _, d_stream = assign(corpus, np.asarray(res_stream.centroids))
    _, d_full = assign(corpus, np.asarray(res_full.centroids))
    print(f"inertia — streamed: {float(np.sum(np.asarray(d_stream))):.1f}, "
          f"full Lloyd's: {float(np.sum(np.asarray(d_full))):.1f}")


if __name__ == "__main__":
    main()
