"""Multi-device PQ training end to end, with checkpointing and metrics.

Runs on whatever devices JAX finds; to try the multi-chip code path on one
machine, use a virtual mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/distributed_train.py

On a real multi-host slice, run the same script under
``jax.distributed.initialize()`` (one process per host) — the mesh spans
hosts automatically and the corpus is generated shard-locally (no host ever
holds more than its slice).
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from vq_tpu.parallel import (  # noqa: E402
    make_mesh,
    sharded_pq_train,
    sharded_synthetic_corpus,
)
from vq_tpu.utils import KMeansCheckpoint, save_kmeans_state  # noqa: E402


def main() -> None:
    n, d, m, k = 1 << 16, 128, 8, 256
    mesh = make_mesh()
    print(f"mesh: {mesh.shape} over {len(jax.devices())} devices")

    # Corpus generated per shard — layout-independent, never gathered.
    corpus = sharded_synthetic_corpus(n, d, seed=66, mesh=mesh)
    print(f"corpus: {corpus.shape}, shard shape "
          f"{corpus.addressable_shards[0].data.shape}")

    res = sharded_pq_train(corpus, m, k, max_iters=10, seed=42, mesh=mesh)
    print(f"codebooks: {res.centroids.shape}, "
          f"iterations per subspace: {np.asarray(res.iterations).tolist()}, "
          f"inertia: {float(res.inertia):.1f}")

    path = save_kmeans_state(
        "/tmp/pq_codebooks",
        KMeansCheckpoint(
            centroids=res.centroids,
            iteration=int(np.max(np.asarray(res.iterations))),
            seed=42,
        ),
    )
    print(f"checkpoint written: {path}")

    # Build a quantizer straight from the trained codebooks and use it.
    from vq_tpu import ProductQuantizer

    pq = ProductQuantizer(codebooks=np.asarray(res.centroids))
    sample = np.asarray(corpus)[:1000]
    codes = pq.encode(sample)
    recon = np.asarray(pq.decode(codes))
    mse = float(np.mean((sample - recon) ** 2))
    print(f"sample reconstruction MSE: {mse:.6f}")


if __name__ == "__main__":
    main()
