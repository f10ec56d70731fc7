"""Vector-search demo: the three index types over one embedding corpus.

Builds a flat PQ index, a binary Hamming index, and an IVF-PQ index over
the same clustered corpus, then compares recall@10 vs exact brute force
and bytes/vector. Runs on whatever backend JAX finds.

    python examples/search_demo.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vq_tpu import BinaryIndex, PQIndex, ProductQuantizer
    from vq_tpu.ivf import IVFPQIndex
    from vq_tpu.ops.distance import pairwise

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d, n_queries = 128, 100

    rng = np.random.default_rng(66)
    centers = rng.normal(0, 1.0, (256, d)).astype(np.float32)
    which = rng.integers(0, 256, n)
    corpus = (centers[which] + rng.normal(0, 0.3, (n, d))).astype(np.float32)
    queries = corpus[rng.choice(n, n_queries, replace=False)] + rng.normal(
        0, 0.05, (n_queries, d)
    ).astype(np.float32)

    # Exact ground truth (on device).
    dmat = pairwise(queries, corpus, "squared_euclidean")
    _, truth = jax.lax.top_k(-dmat, 10)
    truth = np.asarray(truth)

    def recall(ids):
        ids = np.asarray(ids)
        return float(np.mean([
            len(set(r.tolist()) & set(t.tolist())) / 10
            for r, t in zip(ids, truth)
        ]))

    rows = []

    pq = ProductQuantizer(corpus, num_subspaces=8, num_centroids=256)
    flat = PQIndex(pq, keep_corpus=True)
    flat.add(corpus)
    t0 = time.perf_counter()
    ids, _ = flat.search(queries, k=10)
    t_adc = time.perf_counter() - t0
    ids_rr, _ = flat.search(queries, k=10, rerank=500)
    rows.append(("PQIndex (ADC)", flat.code_bytes_per_vector, recall(ids), t_adc))
    rows.append(("PQIndex (+rerank 500)", flat.code_bytes_per_vector, recall(ids_rr), None))

    bidx = BinaryIndex(dim=d, threshold=float(np.median(corpus)), keep_corpus=True)
    bidx.add(corpus)
    ids_b, _ = bidx.search(queries, k=10)
    ids_brr, _ = bidx.search(queries, k=10, rerank=500)
    rows.append(("BinaryIndex (Hamming)", d // 8, recall(ids_b), None))
    rows.append(("BinaryIndex (+rerank 500)", d // 8, recall(ids_brr), None))

    ivf = IVFPQIndex.train(
        corpus[:50_000], nlist=256, num_subspaces=8, num_centroids=256,
        keep_corpus=True,
    )
    ivf.add(corpus)
    ids_i, _ = ivf.search(queries, k=10, nprobe=16)
    ids_irr, _ = ivf.search(queries, k=10, nprobe=16, rerank=500)
    rows.append(("IVFPQIndex (nprobe=16)", 8, recall(ids_i), None))
    rows.append(("IVFPQIndex (+rerank 500)", 8, recall(ids_irr), None))

    # Rebalance: split any skew-inflated lists (probe cost tracks the
    # LARGEST list) and re-search — recall holds, padded cap shrinks.
    before = ivf.bucket_stats()["cap"]
    ivf.rebalance(target_max=2 * n // 256)
    ids_rb, _ = ivf.search(queries, k=10, nprobe=16)
    rows.append((
        f"IVFPQIndex (rebalanced, cap {before}->"
        f"{ivf.bucket_stats()['cap']})", 8, recall(ids_rb), None,
    ))

    print(f"corpus: {n} x {d}, {n_queries} queries, exact 10-NN ground truth")
    print(f"{'index':<28} {'bytes/vec':>9} {'recall@10':>10}")
    for name, bpv, r, _t in rows:
        print(f"{name:<28} {bpv:>9} {r:>10.3f}")


if __name__ == "__main__":
    main()
