"""Parity + recall benchmark over the north-star configs (BASELINE.json).

Runs scaled-down versions of the five benchmark configurations and reports,
per config, throughput plus the *quality* metrics the north star requires
parity on: reconstruction MSE and recall@10 against exact brute-force
search. Where the native C++ oracle is available, PQ codes are also checked
for exact agreement with the CPU reference implementation.

Usage:
    python benchmarks/parity.py [--n 100000] [--queries 200] [--output -]

Each config prints one JSON line. Data is a seeded Gaussian-mixture corpus
(clustered like real embedding/SIFT data — uniform noise would make recall
meaningless).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Runnable as `python benchmarks/parity.py` from the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_clustered(n: int, d: int, n_clusters: int, seed: int) -> np.ndarray:
    """Gaussian-mixture corpus: SIFT/embedding-like local structure."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.0, (n_clusters, d)).astype(np.float32)
    which = rng.integers(0, n_clusters, n)
    return (
        centers[which] + rng.normal(0, 0.35, (n, d)).astype(np.float32)
    ).astype(np.float32)


def exact_topk(queries: np.ndarray, corpus: np.ndarray, k: int) -> np.ndarray:
    """Brute-force L2 ground truth (numpy, f64 accumulate)."""
    out = np.empty((len(queries), k), dtype=np.int64)
    for i, q in enumerate(queries):
        d2 = np.sum((corpus - q) ** 2, axis=1, dtype=np.float64)
        out[i] = np.argpartition(d2, k)[:k]
    return out


def recall_at_k(retrieved: np.ndarray, truth: np.ndarray) -> float:
    k = truth.shape[1]
    return float(
        np.mean(
            [len(set(r[:k]) & set(t)) / k for r, t in zip(retrieved, truth)]
        )
    )


def bench_sq(data, emit):
    import vq_tpu

    t0 = time.perf_counter()
    q = vq_tpu.ScalarQuantizer(float(data.min()), float(data.max()), 256)
    codes = np.asarray(q.quantize(data))
    dt = time.perf_counter() - t0
    recon = np.asarray(q.dequantize(codes))
    emit(
        config="sq_int8",
        n=len(data),
        dim=data.shape[1],
        encode_s=round(dt, 4),
        mse=float(np.mean((data - recon) ** 2)),
    )


def bench_bq(data, queries, truth, emit):
    import vq_tpu

    med = float(np.median(data))
    q = vq_tpu.BinaryQuantizer(med)
    t0 = time.perf_counter()
    packed = np.asarray(q.quantize_packed(data))
    dt = time.perf_counter() - t0
    qp = np.asarray(q.quantize_packed(queries))
    # Hamming search in the packed domain (the 32x-compressed index).
    ham = np.asarray(vq_tpu.hamming_distance(qp, packed))
    retrieved = np.argpartition(ham, 10, axis=1)[:, :10]
    emit(
        config="bq_sign_pack_hamming",
        n=len(data),
        dim=data.shape[1],
        pack_s=round(dt, 4),
        bytes_per_vector=int(packed.shape[1] * 4),
        recall_at_10=recall_at_k(retrieved, truth),
    )


def bench_pq(data, queries, truth, metric, emit):
    import vq_tpu

    t0 = time.perf_counter()
    pq = vq_tpu.ProductQuantizer(
        data, num_subspaces=8, num_centroids=256, max_iters=10,
        distance=metric, seed=66,
    )
    np.asarray(pq.codebooks)
    train_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    codes = np.asarray(pq.encode(data))
    encode_s = time.perf_counter() - t0
    recon = np.asarray(pq.decode(codes))
    idx, _ = pq.adc_search(queries, codes, k=10)
    rec = recall_at_k(np.asarray(idx), truth)

    # Exact-code parity vs the native CPU oracle (same argmin semantics).
    parity = None
    try:
        from vq_tpu import native

        if native.available() and metric == "euclidean":
            sample = data[:2000]
            ref_codes = native.pq_encode(sample, np.asarray(pq.codebooks))
            parity = float((ref_codes == codes[:2000]).mean())
    except Exception:
        pass

    emit(
        config=f"pq_8x256_{metric}",
        n=len(data),
        dim=data.shape[1],
        train_s=round(train_s, 4),
        encode_s=round(encode_s, 4),
        mse=float(np.mean((data - recon) ** 2)),
        recall_at_10=rec,
        cpu_code_parity=parity,
    )


def bench_tsvq(data, emit):
    import vq_tpu

    t0 = time.perf_counter()
    q = vq_tpu.TSVQ(data, max_depth=8)
    train_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    codes = np.asarray(q.encode(data))
    encode_s = time.perf_counter() - t0
    recon = np.asarray(q.decode(codes))
    emit(
        config="tsvq_depth8",
        n=len(data),
        dim=data.shape[1],
        train_s=round(train_s, 4),
        encode_s=round(encode_s, 4),
        leaves=q.num_leaves,
        mse=float(np.mean((data - recon) ** 2)),
    )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--queries", type=int, default=200)
    p.add_argument("--seed", type=int, default=66)
    p.add_argument("--output", type=str, default="-")
    args = p.parse_args(argv)

    out = sys.stdout if args.output == "-" else open(args.output, "w")

    def emit(**fields):
        out.write(json.dumps(fields) + "\n")
        out.flush()

    # Config 1-3 data: SIFT-like 128-d clustered corpus.
    data128 = make_clustered(args.n, 128, 1000, args.seed)
    rng = np.random.default_rng(args.seed + 1)
    q_idx = rng.choice(args.n, args.queries, replace=False)
    queries = data128[q_idx] + rng.normal(0, 0.05, (args.queries, 128)).astype(
        np.float32
    )
    truth = exact_topk(queries, data128, 10)

    bench_sq(data128, emit)
    bench_bq(data128, queries, truth, emit)
    bench_pq(data128, queries, truth, "euclidean", emit)
    bench_pq(data128, queries, truth, "cosine", emit)

    # Config 4: GIST-like 960-d corpus, smaller n (tree build is host-side).
    data960 = make_clustered(min(args.n, 50_000), 960, 200, args.seed + 2)
    bench_tsvq(data960, emit)

    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
