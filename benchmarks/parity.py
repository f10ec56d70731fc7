"""Parity + recall benchmark over the north-star configs (BASELINE.json).

Runs scaled versions of the five benchmark configurations and reports, per
config, device-side throughput plus the *quality* metrics the north star
requires parity on: reconstruction MSE and recall@10 against exact
brute-force search. Where the native C++ oracle is available, PQ codes are
also checked for exact agreement with the CPU reference implementation.

All heavy arithmetic — including the exact ground-truth search — runs on
the accelerator; only scalars and tiny index sets ever transfer to host
(device->host bandwidth through a TPU tunnel can be ~MB/s, which would
otherwise dominate every measurement).

Usage:
    python benchmarks/parity.py [--n 1000000] [--queries 100] [--output -]
    python benchmarks/parity.py --data sift1m.fvecs   # BASELINE configs 2-3
                                                      # on the named dataset

Each config prints one JSON line tagged with its data source. Default data
is a seeded Gaussian-mixture corpus (clustered like real embedding/SIFT
data — uniform noise would make recall meaningless); ``--data`` runs the
real thing (fvecs/bvecs loader: vq_tpu/utils/datasets.py).
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
    """Gaussian-mixture corpus: SIFT/embedding-like local structure (host)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.0, (n_clusters, d)).astype(np.float32)
    which = rng.integers(0, n_clusters, n)
    return (
        centers[which] + rng.normal(0, 0.35, (n, d)).astype(np.float32)
    ).astype(np.float32)


def make_clustered_device(
    n: int, d: int, n_clusters: int, seed: int, centers=None
):
    """Same distribution generated ON DEVICE with jax.random.

    Host->device bandwidth through a TPU tunnel can be ~MB/s; uploading a
    512 MB corpus would dominate the whole benchmark, so the corpus never
    leaves the device (tiny samples are pulled for the CPU-oracle check).
    Pass ``centers`` (a small host array — uploading it is cheap) to draw
    from the same mixture modes as a host-generated corpus.
    """
    import jax
    import jax.numpy as jnp

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    if centers is None:
        centers = jax.random.normal(k0, (n_clusters, d), jnp.float32)
    else:
        centers = jnp.asarray(centers, jnp.float32)
    which = jax.random.randint(k1, (n,), 0, n_clusters)
    noise = 0.35 * jax.random.normal(k2, (n, d), jnp.float32)
    return jnp.take(centers, which, axis=0) + noise


def device_topk_l2(queries, corpus, k: int):
    """Exact brute-force L2 top-k on device -> [Q, k] indices (host)."""
    import jax
    import jax.numpy as jnp

    from vq_tpu.ops.distance import pairwise

    d = pairwise(queries, corpus, "squared_euclidean")  # [Q, n] on device
    _, idx = jax.lax.top_k(-d, k)
    return np.asarray(idx)


def recall_at_k(retrieved: np.ndarray, truth: np.ndarray) -> float:
    k = truth.shape[1]
    return float(
        np.mean(
            [len(set(r[:k]) & set(t)) / k for r, t in zip(retrieved, truth)]
        )
    )


def device_mse(x_dev, recon_dev) -> float:
    import jax.numpy as jnp

    return float(jnp.mean((x_dev - recon_dev) ** 2))


def timed(fn):
    """Run fn() -> device array; force completion with a scalar readback."""
    import jax.numpy as jnp

    t0 = time.perf_counter()
    out = fn()
    if hasattr(out, "ravel"):
        float(jnp.sum(out.ravel()[:2].astype(jnp.float32)))
    return out, time.perf_counter() - t0


def bench_sq(x_dev, n, d, emit):
    import jax.numpy as jnp

    import vq_tpu

    q = vq_tpu.ScalarQuantizer(
        float(jnp.min(x_dev)), float(jnp.max(x_dev)), 256
    )
    q.quantize(x_dev)  # compile
    codes, dt = timed(lambda: q.quantize(x_dev))
    emit(
        config="sq_int8",
        n=n,
        dim=d,
        encode_s=round(dt, 4),
        vectors_per_sec=round(n / dt, 1),
        mse=device_mse(x_dev, q.dequantize(codes)),
    )


def bench_bq(x_dev, q_dev, truth, n, d, emit):
    import jax
    import vq_tpu

    import jax.numpy as jnp

    med = float(jnp.median(x_dev[:100_000]))
    q = vq_tpu.BinaryQuantizer(med)
    q.quantize_packed(x_dev)  # compile
    packed, dt = timed(lambda: q.quantize_packed(x_dev))
    qp = q.quantize_packed(q_dev)
    ham = vq_tpu.hamming_distance(qp, packed)  # [Q, n] device
    _, idx = jax.lax.top_k(-ham, 10)
    emit(
        config="bq_sign_pack_hamming",
        n=n,
        dim=d,
        pack_s=round(dt, 4),
        vectors_per_sec=round(n / dt, 1),
        bytes_per_vector=int(packed.shape[1] * 4),
        recall_at_10=recall_at_k(np.asarray(idx), truth),
    )


def bench_pq(x_dev, x_host_sample, q_dev, truth, metric, n, d, emit):
    import vq_tpu

    t0 = time.perf_counter()
    pq = vq_tpu.ProductQuantizer(
        x_dev, num_subspaces=8, num_centroids=256, max_iters=10,
        distance=metric, seed=66,
    )
    pq.codebooks.block_until_ready()
    cb_host = np.asarray(pq.codebooks)  # tiny; also forces real completion
    train_s = time.perf_counter() - t0
    pq.encode(x_dev)  # compile
    codes, encode_s = timed(lambda: pq.encode(x_dev))
    mse = device_mse(x_dev, pq.decode(codes))
    idx, _ = pq.adc_search(q_dev, codes, k=10)
    rec = recall_at_k(np.asarray(idx), truth)
    idx_rr, _ = pq.adc_search(q_dev, codes, k=10, rerank=1000, corpus=x_dev)
    rec_rr = recall_at_k(np.asarray(idx_rr), truth)

    parity = None
    try:
        from vq_tpu import native

        if native.available() and metric == "euclidean":
            ref_codes = native.pq_encode(x_host_sample, cb_host)
            got = np.asarray(codes[: len(x_host_sample)])
            parity = float((ref_codes == got).mean())
    except Exception:
        pass

    emit(
        config=f"pq_8x256_{metric}",
        n=n,
        dim=d,
        train_s=round(train_s, 4),
        encode_s=round(encode_s, 4),
        vectors_per_sec=round(n / encode_s, 1),
        mse=mse,
        recall_at_10=rec,
        recall_at_10_rerank1000=rec_rr,
        cpu_code_parity=parity,
    )


def bench_tsvq(data_host, x_dev_eval, emit):
    """Tree build is host-side (recursive); encode/MSE evaluate a
    device-generated sample of the same distribution — uploading the build
    corpus back to the device would cost minutes through the tunnel."""
    import vq_tpu

    t0 = time.perf_counter()
    q = vq_tpu.TSVQ(data_host, max_depth=8)
    train_s = time.perf_counter() - t0
    n_eval = x_dev_eval.shape[0]
    q.encode(x_dev_eval)  # compile
    codes, encode_s = timed(lambda: q.encode(x_dev_eval))
    emit(
        config="tsvq_depth8",
        n=data_host.shape[0],
        dim=data_host.shape[1],
        train_s=round(train_s, 4),
        encode_s=round(encode_s, 4),
        vectors_per_sec=round(n_eval / encode_s, 1),
        leaves=q.num_leaves,
        mse=device_mse(x_dev_eval, q.decode(codes)),
    )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--queries", type=int, default=100)
    p.add_argument("--seed", type=int, default=66)
    p.add_argument("--tsvq-n", type=int, default=50_000)
    p.add_argument("--output", type=str, default="-")
    p.add_argument(
        "--data", type=str, default=None,
        help="a real .fvecs/.bvecs corpus for configs 1-3 (e.g. SIFT-1M, "
        "BASELINE configs 2-3); missing file falls back to the synthetic "
        "mixture — every emitted row carries a 'data' tag either way",
    )
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from benchmarks._artifact import git_hash

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    git = git_hash()

    data_tag = "synthetic"

    def emit(**fields):
        out.write(
            json.dumps({**fields, "data": data_tag, "git": git}) + "\n"
        )
        out.flush()

    import jax

    # Config 1-3 data: a real corpus when --data names one (BASELINE
    # configs 2-3 as written: SIFT-1M), else the SIFT-like 128-d
    # clustered mixture generated on device.
    dim = 128
    if args.data and os.path.exists(args.data):
        from vq_tpu.utils.datasets import load_dataset

        x_host = load_dataset(args.data, max_rows=args.n)
        data_tag = os.path.basename(args.data)
        args.n, dim = x_host.shape
        x_dev = jnp.asarray(x_host)  # one documented upload
        del x_host
    else:
        if args.data:
            print(
                f"# --data {args.data!r} not found — synthetic fallback",
                file=sys.stderr,
            )
        x_dev = make_clustered_device(args.n, dim, 1000, args.seed)
    rng = np.random.default_rng(args.seed + 1)
    q_idx = jnp.asarray(rng.choice(args.n, args.queries, replace=False))
    qk = jax.random.PRNGKey(args.seed + 1)
    q_dev = jnp.take(x_dev, q_idx, axis=0) + 0.05 * jax.random.normal(
        qk, (args.queries, dim), jnp.float32
    )
    x_host_sample = np.asarray(x_dev[:2000])  # ~1 MB pull for the CPU oracle
    truth = device_topk_l2(q_dev, x_dev, 10)

    bench_sq(x_dev, args.n, dim, emit)
    bench_bq(x_dev, q_dev, truth, args.n, dim, emit)
    bench_pq(x_dev, x_host_sample, q_dev, truth, "euclidean", args.n, dim, emit)
    bench_pq(x_dev, x_host_sample, q_dev, truth, "cosine", args.n, dim, emit)

    # Config 4: GIST-like 960-d corpus (tree build is host-side; the
    # evaluation sample is device-generated from the same mixture — the
    # modes are shared via the small centers upload).
    rng960 = np.random.default_rng(args.seed + 2)
    centers960 = rng960.normal(0, 1.0, (200, 960)).astype(np.float32)
    which = rng960.integers(0, 200, args.tsvq_n)
    data960 = (
        centers960[which]
        + rng960.normal(0, 0.35, (args.tsvq_n, 960)).astype(np.float32)
    ).astype(np.float32)
    x960_dev = make_clustered_device(
        args.tsvq_n, 960, 200, args.seed + 2, centers=centers960
    )
    bench_tsvq(data960, x960_dev, emit)

    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
