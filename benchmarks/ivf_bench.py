"""IVF-PQ benchmark at corpus scale on the accelerator.

Builds an IVF-PQ index (residual codes) over a device-generated clustered
corpus, then measures recall@10 vs exact ground truth across nprobe
settings, with and without exact rerank. One JSON line per configuration.

    python benchmarks/ivf_bench.py [--n 1000000] [--nlist 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.parity import make_clustered_device, device_topk_l2, recall_at_k  # noqa: E402


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--nlist", type=int, default=1024)
    p.add_argument("--queries", type=int, default=100)
    p.add_argument("--train-n", type=int, default=200_000)
    p.add_argument("--seed", type=int, default=66)
    p.add_argument("--output", type=str, default="-")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from vq_tpu.ivf import IVFPQIndex

    out = sys.stdout if args.output == "-" else open(args.output, "w")

    def emit(**fields):
        out.write(json.dumps(fields) + "\n")
        out.flush()

    x_dev = make_clustered_device(args.n, 128, 1000, args.seed)
    q_dev = x_dev[: args.queries] + 0.01 * make_clustered_device(
        args.queries, 128, 1000, args.seed + 9
    )
    truth = device_topk_l2(q_dev, x_dev, 10)

    t0 = time.perf_counter()
    idx = IVFPQIndex.train(
        x_dev[: args.train_n], nlist=args.nlist, num_subspaces=8,
        num_centroids=256, keep_corpus=True,
    )
    train_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx.add(x_dev)
    add_s = time.perf_counter() - t0
    stats = idx.bucket_stats()

    for nprobe in (8, 64):
        for rerank in (0, 500):
            t0 = time.perf_counter()
            ids, _ = idx.search(q_dev, k=10, nprobe=nprobe, rerank=rerank)
            ids_h = np.asarray(ids)
            dt = time.perf_counter() - t0
            emit(
                config="ivfpq_8x256_residual",
                n=args.n,
                nlist=args.nlist,
                nprobe=nprobe,
                rerank=rerank,
                recall_at_10=recall_at_k(ids_h, truth),
                search_s=round(dt, 4),
                train_s=round(train_s, 2),
                add_s=round(add_s, 2),
                bucket_cap=stats["cap"],
                padding_waste=round(stats["padding_waste"], 4),
            )

    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
