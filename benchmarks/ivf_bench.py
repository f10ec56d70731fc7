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
    p.add_argument("--rebalance", type=int, default=2048)
    p.add_argument("--output", type=str, default="-")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from vq_tpu.ivf import IVFPQIndex

    from benchmarks._artifact import git_hash

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    git = git_hash()

    def emit(**fields):
        out.write(json.dumps({**fields, "git": git}) + "\n")
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

    def grid(tag, stats, extra):
        """Warm-timed search grid (round-1 rows timed single cold calls —
        i.e. mostly per-shape remote compile, not search)."""
        for nprobe in (8, 64):
            for rerank in (0, 500):
                ids, _ = idx.search(
                    q_dev, k=10, nprobe=nprobe, rerank=rerank
                )
                ids_h = np.asarray(ids)  # warm + force completion
                times = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    ids2, _ = idx.search(
                        q_dev, k=10, nprobe=nprobe, rerank=rerank
                    )
                    np.asarray(ids2)
                    times.append(time.perf_counter() - t0)
                dt = min(times)
                emit(
                    config=tag,
                    n=args.n,
                    nlist=args.nlist,
                    nprobe=nprobe,
                    rerank=rerank,
                    recall_at_10=recall_at_k(ids_h, truth),
                    search_s=round(dt, 4),
                    qps=round(args.queries / dt, 1),
                    bucket_cap=stats["cap"],
                    padding_waste=round(stats["padding_waste"], 4),
                    **extra,
                )

    grid(
        "ivfpq_8x256_residual_fused", stats,
        {"train_s": round(train_s, 2), "add_s": round(add_s, 2)},
    )

    t0 = time.perf_counter()
    info = idx.rebalance(target_max=args.rebalance)
    reb_s = time.perf_counter() - t0
    stats = idx.bucket_stats()
    grid(
        "ivfpq_8x256_residual_fused_rebalanced", stats,
        {
            "rebalance_s": round(reb_s, 2),
            "rebalance_target_max": args.rebalance,
            "splits": info["split"],
            "new_nlist": info["new_nlist"],
        },
    )

    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
