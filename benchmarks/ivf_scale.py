"""IVF serving beyond the 1M benchmark scale: 4M / 8M rows on one chip.

docs/performance.md's crossover claim ("IVF wins beyond ~2M rows and
the gap grows linearly") extrapolated from 1M-row measurements; this
commits the actual points. Corpus, build, and buckets stay entirely
device-resident (bf16 rows: 8M x 128 = 2 GB flat + padded buckets), the
probe cost is O(nprobe x cap) independent of n, and the exact flat scan
at the same n is measured in the same process for the crossover.

All rates are RPC-subtracted scan-chained device times (T=8).
One JSON row per (n, engine).

Measured limit (round 4): 8.4M bf16 rows OOM a 16 GB chip during
``_pack_buckets`` — the padded bucket tensor (nlist x cap x d) plus the
reorder copy plus the flat rows need ~9-13 GB concurrently, and the
k-means skew inflates cap before rebalance can run (rebalance itself
OOMs at this size). Single-chip padded-bucket IVF therefore tops out
between 4M and 8M rows at d=128/bf16; the intended path beyond is the
list-sharded multi-chip serving family (vq_tpu/parallel/ivf_scan.py),
which splits the bucket tensor across chips.

Usage: python benchmarks/ivf_scale.py [--sizes 4000000 8000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks._artifact import Rows

ART = Rows(os.environ.get("IVF_SCALE_JSONL"))
D, Q, TOPK, NPROBE, T = 128, 128, 10, 8, 8
RPC = 0.0293


def chain_ms(fn, qb, *ops):
    @jax.jit
    def chain(qs, *o):
        def step(_, q):
            out = fn(q, *o)
            return None, jnp.sum(jnp.float32(jnp.ravel(out)[:8]))

        _, s = jax.lax.scan(step, None, qs)
        return jnp.sum(s)

    float(chain(qb, *ops))

    def run(r):
        t0 = time.perf_counter()
        vs = [chain(qb, *ops) for _ in range(r)]
        for v in vs:
            float(v)
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(2) for _ in range(2))
    t2 = min(run(6) for _ in range(2))
    return max((t2 - t1) / 4 - RPC, 1e-9) / T * 1e3


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[4_194_304, 8_388_608])  # pow2: chunked scans pad-free
    p.add_argument("--clusters", type=int, default=1024)
    p.add_argument("--seed", type=int, default=66)
    args = p.parse_args(argv)

    from vq_tpu.ivf_flat import IVFFlatIndex, _ivf_flat_search_jit
    from vq_tpu.ops.kmeans import lloyd
    from vq_tpu.search import FlatIndex

    print("backend:", jax.default_backend(), flush=True)
    for n in args.sizes:
        # Finer partitions at scale keep bucket caps (and the padded
        # bucket tensor) small enough that no rebalance pass is needed
        # on this smooth corpus.
        nlist = 8192 if n >= 8_000_000 else (
            4096 if n >= 4_000_000 else 1024
        )
        kc, kw, kn, kq = jax.random.split(
            jax.random.PRNGKey(args.seed), 4
        )
        centers = jax.random.normal(kc, (args.clusters, D)) * 2.0

        # Chunked generation: a single-shot take+add materializes 3 f32
        # copies (12.9 GB at 8.4M) whose fragmentation then starves the
        # 4+ GB contiguous bucket buffer.
        @jax.jit
        def gen(centers):
            chunk = 262_144

            def one(i):
                key = jax.random.fold_in(kn, i)
                kw_, kn_ = jax.random.split(key)
                which = jax.random.randint(
                    kw_, (chunk,), 0, args.clusters
                )
                return (
                    jnp.take(centers, which, axis=0)
                    + jax.random.normal(kn_, (chunk, D))
                ).astype(jnp.bfloat16)

            return jax.lax.map(
                one, jnp.arange(n // chunk, dtype=jnp.int32)
            ).reshape(n, D)

        assert n % 262_144 == 0
        data = gen(centers)  # stored width; 2 GB at 8M
        queries = data[:Q].astype(jnp.float32) + 0.01 * jax.random.normal(
            kq, (Q, D), jnp.float32
        )
        qb = jnp.broadcast_to(queries, (T, Q, D)) + 1e-4 * (
            jax.random.normal(jax.random.PRNGKey(9), (T, Q, D))
        )

        # Exact flat baseline FIRST (only corpus + flat live), then GT,
        # then the IVF build — at 8M the three together overflow HBM.
        flat = FlatIndex(dim=D, storage="bfloat16")
        flat.add(data)
        fn_flat, arrays = flat._search_core(TOPK)
        ms_flat = chain_ms(
            lambda q, *a: fn_flat(q, *a)[0], qb, *arrays
        )
        del arrays

        from vq_tpu.tune import exact_neighbors

        gt_ids, _ = exact_neighbors(data, queries, TOPK)
        del flat

        t0 = time.perf_counter()
        res = lloyd(
            data[:262_144].astype(jnp.float32), nlist, max_iters=6,
            seed=1, init="kmeans++",
        )
        idx = IVFFlatIndex(res.centroids, store_dtype="bfloat16")
        idx.add(data)
        cap0 = int(idx._build_buckets()["ids"].shape[1])
        if cap0 > 5000:
            # Skewed partition: oversized lists inflate every probe (and
            # at this scale the padded bucket tensor itself) — the
            # shipped remedy, same as the 1M artifacts.
            info = idx.rebalance(target_max=4096)
            print(f"rebalance: {info['split']} splits (cap {cap0})",
                  flush=True)
        b = idx._build_buckets()
        cap = int(b["ids"].shape[1])
        build_s = time.perf_counter() - t0
        print(f"n={n}: build {build_s:.0f} s, nlist={nlist}, cap={cap}",
              flush=True)

        ids, _ = idx.search(queries, k=TOPK, nprobe=NPROBE)
        gt, got = np.asarray(gt_ids), np.asarray(ids)
        recall = float(
            np.mean([len(set(a) & set(b_)) / TOPK
                     for a, b_ in zip(gt, got)])
        )

        rows, sqn, ids_b = b["rows"], b["sqn"], b["ids"]
        coarse = idx.coarse

        def ivf_fn(q, coarse, rows, sqn, ids_b):
            out, _ = _ivf_flat_search_jit(
                q, coarse, rows, sqn, ids_b, NPROBE, TOPK, "l2",
                True, False,
            )
            return out

        ms_ivf = chain_ms(ivf_fn, qb, coarse, rows, sqn, ids_b)

        row = dict(
            bench="ivf_scale", n=n, nlist=nlist, cap=cap,
            nprobe=NPROBE, q_batch=Q, store="bfloat16",
            build_s=round(build_s, 1),
            recall_at_10=round(recall, 4),
            ivf_ms_per_batch=round(ms_ivf, 3),
            ivf_device_qps=round(Q / (ms_ivf / 1e3), 0),
            flat_ms_per_batch=round(ms_flat, 3),
            flat_device_qps=round(Q / (ms_flat / 1e3), 0),
            ivf_over_flat=round(ms_flat / ms_ivf, 2),
        )
        print(json.dumps(row), flush=True)
        ART.emit(**row)
        del data, idx, b, rows, sqn, ids_b
    return 0


if __name__ == "__main__":
    sys.exit(main())
