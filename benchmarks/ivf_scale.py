"""IVF serving beyond the 1M benchmark scale: 4M..32M rows on one chip.

docs/performance.md's crossover claim ("IVF wins beyond ~2M rows and
the gap grows linearly") extrapolated from 1M-row measurements; this
commits the actual points, and (round 5) extends them to the sizes the
old padded-bucket layout could not reach. Storage is the chunk pool
(vq_tpu/ivf_pool.py): the corpus is generated batch-by-batch and
scattered straight into reserved pool chunks — no flat corpus copy, no
padded [nlist, cap, d] tensor, no reorder copy — so 32M x 128-d bf16
rows (8.2 GB of row data) build, rebalance, and search on one 16 GB
chip where round 4 OOM'd between 4M and 8M.

Ground truth is maintained incrementally: each generated batch's exact
[Q, batch] distances merge into a running global top-k before the batch
is added, so recall needs no second corpus copy either. The exact flat
engine is measured only at sizes where a second full copy fits
(<= 8.4M); larger rows carry ivf-only timings.

All rates are RPC-subtracted scan-chained device times (T=64: the
chunk-contiguous pool probe runs ~1 ms/batch, below RPC jitter at
shorter chains).
One JSON row per (n, engine).

Usage: python benchmarks/ivf_scale.py [--sizes 8388608 16777216 33554432]
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
D, Q, TOPK, NPROBE, T = 128, 128, 10, 8, 64
CHUNK = 262_144
RPC = 0.0293


def chain_ms(fn, qb, *ops):
    @jax.jit
    def chain(qs, *o):
        def step(_, q):
            out = fn(q, *o)
            # FULL consumer: a sliced one let XLA skip most of the
            # pool-backed probe (round-5: ivf_ms read 0.0 with [:8]).
            return None, jnp.sum(jnp.float32(jnp.ravel(out)))

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
                   default=[8_388_608, 16_777_216, 33_554_432])
    p.add_argument("--clusters", type=int, default=1024)
    p.add_argument("--flat-max", type=int, default=8_388_608,
                   help="largest n that also measures the exact flat "
                        "engine (needs a second corpus copy)")
    p.add_argument("--seed", type=int, default=66)
    args = p.parse_args(argv)

    from vq_tpu.ivf_flat import IVFFlatIndex, _ivf_flat_search_jit
    from vq_tpu.ops.kmeans import lloyd
    from vq_tpu.search import FlatIndex

    print("backend:", jax.default_backend(), flush=True)
    for n in args.sizes:
        assert n % CHUNK == 0
        nlist = max(1024, min(8192, n // 2048))
        kc, kq = jax.random.split(jax.random.PRNGKey(args.seed), 2)
        centers = jax.random.normal(kc, (args.clusters, D)) * 2.0
        kn = jax.random.PRNGKey(args.seed + 1)

        @jax.jit
        def gen_batch(i, centers):
            key = jax.random.fold_in(kn, i)
            kw_, kn_ = jax.random.split(key)
            which = jax.random.randint(kw_, (CHUNK,), 0, args.clusters)
            return (
                jnp.take(centers, which, axis=0)
                + jax.random.normal(kn_, (CHUNK, D))
            ).astype(jnp.bfloat16)

        queries = gen_batch(0, centers)[:Q].astype(jnp.float32) + (
            0.01 * jax.random.normal(kq, (Q, D), jnp.float32)
        )
        qb = jnp.broadcast_to(queries, (T, Q, D)) + 1e-4 * (
            jax.random.normal(jax.random.PRNGKey(9), (T, Q, D))
        )

        # Coarse partition from the first batch's sample.
        res = lloyd(
            gen_batch(0, centers)[:CHUNK].astype(jnp.float32), nlist,
            max_iters=6, seed=1, init="kmeans++",
        )
        idx = IVFFlatIndex(res.centroids, store_dtype="bfloat16")
        idx.reserve(n)

        @jax.jit
        def gt_merge(xb, base, run_d, run_i, queries):
            # Exact bf16-stored-row distances of one batch merged into
            # the running global top-k (so recall needs no corpus copy).
            x32 = xb.astype(jnp.float32)
            qy = queries @ x32.T  # [Q, CHUNK]
            d = (
                jnp.sum(queries * queries, axis=1)[:, None]
                - 2.0 * qy + jnp.sum(x32 * x32, axis=1)[None, :]
            )
            ids = base + jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
            cat_d = jnp.concatenate([run_d, d], axis=1)
            cat_i = jnp.concatenate(
                [run_i, jnp.broadcast_to(ids, d.shape)], axis=1
            )
            neg, pos = jax.lax.top_k(-cat_d, TOPK)
            return -neg, jnp.take_along_axis(cat_i, pos, axis=1)

        run_d = jnp.full((Q, TOPK), jnp.inf, jnp.float32)
        run_i = jnp.full((Q, TOPK), -1, jnp.int32)
        t0 = time.perf_counter()
        for i in range(n // CHUNK):
            xb = gen_batch(i, centers)
            run_d, run_i = gt_merge(
                xb, jnp.int32(i * CHUNK), run_d, run_i, queries
            )
            idx.add(xb)
            if (i + 1) % 32 == 0:
                print(f"  added {(i + 1) * CHUNK:,} rows", flush=True)
        add_s = time.perf_counter() - t0
        gt_ids = np.asarray(run_i)

        cap0 = idx._pool.cap
        t0 = time.perf_counter()
        # Capacity-aware splitting: oversized lists inflate every
        # probe; splits add centroids instead of inflating cap. Target
        # the SKEW TAIL (1.5x the mean list), not the mean itself —
        # rebalancing to the mean marks ~60% of all rows as movers,
        # whose payload copies must coexist with the resident pool
        # (OOM at 32M); the tail target moves only the skewed few.
        target = max(4096, int(1.5 * n / nlist))
        if cap0 > max(5000, target):
            info = idx.rebalance(target_max=target)
            print(
                f"rebalance(target_max={target}): {info['split']} "
                f"splits (cap {cap0} -> {idx._pool.cap}, "
                f"nlist {nlist} -> {idx.nlist})",
                flush=True,
            )
        rebalance_s = time.perf_counter() - t0
        b = idx._build_buckets()
        cap = idx._pool.cap
        print(
            f"n={n}: add {add_s:.0f} s, rebalance {rebalance_s:.0f} s, "
            f"nlist={idx.nlist}, cap={cap}, "
            f"pool={idx._pool.stats()}", flush=True,
        )

        ids, _ = idx.search(queries, k=TOPK, nprobe=NPROBE)
        got = np.asarray(ids)
        recall = float(
            np.mean([len(set(a) & set(b_)) / TOPK
                     for a, b_ in zip(gt_ids, got)])
        )

        coarse = idx.coarse

        def ivf_fn(q, coarse, rows, sqn, ids_b, chains):
            out, _ = _ivf_flat_search_jit(
                q, coarse, rows, sqn, ids_b, chains, NPROBE, TOPK,
                cap, "l2", True, False,
            )
            return out

        ms_ivf = chain_ms(
            ivf_fn, qb, coarse, b["rows"], b["sqn"], b["ids"], b["chains"]
        )

        row = dict(
            bench="ivf_scale", n=n, nlist=idx.nlist, cap=cap,
            nprobe=NPROBE, q_batch=Q, store="bfloat16",
            add_s=round(add_s, 1), rebalance_s=round(rebalance_s, 1),
            recall_at_10=round(recall, 4),
            ivf_ms_per_batch=round(ms_ivf, 3),
            ivf_device_qps=round(Q / (ms_ivf / 1e3), 0),
            pool_slack_rows=idx._pool.stats()["slack_rows"],
        )

        if n <= args.flat_max:
            # Exact flat engine needs a second corpus copy — regenerate.
            flat = FlatIndex(dim=D, storage="bfloat16")
            for i in range(n // CHUNK):
                flat.add(gen_batch(i, centers))
            fn_flat, arrays = flat._search_core(TOPK)
            ms_flat = chain_ms(
                lambda q, *a: fn_flat(q, *a)[0], qb, *arrays
            )
            del flat, arrays
            row.update(
                flat_ms_per_batch=round(ms_flat, 3),
                flat_device_qps=round(Q / (ms_flat / 1e3), 0),
                ivf_over_flat=round(ms_flat / ms_ivf, 2),
            )

        print(json.dumps(row), flush=True)
        ART.emit(**row)
        del idx, b
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
