"""Refinement-rerank benchmark on real TPU at 1M rows.

Compares ways to recover recall on an IVF-PQ index at 1M x 128:

  base        IVFPQ search alone (nprobe=8)                      8 MB codes
  refine-sq8  RefineIndex(base, "sq8"), k_factor=8             +128 MB
  refine-pqr  RefineIndex.train_pq(base, m2=16) (IVFPQR)        +16 MB
  (keep_corpus exact rerank, the round-1 baseline, needs the
   512 MB f32 corpus in HBM — docs/performance.md)

Reports recall@10 against exact ground truth and warm QPS with
amortized forced-completion timing (difference quotient of two rep
counts — plain block_until_ready lies through the tunnel, see the
verify skill).

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/refine_bench.py
Env: REFINE_BENCH_N (default 1M), REFINE_BENCH_KFACTOR (default 8).
"""
import os
import time

import jax
import jax.numpy as jnp

N = int(os.environ.get("REFINE_BENCH_N", 1_000_000))
D, NLIST, NPROBE, Q, TOPK = 128, 1000, 8, 128, 10
KFACTOR = int(os.environ.get("REFINE_BENCH_KFACTOR", 8))

print("backend:", jax.default_backend(), flush=True)

kc, kw, kn, kq = jax.random.split(jax.random.PRNGKey(66), 4)
centers = jax.random.normal(kc, (NLIST, D)) * 2.0
which = jax.random.randint(kw, (N,), 0, NLIST)
data = (
    jnp.take(centers, which, axis=0) + 0.15 * jax.random.normal(kn, (N, D))
).astype(jnp.float32)
queries = data[:Q] + 0.01 * jax.random.normal(kq, (Q, D), jnp.float32)
del centers, which


@jax.jit
def probe_sum(x):
    return jnp.sum(jnp.float32(x[:4, :]))


def qps(label, fn, reps=(2, 8)):
    ids, vals = fn()
    float(probe_sum(vals))  # warm / compile

    def run(r):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(r)]
        for o in outs:
            float(probe_sum(o[1]))
        return time.perf_counter() - t0

    run(1)
    r1, r2 = reps
    t1 = min(run(r1) for _ in range(2))
    t2 = min(run(r2) for _ in range(2))
    per = (t2 - t1) / (r2 - r1)
    print(f"{label:14s} {per * 1e3:8.1f} ms/batch  {Q / per:8.0f} QPS",
          flush=True)
    return ids


def recall(ids, gt):
    import numpy as np

    a = np.asarray(ids)[:, :TOPK]
    g = np.asarray(gt)[:, :TOPK]
    return float(np.mean([
        len(set(a[i]) & set(g[i])) / TOPK for i in range(a.shape[0])
    ]))


from vq_tpu import IVFPQIndex, RefineIndex  # noqa: E402
from vq_tpu.tune import exact_neighbors  # noqa: E402

print("ground truth ...", flush=True)
gt, _ = exact_neighbors(data, queries, TOPK)

print("train IVFPQ ...", flush=True)
t0 = time.perf_counter()
train = data[:200_000]
base = IVFPQIndex.train(train, NLIST, 8, 256, max_iters=10, seed=66)
print(f"  train {time.perf_counter() - t0:.1f} s", flush=True)

# SQ8 refinement over the shared base (wrap BEFORE the corpus goes in).
ref_sq = RefineIndex(base, "sq8", sq_train_data=train)
t0 = time.perf_counter()
ref_sq.add(data)
print(f"  add (base + sq8 codes) {time.perf_counter() - t0:.1f} s",
      flush=True)
# No rebalance: the generated clusters are balanced by construction, and
# IVFPQIndex.rebalance re-encodes residual codes, which would stale the
# PQR refiner below (documented RefineIndex caveat).

ids = qps("base", lambda: base.search(queries, TOPK, nprobe=NPROBE))
r_base = recall(ids, gt)
ids = qps(
    "refine-sq8",
    lambda: ref_sq.search(queries, TOPK, k_factor=KFACTOR, nprobe=NPROBE),
)
r_sq = recall(ids, gt)

# IVFPQR: a fresh empty index over the SAME trained params, residual PQ.
print("refine-pqr ...", flush=True)
base2 = IVFPQIndex(base.coarse, base.pq)
ref_pq = RefineIndex.train_pq(base2, train, 16, 256, max_iters=6, seed=67)
t0 = time.perf_counter()
ref_pq.add(data)
print(f"  add (base2 + pqr codes) {time.perf_counter() - t0:.1f} s",
      flush=True)
ids = qps(
    "refine-pqr",
    lambda: ref_pq.search(queries, TOPK, k_factor=KFACTOR, nprobe=NPROBE),
)
r_pq = recall(ids, gt)

print(f"recall@10  base={r_base:.3f}  refine-sq8={r_sq:.3f}  "
      f"refine-pqr={r_pq:.3f}  (nprobe={NPROBE}, k_factor={KFACTOR})",
      flush=True)
