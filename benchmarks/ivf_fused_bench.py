"""IVF-PQ fused-probe search benchmark on real TPU at 1M rows.

Round-1 baseline (XLA gather path): 660 ms / 100 queries at nprobe=8 on
skewed 1000-cluster data (152 QPS). Round-2 target: >= 10x via the
scalar-prefetch Pallas probe kernel, identical returned ids.

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/ivf_fused_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.ivf import IVFPQIndex, _ivf_search_jit

N, D, NLIST, M, K = 1_000_000, 128, 1000, 8, 256
Q, NPROBE, TOPK = 100, 8, 10

print("backend:", jax.default_backend(), flush=True)

# Skewed clustered corpus, generated on device (round-1 setup).
kc, kw, kn, kq = jax.random.split(jax.random.PRNGKey(66), 4)
centers = jax.random.normal(kc, (NLIST, D)) * 2.0
# Zipf-ish skew over clusters.
logits = -1.2 * jnp.log1p(jnp.arange(NLIST, dtype=jnp.float32))
which = jax.random.categorical(kw, logits, shape=(N,))
data = jnp.take(centers, which, axis=0) + 0.15 * jax.random.normal(kn, (N, D))
data = data.astype(jnp.float32)

t0 = time.perf_counter()
idx = IVFPQIndex.train(data[:200_000], NLIST, M, K, max_iters=8, seed=1)
print(f"train: {time.perf_counter()-t0:.1f} s", flush=True)
t0 = time.perf_counter()
idx.add(data)
print(f"add 1M: {time.perf_counter()-t0:.1f} s", flush=True)
bucket_codes, bucket_ids = idx._build_buckets()
print("bucket stats:", {k: v for k, v in idx.bucket_stats().items()
                        if k in ("cap", "max", "overflow_dropped")}, flush=True)

queries = data[:Q] + 0.01 * jax.random.normal(kq, (Q, D), jnp.float32)
pool = NPROBE * int(bucket_ids.shape[1])
fetch = min(TOPK, pool)
args = (queries, idx.coarse, idx.pq.codebooks, bucket_codes, bucket_ids,
        NPROBE, fetch)


@jax.jit
def probe_sum(x):
    return jnp.sum(jnp.float32(x[:4, :]))


def timed(label, **kw):
    ids, dist = _ivf_search_jit(*args, **kw)
    float(probe_sum(dist))  # warm
    def run(reps):
        t0 = time.perf_counter()
        outs = [_ivf_search_jit(*args, **kw) for _ in range(reps)]
        for o in outs:
            float(probe_sum(o[1]))
        return time.perf_counter() - t0
    run(1)
    t_s = min(run(2) for _ in range(2))
    t_l = min(run(6) for _ in range(2))
    per = max((t_l - t_s) / 4, 1e-9)
    print(f"{label}: {per*1e3:.1f} ms / {Q} queries -> {Q/per:.0f} QPS", flush=True)
    return np.asarray(ids), np.asarray(dist), per


ids_p, dist_p, t_p = timed("fused pallas probe", use_pallas=True)
ids_x, dist_x, t_x = timed("xla gather probe  ", use_pallas=False)
print("speedup:", round(t_x / t_p, 1), flush=True)
same = np.array_equal(ids_p, ids_x)
print("ids identical:", same, flush=True)
if not same:
    nm = (ids_p != ids_x).sum()
    print(f"  mismatches: {nm}/{ids_x.size}; max dist delta "
          f"{np.abs(dist_p - dist_x).max():.3e}", flush=True)

# Rebalance kills the skew-padding waste (cap tracks the LARGEST list; the
# fused probe pays O(nprobe * cap) per query), then re-time.
t0 = time.perf_counter()
info = idx.rebalance(target_max=2048)
print(f"rebalance: {info} in {time.perf_counter()-t0:.1f} s", flush=True)
bucket_codes, bucket_ids = idx._build_buckets()
print("bucket stats:", {k: v for k, v in idx.bucket_stats().items()
                        if k in ("cap", "max", "overflow_dropped")}, flush=True)
pool = NPROBE * int(bucket_ids.shape[1])
args = (queries, idx.coarse, idx.pq.codebooks, bucket_codes, bucket_ids,
        NPROBE, min(TOPK, pool))
ids_r, dist_r, t_r = timed("fused probe after rebalance", use_pallas=True)
print("total speedup vs xla-on-skew:", round(t_x / t_r, 1), flush=True)

# Recall sanity: rebalanced index must retrieve the near-duplicate query
# sources (ids change only from list membership, corpus rows are the same).
hit = np.mean([int(i) in set(ids_r[j].tolist()) for j, i in
               enumerate(range(Q))])
print(f"self-hit rate after rebalance: {hit:.2f}", flush=True)
print("DONE", flush=True)
