"""BatchPipeline vs per-batch search on real TPU at 1M x 128.

Quantifies what dispatch amortization buys a serving client: the same
fused IVF-Flat probe measured (a) one search() dispatch per 128-query
batch and (b) T batches chained in ONE dispatch via BatchPipeline.
Through the tunnel (a) is dominated by the ~25 ms per-call RPC; (b)
exposes device rate. Also reports the flat-index pipeline for contrast.

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/pipeline_bench.py
"""

import os
import time

import jax
import jax.numpy as jnp

N, D, NLIST = 1_000_000, 128, 1000
Q, NPROBE, TOPK, T = 128, 8, 10, 16
REBALANCE_MAX = int(os.environ.get("PIPELINE_BENCH_REBALANCE", "2048"))

print("backend:", jax.default_backend(), flush=True)

kc, kw, kn, kq = jax.random.split(jax.random.PRNGKey(66), 4)
centers = jax.random.normal(kc, (NLIST, D)) * 2.0
which = jax.random.randint(kw, (N,), 0, NLIST)
data = (
    jnp.take(centers, which, axis=0) + 0.15 * jax.random.normal(kn, (N, D))
).astype(jnp.float32)
del centers, which
qbatches = data[: T * Q].reshape(T, Q, D) + 0.01 * jax.random.normal(
    kq, (T, Q, D), jnp.float32
)


@jax.jit
def probe_sum(x):
    return jnp.sum(jnp.float32(x[:4, :4]))


@jax.jit
def probe_sum3(x):
    return jnp.sum(jnp.float32(x[:2, :2, :2]))


def timed(label, fn, probe, queries_per_call, reps=(2, 6)):
    out = fn()
    float(probe(out))

    def run(r):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(r)]
        for o in outs:
            float(probe(o))
        return time.perf_counter() - t0

    run(1)
    r1, r2 = reps
    t1 = min(run(r1) for _ in range(2))
    t2 = min(run(r2) for _ in range(2))
    per = max((t2 - t1) / (r2 - r1), 1e-9)
    print(
        f"{label}: {per*1000:.1f} ms/call = "
        f"{queries_per_call/per:.0f} QPS", flush=True,
    )
    return per


from vq_tpu.ivf_flat import IVFFlatIndex  # noqa: E402
from vq_tpu.ops.kmeans import lloyd  # noqa: E402
from vq_tpu.serving import BatchPipeline  # noqa: E402

t0 = time.perf_counter()
res = lloyd(data[:200_000], NLIST, max_iters=8, seed=1, init="kmeans++")
idx = IVFFlatIndex(res.centroids)
idx.add(data)
if REBALANCE_MAX:
    info = idx.rebalance(target_max=REBALANCE_MAX)
    print(f"rebalance({REBALANCE_MAX}): {info['split']} splits", flush=True)
idx._build_buckets()
print(f"setup {time.perf_counter()-t0:.1f} s", flush=True)

import numpy as np  # noqa: E402

# Parity first: pipeline output == per-batch search.
pipe = BatchPipeline(idx, k=TOPK, nprobe=NPROBE)
ids_p, vals_p = pipe.search(qbatches)
ids_s, vals_s = idx.search(qbatches[0], TOPK, nprobe=NPROBE)
assert (np.asarray(ids_p[0]) == np.asarray(ids_s)).all(), "pipeline != search"
print("parity ok (batch 0 ids identical)", flush=True)

timed(
    f"per-batch search (Q={Q})",
    lambda: idx.search(qbatches[0], TOPK, nprobe=NPROBE)[1],
    probe_sum, Q,
)
timed(
    f"BatchPipeline T={T} (Q={Q} each)",
    lambda: pipe.search(qbatches)[1],
    probe_sum3, T * Q,
)
print("done", flush=True)
