"""Decompose the fused IVF-Flat probe's per-batch cost on real TPU.

Post-rebalance every IVF coding converges on ~30 ms / 128 queries
(docs/performance.md), so the next speedup must come from whichever
stage owns that floor. This times each stage of
``IVFFlatIndex.search(use_pallas=True)`` in isolation at the serving
bench's shapes (1M x 128, nlist=1000, Q=128, nprobe=8):

  coarse    [Q, nlist] matmul + top_k(nprobe)
  kernel    scalar-prefetch matvec over the probed lists
  assemble  distance assembly + id masking (no top-k)
  topk      jax.lax.top_k over the flattened [Q, nprobe*cap] pool
  approx    jax.lax.approx_min_k on the same pool (TPU-optimized CustomCall)
  full      the whole search

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_profile.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from benchmarks._artifact import Rows  # noqa: E402

ART = Rows(os.environ.get("PROBE_PROFILE_JSONL"))

N, D, NLIST, Q, NPROBE, TOPK = 1_000_000, 128, 1000, 128, 8, 10

print("backend:", jax.default_backend(), flush=True)

kc, kw, kn, kq = jax.random.split(jax.random.PRNGKey(66), 4)
centers = jax.random.normal(kc, (NLIST, D)) * 2.0
which = jax.random.randint(kw, (N,), 0, NLIST)
data = (
    jnp.take(centers, which, axis=0) + 0.15 * jax.random.normal(kn, (N, D))
).astype(jnp.float32)
queries = data[:Q] + 0.01 * jax.random.normal(kq, (Q, D), jnp.float32)


@jax.jit
def probe_sum(x):
    return jnp.sum(jnp.float32(x[:2, :]))


def per_call(label, fn, reps=(2, 10)):
    out = fn()
    float(probe_sum(out))

    def run(r):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(r)]
        for o in outs:
            float(probe_sum(o))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(reps[0]) for _ in range(2))
    t2 = min(run(reps[1]) for _ in range(2))
    ms = max((t2 - t1) / (reps[1] - reps[0]), 1e-9) * 1000
    print(f"{label}: {ms:.2f} ms / batch", flush=True)
    ART.emit(
        bench="probe_profile_1Mx128", stage=label.strip(), n=N,
        q_batch=Q, nprobe=NPROBE, ms_per_batch=round(ms, 2),
    )
    return ms


from vq_tpu.ivf_flat import IVFFlatIndex, _coarse_probe  # noqa: E402
from vq_tpu.ops.kmeans import lloyd  # noqa: E402
from vq_tpu.ops.pallas_kernels import ivf_probe_matvec_fused  # noqa: E402

t0 = time.perf_counter()
res = lloyd(data[:200_000], NLIST, max_iters=8, seed=1, init="kmeans++")
idx = IVFFlatIndex(res.centroids)
idx.add(data)
import os  # noqa: E402

_reb = int(os.environ.get("PROBE_PROFILE_REBALANCE", "0"))
if _reb:
    t1 = time.perf_counter()
    info = idx.rebalance(target_max=_reb)
    print(
        f"rebalance({_reb}): {time.perf_counter()-t1:.1f} s, "
        f"{info['split']} splits", flush=True,
    )
b = idx._build_buckets()
cap = int(b["ids"].shape[1])
print(
    f"setup {time.perf_counter()-t0:.1f} s, cap={cap}, "
    f"pool={NPROBE*cap}", flush=True,
)
rows, sqn, ids_b = b["rows"], b["sqn"], b["ids"]
coarse = idx.coarse


# NOTE: big arrays are ARGUMENTS, not closures — closure capture bakes
# them into the program as constants (3 GB re-uploaded per compile
# through the tunnel).
@jax.jit
def stage_coarse(q, coarse):
    probe, _ = _coarse_probe(q, coarse, NPROBE, "l2")
    return probe


@jax.jit
def stage_kernel(q, coarse, rows):
    probe, _ = _coarse_probe(q, coarse, NPROBE, "l2")
    qvecs = jnp.broadcast_to(q[:, None, :], (Q, NPROBE, D)).reshape(-1, D)
    return ivf_probe_matvec_fused(qvecs, probe.reshape(-1), rows)


@jax.jit
def stage_assemble(q, coarse, rows, sqn, ids_b):
    probe, _ = _coarse_probe(q, coarse, NPROBE, "l2")
    qvecs = jnp.broadcast_to(q[:, None, :], (Q, NPROBE, D)).reshape(-1, D)
    qy = ivf_probe_matvec_fused(
        qvecs, probe.reshape(-1), rows
    ).reshape(Q, NPROBE, -1)
    ids = jnp.take(ids_b, probe, axis=0)
    sq = jnp.take(sqn, probe, axis=0)
    qn2 = jnp.sum(q * q, axis=-1)
    d = jnp.maximum(qn2[:, None, None] - 2.0 * qy + sq, 0.0)
    return jnp.where(ids >= 0, d, jnp.inf)


pool = jax.random.normal(jax.random.PRNGKey(3), (Q, NPROBE * cap))


@jax.jit
def stage_topk(p):
    neg, pos = jax.lax.top_k(-p, TOPK)
    return neg


@jax.jit
def stage_approx(p):
    vals, idxs = jax.lax.approx_min_k(p, TOPK)
    return vals


from vq_tpu.ivf_flat import _ivf_flat_search_jit  # noqa: E402

T = 16


@jax.jit
def scan_search(qs, coarse, rows, sqn, ids_b):
    """T chained searches in ONE dispatch — separates device time from
    the per-dispatch tunnel RPC cost that dominates single-call timing."""

    def step(_, q):
        ids, d = _ivf_flat_search_jit(
            q, coarse, rows, sqn, ids_b, NPROBE, TOPK, "l2", True, False
        )
        return None, (ids, d)

    _, (ids, d) = jax.lax.scan(step, None, qs)
    return d


qbatches = jnp.broadcast_to(queries, (T, Q, D)) + 1e-4 * jax.random.normal(
    jax.random.PRNGKey(9), (T, Q, D)
)

per_call("coarse  ", lambda: stage_coarse(queries, coarse))
per_call("kernel  ", lambda: stage_kernel(queries, coarse, rows))
per_call(
    "assemble", lambda: stage_assemble(queries, coarse, rows, sqn, ids_b)
)
per_call("topk    ", lambda: stage_topk(pool))
per_call("approx  ", lambda: stage_approx(pool))
per_call(
    "full    ",
    lambda: idx.search(queries, k=TOPK, nprobe=NPROBE)[1],
)
ms16 = per_call(
    "scan16  ",
    lambda: scan_search(qbatches, coarse, rows, sqn, ids_b),
    reps=(2, 6),
)
print(
    f"device time per 128-query batch (dispatch amortized over {T}): "
    f"{ms16/T:.2f} ms -> {Q*T*1000/ms16:.0f} QPS", flush=True,
)
ART.emit(
    bench="probe_profile_1Mx128", stage="device_per_batch", n=N,
    q_batch=Q, nprobe=NPROBE, ms_per_batch=round(ms16 / T, 2),
    qps=round(Q * T * 1000 / ms16, 1),
)
print("done", flush=True)
