"""On-TPU validation of the session-3 surfaces (small shapes, one process).

Run when the tunnel is up:

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/verify_session3.py

Covers, against CPU-oracle expectations computed with numpy in-process:
SQ4 packed scan, GraphIndex incremental add, RefineIndex (flat/sq8/pqr),
ITQ fit (TPU SVD), single-chip BatchPipeline over a refined index, and
the weighted Lloyd duplication equivalence. Small N keeps tunnel
transfers and per-shape compiles tolerable (~minutes total).
"""
import time

import numpy as np
import jax

print("backend:", jax.default_backend(), flush=True)
t0 = time.time()

rng = np.random.default_rng(12)
centers = rng.normal(0, 3.0, (12, 32)).astype(np.float32)
which = rng.integers(0, 12, 3000)
x = (centers[which] + rng.normal(0, 0.3, (3000, 32))).astype(np.float32)
q = (centers[rng.integers(0, 12, 16)]
     + rng.normal(0, 0.3, (16, 32))).astype(np.float32)
gt = np.argsort(((x[None] - q[:, None]) ** 2).sum(-1), axis=1)[:, :10]


def recall(ids):
    ids = np.asarray(ids)
    return float(np.mean(
        [len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(q))]
    ))


def check(name, cond):
    print(f"  {name}: {'OK' if cond else 'FAIL'}", flush=True)
    assert cond, name


# --- SQ4 packed scan == exact decoded distances -------------------------
from vq_tpu import PerDimScalarQuantizer, SQIndex  # noqa: E402

print("[sq4]", flush=True)
sq = PerDimScalarQuantizer.from_data(x, 16)
idx = SQIndex(sq)
idx.add(x)
ids, d = idx.search(q, 10)
y = np.asarray(sq.dequantize(sq.quantize(x)))
ref = np.sort(np.sum((y[None] - q[:, None]) ** 2, axis=-1), axis=1)[:, :10]
check("pack_bits == 4", idx.pack_bits == 4)
check("distances match decoded oracle",
      np.allclose(np.sort(np.asarray(d), axis=1), ref, atol=1e-3))

# --- GraphIndex incremental add -----------------------------------------
from vq_tpu import GraphIndex  # noqa: E402

print("[graph add]", flush=True)
gi = GraphIndex.build(x[:2000], degree=16, seed=0)
gi.add(x[2000:])
ids_g, _ = gi.search(q, 10, beam=48)
check("recall after add >= 0.9", recall(ids_g) >= 0.9)
new_ids, _ = gi.search(x[2500:2516] + 0.001, 1, beam=48)
check("new rows findable",
      float(np.mean(np.asarray(new_ids)[:, 0] >= 2000)) > 0.9)

# --- RefineIndex: flat / sq8 / residual-pq -------------------------------
from vq_tpu import IVFPQIndex, RefineIndex  # noqa: E402

print("[refine]", flush=True)
base = IVFPQIndex.train(x, 8, 4, 16, max_iters=4, seed=1)
ref = RefineIndex(base, "flat")
ref.add(x)
ids_r, d_r = ref.search(q, 10, k_factor=8, nprobe=8)
i_b, _ = base.search(q, 10, nprobe=8)
check("flat refine beats base", recall(ids_r) >= recall(i_b))
top = np.asarray(ids_r)[:, 0]
expect = np.sum((x[top] - q) ** 2, axis=-1)
check("flat refine scores exact",
      np.allclose(np.asarray(d_r)[:, 0], expect, rtol=1e-4, atol=1e-4))

base2 = IVFPQIndex(base.coarse, base.pq)
ref2 = RefineIndex.train_pq(base2, x, 8, 16, max_iters=4, seed=2)
ref2.add(x)
ids_p, _ = ref2.search(q, 10, k_factor=8, nprobe=8)
eb = float(((np.asarray(base2.reconstruct(np.arange(100))) - x[:100]) ** 2).sum())
er = float(((np.asarray(ref2.reconstruct(np.arange(100))) - x[:100]) ** 2).sum())
check("pqr recon beats base recon", er < eb)

# --- single-chip pipeline over the refined index -------------------------
from vq_tpu import BatchPipeline  # noqa: E402

print("[pipeline]", flush=True)
pipe = BatchPipeline(ref, k=10, k_factor=8, nprobe=8)
qs = np.stack([q, q + 0.01])
ip, _ = pipe.search(qs)
check("pipeline == eager",
      np.array_equal(np.asarray(ip[0]), np.asarray(ids_r)))

# --- ITQ on TPU (SVD inside fori_loop) -----------------------------------
from vq_tpu import itq_train  # noqa: E402

print("[itq]", flush=True)
chain = itq_train(x, 16, iters=20, seed=3)
r = np.asarray(chain[1].matrix)
check("rotation orthogonal", np.allclose(r @ r.T, np.eye(16), atol=1e-3))

# --- weighted Lloyd duplication equivalence ------------------------------
from vq_tpu.ops.kmeans import lloyd  # noqa: E402

print("[weighted lloyd]", flush=True)
seeds = x[:4].copy()
xd = np.concatenate([x, x[:200]])
w = np.ones(len(x), np.float32)
w[:200] = 2.0
r_dup = lloyd(xd, 4, max_iters=8, init_centroids=seeds, use_pallas=False)
r_wt = lloyd(x, 4, max_iters=8, init_centroids=seeds, weights=w)
check("dup == weight centroids",
      np.allclose(np.asarray(r_dup.centroids),
                  np.asarray(r_wt.centroids), atol=1e-3))

print(f"ALL OK in {time.time() - t0:.0f} s", flush=True)
