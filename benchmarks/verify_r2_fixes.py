"""Round-2 TPU verification: Mosaic-alignment fix, fused encode dispatch,
device-side k-means++. Run on the real TPU (axon tunnel):

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/verify_r2_fixes.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"

rng = np.random.default_rng(0)
ok = True


def check(name, cond):
    global ok
    print(("PASS " if cond else "FAIL ") + name, flush=True)
    ok = ok and cond


# 1. lloyd_accumulate_fused at former crash sizes (ADVICE r1 high).
from vq_tpu.ops.kmeans import _assign_accumulate
from vq_tpu.ops.pallas_kernels import (
    lloyd_accumulate_fused,
    pq_lloyd_accumulate_fused,
)

for n in (400, 1000, 131):
    x = rng.random((n, 24), dtype=np.float32)
    c = rng.random((17, 24), dtype=np.float32)
    try:
        s_p, c_p, i_p = lloyd_accumulate_fused(x, c, block_rows=1024)
        s_r, c_r, i_r = _assign_accumulate(jnp.asarray(x), jnp.asarray(c), 256)
        good = (
            np.array_equal(np.asarray(c_p), np.asarray(c_r))
            and np.allclose(np.asarray(s_p), np.asarray(s_r), rtol=1e-5, atol=1e-4)
            and np.isclose(float(i_p), float(i_r), rtol=1e-5)
        )
    except Exception as e:  # noqa: BLE001
        print("  exception:", repr(e)[:200], flush=True)
        good = False
    check(f"lloyd_accumulate_fused n={n}", good)

for n in (400, 1000):
    m, s, k = 2, 8, 10
    x = rng.random((n, m * s), dtype=np.float32)
    cb = rng.random((m, k, s), dtype=np.float32)
    try:
        sums, counts, _ = pq_lloyd_accumulate_fused(x, cb, block_rows=1024)
        good = True
        for i in range(m):
            xs = jnp.asarray(x[:, i * s : (i + 1) * s])
            s_r, c_r, _ = _assign_accumulate(xs, jnp.asarray(cb[i]), 256)
            good = good and np.array_equal(np.asarray(counts[i]), np.asarray(c_r))
            good = good and np.allclose(
                np.asarray(sums[i]), np.asarray(s_r), rtol=1e-5, atol=1e-4
            )
    except Exception as e:  # noqa: BLE001
        print("  exception:", repr(e)[:200], flush=True)
        good = False
    check(f"pq_lloyd_accumulate_fused n={n}", good)

# 2. End-to-end small-odd-n training through the public API (used to crash).
from vq_tpu.models.pq import ProductQuantizer, _pq_encode_jit, pq_encode
from vq_tpu.ops.distance import Metric
from vq_tpu.ops.kmeans import lloyd

try:
    res = lloyd(rng.random((400, 16), dtype=np.float32), 8, max_iters=5, seed=0)
    check("lloyd n=400 end-to-end", int(res.iterations) >= 1)
except Exception as e:  # noqa: BLE001
    print("  exception:", repr(e)[:200], flush=True)
    check("lloyd n=400 end-to-end", False)

# 3. pq_encode now dispatches the fused kernel — parity with XLA on TPU.
data = rng.random((3000, 64), dtype=np.float32)
q = ProductQuantizer(data, 8, 256, max_iters=3, seed=1)
codes_pub = np.asarray(pq_encode(data, q.codebooks, "euclidean"))
codes_xla = np.asarray(
    _pq_encode_jit(jnp.asarray(data), q.codebooks, Metric.EUCLIDEAN, 1024)
)
check("pq_encode public==XLA on TPU", np.array_equal(codes_pub, codes_xla))

# 4. Device-side k-means++: on-device, deterministic, sane inertia.
from vq_tpu.ops.kmeans import kmeans_plusplus_init_device

centers = rng.normal(0, 10.0, (8, 16)).astype(np.float32)
blob = (centers[rng.integers(0, 8, 4000)]
        + rng.normal(0, 0.05, (4000, 16))).astype(np.float32)
blob_dev = jnp.asarray(blob)
s1 = np.asarray(kmeans_plusplus_init_device(blob_dev, 8, seed=3))
s2 = np.asarray(kmeans_plusplus_init_device(blob_dev, 8, seed=3))
check("kpp device deterministic", np.array_equal(s1, s2))
res = lloyd(blob_dev, 8, max_iters=10, seed=3, init="kmeans++")
check("kpp lloyd finds all blobs", float(res.inertia) < 4000 * 16 * 0.01)

print("ALL_OK" if ok else "SOME_FAILED", flush=True)
sys.exit(0 if ok else 1)
