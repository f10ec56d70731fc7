"""Headline benchmark: PQ 8x256 encode throughput (the north-star op).

Measures vq_tpu's jitted PQ encode (8 subspaces x 256 centroids, 128-d
vectors — BASELINE.json config 3's shape) on the available accelerator and
compares against the multithreaded C++ CPU kernel library (the hsdlib-analog
baseline, vq_tpu/native/hsd.cpp) measured on this same machine.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "vectors/sec", "vs_baseline": N}
"""

import json
import statistics
import sys
import time

import numpy as np

M, K, DIM = 8, 256, 128
N_DEVICE = 1_000_000
N_CPU = 100_000
BLOCK_ROWS = 8192
SEED = 66  # reference eval harness seed (src/bin/common.rs:9)


def measure_device() -> float:
    """Amortized timing with forced completion.

    ``block_until_ready`` can return before execution completes on tunneled
    TPU backends, so each batch of dispatches ends in a data-dependent scalar
    readback (a tiny jitted reduce of every output) and the per-call cost is
    the difference quotient between two batch sizes — fixed dispatch/readback
    latency cancels out.
    """
    import jax
    import jax.numpy as jnp

    from vq_tpu.models.pq import pq_encode_best
    from vq_tpu.ops.distance import Metric

    # Generate on device: host<->device transfers through a TPU tunnel can
    # run at ~MB/s, so a 512 MB upload would dominate the benchmark's wall
    # clock (not its timed region, but the driver's time budget).
    kx, kc = jax.random.split(jax.random.PRNGKey(SEED))
    x = jax.random.uniform(kx, (N_DEVICE, DIM), jnp.float32)
    cb = jax.random.uniform(kc, (M, K, DIM // M), jnp.float32)

    @jax.jit
    def probe(codes):
        return jnp.sum(codes[:8, :])

    def encode():
        return pq_encode_best(x, cb, Metric.EUCLIDEAN, BLOCK_ROWS)

    int(probe(encode()))  # warm both programs

    def run(reps: int) -> float:
        t0 = time.perf_counter()
        outs = [encode() for _ in range(reps)]
        for o in outs:
            int(probe(o))
        return time.perf_counter() - t0

    run(2)  # settle
    r_small, r_large = 3, 13
    t_small = min(run(r_small) for _ in range(2))
    t_large = min(run(r_large) for _ in range(2))
    per_call = max((t_large - t_small) / (r_large - r_small), 1e-9)
    return N_DEVICE / per_call


def measure_cpu_baseline() -> float | None:
    """Multithreaded C++ AVX kernels — the reference's hsdlib-style CPU path."""
    try:
        from vq_tpu import native

        if not native.available():
            return None
        rng = np.random.default_rng(SEED)
        x = rng.random((N_CPU, DIM), dtype=np.float32)
        cb = rng.random((M, K, DIM // M), dtype=np.float32)
        native.pq_encode(x[:1000], cb)  # warm the thread pool
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            native.pq_encode(x, cb, num_threads=0)
            times.append(time.perf_counter() - t0)
        return N_CPU / min(times)
    except Exception:
        return None


def main() -> None:
    device_vps = measure_device()
    cpu_vps = measure_cpu_baseline()
    result = {
        "metric": "pq_8x256_128d_encode_throughput",
        "value": round(device_vps, 1),
        "unit": "vectors/sec",
        "vs_baseline": round(device_vps / cpu_vps, 2) if cpu_vps else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
