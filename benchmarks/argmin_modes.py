"""Measure fused PQ-encode argmin modes on the real TPU (bench config:
1M x 128, 8x256). Amortized forced-completion timing per bench.py.

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/argmin_modes.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.ops.pallas_kernels import pq_encode_fused

M, K, DIM, N = 8, 256, 128, 1_000_000
BLOCK_ROWS = 768

print("backend:", jax.default_backend(), flush=True)
kx, kc = jax.random.split(jax.random.PRNGKey(66))
x = jax.random.uniform(kx, (N, DIM), jnp.float32)
cb = jax.random.uniform(kc, (M, K, DIM // M), jnp.float32)


@jax.jit
def probe(codes):
    return jnp.sum(codes[:8, :])


def timed(fn, label):
    int(probe(fn()))  # warm
    def run(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        for o in outs:
            int(probe(o))
        return time.perf_counter() - t0
    run(2)
    t_s = min(run(3) for _ in range(2))
    t_l = min(run(13) for _ in range(2))
    per = max((t_l - t_s) / 10, 1e-9)
    print(f"{label}: {per*1e3:.2f} ms -> {N/per/1e6:.2f} M vec/s", flush=True)
    return per


results = {}
for mode in ("reduce", "int2", "int1"):
    fn = lambda m=mode: pq_encode_fused(x, cb, block_rows=BLOCK_ROWS, argmin_mode=m)
    results[mode] = timed(fn, f"argmin_mode={mode}")

# Exactness of int2 / drift of int1 at scale.
base = np.asarray(pq_encode_fused(x, cb, block_rows=BLOCK_ROWS))
for mode in ("int2", "int1"):
    got = np.asarray(
        pq_encode_fused(x, cb, block_rows=BLOCK_ROWS, argmin_mode=mode)
    )
    agree = float((got == base).mean())
    print(f"{mode} agreement vs reduce at 1M: {agree:.8f}", flush=True)

print("DONE", flush=True)
