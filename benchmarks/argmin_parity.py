"""Which fused argmin mode matches the XLA (lowest-index-ties) reference
at 1M scale on real TPU? Resolves the 7e-7 disagreement between `reduce`
and `int2` seen in benchmarks/argmin_modes.py."""
import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.models.pq import _pq_encode_jit
from vq_tpu.ops.distance import Metric
from vq_tpu.ops.pallas_kernels import pq_encode_fused

M, K, DIM, N = 8, 256, 128, 1_000_000
print("backend:", jax.default_backend(), flush=True)
kx, kc = jax.random.split(jax.random.PRNGKey(66))
x = jax.random.uniform(kx, (N, DIM), jnp.float32)
cb = jax.random.uniform(kc, (M, K, DIM // M), jnp.float32)

ref = np.asarray(_pq_encode_jit(x, cb, Metric.SQUARED_EUCLIDEAN, 8192))
for mode in ("reduce", "int2"):
    got = np.asarray(pq_encode_fused(x, cb, block_rows=768, argmin_mode=mode))
    n_mismatch = int((got != ref).sum())
    print(f"{mode} vs XLA argmin: {n_mismatch} mismatches / {ref.size}", flush=True)
print("DONE", flush=True)
