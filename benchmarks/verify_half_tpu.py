"""TPU check: half-width (bf16/f16) corpus path through the fused kernels.

Codes must be identical to feeding the same values as f32; also times the
bf16 encode (HBM read halves; op is MXU-bound so expect parity, not a win).

    PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/verify_half_tpu.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.ops.kmeans import assign
from vq_tpu.ops.pallas_kernels import pq_encode_fused

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"

M, K, DIM, N = 8, 256, 128, 200_000
kx, kc = jax.random.split(jax.random.PRNGKey(66))
# Values exactly representable in bf16 AND f16: start from bf16.
x16 = jax.random.uniform(kx, (N, DIM), jnp.float32).astype(jnp.bfloat16)
x32 = x16.astype(jnp.float32)
cb = jax.random.uniform(kc, (M, K, DIM // M), jnp.float32)

ok = True
for dtype in (jnp.bfloat16, jnp.float16):
    xh = x32.astype(dtype)
    try:
        got = np.asarray(pq_encode_fused(xh, cb, block_rows=768))
        want = np.asarray(pq_encode_fused(x32, cb, block_rows=768))
        same = np.array_equal(got, want)
    except Exception as e:  # noqa: BLE001
        print(f"  {dtype.__name__} exception: {repr(e)[:160]}", flush=True)
        same = False
    print(("PASS " if same else "FAIL ") + f"pq_encode_fused {dtype.__name__}",
          flush=True)
    ok &= same

c = jax.random.uniform(jax.random.PRNGKey(1), (256, DIM), jnp.float32)
codes_h, _ = assign(x16, c)
codes_f, _ = assign(x32, c)
same = np.array_equal(np.asarray(codes_h), np.asarray(codes_f))
print(("PASS " if same else "FAIL ") + "assign_fused bf16", flush=True)
ok &= same

print("ALL_OK" if ok else "SOME_FAILED", flush=True)
