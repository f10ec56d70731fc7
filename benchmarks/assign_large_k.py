"""k-tiled fused assign at coarse-quantizer scale (VERDICT r4 #2).

The resident-kernel form of ``assign_fused`` tops out where the
``[k_pad, d]`` centroid block plus a usable data tile exceed the 15 MB
VMEM budget (~10k centroids at d=128); past that the dispatch chunks
the centroid axis at the XLA level — ceil(k/k_chunk) identical resident
kernels merged on unclamped scores with strict ``<`` (lowest index wins
exact ties). This script verifies on REAL hardware, at the large-nlist
coarse-quantizer shapes 10-100M-row IVF needs:

* bit-identical codes to the XLA argmin at k = 4096 (the round-4 OOM
  shape, fa99674) and k = 65_536, d = 128;
* scan-chained device time per 1M-row assign at both shapes, with the
  XLA path timed alongside.

One JSON line per (k, path). Run on the tunneled TPU (single process).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks._artifact import Rows

ART = Rows(os.environ.get("ASSIGN_LARGE_K_JSONL"))
RPC = 0.0293


def chain_ms(fn, T, *ops):
    @jax.jit
    def chain(*o):
        def step(c, t):
            out = fn(t, *o)
            return c + out, None

        s, _ = jax.lax.scan(
            step, jnp.float32(0), jnp.arange(T, dtype=jnp.int32)
        )
        return s

    float(chain(*ops))

    def run(r):
        t0 = time.perf_counter()
        vs = [chain(*ops) for _ in range(r)]
        for v in vs:
            float(v)
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(2) for _ in range(2))
    t2 = min(run(6) for _ in range(2))
    return max((t2 - t1) / 4 - RPC, 1e-9) / T * 1e3


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--ks", type=int, nargs="+", default=[4096, 65_536])
    p.add_argument("--parity-n", type=int, default=200_000)
    p.add_argument("--t", type=int, default=4)
    args = p.parse_args(argv)

    from vq_tpu.ops.kmeans import _assign_codes
    from vq_tpu.ops.pallas_kernels import assign_block_cap, assign_fused

    print("backend:", jax.default_backend(), flush=True)
    kx, kc = jax.random.split(jax.random.PRNGKey(66))
    x = jax.random.uniform(kx, (args.n, args.dim), jnp.float32)

    for k in args.ks:
        cents = jax.random.uniform(kc, (k, args.dim), jnp.float32)
        cap = assign_block_cap(k, args.dim)
        assert cap > 0, f"k={k} should dispatch (chunked) fused assign"

        # Parity: bit-identical codes + distances vs the XLA argmin.
        xp = x[: args.parity_n]
        codes_f, dist_f = assign_fused(xp, cents)
        codes_x, dist_x = _assign_codes(xp, cents, 8192)
        codes_f, codes_x = np.asarray(codes_f), np.asarray(codes_x)
        mismatch = int((codes_f != codes_x).sum())
        dd = float(np.max(np.abs(np.asarray(dist_f) - np.asarray(dist_x))))
        print(f"k={k}: mismatches {mismatch}/{args.parity_n}, "
              f"max |dist delta| {dd:.3e}", flush=True)

        def fused(t, x, c):
            codes, _ = assign_fused(
                x + 1e-6 * jnp.float32(t), c
            )
            return jnp.sum(jnp.float32(codes[:8]))

        def xla(t, x, c):
            codes, _ = _assign_codes(x + 1e-6 * jnp.float32(t), c, 8192)
            return jnp.sum(jnp.float32(codes[:8]))

        ms_f = chain_ms(fused, args.t, x, cents)
        ms_x = chain_ms(xla, args.t, x, cents)
        row = dict(
            bench="assign_large_k", n=args.n, dim=args.dim, k=k,
            block_cap=cap,
            code_mismatches=mismatch, parity_n=args.parity_n,
            max_dist_delta=dd,
            fused_ms=round(ms_f, 2), xla_ms=round(ms_x, 2),
            speedup=round(ms_x / ms_f, 2),
        )
        print(json.dumps(row), flush=True)
        ART.emit(**row)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
