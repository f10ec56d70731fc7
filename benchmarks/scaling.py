"""Weak-scaling benchmark for sharded k-means/PQ training.

Holds per-device work constant while growing the device count and reports
seconds/iteration and scaling efficiency (t_1 / t_N under weak scaling —
1.0 means communication is fully hidden). On real multi-chip hardware this
measures the north-star 1→N-host efficiency; on a single host with
`--virtual N` it exercises the identical code path on a forced N-device CPU
mesh (functional validation + communication-volume accounting, not a
hardware measurement).

Usage:
    python benchmarks/scaling.py --virtual 8 --rows-per-device 8192
    python benchmarks/scaling.py            # real devices, all of them

One JSON line per device count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Runnable as `python benchmarks/scaling.py` from the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--virtual", type=int, default=0,
                   help="force an N-device CPU mesh (single host)")
    p.add_argument("--rows-per-device", type=int, default=16384)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--k", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--seed", type=int, default=66)
    args = p.parse_args(argv)

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    from vq_tpu.parallel import make_mesh, sharded_pq_train

    n_devices = len(jax.devices())
    rng = np.random.default_rng(args.seed)

    results = []
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_devices]
    for nd in counts:
        n = args.rows_per_device * nd
        data = rng.random((n, args.dim), dtype=np.float32)
        mesh = make_mesh(n_devices=nd)
        # Warm (compile) then measure.
        sharded_pq_train(
            data, args.m, args.k, max_iters=1, seed=args.seed, mesh=mesh
        ).centroids.block_until_ready()
        t0 = time.perf_counter()
        res = sharded_pq_train(
            data, args.m, args.k, max_iters=args.iters, seed=args.seed + 1,
            mesh=mesh,
        )
        res.centroids.block_until_ready()
        dt = time.perf_counter() - t0
        iters = int(np.max(np.asarray(res.iterations)))
        per_iter = dt / max(iters, 1)
        results.append((nd, per_iter))
        base = results[0][1]
        psum_bytes = args.m * args.k * (args.dim // args.m + 1) * 4
        print(
            json.dumps(
                {
                    "devices": nd,
                    "rows_total": n,
                    "sec_per_iter": round(per_iter, 5),
                    "weak_scaling_efficiency": round(base / per_iter, 4),
                    "psum_payload_bytes": psum_bytes,
                    "virtual": bool(args.virtual),
                }
            ),
            flush=True,
        )

    if len(results) > 1:
        eff = results[0][1] / results[-1][1]
        print(
            f"# 1->{results[-1][0]} devices weak-scaling efficiency: "
            f"{eff:.1%}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
