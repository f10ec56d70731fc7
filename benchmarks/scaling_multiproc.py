"""Multi-process scaling probe: sharded PQ training across a REAL
process boundary (the DCN code path).

Launches ``--processes`` OS processes, each owning ``--local-devices``
virtual CPU devices; they rendezvous through ``jax.distributed`` (Gloo
CPU collectives — the same code path a multi-host TPU pod exercises over
DCN), build ONE global mesh, and time the identical
``sharded_pq_train`` program the single-process virtual benchmark
(benchmarks/scaling.py) runs. Process 0 emits one JSON row.

This validates that the cross-process collective path carries the
training step at a measurable rate; it is NOT a hardware efficiency
number (all processes share this host's cores). The analytical
communication model for real 1→4-host efficiency is in
docs/distributed.md.

Usage:
    python benchmarks/scaling_multiproc.py [--processes 2]
        [--local-devices 4] [--rows-per-device 16384] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(args) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from vq_tpu.parallel import make_mesh, sharded_pq_train
    from vq_tpu.parallel.mesh import init_distributed

    pid = init_distributed(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.processes
    nd = jax.device_count()
    n = args.rows_per_device * nd
    rng = np.random.default_rng(args.seed)  # identical corpus everywhere
    data = rng.random((n, args.dim), dtype=np.float32)
    mesh = make_mesh(n_devices=nd)

    # Warm (compile), then time. Collectives synchronize the processes,
    # so process 0's wall clock bounds the global step time.
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
    if pid == 0:
        sub = args.dim // args.m
        print(
            json.dumps(
                {
                    "devices": nd,
                    "processes": args.processes,
                    "rows_total": n,
                    "sec_per_iter": round(dt / max(iters, 1), 5),
                    "psum_payload_bytes": args.m * args.k * (sub + 1) * 4,
                    "virtual": True,
                    "transport": "jax.distributed + Gloo (DCN code path)",
                }
            ),
            flush=True,
        )
    jax.distributed.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--processes", type=int, default=2)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--rows-per-device", type=int, default=16384)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--k", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--seed", type=int, default=66)
    p.add_argument("--port", type=int, default=29571)
    p.add_argument("--process-id", type=int, default=None,
                   help="(internal) run as a worker")
    args = p.parse_args(argv)

    if args.process_id is not None:
        return worker(args)

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--process-id", str(i)]
            + [a for a in (argv if argv is not None else sys.argv[1:])],
            env=env,
        )
        for i in range(args.processes)
    ]
    rc = 0
    for pr in procs:
        try:
            rc |= pr.wait(timeout=600)
        except subprocess.TimeoutExpired:
            pr.kill()
            rc |= 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
