"""Worker for the multi-process (DCN-path) distributed test.

Launched by ``tests/test_multiprocess.py`` as N separate OS processes, each
owning a disjoint set of virtual CPU devices (``XLA_FLAGS=
--xla_force_host_platform_device_count=<local>`` set by the launcher). The
processes rendezvous through ``init_distributed`` (a real
``jax.distributed`` coordinator + Gloo CPU collectives — the same code path
a multi-host TPU pod uses over DCN), build one global mesh, and run the
sharded trainer and a sharded search across the process boundary.

Process 0 writes the results to ``--out`` as an ``.npz``; the launcher
compares them against the single-process GSPMD result.

Not a pytest module (no ``test_`` prefix) — invoked via subprocess only.
"""

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    # The TPU-tunnel site hook force-selects its platform through
    # jax.config (env JAX_PLATFORMS does not stick) — pin CPU before any
    # backend initialization.
    jax.config.update("jax_platforms", "cpu")

    from vq_tpu.parallel.mesh import init_distributed

    pid = init_distributed(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert pid == args.process_id, (pid, args.process_id)
    # Idempotent re-entry must be a no-op, not an error.
    assert init_distributed(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    ) == args.process_id

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vq_tpu.parallel import make_mesh, sharded_flat_search, sharded_pq_train
    from vq_tpu.search import FlatIndex

    assert jax.process_count() == args.num_processes
    n_global = jax.device_count()

    # 2-D mesh (data x subspace) spanning BOTH processes: the data-axis psum
    # and the search all_gather must cross the process boundary.
    mesh = make_mesh(n_devices=n_global, subspace_parallel=2)

    rng = np.random.default_rng(7)  # identical corpus on every process
    data = rng.random((256, 16), dtype=np.float32)
    queries = rng.random((8, 16), dtype=np.float32)

    res = sharded_pq_train(data, 2, 4, max_iters=3, seed=0, mesh=mesh)
    # Replicate the sub-sharded codebooks so every process can read them.
    cb = jax.jit(
        lambda c: c, out_shardings=NamedSharding(mesh, P())
    )(res.centroids)

    serve_mesh = make_mesh(n_devices=n_global, subspace_parallel=1)
    idx = FlatIndex(dim=16)
    idx.add(data)
    ids, dists = sharded_flat_search(idx, queries, k=5, mesh=serve_mesh)

    if args.process_id == 0:
        np.savez(
            args.out,
            centroids=np.asarray(cb),
            inertia=np.float32(res.inertia),
            iterations=np.asarray(res.iterations),
            ids=np.asarray(ids),
            dists=np.asarray(dists),
        )
    # All processes must reach shutdown together (the coordinator tears the
    # cluster down when process 0 exits).
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
