"""PQ eval harness (reference: src/bin/eval_pq.rs).

Sweeps corpus sizes; times codebook training (batched Lloyd's) and encode;
reports reconstruction MSE and windowed recall@10 like the reference
(src/bin/eval_pq.rs:60-69 + src/bin/common.rs:89-130).

Run: ``python -m vq_tpu.cli.eval_pq [--m 16] [--k 256] [--max-iters 10]``
"""

from __future__ import annotations

from vq_tpu.cli.common import (
    MAX_ITERS,
    PQ_K,
    PQ_M,
    BenchmarkResult,
    Timer,
    base_parser,
    block,
    device_encode_ms,
    emit,
    reconstruction_mse,
    resolve_corpus,
    windowed_recall_at_k,
)


def main(argv=None) -> None:
    p = base_parser("Benchmark product quantization")
    p.add_argument("--m", type=int, default=PQ_M, help="number of subspaces")
    p.add_argument("--k", type=int, default=PQ_K, help="centroids per subspace")
    p.add_argument("--max-iters", type=int, default=MAX_ITERS)
    p.add_argument("--distance", type=str, default="euclidean")
    p.add_argument("--recall", action="store_true", help="also compute recall@10")
    args = p.parse_args(argv)

    import numpy as np

    from vq_tpu import ProductQuantizer

    from vq_tpu.cli.common import warmup_backend

    warmup_backend()
    get_data, data_tag = resolve_corpus(args)
    results = []
    for n in args.sizes:
        data = get_data(n)
        import jax.numpy as jnp

        data = jnp.asarray(data)  # one upload, outside every timed region
        n = int(data.shape[0])  # file slices clamp; record the truth

        def fit():
            return ProductQuantizer(
                data,
                num_subspaces=args.m,
                num_centroids=args.k,
                max_iters=args.max_iters,
                distance=args.distance,
                seed=args.seed,
            )

        if not args.cold:  # warm compiles + the block() probe (deterministic rerun)
            block(fit().codebooks)
        with Timer() as t_train:
            q = fit()
            block(q.codebooks)
        if not args.cold:
            block(q.encode(data))
        with Timer() as t_enc:
            codes = block(q.encode(data))
        recon = q.decode(codes)  # device; only pulled to host if --recall
        extra = {
            "m": args.m,
            "k": args.k,
            "code_bytes_per_vector": int(codes.shape[1]) * codes.dtype.itemsize,
            "data": data_tag,
        }
        if not args.cold:
            # Chip-side rate: scan-chained so the ~29 ms per-dispatch
            # tunnel RPC (which floors encode_ms from 1k to 1M rows)
            # amortizes away — encode_ms stays the single-dispatch
            # CLIENT time for reference-grid continuity.
            dev_ms = device_encode_ms(lambda x: q.encode(x), data)
            if dev_ms is not None:
                extra["encode_ms_device"] = dev_ms
        recall = (
            # Device arrays pass through unconverted — recall computes
            # on-device (host pull of a 1M corpus would take ~15 min
            # through the tunnel).
            windowed_recall_at_k(data, recon, seed=args.seed)
            if args.recall
            else None
        )
        results.append(
            BenchmarkResult(
                algorithm="pq",
                num_samples=n,
                dim=args.dim,
                train_ms=t_train.ms,
                encode_ms=t_enc.ms,
                mse=reconstruction_mse(data, recon),
                recall_at_k=recall,
                extra=extra,
            )
        )
    emit(results, args.output, args.output_append)


if __name__ == "__main__":
    main()
