"""TSVQ eval harness (reference: src/bin/eval_tsvq.rs).

Run: ``python -m vq_tpu.cli.eval_tsvq [--max-depth 5]``
"""

from __future__ import annotations

from vq_tpu.cli.common import (
    TSVQ_DEPTH,
    BenchmarkResult,
    Timer,
    base_parser,
    block,
    device_encode_ms,
    emit,
    generate_synthetic_data,
    reconstruction_mse,
    resolve_corpus,
    windowed_recall_at_k,
)


def main(argv=None) -> None:
    p = base_parser("Benchmark tree-structured VQ")
    p.add_argument("--max-depth", type=int, default=TSVQ_DEPTH)
    p.add_argument("--distance", type=str, default="euclidean")
    p.add_argument("--recall", action="store_true", help="also compute recall@10")
    args = p.parse_args(argv)

    import numpy as np

    from vq_tpu import TSVQ

    from vq_tpu.cli.common import warmup_backend

    warmup_backend()
    get_data, data_tag = resolve_corpus(args)
    results = []
    for n in args.sizes:
        # Tree build is host-orchestrated -> host data; with synthetic
        # data, encode/MSE run on a device-generated sample of the same
        # distribution (uploading the host corpus through a TPU tunnel
        # would dominate the timing). File corpora (--data) encode the
        # real rows — one documented upload.
        if data_tag == "synthetic":
            data = generate_synthetic_data(
                n, args.dim, args.seed, device=False
            )
        else:
            data = get_data(n)
            n = int(data.shape[0])  # file slices clamp; record the truth
        if not args.cold:
            # Warm the per-shape build compiles so train_ms is the
            # steady-state tree-build cost.
            TSVQ(data, max_depth=args.max_depth, distance=args.distance)
        with Timer() as t_train:
            q = TSVQ(data, max_depth=args.max_depth, distance=args.distance)
        if data_tag == "synthetic":
            dev_data = generate_synthetic_data(n, args.dim, args.seed + 1)
        else:
            import jax.numpy as jnp

            dev_data = jnp.asarray(data)
        if not args.cold:
            block(q.encode(dev_data))
        with Timer() as t_enc:
            codes = block(q.encode(dev_data))
        data = dev_data
        recon = q.decode(codes)
        results.append(
            BenchmarkResult(
                algorithm="tsvq",
                num_samples=n,
                dim=args.dim,
                train_ms=t_train.ms,
                encode_ms=t_enc.ms,
                mse=reconstruction_mse(data, recon),
                recall_at_k=(
                    windowed_recall_at_k(data, recon, seed=args.seed)
                    if args.recall else None
                ),
                extra={
                    "max_depth": args.max_depth,
                    "nodes": q.num_nodes,
                    "leaves": q.num_leaves,
                    "data": data_tag,
                    **(
                        {"encode_ms_device": d}
                        if not args.cold
                        and (d := device_encode_ms(q.encode, dev_data))
                        is not None
                        else {}
                    ),
                },
            )
        )
    emit(results, args.output, args.output_append)


if __name__ == "__main__":
    main()
