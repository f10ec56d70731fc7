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
    emit,
    generate_synthetic_data,
    reconstruction_mse,
)


def main(argv=None) -> None:
    p = base_parser("Benchmark tree-structured VQ")
    p.add_argument("--max-depth", type=int, default=TSVQ_DEPTH)
    p.add_argument("--distance", type=str, default="euclidean")
    args = p.parse_args(argv)

    import numpy as np

    from vq_tpu import TSVQ

    results = []
    for n in args.sizes:
        data = generate_synthetic_data(n, args.dim, args.seed)
        with Timer() as t_train:
            q = TSVQ(data, max_depth=args.max_depth, distance=args.distance)
        with Timer() as t_enc:
            codes = block(q.encode(data))
        recon = np.asarray(q.decode(codes))
        results.append(
            BenchmarkResult(
                algorithm="tsvq",
                num_samples=n,
                dim=args.dim,
                train_ms=t_train.ms,
                encode_ms=t_enc.ms,
                mse=reconstruction_mse(data, recon),
                extra={
                    "max_depth": args.max_depth,
                    "nodes": q.num_nodes,
                    "leaves": q.num_leaves,
                },
            )
        )
    emit(results, args.output)


if __name__ == "__main__":
    main()
