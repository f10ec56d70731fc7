"""SQ eval harness (reference: src/bin/eval_sq.rs).

Run: ``python -m vq_tpu.cli.eval_sq [--levels 256] [--sizes ...]``
"""

from __future__ import annotations

from vq_tpu.cli.common import (
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
    p = base_parser("Benchmark scalar quantization")
    p.add_argument("--levels", type=int, default=256)
    p.add_argument("--recall", action="store_true", help="also compute recall@10")
    args = p.parse_args(argv)

    from vq_tpu import ScalarQuantizer

    from vq_tpu.cli.common import warmup_backend

    warmup_backend()
    get_data, data_tag = resolve_corpus(args)
    results = []
    for n in args.sizes:
        data = get_data(n)
        import jax.numpy as jnp

        data = jnp.asarray(data)  # one upload, outside every timed region
        n = int(data.shape[0])  # file slices clamp; record the truth
        if not args.cold:
            # Warm the min/max reduction compile + readback (the SQ "train")
            # so train_ms is the steady-state cost, not the per-shape
            # compile (~800 ms through the tunnel).
            float(data.min()), float(data.max())
        with Timer() as t_train:
            q = ScalarQuantizer(float(data.min()), float(data.max()), args.levels)
        if not args.cold:
            block(q.quantize(data))
        with Timer() as t_enc:
            codes = block(q.quantize(data))
        recon = q.dequantize(codes)
        recall = (
            windowed_recall_at_k(data, recon, seed=args.seed)
            if args.recall else None
        )
        results.append(
            BenchmarkResult(
                algorithm="sq",
                num_samples=n,
                dim=args.dim,
                train_ms=t_train.ms,
                encode_ms=t_enc.ms,
                mse=reconstruction_mse(data, recon),
                recall_at_k=recall,
                extra={
                    "levels": args.levels,
                    "data": data_tag,
                    **(
                        {"encode_ms_device": d}
                        if not args.cold
                        and (d := device_encode_ms(q.quantize, data))
                        is not None
                        else {}
                    ),
                },
            )
        )
    emit(results, args.output, args.output_append)


if __name__ == "__main__":
    main()
