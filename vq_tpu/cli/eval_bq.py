"""BQ eval harness (reference: src/bin/eval_bq.rs).

Sweeps corpus sizes, timing train (O(1)) and batch quantize, reporting MSE.
Also reports packed (32x) storage stats — the TPU-native extension.

Run: ``python -m vq_tpu.cli.eval_bq [--threshold 0.5] [--sizes ...]``
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
    p = base_parser("Benchmark binary quantization")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--low", type=int, default=0)
    p.add_argument("--high", type=int, default=1)
    p.add_argument("--recall", action="store_true", help="also compute recall@10")
    args = p.parse_args(argv)

    from vq_tpu import BinaryQuantizer

    from vq_tpu.cli.common import warmup_backend

    warmup_backend()
    get_data, data_tag = resolve_corpus(args)
    results = []
    for n in args.sizes:
        data = get_data(n)
        import jax.numpy as jnp

        data = jnp.asarray(data)  # one upload, outside every timed region
        n = int(data.shape[0])  # file slices clamp; record the truth
        with Timer() as t_train:
            q = BinaryQuantizer(args.threshold, args.low, args.high)
        if not args.cold:
            block(q.quantize(data))
        with Timer() as t_enc:
            codes = block(q.quantize(data))
        recon = q.dequantize(codes)  # stays on device; MSE computes there
        if not args.cold:
            block(q.quantize_packed(data))
        with Timer() as t_pack:
            packed = block(q.quantize_packed(data))
        results.append(
            BenchmarkResult(
                algorithm="bq",
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
                    "pack_ms": t_pack.ms,
                    "packed_bytes_per_vector": int(packed.shape[1]) * 4,
                    "raw_bytes_per_vector": args.dim * 4,
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
