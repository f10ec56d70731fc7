#!/bin/bash
# Regenerate the committed eval artifacts at the full reference grid
# {1k, 5k, 10k, 50k, 100k, 1M} (reference src/bin/common.rs:10) with
# recall@10, warm (steady-state) timing, on the real TPU.
#
#   PYTHONPATH=/root/repo:/root/.axon_site bash benchmarks/run_eval_grid.sh
#
# Serialize: ONE TPU process at a time (the axon tunnel grant).
set -e
cd "$(dirname "$0")/.."
OUT=benchmarks/results
mkdir -p "$OUT"
SIZES="1000 5000 10000 50000 100000 1000000"

echo "=== eval_sq ==="
python -u -m vq_tpu.cli.eval_sq   --sizes $SIZES --recall --output "$OUT/eval_sq_tpu.jsonl"
echo "=== eval_bq ==="
python -u -m vq_tpu.cli.eval_bq   --sizes $SIZES --recall --output "$OUT/eval_bq_tpu.jsonl"
echo "=== eval_pq ==="
python -u -m vq_tpu.cli.eval_pq   --sizes $SIZES --recall --output "$OUT/eval_pq_tpu.jsonl"
echo "=== eval_tsvq ==="
python -u -m vq_tpu.cli.eval_tsvq --sizes $SIZES --recall --output "$OUT/eval_tsvq_tpu.jsonl"
echo "ALL DONE"
