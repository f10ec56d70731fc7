#!/bin/bash
# Round-4 (VERDICT r3 #4): regenerate the four reference-grid eval
# artifacts with the scan-chained device rate (encode_ms_device) next to
# the client encode_ms. Sequential — one TPU process at a time.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=benchmarks/results
L=/tmp/regen_logs
mkdir -p $L

for alg in sq bq pq tsvq; do
  echo "=== eval_$alg (warm grid + device rate) ==="
  timeout 5000 python -u -m vq_tpu.cli.eval_$alg --recall \
    --output $R/eval_${alg}_tpu.jsonl > $L/eval_$alg.log 2>&1
  echo "eval_$alg rc=$?"
done
