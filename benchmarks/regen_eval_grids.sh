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

# Both corpora per algorithm (round 5, VERDICT r4 #7): uniform rows for
# reference continuity, clustered rows so the quality columns can move.
# Rows append into one file per algorithm; the 'data' tag separates them.
for alg in sq bq pq tsvq; do
  : > $R/eval_${alg}_tpu.jsonl
  for corpus in synthetic clustered; do
    echo "=== eval_$alg ($corpus grid + device rate) ==="
    timeout 5000 python -u -m vq_tpu.cli.eval_$alg --recall \
      --corpus $corpus --output-append $R/eval_${alg}_tpu.jsonl \
      > $L/eval_${alg}_${corpus}.log 2>&1
    echo "eval_$alg $corpus rc=$?"
  done
done
