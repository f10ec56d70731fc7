#!/bin/bash
# Round-5 second pass: reruns with the block-wise rebalance, SMEM probe
# guard, and threaded stream checkpoints; plus the deep-TSVQ bench.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=benchmarks/results
L=/tmp/regen_r5
mkdir -p $L

echo "=== 16M ivf_scale (block-wise rebalance) ==="
IVF_SCALE_JSONL=$L/scale_16777216.jsonl \
  timeout 7000 python -u benchmarks/ivf_scale.py \
  --sizes 16777216 > $L/scale_16777216.log 2>&1
echo "scale 16M rc=$?"

echo "=== 32M ivf_scale ==="
IVF_SCALE_JSONL=$L/scale_33554432.jsonl \
  timeout 10000 python -u benchmarks/ivf_scale.py \
  --sizes 33554432 > $L/scale_33554432.log 2>&1
echo "scale 32M rc=$?"

cat $L/scale_4194304.jsonl $L/scale_8388608.jsonl \
    $L/scale_16777216.jsonl $L/scale_33554432.jsonl \
    > $R/ivf_scale_tpu.jsonl 2>/dev/null
echo "scale rows: $(wc -l < $R/ivf_scale_tpu.jsonl)"

echo "=== stream_100M rerun (threaded checkpoints) ==="
rm -f $R/stream_100M_tpu.jsonl /tmp/stream_100M_ckpt.npz
timeout 7000 python -u benchmarks/stream_100M.py --kill-after 3 \
  > $L/stream1b.log 2>&1
echo "stream kill rc=$? (expect 42)"
timeout 7000 python -u benchmarks/stream_100M.py --resume > $L/stream2b.log 2>&1
echo "stream resume rc=$?"

echo "=== graph tight (noise 0.15) ==="
: > $R/graph_1M_tight_tpu.jsonl
GRAPH_BENCH_JSONL=$R/graph_1M_tight_tpu.jsonl GRAPH_BENCH_NOISE=0.15 \
  timeout 4000 python -u benchmarks/graph_bench.py > $L/graph_tight_b.log 2>&1
echo "graph tight rc=$?"

echo "=== graph smooth (noise 1.0) ==="
: > $R/graph_1M_smooth_tpu.jsonl
GRAPH_BENCH_JSONL=$R/graph_1M_smooth_tpu.jsonl \
  timeout 4000 python -u benchmarks/graph_bench.py > $L/graph_smooth_b.log 2>&1
echo "graph smooth rc=$?"

echo "=== tsvq_deep (depth 10 vs 12 at 1M x 384) ==="
timeout 4000 python -u benchmarks/tsvq_deep.py \
  --output $R/tsvq_deep_tpu.jsonl > $L/tsvq_deep.log 2>&1
echo "tsvq_deep rc=$?"

echo "=== bench.py sanity ==="
timeout 2000 python bench.py > $L/bench.log 2>&1
echo "bench rc=$?"
tail -1 $L/bench.log
echo "=== ALL DONE (r5b) ==="
