#!/bin/bash
# Round-3 artifact regeneration (VERDICT r2 #2): every committed JSONL
# regenerated from shipped code, sequentially (one TPU process at a time).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=benchmarks/results
L=/tmp/regen_logs
mkdir -p $L

echo "=== 1/6 ivf_bench ==="
timeout 3000 python -u benchmarks/ivf_bench.py --output $R/ivf_1M_tpu.jsonl \
  > $L/ivf.log 2>&1
echo "ivf rc=$?"

echo "=== 2/6 eval_sq (warm grid) ==="
timeout 3000 python -u -m vq_tpu.cli.eval_sq --recall \
  --output $R/eval_sq_tpu.jsonl > $L/eval_sq.log 2>&1
echo "eval_sq rc=$?"

echo "=== 3/6 probe_profile ==="
PROBE_PROFILE_JSONL=$R/probe_profile_tpu.jsonl PROBE_PROFILE_REBALANCE=2048 \
  timeout 3000 python -u benchmarks/probe_profile.py > $L/probe.log 2>&1
echo "probe rc=$?"

echo "=== 4/6 serving_bench (fused+xla compare, rebalance) ==="
SERVING_BENCH_JSONL=$R/serving_1M_tpu.jsonl SERVING_BENCH_COMPARE=1 \
  SERVING_BENCH_REBALANCE=2048 \
  timeout 7000 python -u benchmarks/serving_bench.py > $L/serving.log 2>&1
echo "serving rc=$?"

echo "=== 5/6 graph_bench smooth (noise 1.0) ==="
GRAPH_BENCH_JSONL=$R/graph_1M_smooth_tpu.jsonl \
  timeout 3000 python -u benchmarks/graph_bench.py > $L/graph_smooth.log 2>&1
echo "graph smooth rc=$?"

echo "=== 6/6 graph_bench concentrated (noise 0.15) ==="
GRAPH_BENCH_JSONL=$R/graph_1M_tight_tpu.jsonl GRAPH_BENCH_NOISE=0.15 \
  timeout 3000 python -u benchmarks/graph_bench.py > $L/graph_tight.log 2>&1
echo "graph tight rc=$?"
echo "=== ALL DONE ==="
