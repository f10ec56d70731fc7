#!/bin/bash
# Round-5 artifact regeneration: sequential (one TPU process at a time).
# 1. ivf_scale 4M..32M on chunk-pool storage (VERDICT r4 #1)
# 2. stream_100M kill+resume with decoupled checkpointing (#3)
# 3. graph builds, tight + smooth (#6)
# 4. serving + ivf 1M benches post-ChunkPool-migration (storage changed
#    under them in 2d8536c; COMPARE=1 asserts fused-vs-XLA parity)
# 5. eval grids x4, uniform + clustered corpora (#7)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=benchmarks/results
L=/tmp/regen_r5
mkdir -p $L

echo "=== 1 ivf_scale (4M..32M, chunk pool; one size per process so"
echo "    each size's rows flush even if a later size dies) ==="
for n in 4194304 8388608 16777216 33554432; do
  IVF_SCALE_JSONL=$L/scale_$n.jsonl \
    timeout 7000 python -u benchmarks/ivf_scale.py \
    --sizes $n > $L/scale_$n.log 2>&1
  echo "scale n=$n rc=$?"
done
cat $L/scale_4194304.jsonl $L/scale_8388608.jsonl \
    $L/scale_16777216.jsonl $L/scale_33554432.jsonl \
    > $R/ivf_scale_tpu.jsonl 2>/dev/null
echo "scale rows: $(wc -l < $R/ivf_scale_tpu.jsonl)"

echo "=== 2 stream_100M (kill + resume + eval) ==="
rm -f $R/stream_100M_tpu.jsonl /tmp/stream_100M_ckpt.npz
timeout 7000 python -u benchmarks/stream_100M.py --kill-after 3 \
  > $L/stream1.log 2>&1
echo "stream kill rc=$? (expect 42)"
timeout 7000 python -u benchmarks/stream_100M.py --resume > $L/stream2.log 2>&1
echo "stream resume rc=$?"

echo "=== 3 graph tight (noise 0.15) ==="
: > $R/graph_1M_tight_tpu.jsonl
GRAPH_BENCH_JSONL=$R/graph_1M_tight_tpu.jsonl GRAPH_BENCH_NOISE=0.15 \
  timeout 4000 python -u benchmarks/graph_bench.py > $L/graph_tight.log 2>&1
echo "graph tight rc=$?"

echo "=== 4 graph smooth (noise 1.0) ==="
: > $R/graph_1M_smooth_tpu.jsonl
GRAPH_BENCH_JSONL=$R/graph_1M_smooth_tpu.jsonl \
  timeout 4000 python -u benchmarks/graph_bench.py > $L/graph_smooth.log 2>&1
echo "graph smooth rc=$?"

echo "=== 5 serving_bench (fused+xla compare, rebalance) ==="
: > $R/serving_1M_tpu.jsonl
SERVING_BENCH_JSONL=$R/serving_1M_tpu.jsonl SERVING_BENCH_COMPARE=1 \
  SERVING_BENCH_REBALANCE=2048 \
  timeout 8000 python -u benchmarks/serving_bench.py > $L/serving.log 2>&1
echo "serving rc=$?"

echo "=== 6 ivf_bench 1M ==="
: > $R/ivf_1M_tpu.jsonl
timeout 4000 python -u benchmarks/ivf_bench.py \
  --output $R/ivf_1M_tpu.jsonl > $L/ivf.log 2>&1
echo "ivf rc=$?"

echo "=== 7 eval grids (uniform + clustered) ==="
for alg in sq bq pq tsvq; do
  : > $R/eval_${alg}_tpu.jsonl
  for corpus in synthetic clustered; do
    timeout 5000 python -u -m vq_tpu.cli.eval_$alg --recall \
      --corpus $corpus --output-append $R/eval_${alg}_tpu.jsonl \
      > $L/eval_${alg}_${corpus}.log 2>&1
    echo "eval_$alg $corpus rc=$?"
  done
done
echo "=== ALL DONE ==="
