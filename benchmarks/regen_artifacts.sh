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

# --- Round-4 artifacts -------------------------------------------------
echo "=== 7 eval grids (client + scan-chained device rates) ==="
bash benchmarks/regen_eval_grids.sh

echo "=== 8 roofline (RPC-subtracted calibration) ==="
rm -f $R/roofline_r4_tpu.jsonl
timeout 9000 python -u benchmarks/roofline_chain.py \
  --output $R/roofline_r4_tpu.jsonl > $L/roofline.log 2>&1
echo "roofline rc=$?"

echo "=== 9 IVF epilogue decomposition ==="
IVF_EPILOGUE_JSONL=$R/ivf_epilogue_tpu.jsonl \
  timeout 3000 python -u benchmarks/ivf_epilogue_bench.py > $L/epilogue.log 2>&1
echo "epilogue rc=$?"

echo "=== 10 IVF crossover at 4M (8M documents the memory limit) ==="
rm -f $R/ivf_scale_tpu.jsonl
IVF_SCALE_JSONL=$R/ivf_scale_tpu.jsonl \
  timeout 8000 python -u benchmarks/ivf_scale.py --sizes 4194304 > $L/scale.log 2>&1
echo "scale rc=$?"

echo "=== 11 streaming config-5 (kill + resume + eval) ==="
rm -f $R/stream_100M_tpu.jsonl /tmp/stream_100M_ckpt.npz
timeout 7000 python -u benchmarks/stream_100M.py --kill-after 3 \
  > $L/stream1.log 2>&1
echo "stream kill rc=$? (expect 42)"
timeout 7000 python -u benchmarks/stream_100M.py --resume > $L/stream2.log 2>&1
echo "stream resume rc=$?"

echo "=== 12 parity (north-star quality metrics) ==="
timeout 7000 python -u benchmarks/parity.py \
  --output $R/parity_1M_tpu.jsonl > $L/parity.log 2>&1
echo "parity rc=$?"

echo "=== 13 virtual scaling (CPU mesh; not a hardware measurement) ==="
timeout 900 python benchmarks/scaling.py --virtual 8 --rows-per-device 32768 \
  --iters 10 2>/dev/null > $R/scaling_virtual_cpu.jsonl
timeout 600 python benchmarks/scaling_multiproc.py --rows-per-device 32768 \
  --iters 10 2>/dev/null | grep '^{' >> $R/scaling_virtual_cpu.jsonl
echo "scaling rc=$?"
