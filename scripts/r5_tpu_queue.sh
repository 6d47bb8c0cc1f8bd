#!/bin/bash
# Round-5 TPU bench queue (VERDICT r4 #1): run the six landed-but-unmeasured
# device benches sequentially — ONE TPU process at a time (CLAUDE.md).
# Usage: nohup bash scripts/r5_tpu_queue.sh > tpu_logs/r5_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p tpu_logs

run() {
  local name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] START $name: $*"
  timeout 7200 env "$@" > "tpu_logs/r5_${name}.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] DONE  $name rc=$rc"
  tail -5 "tpu_logs/r5_${name}.log" | sed 's/^/    /'
}

# (a) dedup A/B on the fused path (env read at trace time -> one proc per mode)
run dedup_loop  PARLAYANN_DEDUP=loop  python scripts/diag_dedup_ab.py
run dedup_merge PARLAYANN_DEDUP=merge python scripts/diag_dedup_ab.py

# (b) build A/B: shipped default vs fused read phase, both cap regimes
run build_ab VARIANTS="0.04:2,0.04:2:0:2:64:1,0.08:4,0.08:4:0:2:64:1" \
    python scripts/diag_build_ab.py

# (c) HNSW with fused level-0 routing: f32 vs q8 build tier, cap A/B
run hnsw_f32 WHICH=hnsw HNSW_Q8=0 HNSW_CAP=0.02 python scripts/bench_builders.py
run hnsw_q8  WHICH=hnsw HNSW_Q8=1 HNSW_CAP=0.02 python scripts/bench_builders.py
run hnsw_q8cap WHICH=hnsw HNSW_Q8=1 HNSW_CAP=0.08 python scripts/bench_builders.py

# (d) MIPS / uint8 at 1M — first device numbers for the BASELINE bigann class
run mips_u8 python scripts/bench_mips_u8.py

# (e) JL-bit dim sweep at 1M
run jlbit WHICH=jlbit python scripts/bench_1m_tiers.py

# (f) range search sweep
run range python scripts/bench_range.py

echo "=== [$(date +%H:%M:%S)] QUEUE COMPLETE"
