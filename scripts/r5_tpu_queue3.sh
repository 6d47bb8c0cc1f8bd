#!/bin/bash
# Round-5 TPU queue #3: fused multi-expansion A/B (+ anything appended
# before it starts). Chained after queue2.
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

# HNSW re-validation: queue2's runs hit the uncast-int8-query inline bug
run hnsw3_q8    WHICH=hnsw HNSW_Q8=1 HNSW_CAP=0.02 python scripts/bench_builders.py
run hnsw3_q8cap WHICH=hnsw HNSW_Q8=1 HNSW_CAP=0.08 python scripts/bench_builders.py

run fusede1 PARLAYANN_FUSED_E=1 python scripts/diag_fused_e.py
run fusede2 PARLAYANN_FUSED_E=2 python scripts/diag_fused_e.py
run fusede4 PARLAYANN_FUSED_E=4 python scripts/diag_fused_e.py

# high-beam collapse: steps*step_cost is O(Q^2); E-way expansion cuts the
# step count E-fold at ~flat per-step growth (converged section reads
# PARLAYANN_FUSED_E per call)
run highbeam_e4 PARLAYANN_FUSED_E=4 QS=110,240,350 python scripts/diag_highbeam.py

# 10M vamana re-sweep: graph cached (40-min build skipped), 64K entry
# tier + wider beams (first sweep's 4K entry/Q<=50 capped recall at .64)
run vam10m_sweep python scripts/bench_10m_vamana.py

# tier-filter A/B re-run (queue2 run died on a transient remote-compile
# infrastructure error mid-sweep; graph+gt now cached)
run tierfilter2 python scripts/bench_tier_filter.py

echo "=== [$(date +%H:%M:%S)] QUEUE3 COMPLETE"
