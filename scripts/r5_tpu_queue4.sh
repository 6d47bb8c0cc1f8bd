#!/bin/bash
# Round-5 TPU queue #4: E>1 fused A/B re-runs after the i1-concat fix.
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
run fusede2b PARLAYANN_FUSED_E=2 python scripts/diag_fused_e.py
run fusede4b PARLAYANN_FUSED_E=4 python scripts/diag_fused_e.py
run highbeam_e4b PARLAYANN_FUSED_E=4 QS=110,240,350 python scripts/diag_highbeam.py
# 10M re-sweep: the 64K entry tier was silently clobbered back to 4K by
# batch_search's lazy default (fixed in index.py) — the first "re-sweep"
# measured the same 4K entries
run vam10m_e64k QS=50,80,120,180,260 python scripts/bench_10m_vamana.py

echo "=== [$(date +%H:%M:%S)] QUEUE4 COMPLETE"
