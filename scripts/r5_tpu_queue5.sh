#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p tpu_logs
run() {
  local name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] START $name: $*"
  timeout 7200 env "$@" > "tpu_logs/r5_${name}.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] DONE  $name rc=$?"
  tail -4 "tpu_logs/r5_${name}.log" | sed 's/^/    /'
}
run fusede4c PARLAYANN_FUSED_E=4 python scripts/diag_fused_e.py
run highbeam_e2 PARLAYANN_FUSED_E=2 QS=110,240,350 python scripts/diag_highbeam.py
run highbeam_e4c PARLAYANN_FUSED_E=4 QS=110,240,350 python scripts/diag_highbeam.py
echo "=== [$(date +%H:%M:%S)] QUEUE5 COMPLETE"
