#!/bin/bash
# Round-5 TPU queue #2: re-runs with the r5 code (dedup arg, HNSW entry
# fold + build fixes, fixed-shape respill) + the new diagnostics.
# ONE TPU process at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p tpu_logs

run() {
  local name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] START $name: $*"
  timeout 10800 env "$@" > "tpu_logs/r5_${name}.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] DONE  $name rc=$rc"
  tail -5 "tpu_logs/r5_${name}.log" | sed 's/^/    /'
}

# (1) dedup A/B, clean re-run on the r5 explicit-arg path
run dedup2_loop  PARLAYANN_DEDUP=loop  python scripts/diag_dedup_ab.py
run dedup2_merge PARLAYANN_DEDUP=merge python scripts/diag_dedup_ab.py

# (2) HNSW with the r5 search fold + build fixes, both cap regimes
run hnsw2_q8     WHICH=hnsw HNSW_Q8=1 HNSW_CAP=0.02 python scripts/bench_builders.py
run hnsw2_q8cap  WHICH=hnsw HNSW_Q8=1 HNSW_CAP=0.08 python scripts/bench_builders.py

# (3) HNSW build device profile
run hnsw2_build  python scripts/diag_hnsw_build.py

# (4) high-beam collapse diagnosis (uniform 100K)
run highbeam     python scripts/diag_highbeam.py

# (5) mid-beam tier filter A/B at 1M
run tierfilter   python scripts/bench_tier_filter.py

# (6) cluster-build guardrail check: uniform 100K build time (was 46.2s)
run hard_uniform python - <<'EOF'
import os, time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from parlayann_tpu.utils import synthetic
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.build.clusterindex import ClusterIndex
print("devices:", jax.devices(), flush=True)
for name, gen in (("uniform", synthetic.uniform),
                  ("heavy_tail", synthetic.heavy_tailed)):
    X, Q = gen(100_000, 128, n_queries=100, seed=7)
    ps = PointSet.from_numpy(X)
    for rep in range(2):
        t0 = time.perf_counter()
        ci = ClusterIndex.build(ps, m=64)
        print(f"{name} build[{rep}]: {time.perf_counter()-t0:.1f}s", flush=True)
EOF

# (7) the 10M Vamana composition (long: build + sweep)
run vam10m       python scripts/bench_10m_vamana.py



# (8) mips_u8 re-run (queue1 run died on the SMEM scalar-prefetch bound,
# fixed in ops/pallas/expand.py)
run mips2_u8 python scripts/bench_mips_u8.py

# (7b) high-recall curve: bigger-m cluster configs (the .96-.98 regime
# trails the baseline's .971 @ 956K; r3 leftover "bigger-m unexplored")
run cluster_m128 CB_M=128 python scripts/bench_cluster.py
run cluster_m96  CB_M=96  python scripts/bench_cluster.py

# (8b) jlbit re-run (queue1 run predates the SMEM chunking fix)
run jlbit2 WHICH=jlbit python scripts/bench_1m_tiers.py

# (9) final headline bench
run bench_final python bench.py
echo "=== [$(date +%H:%M:%S)] QUEUE2 COMPLETE"
