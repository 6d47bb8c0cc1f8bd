#!/bin/bash
# Build + query all algorithms on a synthetic 100K slice
# (reference: algorithms/tutorial.sh)
set -e
D=$(mktemp -d)
python - <<PY
import numpy as np
from parlayann_tpu.data import io
from parlayann_tpu.utils import synthetic
X, Q = synthetic.clustered(100_000, 128, n_queries=1000, seed=0)
io.write_bin("$D/base.fbin", X); io.write_bin("$D/query.fbin", Q)
PY
python -m parlayann_tpu.tools.compute_groundtruth -base_path $D/base.fbin \
  -query_path $D/query.fbin -gt_path $D/gt.ibin -k 100
for args in "-R 32 -L 64 -alpha 1.2 -two_pass 1" \
            "-num_clusters 10 -cluster_size 1000 -mst_deg 3" \
            "-R 40 -num_clusters 10 -cluster_size 100 -alpha 1.2 -delta 0.05"; do
  python -m parlayann_tpu.cli -base_path $D/base.fbin -query_path $D/query.fbin \
    -gt_path $D/gt.ibin -Q 64 $args
done
