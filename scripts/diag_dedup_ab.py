"""A/B the fused-beam dedup modes on device (PARLAYANN_DEDUP=loop|merge).

The merge mode replaces phase B's Wb-pass candidate-vs-beam compare loop
with adjacency dedup after the dist merge + one segmented cleanup sort
(see fusedbeam._dedup_merged). Run once per mode (the env is read at
trace time):

  PARLAYANN_DEDUP=loop  python scripts/diag_dedup_ab.py
  PARLAYANN_DEDUP=merge python scripts/diag_dedup_ab.py

Graph is cached in bench_cache so both runs search the same artifact.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    cache = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parlayann_tpu.types import BuildParams
    from parlayann_tpu.data.pointset import PointSet
    from parlayann_tpu.data.graph import GraphIndexData
    from parlayann_tpu.build.vamana import build_vamana_graph
    from parlayann_tpu.index import Index
    from parlayann_tpu.search import exact
    from parlayann_tpu.harness.recall import compute_recall
    from parlayann_tpu.ops import quantize
    from parlayann_tpu.utils import synthetic

    mode = os.environ.get("PARLAYANN_DEDUP", "loop")
    n, d, nq, k = 100_000, 128, 10_000, 10
    rounds = int(os.environ.get("BENCH_ROUNDS", 10))
    print(f"devices: {jax.devices()}  dedup={mode}", flush=True)
    X, Q = synthetic.clustered(n, d, n_queries=nq,
                               n_clusters=max(64, n // 100),
                               cluster_std=0.35, seed=7)
    ps = PointSet.from_numpy(X)
    cdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "bench_cache")
    z = np.load(os.path.join(cdir, f"gt_{n}x{d}_{nq}.npz"))
    gt_ids, gt_dists = z["ids"], z["dists"]
    gpath = os.path.join(cdir, f"r32_{n}x{d}.graph")
    bps = quantize.quantize_pointset(ps, bits=8)
    if os.path.exists(gpath):
        graph = GraphIndexData.load(gpath)
        print("graph: cached", flush=True)
    else:
        graph, _ = build_vamana_graph(
            bps, BuildParams(R=32, L=64, alpha=1.2, num_passes=2,
                             batch_cap_frac=0.16))
        graph.save(gpath)
    idx = Index(points=ps, graph=graph).enable_quantized(bits=8)
    for beam in (10, 12, 15, 22):
        dt = float("inf")
        ids = None
        for _ in range(3):
            ids, _d, _r, dt_i = idx.batch_search_timed(
                Q, k=k, beam_size=beam, rounds=rounds)
            dt = min(dt, dt_i)
        rec = compute_recall(np.asarray(ids), gt_ids, gt_dists, k)
        print(f"  [dedup={mode}] Q={beam} recall={rec:.4f} "
              f"QPS={nq/dt:,.0f}", flush=True)


if __name__ == "__main__":
    main()
