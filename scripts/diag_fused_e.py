"""A/B the fused kernel's multi-expansion (PARLAYANN_FUSED_E) on device.

E=2 halves sequential steps per query while doubling per-step DMA and
growing phase-B candidate lanes 2x (sorted in packed segments, so the
algebra grows sublinearly); it forces merge dedup in-kernel. The round-4
trace put phase-B algebra at ~0.9 ms/step vs DMA 0.23 at B=10240 —
multi-expansion amortizes exactly the dominant term (VERDICT r4 #2,
target >= 1.15M QPS @ >= .95).

Run once per E (env resolved per call; jit re-keys):
  PARLAYANN_FUSED_E=1 python scripts/diag_fused_e.py
  PARLAYANN_FUSED_E=2 python scripts/diag_fused_e.py
  PARLAYANN_FUSED_E=4 python scripts/diag_fused_e.py
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

    e = os.environ.get("PARLAYANN_FUSED_E", "1")
    n, d, nq, k = 100_000, 128, 10_000, 10
    rounds = int(os.environ.get("BENCH_ROUNDS", 10))
    print(f"devices: {jax.devices()}  E={e}", flush=True)
    X, Q = synthetic.clustered(n, d, n_queries=nq,
                               n_clusters=max(64, n // 100),
                               cluster_std=0.35, seed=7)
    ps = PointSet.from_numpy(X)
    cdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "bench_cache")
    import pickle
    gpath = os.path.join(cdir, "dedup_graph_100000.pkl")
    if not os.path.exists(gpath):
        gpath = os.path.join(cdir, f"fe_graph_{n}.pkl")
    import jax.numpy as jnp
    if os.path.exists(gpath):
        with open(gpath, "rb") as f:
            nb, dg = pickle.load(f)
        graph = GraphIndexData(neighbors=jnp.asarray(nb),
                               degrees=jnp.asarray(dg), n=n,
                               max_degree=nb.shape[1])
        print("graph: cached", flush=True)
    else:
        graph, _ = build_vamana_graph(
            quantize.quantize_pointset(ps, bits=8),
            BuildParams(R=32, L=64, alpha=1.2, num_passes=2))
        with open(gpath, "wb") as f:
            pickle.dump((np.asarray(graph.neighbors),
                         np.asarray(graph.degrees)), f)
    gtp = os.path.join(cdir, f"gt_{n}x{d}_{nq}.npz")
    z = np.load(gtp)
    gt_ids, gt_dists = z["ids"], z["dists"]

    idx = Index(points=ps, graph=graph).enable_quantized(bits=8)
    Qd = jnp.asarray(Q)
    for beam in (10, 12, 15, 22):
        best = 1e9
        for r in range(3):
            ids, dists, res, dt = idx.batch_search_timed(
                Qd, k=k, beam_size=beam, rounds=rounds, warmup=(r == 0))
            best = min(best, dt)
        rec = compute_recall(np.asarray(ids), gt_ids, gt_dists, k)
        print(f"  [E={e}] Q={beam} recall={rec:.4f} QPS={nq/best:,.0f}",
              flush=True)


if __name__ == "__main__":
    main()
