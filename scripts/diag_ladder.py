"""Tune the fused-path straggler-compaction ladder (real TPU).

Part 1: convergence profile — run the fused beam with compact=False and a
hard step cap; n_left = queries still active after that many steps, and
recall shows what stopping there would cost.

Part 2: ladder A/B — Index.batch_search (the real headline path) timed
with several ladder_spec values.

Env: BENCH_N/BENCH_D/BENCH_Q, BEAM (default 8).
"""

from __future__ import annotations

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parlayann_tpu.data.pointset import PointSet
    from parlayann_tpu.data.graph import GraphIndexData
    from parlayann_tpu.harness.recall import compute_recall
    from parlayann_tpu.index import Index, _entry_top1
    from parlayann_tpu.ops import quantize
    from parlayann_tpu.ops.pallas.fusedbeam import beam_search_fused
    from parlayann_tpu.search.rerank import rerank_topk
    from parlayann_tpu.types import QueryParams
    from parlayann_tpu.utils import synthetic

    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 128))
    nq = int(os.environ.get("BENCH_Q", 10_000))
    beam = int(os.environ.get("BEAM", 8))
    k = 10

    print(f"[{jax.devices()[0].device_kind}]", flush=True)
    X, Q = synthetic.clustered(n, d, n_queries=nq,
                               n_clusters=max(64, n // 100),
                               cluster_std=0.35, seed=7)
    ps = PointSet.from_numpy(X)
    root = os.path.join(os.path.dirname(__file__), "..", "bench_cache")
    z = np.load(os.path.join(root, f"gt_{n}x{d}_{nq}.npz"))
    gt_ids, gt_dists = z["ids"], z["dists"]
    graph = GraphIndexData.load(os.path.join(root, f"r64_{n}x{d}.graph"))

    idx = Index(points=ps, graph=graph).enable_quantized(bits=8)
    idx.build_entry_cache()
    qj = jnp.asarray(Q)
    starts = _entry_top1(qj, idx.entry_vecs, idx.entry_ids,
                         metric=ps.metric)
    tier = idx.qpoints
    ext = idx.build_inline_ext_cache()
    q_t = quantize.translate_query(qj, tier).astype(jnp.float32)
    qp = QueryParams(k=k, beamSize=beam).resolved(graph.max_degree, ps.n)
    L = max(beam, k)

    if os.environ.get("CONV", "1") == "1":
        print("== convergence profile (compact=False, hard step cap) ==",
              flush=True)
        for cap in (4, 6, 8, 10, 12, 16, 24, 40):
            fid, fdist, nv, cmps, n_left = beam_search_fused(
                q_t, tier.data, ext, starts, metric=tier.metric,
                n_valid=tier.n, k=k, L=L, cut=qp.cut, limit=qp.limit,
                max_steps=cap, compact=False,
            )
            ids, dists = rerank_topk(
                qj.astype(jnp.float32), ps.data, fid, k=k, pool=k,
                metric=ps.metric,
            )
            rec = compute_recall(np.asarray(ids), gt_ids, gt_dists, k)
            print(f"cap={cap:3d} n_left={int(n_left):6d} "
                  f"recall={rec:.4f}", flush=True)

    print("== ladder A/B (Index.batch_search, best of 3) ==", flush=True)
    specs = [
        (),
        ((1, 10), (4, 14), (16, 0)),
        ((1, 8), (4, 10), (16, 0)),
        ((1, 8), (2, 4), (8, 8), (32, 0)),
        ((1, 6), (2, 4), (4, 4), (16, 8), (64, 0)),
    ]
    for spec in specs:
        idx.ladder_spec = spec
        dt = float("inf")
        for _ in range(3):
            ids, dists, res, dt_i = idx.batch_search_timed(
                Q, k=k, beam_size=beam, two_phase=True)
            dt = min(dt, dt_i)
        rec = compute_recall(np.asarray(ids), gt_ids, gt_dists, k)
        nl = int(np.asarray(res.n_left)) if hasattr(res, "n_left") else -1
        print(f"spec={spec!r:48s} recall={rec:.4f} QPS={nq/dt:,.0f} "
              f"n_left={nl}", flush=True)


if __name__ == "__main__":
    main()
