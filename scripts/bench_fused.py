"""A/B bench: fused Pallas beam step vs the hybrid search path (real TPU).

Builds (or loads from bench_cache/) the R=64 L=128 synth100k graph, then
sweeps beams on both paths and prints recall/QPS per row. Env:
  BENCH_N / BENCH_D / BENCH_Q  dataset shape (default 100K x 128, 10K q)
  WHICH=hybrid,fused,dmaonly   paths to run
  BEAMS=8,10,12                beam sweep
  G/NBUF/BLOCK_B               fused kernel tuning knobs
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parlayann_tpu.types import BuildParams, Metric
    from parlayann_tpu.data.pointset import PointSet
    from parlayann_tpu.data.graph import GraphIndexData
    from parlayann_tpu.build.vamana import build_vamana_graph
    from parlayann_tpu.index import Index
    from parlayann_tpu.search import exact
    from parlayann_tpu.harness.recall import compute_recall
    from parlayann_tpu.utils import synthetic
    from parlayann_tpu.ops import quantize
    from parlayann_tpu.ops.pallas.fusedbeam import (
        build_inline_ext, beam_search_fused,
    )
    from parlayann_tpu.search.rerank import rerank_topk

    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 128))
    nq = int(os.environ.get("BENCH_Q", 10_000))
    k = 10
    R, L, alpha = 64, 128, 1.15
    which = os.environ.get("WHICH", "hybrid,fused").split(",")
    beams = [int(b) for b in os.environ.get("BEAMS", "8,10,12,14").split(",")]
    G = int(os.environ.get("G", 8))
    n_buf = int(os.environ.get("NBUF", 8))
    block_b = int(os.environ.get("BLOCK_B", 256))

    log(f"devices: {jax.devices()}")
    X, Q = synthetic.clustered(n, d, n_queries=nq, n_clusters=max(64, n // 100),
                               cluster_std=0.35, seed=7)
    ps = PointSet.from_numpy(X)

    cdir = os.path.join(os.path.dirname(__file__), "..", "bench_cache")
    os.makedirs(cdir, exist_ok=True)
    gpath = os.path.join(cdir, f"r64_{n}x{d}.graph")
    gtpath = os.path.join(cdir, f"gt_{n}x{d}_{nq}.npz")

    if os.path.exists(gtpath):
        z = np.load(gtpath)
        gt_ids, gt_dists = z["ids"], z["dists"]
    else:
        t0 = time.perf_counter()
        gt_ids, gt_dists = exact.compute_groundtruth(ps, Q, 2 * k)
        log(f"ground truth: {time.perf_counter()-t0:.2f}s")
        np.savez(gtpath, ids=gt_ids, dists=gt_dists)

    qps8 = quantize.quantize_pointset(ps, bits=8)
    if os.path.exists(gpath):
        graph = GraphIndexData.load(gpath)
        log(f"loaded graph {gpath}")
    else:
        bp = BuildParams(R=R, L=L, alpha=alpha, num_passes=2,
                         batch_cap_frac=0.04)
        t0 = time.perf_counter()
        graph, _ = build_vamana_graph(qps8, bp, verbose=False)
        log(f"build: {time.perf_counter()-t0:.2f}s")
        graph.save(gpath)

    idx = Index(points=ps, graph=graph).enable_quantized(bits=8)

    q_full = jnp.asarray(Q.astype(np.float32))
    q_t = quantize.translate_query(q_full, idx.qpoints).astype(jnp.float32)

    def timed(fn, reps=3):
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            _ = np.asarray(out[0][:1])
            best = min(best, time.perf_counter() - t0)
        return out, best

    if "hybrid" in which:
        for beam in beams:
            ids, dists, res, dt = idx.batch_search_timed(
                Q, k=k, beam_size=beam, two_phase=True, expand_group=4,
            )
            for _ in range(2):
                _, _, _, dt2 = idx.batch_search_timed(
                    Q, k=k, beam_size=beam, warmup=False, two_phase=True,
                    expand_group=4,
                )
                dt = min(dt, dt2)
            rec = compute_recall(np.asarray(ids), gt_ids, gt_dists, k)
            log(f"[hybrid ] Q={beam:4d} recall={rec:.4f} QPS={nq/dt:,.0f} "
                f"cmps={np.asarray(res.dist_cmps).mean():.0f}")

    if "fused" in which or "dmaonly" in which:
        ext = build_inline_ext(idx.qpoints.data, graph.neighbors,
                               graph.degrees)
        ext.block_until_ready()
        starts = jnp.zeros((1,), jnp.int32)
        for beam in beams:
            Lq = max(beam, k)

            def run():
                fid, fdist, nv, cmps, n_left = beam_search_fused(
                    q_t, idx.qpoints.data, ext, starts,
                    metric=Metric.L2, n_valid=ps.n, k=k, L=Lq,
                    limit=ps.n, block_b=block_b, G=G, n_buf=n_buf,
                )
                ids, dists = rerank_topk(
                    q_full, ps.data, fid, k=k, pool=min(10 * k, Lq),
                    metric=Metric.L2,
                )
                return ids, dists, nv, cmps

            (ids, dists, nv, cmps), dt = timed(run)
            rec = compute_recall(np.asarray(ids), gt_ids, gt_dists, k)
            log(f"[fused  ] Q={beam:4d} recall={rec:.4f} QPS={nq/dt:,.0f} "
                f"cmps={np.asarray(cmps).mean():.0f} "
                f"nv={np.asarray(nv).mean():.1f}")


if __name__ == "__main__":
    main()
