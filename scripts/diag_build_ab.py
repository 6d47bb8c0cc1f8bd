"""Vamana build-time/quality A/B on the real TPU: batch_cap_frac and
beam expand variants vs the shipped defaults (cap=0.04, expand=2).

Each variant: steady build time (2nd run) + recall@10 at two fixed beams
through the fused search path (same protocol as bench.py).

Env: BENCH_N/BENCH_D, VARIANTS="cap:0.04:2,cap:0.08:2,cap:0.08:4" etc.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parlayann_tpu.types import BuildParams
    from parlayann_tpu.data.pointset import PointSet
    from parlayann_tpu.build import vamana as V
    from parlayann_tpu.index import Index
    from parlayann_tpu.search import exact
    from parlayann_tpu.harness.recall import compute_recall
    from parlayann_tpu.ops import quantize
    from parlayann_tpu.utils import synthetic

    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 128))
    nq = 10_000
    k = 10
    print(f"devices: {jax.devices()}", flush=True)
    X, Q = synthetic.clustered(n, d, n_queries=nq,
                               n_clusters=max(64, n // 100),
                               cluster_std=0.35, seed=7)
    ps = PointSet.from_numpy(X)
    build_ps = quantize.quantize_pointset(ps, bits=8)

    cdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "bench_cache")
    gtp = os.path.join(cdir, f"gt_{n}x{d}_{nq}.npz")
    if os.path.exists(gtp):
        z = np.load(gtp)
        gt_ids, gt_dists = z["ids"], z["dists"]
    else:
        gt_ids, gt_dists = exact.compute_groundtruth(ps, Q, 2 * k)

    spec = os.environ.get(
        "VARIANTS", "0.04:2,0.08:2,0.12:2,0.08:4")
    Qd = jnp.asarray(Q)
    for item in spec.split(","):
        # cap:expand[:vmax[:passes[:L[:fused]]]] — vmax "0"/"" = default;
        # fused=1 routes the read phase through build_beam_fused
        parts = item.split(":")
        cap_s, exp_s = parts[0], parts[1]
        cap, expv = float(cap_s), int(exp_s)
        passes = int(parts[3]) if len(parts) > 3 else 2
        L = int(parts[4]) if len(parts) > 4 else 64
        os.environ["PARLAYANN_BUILD_FUSED"] = (
            parts[5] if len(parts) > 5 else "0")
        bp = BuildParams(R=32, L=L, alpha=1.2, num_passes=passes,
                         batch_cap_frac=cap)
        os.environ["PARLAYANN_BUILD_EXPAND"] = str(expv)
        if len(parts) > 2 and parts[2] not in ("", "0"):
            os.environ["PARLAYANN_BUILD_VMAX"] = parts[2]
        else:
            os.environ.pop("PARLAYANN_BUILD_VMAX", None)
        t0 = time.perf_counter()
        graph, stats = V.build_vamana_graph(build_ps, bp)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        graph, stats = V.build_vamana_graph(build_ps, bp)
        steady = time.perf_counter() - t0
        avg, mx = graph.stats()
        idx = Index(points=ps, graph=graph).enable_quantized(bits=8)
        row = []
        for beam in (10, 12, 15):
            dt = float("inf")
            for _ in range(3):
                ids, dists, res, dt_i = idx.batch_search_timed(
                    Qd, k=k, beam_size=beam, two_phase=True,
                    expand_group=4, rounds=10)
            dt = min(dt, dt_i)
            rec = compute_recall(np.asarray(ids), gt_ids, gt_dists, k)
            row.append(f"Q={beam}: {rec:.4f}@{nq/dt:,.0f}")
        vm = os.environ.get("PARLAYANN_BUILD_VMAX", "default")
        fz = os.environ.get("PARLAYANN_BUILD_FUSED", "0")
        print(f"cap={cap} expand={expv} vmax={vm} passes={passes} L={L} "
              f"fused={fz}: "
              f"cold={cold:.1f}s steady={steady:.2f}s deg={avg:.2f}  "
              + "  ".join(row), flush=True)


if __name__ == "__main__":
    main()
