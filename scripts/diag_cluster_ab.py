"""A/B the cluster-search seed path (argmin passes vs streamed top-k)
and pool select (grouped 128-lane select vs full-width lax.sort).

Context: the argmin+group combo measured 3x SLOWER end-to-end than the
committed stream+sort path (324K vs 996K QPS at m=64 probes=4) — this
isolates which half regressed. Builds once (save/load cache in
bench_cache/), then times all four combos in ONE process so compiles
share the jit cache.
"""

from __future__ import annotations

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

    from parlayann_tpu.data.pointset import PointSet
    from parlayann_tpu.build.clusterindex import ClusterIndex
    from parlayann_tpu.harness.recall import compute_recall
    from parlayann_tpu.utils import synthetic

    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 128))
    nq = int(os.environ.get("BENCH_Q", 10_000))
    rounds = int(os.environ.get("ROUNDS", 10))
    m = int(os.environ.get("M", 64))
    npr = int(os.environ.get("PROBES", 4))
    k = 10

    print(f"devices: {jax.devices()}", flush=True)
    X, Q = synthetic.clustered(n, d, n_queries=nq,
                               n_clusters=max(64, n // 100),
                               cluster_std=0.35, seed=7)
    ps = PointSet.from_numpy(X)
    cdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "bench_cache")
    z = np.load(os.path.join(cdir, f"gt_{n}x{d}_{nq}.npz"))
    gt_ids, gt_dists = z["ids"], z["dists"]

    cpath = os.path.join(cdir, f"cluster_m{m}_{n}x{d}.npz")
    if os.path.exists(cpath):
        ci = ClusterIndex.load(cpath, ps)
        print(f"loaded cluster index: C={ci.C}", flush=True)
    else:
        t0 = time.perf_counter()
        ci = ClusterIndex.build(ps, m=m, Rc=16, ext_dtype="f32")
        print(f"built: {time.perf_counter()-t0:.2f}s C={ci.C}", flush=True)
        ci.save(cpath)

    Qd = jax.device_put(np.asarray(Q))
    Qd.block_until_ready()

    for seed_mode in ("stream", "argmin"):
        for select_mode in ("sort", "group"):
            dt = float("inf")
            out = None
            for _ in range(3):
                *out, dt_i = ci.search_timed(
                    Qd, k=k, n_probe=npr, min_probe=0, cut=0.0,
                    starts=2, rounds=rounds,
                    seed_mode=seed_mode, select_mode=select_mode)
                dt = min(dt, dt_i)
            rec = compute_recall(np.asarray(out[0]), gt_ids, gt_dists, k)
            print(f"  [seed={seed_mode:7s} select={select_mode:5s}] "
                  f"recall={rec:.4f} QPS={nq/dt:,.0f}", flush=True)


if __name__ == "__main__":
    main()
