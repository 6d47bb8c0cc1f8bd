"""Sweep ClusterIndex (m, slack) on CPU for assignment-coverage ceilings.

diag_cluster_coverage.py showed (synth100k, m=64, slack=1.25):
  - probe selection is near-optimal (measured fused recall is within
    ~0.2pp of the exact-top-P oracle),
  - the CAPACITY BALANCER is the recall ceiling: natural (uncapped)
    nearest-centroid assignment covers .9780 at P=4 vs .9601 balanced,
  - filling the slack with boundary duplicates recovers nothing (+0.02pp)
    because the free slots sit in the WRONG clusters (the displaced
    points' home clusters are exactly the full ones).

So the lever is displacement rate: slack (emptier clusters) and m
(coarser cells). This sweep prints cov(assign) per probe count for each
(m, slack) plus the displaced fraction and C (seed-scan width).

Run: JAX_PLATFORMS=cpu python scripts/diag_cluster_sweep_cov.py
Env: N, CONFIGS ("m:slack,m:slack,..."), PROBES.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from diag_cluster_coverage import coverage


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from parlayann_tpu.build.clusterindex import (
        kmeans, _assign_all, balance_assign, _recenter)
    from parlayann_tpu.types import Metric
    from parlayann_tpu.utils import synthetic

    n = int(os.environ.get("N", 100_000))
    d, nq, k = 128, 10_000, 10
    cand = 8
    X, Q = synthetic.clustered(n, d, n_queries=nq,
                               n_clusters=max(64, n // 100),
                               cluster_std=0.35, seed=7)
    gtpath = os.path.join(os.path.dirname(__file__), "..", "bench_cache",
                          f"gt_{n}x{d}_{nq}.npz")
    gt_ids = np.load(gtpath)["ids"][:, :k]
    data = np.asarray(X, np.float32)

    configs = os.environ.get(
        "CONFIGS",
        "64:1.25,64:1.5,64:2.0,96:1.25,96:1.5,128:1.25,128:1.5,128:2.0")
    probes = [int(x) for x in os.environ.get(
        "PROBES", "2,3,4,6,8,12,16").split(",")]
    Pmax = max(probes)

    for item in configs.split(","):
        m_s, sl_s = item.split(":")
        m, slack = int(m_s), float(sl_s)
        C = max(8, int(-(-n * slack // m)))
        t0 = time.perf_counter()
        cents = kmeans(data, n, C, metric=Metric.L2, iters=6, seed=0)
        nbr_ids, nbr_d = _assign_all(data, n, cents, C, cand, Metric.L2)
        nbr_ids, nbr_d = np.asarray(nbr_ids), np.asarray(nbr_d)
        members = balance_assign(nbr_ids, nbr_d, C, m)
        cents = np.asarray(_recenter(data, members, C))
        pt2c = np.full((n, 1), -1, np.int32)
        cc, ss = np.nonzero(members >= 0)
        pt2c[members[cc, ss], 0] = cc
        displaced = float((pt2c[:, 0] != nbr_ids[:, 0]).mean())

        qd = ((Q ** 2).sum(1)[:, None] + (cents ** 2).sum(1)[None, :]
              - 2.0 * Q @ cents.T)
        qtop = np.argsort(qd, axis=1)[:, :Pmax].astype(np.int32)
        cov = [coverage(pt2c, gt_ids, qtop, P, k) for P in probes]
        row = "  ".join(f"P{P}={c:.4f}" for P, c in zip(probes, cov))
        print(f"m={m:3d} slack={slack:.2f} C={C:5d} "
              f"displaced={displaced:.3f} ({time.perf_counter()-t0:.0f}s)"
              f"  {row}", flush=True)


if __name__ == "__main__":
    main()
