"""pyNNDescent builder: knn-graph quality + end-to-end search recall."""

import numpy as np
import jax.numpy as jnp

from parlayann_tpu.types import BuildParams, Metric
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.build.pynndescent import build_pynndescent_graph
from parlayann_tpu.search import exact
from parlayann_tpu.search.beam import beam_search_batch, top_k_from_beam


def test_pynndescent_build_and_search(rng):
    n, d, k = 1000, 16, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((40, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    bp = BuildParams(R=20, cluster_size=80, num_clusters=6, alpha=1.2, delta=0.05)
    g, dt = build_pynndescent_graph(ps, bp)
    avg, mx = g.stats()
    assert mx <= 20 and avg > 5

    # knn-graph quality: the graph's neighbors contain most of the true
    # 5-NN of each point (spot check)
    gt_self, _ = exact.exact_knn(ps.data[:100], ps, 6, chunk=128)
    gt_self = np.asarray(gt_self)
    nb = np.asarray(g.neighbors)
    dg = np.asarray(g.degrees)
    hits = tot = 0
    for i in range(100):
        true = [j for j in gt_self[i] if j != i][:5]
        row = set(nb[i, : dg[i]].tolist())
        hits += len(row & set(true))
        tot += len(true)
    assert hits / tot >= 0.6, hits / tot

    gt, _ = exact.exact_knn(Q, ps, k, chunk=128)
    res = beam_search_batch(
        jnp.asarray(Q), ps.data, g.neighbors, g.degrees,
        jnp.zeros((1,), jnp.int32),
        metric=Metric.L2, n_valid=n, k=k, L=48,
    )
    ids, _ = top_k_from_beam(res, k)
    recall = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids), np.asarray(gt))
    ) / (40 * k)
    assert recall >= 0.85, recall
