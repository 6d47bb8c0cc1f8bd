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


def test_pynndescent_convergence(rng):
    """nn-descent rounds converge: each round's changed-entry count
    decreases and the k-NN graph quality improves monotonically
    (pynn_index.h:178-196 terminates on changed < delta*n)."""
    import jax
    from parlayann_tpu.build.pynndescent import (
        _reverse_capped, _descent_round,
    )
    from parlayann_tpu.ops.distance import INF
    import jax.numpy as jnp

    n, d, K = 800, 16, 12
    X = rng.standard_normal((n, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    # random init (worst case; the real builder seeds from cluster trees)
    ids0 = rng.integers(0, n, (ps.n_pad, K)).astype(np.int32)
    vec = np.asarray(ps.data)
    d0 = ((vec[:, None, :] - vec[ids0]) ** 2).sum(-1).astype(np.float32)
    d0[ids0 == np.arange(ps.n_pad)[:, None]] = np.float32(INF)
    nbr_ids, nbr_dists = jnp.asarray(ids0), jnp.asarray(d0)
    key = jax.random.key(0)
    gt_self, _ = exact.exact_knn(ps.data[:200], ps, K + 1, chunk=128)
    gt = np.asarray(gt_self)

    def quality(ids):
        nb = np.asarray(ids)
        hits = tot = 0
        for i in range(200):
            true = [j for j in gt[i] if j != i][:5]
            hits += len(set(nb[i].tolist()) & set(true))
            tot += 5
        return hits / tot

    qual = [quality(nbr_ids)]
    changes = []
    for r in range(4):
        key, k1, k2 = jax.random.split(key, 3)
        rev = _reverse_capped(nbr_ids, k1, K=K, metric=ps.metric, n_valid=n)
        nbr_ids, nbr_dists, ch = _descent_round(
            ps.data, nbr_ids, nbr_dists, rev, k2,
            s1=16, s2=16, K=K, metric=ps.metric, n_valid=n,
        )
        changes.append(int(ch))
        qual.append(quality(nbr_ids))
    # quality strictly improves from random init and ends high
    assert qual[-1] > qual[0] + 0.3, qual
    assert qual[-1] >= 0.8, qual
    # the descent converges: last round changes fewer entries than first
    assert changes[-1] < changes[0], changes
