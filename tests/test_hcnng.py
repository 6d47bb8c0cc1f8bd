"""HCNNG builder: cluster trees, native Kruskal, end-to-end recall."""

import numpy as np
import jax
import jax.numpy as jnp

from parlayann_tpu.types import BuildParams, Metric
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.build.cluster import cluster_tree_labels, leaf_members
from parlayann_tpu.build.hcnng import build_hcnng_graph
from parlayann_tpu import native
from parlayann_tpu.search import exact
from parlayann_tpu.search.beam import beam_search_batch, top_k_from_beam


def test_cluster_tree_partitions(rng):
    n, d, cs = 600, 8, 50
    X = rng.standard_normal((n, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    ids, labels = cluster_tree_labels(
        ps.data, jax.random.key(0), metric=Metric.L2, cluster_size=cs, n_valid=n
    )
    ids, labels = np.asarray(ids), np.asarray(labels)
    # every valid point appears exactly once with a non-negative label
    valid = labels >= 0
    assert sorted(ids[valid].tolist()) == list(range(n))
    members, sizes = leaf_members(ids, labels, cs)
    assert sizes.sum() == n
    assert sizes.max() <= cs
    # leaves should be spatially coherent: leaf diameter << global diameter
    big = members[np.argmax(sizes)]
    big = big[big >= 0]
    leaf_diam = ((X[big][:, None] - X[big][None]) ** 2).sum(-1).max()
    glob_diam = ((X[:200][:, None] - X[:200][None]) ** 2).sum(-1).max()
    assert leaf_diam < glob_diam


def test_native_kruskal_matches_python(rng):
    # force both paths and compare
    s, E = 20, 60
    w = rng.random((1, E)).astype(np.float32)
    order = np.argsort(w[0])
    eu = rng.integers(0, s, (1, E)).astype(np.int32)[:, order]
    ev = rng.integers(0, s, (1, E)).astype(np.int32)[:, order]
    sizes = np.array([s], np.int32)
    ou1, ov1, c1 = native.kruskal_leaves(eu, ev, sizes, s, 3)
    lib_loaded = native._load() is not None
    if lib_loaded:
        # compare against the pure-python fallback
        saved = native._lib
        native._lib, native._build_failed = None, True
        ou2, ov2, c2 = native.kruskal_leaves(eu, ev, sizes, s, 3)
        native._lib, native._build_failed = saved, False
        assert c1.tolist() == c2.tolist()
        np.testing.assert_array_equal(ou1, ou2)
        np.testing.assert_array_equal(ov1, ov2)
    # selected edges obey the degree cap and form a forest
    deg = np.zeros(s, int)
    for u, v in zip(ou1[0, : c1[0]], ov1[0, : c1[0]]):
        deg[u] += 1
        deg[v] += 1
    assert deg.max() <= 3


def test_hcnng_build_and_search(rng):
    n, d, k = 1200, 16, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((40, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    bp = BuildParams(num_clusters=8, cluster_size=150, MST_deg=3)
    g, dt = build_hcnng_graph(ps, bp)
    assert g.max_degree == 24
    avg, mx = g.stats()
    assert mx <= 24 and avg >= 3

    gt, _ = exact.exact_knn(Q, ps, k, chunk=128)
    res = beam_search_batch(
        jnp.asarray(Q), ps.data, g.neighbors, g.degrees,
        jnp.zeros((1,), jnp.int32),
        metric=Metric.L2, n_valid=n, k=k, L=48,
    )
    ids, _ = top_k_from_beam(res, k)
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids), np.asarray(gt))
    )
    assert hits / (40 * k) >= 0.85
