"""HNSW builder: layered structure, search recall, model persistence."""

import numpy as np

from parlayann_tpu.types import BuildParams, Metric
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.build.hnsw import build_hnsw_graph, assign_levels, HNSWIndex
from parlayann_tpu.search import exact


def test_level_assignment():
    rng = np.random.default_rng(0)
    lev = assign_levels(100_000, 0.34, rng)
    frac1 = (lev >= 1).mean()
    # P(level >= 1) = exp(-1/m_l) ~ 5.3%
    assert 0.03 < frac1 < 0.08
    assert lev.min() == 0


def test_hnsw_build_search_save_load(tmp_path, rng):
    n, d, k = 1200, 16, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((40, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    bp = BuildParams(R=10, L=24, alpha=0.9, m_l=0.34)
    idx, dt = build_hnsw_graph(ps, bp)

    # structure: level0 has everyone, upper levels shrink
    sizes = [len(lv.members) for lv in idx.levels]
    assert sizes[0] == n
    assert all(sizes[i + 1] < sizes[i] for i in range(len(sizes) - 1))
    assert idx.levels[0].cap == 20 and (
        len(idx.levels) == 1 or idx.levels[1].cap == 10
    )
    # entrance is a member of the top level
    assert idx.entrance in idx.levels[-1].members

    gt, _ = exact.exact_knn(Q, ps, k, chunk=128)
    gt = np.asarray(gt)
    ids, dists = idx.batch_search(Q, k=k, ef=48)
    ids = np.asarray(ids)
    recall = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt)
    ) / (40 * k)
    assert recall >= 0.85, recall

    # versioned model round trip (reference has its own versioned format,
    # HNSW.hpp:1615-1691)
    p = str(tmp_path / "model.hnsw")
    idx.save(p)
    idx2 = HNSWIndex.load(p, ps)
    assert idx2.entrance == idx.entrance
    assert idx2.m == idx.m and len(idx2.levels) == len(idx.levels)
    ids2, _ = idx2.batch_search(Q, k=k, ef=48)
    np.testing.assert_array_equal(ids, np.asarray(ids2))
