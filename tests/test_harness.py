"""Sweep harness: protocol shape, bucket selection, CSV."""

import numpy as np

from parlayann_tpu.types import BuildParams
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.build.vamana import build_vamana_graph
from parlayann_tpu.index import Index
from parlayann_tpu.search import exact
from parlayann_tpu.harness import sweep
from parlayann_tpu.harness.recall import NNResult
from parlayann_tpu.harness.csv import GraphRecord, write_to_csv


def test_sweep_and_buckets(tmp_path, rng):
    n, d, k = 600, 12, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((50, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    bp = BuildParams(R=12, L=24, alpha=1.2, num_passes=1, batch_cap_frac=0.5)
    g, _ = build_vamana_graph(ps, bp)
    gt_ids, gt_dists = exact.compute_groundtruth(ps, Q, 2 * k)
    idx = Index(points=ps, graph=g)

    results, best = sweep.search_and_parse(
        idx, Q, gt_ids, gt_dists, k=k,
        beams=[12, 24, 48], limits=[10, 20], best_accuracy_probe=True,
    )
    assert len(results) == 6
    # recall grows with beam width
    assert results[2].recall >= results[0].recall
    # visited-limit rows respect the limit
    assert results[3].limit == 10 and results[3].avg_visited <= 10
    # buckets are (threshold, best-result) with recall >= threshold
    for b, r in best:
        assert r.recall >= b

    rec = GraphRecord("vamana", "R=12", n, 1.0, *g.stats())
    path = str(tmp_path / "res.csv")
    write_to_csv(path, best, rec)
    text = open(path).read()
    assert "Target recall" in text

    r = idx.check_recall(Q, gt_ids, gt_dists, k=k, beam_size=48)
    assert r >= 0.9
