"""Range search: BFS semantics, self-join, range recall."""

import numpy as np
import jax.numpy as jnp

from parlayann_tpu.types import BuildParams, Metric
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.build.vamana import build_vamana_graph
from parlayann_tpu.search import exact
from parlayann_tpu.search.range import range_search_batch, range_query, self_join
from parlayann_tpu.harness.recall import range_recall


def _setup(rng, n=800, d=12):
    X = rng.standard_normal((n, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    bp = BuildParams(R=16, L=32, alpha=1.2, num_passes=2, batch_cap_frac=0.25)
    g, _ = build_vamana_graph(ps, bp)
    return X, ps, g


def test_range_query_recall(rng):
    X, ps, g = _setup(rng)
    Q = rng.standard_normal((30, 12)).astype(np.float32)
    # pick a radius that yields a handful of results per query
    rad = float(np.quantile(((X[:200, None] - Q[None, :5]) ** 2).sum(-1), 0.01))
    gt = exact.compute_range_groundtruth(ps, Q, rad)
    rr = range_query(
        Q, ps.data, g.neighbors, g.degrees, 0, rad, initial_beam=45,
        metric=Metric.L2, n_valid=ps.n,
    )
    ids = np.asarray(rr.ids)
    ds = np.asarray(rr.dists)
    reported = [ids[i][(ids[i] >= 0) & (ds[i] <= rad)] for i in range(len(Q))]
    pw, cum = range_recall(reported, gt)
    assert cum >= 0.8, (pw, cum)
    # everything reported is truly within the radius
    for i, row in enumerate(reported):
        if len(row):
            dd = ((X[row] - Q[i]) ** 2).sum(-1)
            assert np.all(dd <= rad + 1e-3)


def test_self_join(rng):
    X, ps, g = _setup(rng, n=500)
    rad = float(np.quantile(((X[:100, None] - X[None, 100:150]) ** 2).sum(-1), 0.02))
    gt = exact.compute_range_groundtruth(ps, X, rad)
    gt = [np.array([j for j in row if j != i]) for i, row in enumerate(gt)]
    reported, cmps = self_join(
        ps.data, g.neighbors, g.degrees, rad, rad,
        metric=Metric.L2, n_valid=ps.n, batch=512,
    )
    assert cmps > 0
    pw, cum = range_recall(reported, gt)
    assert cum >= 0.75, (pw, cum)
