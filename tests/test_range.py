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


def test_range_sweep_wrapper(rng, tmp_path):
    """Reference-format sweep table (check_range_recall.h:67-84): recall
    rises (weakly) with the initial beam; rows carry QPS and cmps."""
    from parlayann_tpu.harness.range_sweep import range_search_wrapper

    X, ps, g = _setup(rng)
    Q = rng.standard_normal((25, 12)).astype(np.float32)
    rad = float(np.quantile(((X[:200, None] - Q[None, :5]) ** 2).sum(-1), 0.01))
    gt = exact.compute_range_groundtruth(ps, Q, rad)
    rows = range_search_wrapper(
        Q, ps.data, g.neighbors, g.degrees, gt, rad,
        beams=(10, 20, 45), metric=Metric.L2, n_valid=ps.n, verbose=False,
    )
    assert [r.initial_beam for r in rows] == [10, 20, 45]
    cums = [r.cumulative_recall for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(cums, cums[1:])), cums
    assert cums[-1] >= 0.8, cums
    assert all(r.QPS > 0 and r.avg_cmps > 0 for r in rows)


def test_cli_range_track(rng, tmp_path):
    """-range (non-self) prints the per-beam table from files on disk."""
    from parlayann_tpu.data import io as pio
    from parlayann_tpu import cli

    X, ps, g = _setup(rng, n=400)
    Q = rng.standard_normal((10, 12)).astype(np.float32)
    rad = float(np.quantile(((X[:100, None] - Q[None, :5]) ** 2).sum(-1), 0.02))
    gt = exact.compute_range_groundtruth(ps, Q, rad)
    base = str(tmp_path / "b.fbin")
    qf = str(tmp_path / "q.fbin")
    gtf = str(tmp_path / "gt.rbin")
    gf = str(tmp_path / "g.graph")
    pio.write_bin(base, X)
    pio.write_bin(qf, Q)
    pio.write_range_ibin(gtf, gt)
    g.save(gf)
    rc = cli.main([
        "-base_path", base, "-query_path", qf, "-gt_path", gtf,
        "-graph_path", gf, "-range", "-radius", str(rad),
    ])
    assert rc == 0


def test_range_gt_tool_nonzero_subset(rng, tmp_path):
    """The range-GT tool's -nonzero_path output: a .bin holding exactly
    the query VECTORS with >=1 in-range result, in query order
    (compute_range_groundtruth.cpp:32-58 write_nonzero_elts)."""
    from parlayann_tpu.data import io
    from parlayann_tpu.tools import compute_range_groundtruth as tool

    X = rng.standard_normal((400, 16)).astype(np.float32)
    Q = rng.standard_normal((37, 16)).astype(np.float32)
    bp = str(tmp_path / "b.fbin")
    qp = str(tmp_path / "q.fbin")
    gp = str(tmp_path / "gt.rbin")
    zp = str(tmp_path / "qnz.fbin")
    io.write_bin(bp, X)
    io.write_bin(qp, Q)
    rad = 18.0
    tool.main(["-base_path", bp, "-query_path", qp, "-gt_path", gp,
               "-radius", str(rad), "-nonzero_path", zp])
    gt = io.read_range_ibin(gp)
    keep = np.asarray([len(g) > 0 for g in gt])
    sub = io.read_bin(zp, dtype=np.float32)
    assert sub.shape == (int(keep.sum()), 16)
    np.testing.assert_array_equal(sub, Q[keep])
    # oracle: brute-force radius membership
    d2 = ((Q[:, None, :] - X[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(keep, (d2 <= rad).any(axis=1))
