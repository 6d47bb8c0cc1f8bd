"""Cross-shard GLOBAL build: one graph over all n, rows sharded over the
mesh (parallel/global_build.py). The driver's dryrun exercises the same
path; here we check recall parity with the single-device build."""

import numpy as np
import pytest

from parlayann_tpu.types import BuildParams
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.build.vamana import build_vamana_graph
from parlayann_tpu.parallel.global_build import (
    make_mesh_1d, build_global_vamana, global_search,
)
from parlayann_tpu.search import exact
from parlayann_tpu.index import Index
from parlayann_tpu.harness.recall import compute_recall


def test_global_build_matches_single_device(rng):
    n, d, k = 1500, 24, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((80, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    gt, gtd = exact.compute_groundtruth(ps, Q, k)
    bp = BuildParams(R=16, L=32, alpha=1.2, num_passes=2)

    g, _ = build_vamana_graph(ps, bp)
    ids1, _, _ = Index(points=ps, graph=g).batch_search(Q, k=k, beam_size=32)
    r1 = compute_recall(np.asarray(ids1), gt, gtd, k)

    mesh = make_mesh_1d(8)
    gidx = build_global_vamana(X, mesh, bp)
    # the graph is ONE graph: neighbor ids are global and rows live on
    # their owning shard
    nb = np.asarray(gidx.nbrs).reshape(-1, 16)
    dg = np.asarray(gidx.degs).reshape(-1)
    assert dg[:n].mean() > 8  # healthy connectivity
    mask = np.arange(16)[None, :] < dg[:n, None]
    valid_edges = nb[:n][mask]
    assert (valid_edges >= 0).all() and (valid_edges < n).all()
    # edges cross shard boundaries (a per-shard-island build would not)
    nl = gidx.rows_per_shard
    owner = np.repeat(np.arange(8), nl)[:n]
    cross = 0
    for v in range(0, n, 97):
        for j in range(dg[v]):
            cross += owner[nb[v, j]] != owner[v]
    assert cross > 0

    gids, _ = global_search(gidx, Q, k=k, beam_size=32)
    r2 = compute_recall(gids, gt, gtd, k)
    assert r2 > r1 - 0.05, (r1, r2)


def test_global_search_exact_on_full_graph(rng):
    """Fully-connected graph -> global search must return exact top-k."""
    from parlayann_tpu.parallel.global_build import GlobalIndex
    from parlayann_tpu.types import Metric
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh_1d(8)
    n, d, k = 32, 8, 5
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((16, d)).astype(np.float32)
    D, nl = 8, 4
    nbrs = np.arange(n, dtype=np.int32)[None, :].repeat(n, 0)
    degs = np.full(n, n, np.int32)

    def sh(a):
        a = np.asarray(a)
        return jax.device_put(
            a.reshape((D, nl) + a.shape[1:]),
            NamedSharding(mesh, P(*(("d",) + (None,) * a.ndim))),
        )

    gidx = GlobalIndex(
        mesh=mesh, points=sh(X), nbrs=sh(nbrs), degs=sh(degs), n=n,
        rows_per_shard=nl, max_degree=n, metric=Metric.L2,
    )
    ids, dists = global_search(gidx, Q, k=k, beam_size=16)
    gt = np.argsort(((Q[:, None, :] - X[None]) ** 2).sum(-1), axis=1)[:, :k]
    np.testing.assert_array_equal(ids, gt)


def test_global_build_8k_parity(rng):
    """VERDICT-scale parity: n=8K over D=8 virtual devices, recall within
    2pp of the single-device build on identical data."""
    n, d, k = 8192, 32, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((100, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    gt, gtd = exact.compute_groundtruth(ps, Q, k)
    bp = BuildParams(R=16, L=32, alpha=1.2, num_passes=1,
                     batch_cap_frac=0.25)

    g, _ = build_vamana_graph(ps, bp)
    ids1, _, _ = Index(points=ps, graph=g).batch_search(Q, k=k, beam_size=48)
    r1 = compute_recall(np.asarray(ids1), gt, gtd, k)

    mesh = make_mesh_1d(8)
    gidx = build_global_vamana(X, mesh, bp)
    gids, _ = global_search(gidx, Q, k=k, beam_size=48)
    r2 = compute_recall(gids, gt, gtd, k)
    assert r2 > r1 - 0.02, (r1, r2)


def test_collective_volume_report():
    from parlayann_tpu.parallel.global_build import collective_volume_report

    sites, total = collective_volume_report(
        100_000, 8, R=32, L=64, dim=128, batch=4096, print_table=False,
    )
    assert total > 0 and len(sites) == 10
    # load-balanced overflow (r5): at the VERDICT shapes
    # (B=4096, R=64, d=128) with the q8 wire format and typical runtime
    # counts (converged hops, ~B/D overflow targets/device), the whole
    # batch exchange fits under 1 GB/device — the r3 design's overflow
    # term ALONE was 15 GB/batch (and D-fold undercounted at that)
    sites_t, total_t = collective_volume_report(
        1_000_000, 8, R=64, L=128, dim=128, batch=4096,
        itemsize_vec=1, hops=136, overflow_targets=512,
        print_table=False,
    )
    assert total_t < 1e9, total_t
    # the per-hop candidate-id replication is now the dominant term
    assert max(sites_t.values()) == sites_t[
        "beam: psum cand ids+deg   (B,E,R+1)"]
    # WORST case at the same shapes: round-robin balancing bounds every
    # device's overflow walk by ceil(min(M, n)/D) whatever the batch
    # skew — 14.4 GB/batch (q8) in the r4 owner-partitioned design, now
    # under 5 GB. (The VERDICT "ship (chunk, C) scalars" sketch can't
    # beat this: occlusion needs selected-vs-candidate pairwise
    # distances, and a (C, C) scalar matrix is >= the q8 vector payload
    # whenever C >= d.)
    _, total_w = collective_volume_report(
        1_000_000, 8, R=64, L=128, dim=128, batch=4096,
        itemsize_vec=1, print_table=False,
    )
    assert total_w < 5e9, total_w
