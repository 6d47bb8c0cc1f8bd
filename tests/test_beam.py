"""Batched beam search vs exact oracle on a tiny k-NN graph."""

import numpy as np
import jax.numpy as jnp

from parlayann_tpu.types import Metric
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.data.graph import GraphIndexData
from parlayann_tpu.search import exact
from parlayann_tpu.search.beam import beam_search_batch, top_k_from_beam


def _knn_graph(ps: PointSet, r: int) -> GraphIndexData:
    """Exact undirected-ish kNN graph as a search substrate."""
    ids, _ = exact.exact_knn(ps.data[: ps.n], ps, r + 1, chunk=64)
    ids = np.asarray(ids)
    nbrs = np.zeros((ps.n, r), dtype=np.int32)
    for i in range(ps.n):
        row = [j for j in ids[i] if j != i][:r]
        nbrs[i, : len(row)] = row
    degs = np.full(ps.n, r, dtype=np.int32)
    return GraphIndexData.from_numpy(nbrs, degs)


def _recall(found_ids, gt_ids):
    hits = 0
    for f, g in zip(found_ids, gt_ids):
        hits += len(set(f.tolist()) & set(g.tolist()))
    return hits / gt_ids.size


def test_beam_search_recall(rng):
    n, d, k = 500, 16, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((40, d)).astype(np.float32)
    ps = PointSet.from_numpy(x)
    g = _knn_graph(ps, 10)
    gt_ids, _ = exact.exact_knn(q, ps, k, chunk=64)

    # L=48 puts recall ~.93 — the L=32 point sat exactly at the .9
    # threshold and XLA:CPU's thread-count-dependent reduction order
    # flipped distance ties across runs (observed .88-.90)
    res = beam_search_batch(
        jnp.asarray(q), ps.data, g.neighbors, g.degrees,
        jnp.asarray([0], dtype=jnp.int32),
        metric=Metric.L2, n_valid=n, k=k, L=48,
    )
    ids, dists = top_k_from_beam(res, k)
    ids = np.asarray(ids)
    assert _recall(ids, np.asarray(gt_ids)) >= 0.9
    # results are sorted and duplicate-free
    dd = np.asarray(dists)
    assert np.all(np.diff(dd, axis=1) >= 0)
    for row in ids:
        valid = row[row >= 0]
        assert len(set(valid.tolist())) == len(valid)


def test_beam_search_expand_multi(rng):
    n, d, k = 400, 12, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((16, d)).astype(np.float32)
    ps = PointSet.from_numpy(x)
    g = _knn_graph(ps, 8)
    gt_ids, _ = exact.exact_knn(q, ps, k, chunk=64)
    res = beam_search_batch(
        jnp.asarray(q), ps.data, g.neighbors, g.degrees,
        jnp.asarray([0], dtype=jnp.int32),
        metric=Metric.L2, n_valid=n, k=k, L=32, expand=4,
    )
    ids, _ = top_k_from_beam(res, k)
    assert _recall(np.asarray(ids), np.asarray(gt_ids)) >= 0.85


def test_beam_limit_and_visited(rng):
    n, d = 300, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((8, d)).astype(np.float32)
    ps = PointSet.from_numpy(x)
    g = _knn_graph(ps, 8)
    res = beam_search_batch(
        jnp.asarray(q), ps.data, g.neighbors, g.degrees,
        jnp.asarray([0], dtype=jnp.int32),
        metric=Metric.L2, n_valid=n, k=0, L=16, limit=7,
        record_visited=True,
    )
    nv = np.asarray(res.num_visited)
    assert np.all(nv <= 7)
    # visited entries within num_visited are real ids with finite dists
    for b in range(8):
        v = np.asarray(res.visited_ids[b, : nv[b]])
        vd = np.asarray(res.visited_dists[b, : nv[b]])
        assert np.all((v >= 0) & (v < n))
        assert np.all(vd < 1e38)
        assert len(set(v.tolist())) == len(v)  # expanded nodes are unique


def test_beam_exclude_self(rng):
    n, d = 200, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    ps = PointSet.from_numpy(x)
    g = _knn_graph(ps, 8)
    qidx = np.arange(20, dtype=np.int32)
    res = beam_search_batch(
        ps.data[:20], ps.data, g.neighbors, g.degrees,
        jnp.asarray([0], dtype=jnp.int32),
        jnp.asarray(qidx),
        metric=Metric.L2, n_valid=n, k=0, L=16,
        exclude_self=True,
    )
    ids = np.asarray(res.beam_ids)
    for b in range(1, 20):  # query 0 is the start point; skip
        assert qidx[b] not in ids[b]


def test_beam_mips(rng):
    n, d, k = 400, 16, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.standard_normal((16, d)).astype(np.float32)
    ps = PointSet.from_numpy(x, metric=Metric.MIPS)
    g = _knn_graph(ps, 10)
    gt_ids, _ = exact.exact_knn(q, ps, k, chunk=64)
    res = beam_search_batch(
        jnp.asarray(q), ps.data, g.neighbors, g.degrees,
        jnp.asarray([0], dtype=jnp.int32),
        metric=Metric.MIPS, n_valid=n, k=k, L=40,
    )
    ids, _ = top_k_from_beam(res, k)
    assert _recall(np.asarray(ids), np.asarray(gt_ids)) >= 0.85


def test_beam_inline_matches_gather(rng):
    from parlayann_tpu.ops.pallas.expand import build_inline

    n, d, k = 300, 16, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((8, d)).astype(np.float32)
    ps = PointSet.from_numpy(x)
    g = _knn_graph(ps, 8)
    inline = build_inline(ps.data, g.neighbors)
    r1 = beam_search_batch(
        jnp.asarray(q), ps.data, g.neighbors, g.degrees,
        jnp.asarray([0], dtype=jnp.int32), None, inline,
        metric=Metric.L2, n_valid=n, k=k, L=16, block_b=8,
    )
    r2 = beam_search_batch(
        jnp.asarray(q), ps.data, g.neighbors, g.degrees,
        jnp.asarray([0], dtype=jnp.int32),
        metric=Metric.L2, n_valid=n, k=k, L=16, use_inline=False,
    )
    np.testing.assert_array_equal(np.asarray(r1.beam_ids), np.asarray(r2.beam_ids))
    np.testing.assert_allclose(
        np.asarray(r1.beam_dists), np.asarray(r2.beam_dists), rtol=1e-5, atol=1e-5
    )


def test_beam_search_random_starts(rng):
    """beamSearchRandom parity (beamSearch.h:309-351): per-query random
    starts reach island clusters a single fixed start cannot."""
    from parlayann_tpu.search.beam import beam_search_random

    n, d, k = 400, 8, 5
    # two far-apart blobs; a 6-NN graph is disconnected between them
    x = rng.standard_normal((n, d)).astype(np.float32)
    x[n // 2:] += 60.0
    q = x[n - 8:] + 0.01  # queries in the second blob
    ps = PointSet.from_numpy(x)
    g = _knn_graph(ps, 6)
    r_fixed = beam_search_batch(
        jnp.asarray(q), ps.data, g.neighbors, g.degrees,
        jnp.asarray([0], dtype=jnp.int32),
        metric=Metric.L2, n_valid=n, k=k, L=16, use_inline=False,
    )
    ids_fixed, _ = top_k_from_beam(r_fixed, k)
    # fixed start 0 lives in blob 1: finds nothing from blob 2
    assert (np.asarray(ids_fixed) < n // 2).all()
    r_rand = beam_search_random(
        jnp.asarray(q), ps.data, g.neighbors, g.degrees,
        n_starts=8, seed=3,
        metric=Metric.L2, n_valid=n, k=k, L=16, use_inline=False,
    )
    ids_rand, _ = top_k_from_beam(r_rand, k)
    # with 8 random starts, some land in blob 2 and the true NNs surface
    assert (np.asarray(ids_rand) >= n // 2).mean() > 0.9


def test_index_random_starts(rng):
    """Index.batch_search(random_starts=...) end-to-end."""
    from parlayann_tpu.index import Index

    n, d = 300, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((16, d)).astype(np.float32)
    ps = PointSet.from_numpy(x)
    g = _knn_graph(ps, 8)
    idx = Index(points=ps, graph=g)
    ids, dists, _ = idx.batch_search(q, k=5, beam_size=16, random_starts=4)
    assert ids.shape == (16, 5)
    assert (np.asarray(ids) < n).all()


def test_index_entry_tier(rng):
    """Sampled entry tier: per-query exact top-1 over the sample replaces
    the medoid start and must not hurt recall on an easy graph; with
    E=n the start IS the true nearest neighbor."""
    from parlayann_tpu.index import Index
    from parlayann_tpu.index import _entry_top1

    n, d, k = 400, 12, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((24, d)).astype(np.float32)
    ps = PointSet.from_numpy(x)
    g = _knn_graph(ps, 8)
    gt_ids, _ = exact.exact_knn(q, ps, k, chunk=64)

    idx = Index(points=ps, graph=g, entry_min_n=1)
    idx.build_entry_cache(E=n)
    # with the full set as the sample, the entry point is the 1-NN
    starts = _entry_top1(jnp.asarray(q), idx.entry_vecs, idx.entry_ids,
                         metric=Metric.L2)
    assert (np.asarray(starts)[:, 0] == np.asarray(gt_ids)[:, 0]).all()

    ids, _, _ = idx.batch_search(q, k=k, beam_size=20)
    r_entry = _recall(np.asarray(ids), np.asarray(gt_ids))

    idx2 = Index(points=ps, graph=g, use_entry=False)
    ids2, _, _ = idx2.batch_search(q, k=k, beam_size=20)
    r_medoid = _recall(np.asarray(ids2), np.asarray(gt_ids))
    assert r_entry >= r_medoid - 0.02
    assert r_entry > 0.8


def test_beam_two_tier_filter(rng):
    """Mid-beam two-tier filter (beamSearch.h:119-146): the running-mean
    cheap-tier prune must (a) keep recall within noise of the unfiltered
    walk on an easy graph, (b) actually drop candidates (visible as a
    num_visited/beam difference on at least one query), and (c) never
    return duplicate or unsorted results."""
    n, d, k = 600, 16, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((40, d)).astype(np.float32)
    ps = PointSet.from_numpy(x)
    g = _knn_graph(ps, 10)
    gt_ids, _ = exact.exact_knn(q, ps, k, chunk=64)
    # a deliberately coarse cheap tier (half the dims) guarantees real
    # tier disagreement so the filter's effect is observable; the q8
    # production tier agrees so closely with f32 that the running-mean
    # threshold (a mean of PAST frontier-worsts, >= the current worst
    # the cutoff already applies) almost never fires
    fd = jnp.asarray(x[:, :8])
    fq = jnp.asarray(q[:, :8])

    kw = dict(metric=Metric.L2, n_valid=n, k=k, L=32)
    starts = jnp.asarray([0], dtype=jnp.int32)
    res0 = beam_search_batch(jnp.asarray(q), ps.data, g.neighbors,
                             g.degrees, starts, **kw)
    resf = beam_search_batch(
        jnp.asarray(q), ps.data, g.neighbors, g.degrees, starts,
        filter_data=fd, filter_queries=fq, **kw)
    r0 = _recall(np.asarray(top_k_from_beam(res0, k)[0]), np.asarray(gt_ids))
    rf = _recall(np.asarray(top_k_from_beam(resf, k)[0]), np.asarray(gt_ids))
    assert rf >= r0 - 0.15, (r0, rf)
    # the filter is not a no-op: some walk diverges
    assert (np.asarray(res0.num_visited) != np.asarray(resf.num_visited)).any() \
        or (np.asarray(top_k_from_beam(res0, 32)[0])
            != np.asarray(top_k_from_beam(resf, 32)[0])).any()
    ids, dists = top_k_from_beam(resf, k)
    dd = np.asarray(dists)
    assert np.all(np.diff(dd, axis=1) >= 0)
    for row in np.asarray(ids):
        valid = row[row >= 0]
        assert len(set(valid.tolist())) == len(valid)
