"""Quantized search tier + rerank (beamSearch.h:394-454 semantics)."""

import numpy as np

from parlayann_tpu.types import BuildParams
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.build.vamana import build_vamana_graph
from parlayann_tpu.index import Index
from parlayann_tpu.search import exact


def _recall(ids, gt):
    return sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt)
    ) / gt.size


def test_quantized_search_with_rerank(rng):
    n, d, k = 800, 24, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((30, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    bp = BuildParams(R=16, L=32, alpha=1.2, num_passes=1, batch_cap_frac=0.25)
    g, _ = build_vamana_graph(ps, bp)
    gt, _ = exact.exact_knn(Q, ps, k, chunk=128)
    gt = np.asarray(gt)

    idx_f = Index(points=ps, graph=g)
    ids_f, _, _ = idx_f.batch_search(Q, k=k, beam_size=40)
    rec_f = _recall(np.asarray(ids_f), gt)

    idx_q = Index(points=ps, graph=g).enable_quantized(bits=8)
    assert idx_q.qpoints is not None
    ids_q, dists_q, _ = idx_q.batch_search(Q, k=k, beam_size=40, rerank_factor=10)
    rec_q = _recall(np.asarray(ids_q), gt)

    # the quantized inline tier is 1 byte/dim
    assert idx_q.build_inline_cache().dtype == np.int8
    # rerank restores most of the full-precision recall
    assert rec_q >= rec_f - 0.03, (rec_q, rec_f)
    # reranked dists are true full-precision distances, ascending
    dd = np.asarray(dists_q)
    assert np.all(np.diff(dd, axis=1) >= 0)
    row = np.asarray(ids_q)[0]
    want = ((X[row] - Q[0]) ** 2).sum(1)
    np.testing.assert_allclose(dd[0], want, rtol=1e-4, atol=1e-3)


def test_build_on_quantized_points(rng):
    """The reference builds the graph on the 1-byte tier (builder.cpp:60-87);
    int8 storage must flow through every build kernel."""
    from parlayann_tpu.ops import quantize
    from parlayann_tpu.build.vamana import build_vamana_graph

    n, d, k = 800, 16, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((30, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    qps = quantize.quantize_pointset(ps, bits=8)
    bp = BuildParams(R=16, L=32, alpha=1.2, num_passes=2, batch_cap_frac=0.25)
    g, _ = build_vamana_graph(qps, bp)
    avg, mx = g.stats()
    assert avg > 6, f"degree collapsed: {avg}"

    gt, _ = exact.exact_knn(Q, ps, k, chunk=128)
    idx = Index(points=ps, graph=g, qpoints=qps)
    ids, _, _ = idx.batch_search(Q, k=k, beam_size=40)
    rec = _recall(np.asarray(ids), np.asarray(gt))
    assert rec >= 0.85, rec


def test_bit_tier_search(rng):
    """1-bit hamming beam phase + full-precision rerank."""
    n, d, k = 800, 64, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((30, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    bp = BuildParams(R=16, L=32, alpha=1.2, num_passes=2, batch_cap_frac=0.25)
    g, _ = build_vamana_graph(ps, bp)
    gt, _ = exact.exact_knn(Q, ps, k, chunk=128)
    gt = np.asarray(gt)

    idx = Index(points=ps, graph=g).enable_bit_tier()
    assert idx.bit_points.data.dtype == np.uint32
    ids, dists, _ = idx.batch_search(Q, k=k, beam_size=64, rerank_factor=10)
    rec = _recall(np.asarray(ids), gt)
    # coarse tier + rerank: useful but below full precision
    assert rec >= 0.5, rec
    # reranked dists are true full-precision distances
    row = np.asarray(ids)[0]
    valid = row >= 0
    want = ((X[row[valid]] - Q[0]) ** 2).sum(1)
    np.testing.assert_allclose(np.asarray(dists)[0][valid], want, rtol=1e-4,
                               atol=1e-3)
