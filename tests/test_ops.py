"""Distance / top-k / quantization kernels vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from parlayann_tpu.types import Metric
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.ops import distance, topk, quantize
from parlayann_tpu.search import exact


def _np_l2(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


def test_all_pairs_l2(rng):
    q = rng.standard_normal((8, 16)).astype(np.float32)
    x = rng.standard_normal((32, 16)).astype(np.float32)
    got = np.asarray(distance.all_pairs(jnp.asarray(q), jnp.asarray(x), Metric.L2))
    np.testing.assert_allclose(got, _np_l2(q, x), rtol=1e-4, atol=1e-3)


def test_all_pairs_mips(rng):
    q = rng.standard_normal((8, 16)).astype(np.float32)
    x = rng.standard_normal((32, 16)).astype(np.float32)
    got = np.asarray(distance.all_pairs(jnp.asarray(q), jnp.asarray(x), Metric.MIPS))
    np.testing.assert_allclose(got, -(q @ x.T), rtol=1e-4, atol=1e-4)


def test_gathered_matches_all_pairs(rng):
    q = rng.standard_normal((4, 8)).astype(np.float32)
    x = rng.standard_normal((20, 8)).astype(np.float32)
    ids = rng.integers(0, 20, (4, 6))
    cand = x[ids]
    got = np.asarray(distance.gathered(jnp.asarray(q), jnp.asarray(cand), Metric.L2))
    want = _np_l2(q, x)[np.arange(4)[:, None], ids]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_smallest_k(rng):
    d = rng.standard_normal((5, 40)).astype(np.float32)
    ids = np.tile(np.arange(40, dtype=np.int32), (5, 1))
    kd, ki = topk.smallest_k(jnp.asarray(d), jnp.asarray(ids), 7)
    want = np.sort(d, axis=1)[:, :7]
    np.testing.assert_allclose(np.asarray(kd), want, rtol=1e-6)


def test_merge_topk_dedup(rng):
    da = jnp.asarray([[1.0, 2.0, 3.0]])
    ia = jnp.asarray([[10, 11, 12]], dtype=jnp.int32)
    db = jnp.asarray([[2.0, 0.5]])
    ib = jnp.asarray([[11, 13]], dtype=jnp.int32)
    kd, ki = topk.merge_topk(da, ia, db, ib, 4, dedup=True)
    assert np.asarray(kd).tolist() == [[0.5, 1.0, 2.0, 3.0]]
    assert np.asarray(ki).tolist() == [[13, 10, 11, 12]]


def test_exact_knn_vs_numpy(rng):
    x = rng.standard_normal((300, 24)).astype(np.float32)
    q = rng.standard_normal((17, 24)).astype(np.float32)
    ps = PointSet.from_numpy(x)
    ids, dists = exact.exact_knn(q, ps, 5, chunk=64)
    full = _np_l2(q, x)
    want_ids = np.argsort(full, axis=1)[:, :5]
    want_d = np.take_along_axis(full, want_ids, axis=1)
    np.testing.assert_allclose(np.asarray(dists), want_d, rtol=1e-4, atol=1e-3)
    # ids may differ on exact ties; distances must match
    got_d = np.take_along_axis(full, np.asarray(ids), axis=1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-3)


def test_euclidean_quantization_monotone(rng):
    x = rng.standard_normal((100, 8)).astype(np.float32)
    ps = PointSet.from_numpy(x)
    qps = quantize.quantize_pointset(ps, bits=8)
    assert qps.data.dtype == jnp.int8
    # quantized distances approximately preserve ranking
    q = x[:3]
    qq = quantize.translate_query(jnp.asarray(q), qps)
    dq = np.asarray(distance.all_pairs(qq, qps.data, Metric.L2))[:, :100]
    df = _np_l2(q, x)
    for i in range(3):
        top_f = set(np.argsort(df[i])[:5].tolist())
        top_q = set(np.argsort(dq[i])[:15].tolist())
        assert len(top_f & top_q) >= 4


def test_mips_quantization(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    ps = PointSet.from_numpy(x, metric=Metric.MIPS)
    qps = quantize.quantize_pointset(ps, bits=8)
    assert qps.data.dtype == jnp.int8
    assert np.abs(np.asarray(qps.data)).max() <= 127


def test_bit_quantization_hamming(rng):
    x = rng.standard_normal((200, 64)).astype(np.float32)
    ps = PointSet.from_numpy(x)
    bps = quantize.bit_quantize(ps)
    assert bps.data.dtype == jnp.uint32
    assert bps.data.shape == (ps.n_pad, 2)  # 64 bits -> 2 words
    # hamming distance between a point's own code and itself is 0
    q = quantize.bit_translate_query(jnp.asarray(x[:5]), bps)
    d = np.asarray(quantize.hamming_all_pairs(q, bps.data))
    assert all(d[i, i] == 0 for i in range(5))
    # hamming roughly orders like L2: nearest-by-hamming of a point should
    # overlap its true L2 neighborhood
    full = ((x[:5, None, :] - x[None, :, :]) ** 2).sum(-1)
    hits = 0
    for i in range(5):
        top_l2 = set(np.argsort(full[i])[:20].tolist())
        top_h = set(np.argsort(d[i, :200])[:20].tolist())
        hits += len(top_l2 & top_h)
    assert hits >= 15, hits


def test_jl_projection(rng):
    x = rng.standard_normal((150, 96)).astype(np.float32)
    ps = PointSet.from_numpy(x, metric=Metric.MIPS)
    jl = quantize.jl_project(ps, jl_dims=32, bits=8, seed=1)
    assert jl.d == 32 and jl.data.shape[1] == 32
    jl1 = quantize.jl_project(ps, jl_dims=64, bits=1, seed=1)
    assert jl1.data.dtype == jnp.uint32 and jl1.data.shape[1] == 2
