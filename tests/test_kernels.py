"""Pallas kernel regression tests: each kernel vs its XLA oracle."""

import numpy as np
import jax.numpy as jnp

from parlayann_tpu.types import Metric
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.ops import quantize
from parlayann_tpu.ops.distance import INF
from parlayann_tpu.ops.pallas.expand import expand_distances, build_inline
from parlayann_tpu.build.prune import (
    _occlusion_loop, _occlusion_loop_xla, sort_dedup_candidates,
)


def test_occlusion_kernel_matches_xla(rng):
    """The VMEM occlusion kernel (ops/pallas/occlude.py) must select the
    exact same neighbors as the XLA pairwise-matrix path (the reference
    semantics, index.h:90-120)."""
    for metric in (Metric.L2, Metric.MIPS):
        B, C, d, R = 96, 80, 48, 12
        pts = rng.standard_normal((400, d)).astype(np.float32)
        ci = rng.integers(0, 400, (B, C)).astype(np.int32)
        p = rng.standard_normal((B, d)).astype(np.float32)
        if metric is Metric.L2:
            cd = ((pts[ci] - p[:, None, :]) ** 2).sum(-1).astype(np.float32)
        else:
            cd = -(pts[ci] * p[:, None, :]).sum(-1).astype(np.float32)
        cd[rng.random((B, C)) < 0.15] = np.float32(INF)
        sid, sdist = sort_dedup_candidates(
            jnp.asarray(ci), jnp.asarray(cd), 400
        )
        svecs = jnp.take(jnp.asarray(pts), jnp.clip(sid, 0, 399), axis=0)
        a = jnp.float32(1.2)
        ki, kd = _occlusion_loop(sid, sdist, svecs, a, R, metric)
        xi, xd = _occlusion_loop_xla(sid, sdist, svecs, a, R, metric)
        np.testing.assert_array_equal(np.asarray(ki), np.asarray(xi))
        np.testing.assert_allclose(
            np.asarray(kd), np.asarray(xd), rtol=1e-5, atol=1e-5
        )


def test_popcount_expand_matches_xla(rng):
    """bits=1 expand kernel (packed-word XOR+popcount) == XLA hamming."""
    n, d, R, B = 256, 96, 16, 64
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((B, d)).astype(np.float32)
    nbrs = jnp.asarray(rng.integers(0, n, (n, R)).astype(np.int32))
    ps = PointSet.from_numpy(X)
    bps = quantize.bit_quantize(ps)
    qb = quantize.bit_translate_query(jnp.asarray(Q), bps)
    inline = build_inline(bps.data, nbrs)
    ids = jnp.asarray(rng.integers(0, n, (B,)).astype(np.int32))
    for g in (1, 4):
        dk = expand_distances(inline, ids, qb, metric=Metric.L2, bits=1,
                              group=g)
        cand = jnp.take(
            bps.data, jnp.take(nbrs, ids, axis=0).reshape(-1), axis=0
        ).reshape(B, R, -1)
        dref = quantize.hamming_distance(qb, cand)
        np.testing.assert_array_equal(np.asarray(dk), np.asarray(dref))


def test_flat_bits_expand_matches_xla(rng):
    """Flat packed-word kernel (128-lane rows, in-place group sums) == XLA
    hamming for several word widths incl. the non-pow2 pad case (d=96 ->
    W=3 -> Wp=4)."""
    from parlayann_tpu.ops.pallas.expand import (
        build_inline_bits_flat, expand_bits_flat,
    )

    for d in (64, 96, 128, 1024):
        n, R, B = 256, 18, 48
        X = rng.standard_normal((n, d)).astype(np.float32)
        Q = rng.standard_normal((B, d)).astype(np.float32)
        nbrs = jnp.asarray(rng.integers(0, n, (n, R)).astype(np.int32))
        ps = PointSet.from_numpy(X)
        bps = quantize.bit_quantize(ps)
        qb = quantize.bit_translate_query(jnp.asarray(Q), bps)
        inline = build_inline_bits_flat(bps.data, nbrs)
        ids = jnp.asarray(rng.integers(0, n, (B,)).astype(np.int32))
        for g in (1, 4):
            dk = expand_bits_flat(inline, ids, qb, group=g)[:, :R]
            cand = jnp.take(
                bps.data, jnp.take(nbrs, ids, axis=0).reshape(-1), axis=0
            ).reshape(B, R, -1)
            dref = quantize.hamming_distance(qb, cand)
            np.testing.assert_array_equal(np.asarray(dk), np.asarray(dref))


def test_grouped_expand_matches_ungrouped(rng):
    """expand_group amortizes loop overhead only — identical distances."""
    n, d, R, B = 256, 32, 8, 64
    X = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    nbrs = jnp.asarray(rng.integers(0, n, (n, R)).astype(np.int32))
    Q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    inline = build_inline(X, nbrs)
    ids = jnp.asarray(rng.integers(0, n, (B,)).astype(np.int32))
    d1 = expand_distances(inline, ids, Q, metric=Metric.L2, group=1)
    d4 = expand_distances(inline, ids, Q, metric=Metric.L2, group=4)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d4),
                               rtol=1e-6, atol=1e-6)
