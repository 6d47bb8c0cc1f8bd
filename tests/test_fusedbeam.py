"""Fused beam-step kernel vs the XLA reference path (exactness)."""

import numpy as np
import jax
import jax.numpy as jnp

from parlayann_tpu.types import Metric
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.ops import quantize
from parlayann_tpu.search.beam import beam_search_batch
from parlayann_tpu.ops.pallas.bitonic import bitonic_sort, bitonic_merge
from parlayann_tpu.ops.pallas.fusedbeam import (
    build_inline_ext, beam_search_fused,
)


def test_bitonic_sort_matches_lax_sort(rng):
    for W in (8, 64, 128):
        k = rng.standard_normal((16, W)).astype(np.float32)
        p = rng.permutation(16 * W).reshape(16, W).astype(np.int32)
        sk, sp = bitonic_sort(jnp.asarray(k), jnp.asarray(p))
        rk, rp = jax.lax.sort((jnp.asarray(k), jnp.asarray(p)), num_keys=1)
        np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))


def test_bitonic_merge(rng):
    W = 128
    a = np.sort(rng.standard_normal((8, W // 2)).astype(np.float32), axis=1)
    b = np.sort(rng.standard_normal((8, W // 2)).astype(np.float32),
                axis=1)[:, ::-1]
    k = np.concatenate([a, b], axis=1)
    mk, = bitonic_merge(jnp.asarray(k))
    np.testing.assert_array_equal(np.asarray(mk), np.sort(k, axis=1))


def test_bitonic_sort_segmented(rng):
    """Packed rows: each aligned seg-lane segment sorts independently."""
    for W, seg in ((128, 64), (128, 32), (64, 16), (128, 128)):
        k = rng.standard_normal((16, W)).astype(np.float32)
        p = rng.permutation(16 * W).reshape(16, W).astype(np.int32)
        sk, sp = bitonic_sort(jnp.asarray(k), jnp.asarray(p), seg=seg)
        ref = np.sort(k.reshape(16, W // seg, seg), axis=2).reshape(16, W)
        np.testing.assert_array_equal(np.asarray(sk), ref)
        # payload rides along: keys gathered via the sorted payload match
        kr = k.reshape(-1)[np.asarray(sp).reshape(-1) // 1]
        # payload is a permutation of row-unique values; check pairing
        flat_p = p.reshape(16 * W)
        inv = np.empty_like(flat_p)
        inv[flat_p] = np.arange(16 * W)
        np.testing.assert_array_equal(
            k.reshape(-1)[inv[np.asarray(sp).reshape(-1)]],
            np.asarray(sk).reshape(-1))


def test_bitonic_merge_segmented(rng):
    W, seg = 128, 32
    rows = 8
    a = np.sort(rng.standard_normal((rows, W // seg, seg // 2)).astype(
        np.float32), axis=2)
    b = np.sort(rng.standard_normal((rows, W // seg, seg // 2)).astype(
        np.float32), axis=2)[:, :, ::-1]
    k = np.concatenate([a, b], axis=2).reshape(rows, W)
    mk, = bitonic_merge(jnp.asarray(k), seg=seg)
    ref = np.sort(k.reshape(rows, W // seg, seg), axis=2).reshape(rows, W)
    np.testing.assert_array_equal(np.asarray(mk), ref)


def test_fused_beam_matches_xla(rng):
    """Valid beam entries, visited counts and dist_cmps all equal the
    XLA beam_search_batch on a duplicate-free graph (the kernel's
    documented row contract)."""
    n, d, R, B, L, k = 500, 128, 16, 48, 12, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    qps = quantize.quantize_pointset(ps, bits=8)
    nbrs = np.empty((n, R), np.int32)
    for i in range(n):
        nbrs[i] = rng.choice(n, R, replace=False)
    nbrs = jnp.asarray(nbrs)
    degs = jnp.asarray(rng.integers(4, R + 1, (n,)).astype(np.int32))
    Qf = rng.standard_normal((B, d)).astype(np.float32)
    q_t = quantize.translate_query(jnp.asarray(Qf), qps).astype(jnp.float32)
    starts = jnp.zeros((1,), jnp.int32)

    ref = beam_search_batch(
        q_t, qps.data, nbrs, degs, starts,
        metric=Metric.L2, n_valid=n, k=k, L=L, use_inline=False,
    )
    inline_ext = build_inline_ext(qps.data, nbrs, degs)
    fid, fdist, fnv, fcmps, n_left = beam_search_fused(
        q_t, qps.data, inline_ext, starts,
        metric=Metric.L2, n_valid=n, k=k, L=L, G=8, block_b=48,
    )
    assert int(n_left) == 0
    # compaction ladder (block_b=8 -> 3 stages on B=48): same result
    cid_, cdist_, cnv_, ccmps_, cleft = beam_search_fused(
        q_t, qps.data, inline_ext, starts,
        metric=Metric.L2, n_valid=n, k=k, L=L, G=8, block_b=8, compact=True,
    )
    assert int(cleft) == 0
    np.testing.assert_array_equal(np.asarray(cnv_), np.asarray(fnv))
    np.testing.assert_allclose(
        np.where(np.asarray(cdist_) > 1e37, 0, np.asarray(cdist_)),
        np.where(np.asarray(fdist) > 1e37, 0, np.asarray(fdist)), rtol=1e-5,
    )
    rd, fd = np.asarray(ref.beam_dists), np.asarray(fdist)
    ri, fi = np.asarray(ref.beam_ids), np.asarray(fid)
    big = 1e37
    np.testing.assert_allclose(
        np.where(rd > big, 0, rd), np.where(fd > big, 0, fd), rtol=1e-5
    )
    # ids: tie-aware — the kernel's bitonic breaks equal-distance ties
    # arbitrarily where the XLA sort is stable; compare (dist, id) SETS
    for b in range(B):
        rset = sorted((rd[b, i], ri[b, i]) for i in range(L) if rd[b, i] < big)
        fset = sorted((fd[b, i], fi[b, i]) for i in range(L) if fd[b, i] < big)
        assert rset == fset, b
    np.testing.assert_array_equal(
        np.asarray(ref.num_visited), np.asarray(fnv)
    )
    np.testing.assert_array_equal(np.asarray(ref.dist_cmps), np.asarray(fcmps))


def test_inline_ext_id_planes(rng):
    """Byte planes reassemble to the degree-masked neighbor ids."""
    n, d, R = 64, 128, 12
    pts = jnp.asarray(rng.integers(-100, 100, (n, d)).astype(np.int8))
    nbrs = jnp.asarray(rng.integers(0, n, (n, R)).astype(np.int32))
    degs = jnp.asarray(rng.integers(0, R + 1, (n,)).astype(np.int32))
    ext = np.asarray(build_inline_ext(pts, nbrs, degs))
    R8 = (R + 7) // 8 * 8
    b = [ext[:, R8 + i, :].astype(np.int32) & 0xFF for i in range(4)]
    ids = b[0] + (b[1] << 8) + (b[2] << 16) + (b[3] << 24)
    slot = np.arange(R)[None, :]
    want = np.where(slot < np.asarray(degs)[:, None], np.asarray(nbrs), -1)
    np.testing.assert_array_equal(ids[:, :R], want)


def test_fused_beam_odd_batch(rng):
    """Regression: block_b must round to a multiple of G — a batch of 24
    with G=16 used to leave rows 16-23 unprocessed (start point only)."""
    n, d, R, L, k = 400, 128, 16, 12, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    qps = quantize.quantize_pointset(ps, bits=8)
    nbrs = np.empty((n, R), np.int32)
    for i in range(n):
        nbrs[i] = rng.choice(n, R, replace=False)
    nbrs = jnp.asarray(nbrs)
    degs = jnp.full((n,), R, jnp.int32)
    Qf = rng.standard_normal((32, d)).astype(np.float32)
    q_t = quantize.translate_query(jnp.asarray(Qf), qps).astype(jnp.float32)
    starts = jnp.zeros((1,), jnp.int32)
    inline_ext = build_inline_ext(qps.data, nbrs, degs)

    full, _, _, _, _ = beam_search_fused(
        q_t, qps.data, inline_ext, starts,
        metric=Metric.L2, n_valid=n, k=k, L=L, G=16,
    )
    for B in (24, 20):
        part, _, _, _, _ = beam_search_fused(
            q_t[:B], qps.data, inline_ext, starts,
            metric=Metric.L2, n_valid=n, k=k, L=L, G=16,
        )
        np.testing.assert_array_equal(
            np.asarray(part), np.asarray(full)[:B]
        )


def test_build_beam_fused_matches_hybrid_visited(rng):
    """The build read phase (k=0, fixed vmax budget): the fused driver's
    stacked expansion sequence equals the XLA recorder's visited list
    (as (dist, id) sets — tie order may differ between the kernel's
    bitonic and XLA's stable sort)."""
    from parlayann_tpu.ops.pallas.fusedbeam import build_beam_fused

    n, d, R, B, L = 400, 128, 16, 32, 16
    vmax = 24
    X = rng.standard_normal((n, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    qps = quantize.quantize_pointset(ps, bits=8)
    nbrs = np.empty((n, R), np.int32)
    for i in range(n):
        nbrs[i] = rng.choice(n, R, replace=False)
    nbrs = jnp.asarray(nbrs)
    degs = jnp.asarray(rng.integers(4, R + 1, (n,)).astype(np.int32))
    Qf = rng.standard_normal((B, d)).astype(np.float32)
    q_t = quantize.translate_query(jnp.asarray(Qf), qps).astype(jnp.float32)
    starts = jnp.zeros((1,), jnp.int32)

    ref = beam_search_batch(
        q_t, qps.data, nbrs, degs, starts,
        metric=Metric.L2, n_valid=n, k=0, L=L, limit=vmax,
        expand=1, record_visited=True, use_inline=False,
    )
    inline_ext = build_inline_ext(qps.data, nbrs, degs)
    vis_ids, vis_d, nv, cmps = build_beam_fused(
        q_t, qps.data, inline_ext, starts,
        metric=Metric.L2, n_valid=n, L=L, vmax=vmax, G=8, block_b=32,
    )
    vis_ids, vis_d = np.asarray(vis_ids), np.asarray(vis_d)
    rid = np.asarray(ref.visited_ids)
    rd = np.asarray(ref.visited_dists)
    big = 1e37
    np.testing.assert_array_equal(np.asarray(ref.num_visited),
                                  np.asarray(nv))
    for b in range(B):
        rset = sorted(
            (round(float(rd[b, i]), 3), int(rid[b, i]))
            for i in range(rid.shape[1]) if rd[b, i] < big
        )
        fset = sorted(
            (round(float(vis_d[b, i]), 3), int(vis_ids[b, i]))
            for i in range(vis_ids.shape[1]) if vis_ids[b, i] >= 0
        )
        assert rset == fset, b


def test_dedup_merged_semantics():
    """_dedup_merged (PARLAYANN_DEDUP=merge): duplicate ids adjacent in a
    dist-sorted merged row are collapsed — the surviving copy keeps the
    MIN pack (expanded bit wins, preserving eviction permanence), dup
    lanes become INF sentinels, and the cleanup sort restores ascending
    order. End-to-end equivalence with the loop mode is checked manually
    per-process (env is trace-time); this pins the helper's contract."""
    import jax.numpy as jnp
    import numpy as np

    from parlayann_tpu.ops.distance import INF
    from parlayann_tpu.ops.pallas.fusedbeam import _dedup_merged

    n_valid, Rp = 100, 8
    # ids:   7(exp) 7(unexp dup) 3 5 5(exp dup later lane) pad...
    ids =   [7,    7,    3,    5,    5,    90,   91,   92]
    packs = [14,   15,   7,    11,   10,   181,  183,  185]
    dists = [1.0,  1.0,  2.0,  3.0,  3.0,  INF,  INF,  INF]
    nd = jnp.asarray([dists], jnp.float32)
    npk = jnp.asarray([packs], jnp.int32)
    od, op = _dedup_merged(nd, npk, seg=8, n_valid=n_valid, Rp=Rp,
                           roll=jnp.roll)
    od, op = np.asarray(od)[0], np.asarray(op)[0]
    live = od < INF
    assert live.sum() == 3
    out_ids = (op[live] >> 1).tolist()
    assert out_ids == [7, 3, 5]
    # min pack survives: id 7 keeps 14 (expanded), id 5 keeps 10
    assert op[live].tolist() == [14, 7, 10]
    assert np.all(np.diff(od[live]) >= 0)


def test_fused_beam_dedup_modes_agree(rng):
    """dedup="merge" end-to-end equals dedup="loop" (now an explicit
    static argument, ADVICE r4 — no trace-time env read), and merge-mode
    final ids are duplicate-free even when seed distances come from the
    ulp-divergent XLA path."""
    n, d, R, B, L, k = 400, 64, 16, 32, 12, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    qps = quantize.quantize_pointset(ps, bits=8)
    nbrs = np.empty((n, R), np.int32)
    for i in range(n):
        nbrs[i] = rng.choice(n, R, replace=False)
    nbrs = jnp.asarray(nbrs)
    degs = jnp.full((n,), R, jnp.int32)
    Qf = rng.standard_normal((B, d)).astype(np.float32)
    q_t = quantize.translate_query(jnp.asarray(Qf), qps).astype(jnp.float32)
    # multi-start seeds exercise the seed-vs-kernel distance path
    starts = jnp.asarray(rng.choice(n, 4, replace=False).astype(np.int32))

    out = {}
    for mode in ("loop", "merge"):
        fid, fdist, fnv, fcmps, n_left = beam_search_fused(
            q_t, qps.data, build_inline_ext(qps.data, nbrs, degs), starts,
            metric=Metric.L2, n_valid=n, k=k, L=L, G=8, block_b=32,
            dedup=mode,
        )
        assert int(n_left) == 0
        out[mode] = (np.asarray(fid), np.asarray(fdist))
    li, ld = out["loop"]
    mi, md = out["merge"]
    big = 1e37
    np.testing.assert_allclose(
        np.where(ld > big, 0, ld), np.where(md > big, 0, md), rtol=1e-5
    )
    for b in range(B):
        valid = mi[b][mi[b] >= 0]
        assert len(valid) == len(set(valid.tolist())), b
        assert set(valid[:k]) == set(li[b][li[b] >= 0][:k]), b


def test_fused_beam_expand2(rng):
    """E=2 multi-expansion: per step the kernel expands the TWO nearest
    workable entries (DMA doubles, sequential steps ~halve). The walk
    visits a superset-ish frontier vs E=1, so beams are compared by
    quality, not bit-equality: same-or-better recall against the XLA
    reference beam, duplicate-free sorted results, full convergence."""
    n, d, R, B, L, k = 600, 64, 16, 48, 16, 10
    X = rng.standard_normal((n, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    qps = quantize.quantize_pointset(ps, bits=8)
    nbrs = np.empty((n, R), np.int32)
    for i in range(n):
        nbrs[i] = rng.choice(n, R, replace=False)
    nbrs = jnp.asarray(nbrs)
    degs = jnp.full((n,), R, jnp.int32)
    Qf = rng.standard_normal((B, d)).astype(np.float32)
    q_t = quantize.translate_query(jnp.asarray(Qf), qps).astype(jnp.float32)
    starts = jnp.zeros((1,), jnp.int32)
    ext = build_inline_ext(qps.data, nbrs, degs)

    ref = beam_search_batch(
        q_t, qps.data, nbrs, degs, starts,
        metric=Metric.L2, n_valid=n, k=k, L=L, use_inline=False,
    )
    fid, fdist, fnv, fcmps, n_left = beam_search_fused(
        q_t, qps.data, ext, starts,
        metric=Metric.L2, n_valid=n, k=k, L=L, G=8, block_b=48, expand=2,
    )
    assert int(n_left) == 0
    fid = np.asarray(fid)
    fdist = np.asarray(fdist)
    rd = np.asarray(ref.beam_dists)[:, :k]
    hits = 0
    for b in range(B):
        valid = fid[b][fid[b] >= 0]
        assert len(valid) == len(set(valid.tolist())), b
        assert np.all(np.diff(fdist[b][fdist[b] < 1e37]) >= 0), b
        # top-k dist mass no worse than the E=1 reference walk's
        hits += int(np.sum(fdist[b, :k] <= rd[b, k - 1] * (1 + 1e-5)))
    assert hits >= int(0.95 * B * k), hits / (B * k)
