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


def test_hnsw_v3_model_roundtrip(tmp_path, rng):
    """The reference "HNSW" v3 byte format (HNSW.hpp:1615-1691 save,
    :631-744 load): write -> parse header by hand -> load -> identical
    structure and search results."""
    import struct

    n, d = 600, 12
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((20, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    idx, _ = build_hnsw_graph(ps, BuildParams(R=8, L=16, alpha=0.9, m_l=0.5))

    p = str(tmp_path / "model.v3")
    idx.save_v3(p)
    with open(p, "rb") as f:
        raw = f.read(4 + 4 + 16 + 24)
    assert raw[:4] == b"HNSW"
    assert struct.unpack_from("<I", raw, 4)[0] == 3
    dim, m_l, m, efc, alpha, nn = struct.unpack_from("<IfIIfI", raw, 24)
    assert (dim, m, efc, nn) == (d, idx.m, idx.efc, n)
    assert abs(alpha - idx.alpha) < 1e-6 and abs(m_l - idx.m_l) < 1e-6

    idx3 = HNSWIndex.load(p, ps)  # auto-detects the HNSW magic
    assert sorted(np.asarray(idx3.entrances).tolist()) == sorted(
        np.asarray(idx.entrances).tolist()
    )
    assert len(idx3.levels) == len(idx.levels)
    for lv, lv3 in zip(idx.levels, idx3.levels):
        np.testing.assert_array_equal(lv.members, lv3.members)
        ml = len(lv.members)
        np.testing.assert_array_equal(
            np.asarray(lv.degs)[:ml], np.asarray(lv3.degs)[:ml]
        )
        # same edge sets per row (order-insensitive: v3 keeps row order,
        # but compare as sets for robustness)
        a = np.asarray(lv.nbrs)[:ml]
        b = np.asarray(lv3.nbrs)[:ml]
        for i in range(ml):
            dg = int(np.asarray(lv.degs)[i])
            assert set(a[i, :dg].tolist()) == set(b[i, :dg].tolist())
    ids, _ = idx.batch_search(Q, k=5, ef=32)
    ids3, _ = idx3.batch_search(Q, k=5, ef=32)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids3))


def test_hnsw_v3_reference_node_order(tmp_path, rng):
    """load_v3 must handle the reference's layout where node order is the
    insertion permutation, not point-id order (HNSW.hpp:691-706: the node
    table carries the id mapping and neighbor lists are NODE ids)."""
    import struct

    n, d, m, efc = 40, 8, 4, 8
    X = rng.standard_normal((n, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    perm = rng.permutation(n).astype(np.uint32)  # node u -> point perm[u]
    lev = np.zeros(n, dtype=np.uint32)
    lev[:3] = 1  # nodes 0..2 also on level 1
    # hand-written tiny model: level-0 ring over node ids, level-1 triangle
    buf = b"HNSW" + struct.pack("<I", 3) + struct.pack("<QQ", 123, 456)
    buf += struct.pack("<IfIIfI", d, 0.5, m, efc, 0.9, n)
    for u in range(n):
        buf += struct.pack("<II", lev[u], perm[u])
    for u in range(n):
        ring = [(u + 1) % n, (u - 1) % n]
        buf += struct.pack("<Q", len(ring)) + np.asarray(ring, "<u4").tobytes()
        if lev[u]:
            tri = [v for v in range(3) if v != u]
            buf += struct.pack("<Q", len(tri)) + np.asarray(tri, "<u4").tobytes()
    buf += struct.pack("<Q", 1) + np.asarray([0], "<u4").tobytes()
    p = str(tmp_path / "ref.v3")
    with open(p, "wb") as f:
        f.write(buf)

    idx = HNSWIndex.load_v3(p, ps)
    assert idx.entrance == int(perm[0])
    assert len(idx.levels) == 2
    np.testing.assert_array_equal(
        idx.levels[1].members, np.sort(perm[:3].astype(np.int32))
    )
    # node u's ring neighbors map to point ids perm[u +- 1]
    lv0 = idx.levels[0]
    for u in [0, 5, n - 1]:
        pid = int(perm[u])
        row = np.asarray(lv0.nbrs)[pid]  # level-0 local ids == point ids
        want = {int(perm[(u + 1) % n]), int(perm[(u - 1) % n])}
        assert set(row[:2].tolist()) == want


def test_hnsw_multi_entrance_tie(rng):
    """Entrance update rule (HNSW.hpp:991-1007): append on a level tie so
    the entrance list can grow past one."""
    n, d = 800, 8
    X = rng.standard_normal((n, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    # high m_l -> many levels/ties
    idx, _ = build_hnsw_graph(ps, BuildParams(R=6, L=12, alpha=0.9, m_l=0.8))
    top = idx.levels[-1].members
    for e in np.asarray(idx.entrances):
        assert e in top
    assert len(np.asarray(idx.entrances)) >= 1


def test_hnsw_descent_oracle(rng):
    """Multi-level descent correctness at >1 level depth: with complete
    upper-level graphs, greedy ef=1 descent must land on each level's true
    nearest member before the level-0 search (search_layer_to semantics,
    HNSW.hpp:1532-1567)."""
    from parlayann_tpu.build.hnsw import _make_level, _descend_dev
    import jax.numpy as jnp

    n, d = 400, 6
    X = rng.standard_normal((n, d)).astype(np.float32)
    ps = PointSet.from_numpy(X)
    members = np.sort(rng.choice(n, 24, replace=False)).astype(np.int32)
    # complete graph over the level => greedy descent is exact 1-NN
    ml = len(members)
    nb = np.zeros((ml, ml - 1), dtype=np.int32)
    for i in range(ml):
        nb[i] = [j for j in range(ml) if j != i]
    lv = _make_level(ps, members, cap=ml - 1, nbrs=nb,
                     degs=np.full(ml, ml - 1, dtype=np.int32))
    Qg = rng.integers(0, n, 32).astype(np.int32)  # query points by id
    entry = np.full((32, 1), int(members[0]), dtype=np.int32)
    got = np.asarray(_descend_dev(
        lv.points_l, lv.nbrs, lv.degs, lv.members_d, lv.glob2loc_d,
        ps.data, jnp.asarray(Qg), jnp.asarray(entry),
        jnp.ones(32, bool), n_valid=ml, metric=Metric.L2,
    ))
    qv = X[Qg]
    d2 = ((qv[:, None, :] - X[members][None, :, :]) ** 2).sum(-1)
    want = members[np.argmin(d2, axis=1)]
    np.testing.assert_array_equal(got, want)
