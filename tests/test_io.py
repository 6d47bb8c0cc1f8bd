"""Round-trip tests for the reference-compatible binary formats."""

import numpy as np

from parlayann_tpu.data import io


def test_bin_roundtrip(tmp_path, rng):
    x = rng.standard_normal((37, 13)).astype(np.float32)
    p = str(tmp_path / "x.fbin")
    io.write_bin(p, x)
    y = io.read_bin(p, np.float32)
    np.testing.assert_array_equal(x, y)
    # header is two uint32 little-endian words (point_range.h:84-90)
    raw = np.fromfile(p, dtype=np.uint32, count=2)
    assert raw.tolist() == [37, 13]


def test_bin_dtype_inference(tmp_path, rng):
    x = rng.integers(0, 255, (10, 8)).astype(np.uint8)
    p = str(tmp_path / "x.bin")
    io.write_bin(p, x)
    assert io.infer_bin_dtype(p) == np.uint8
    np.testing.assert_array_equal(io.read_bin(p, io.infer_bin_dtype(p)), x)


def test_vecs_roundtrip(tmp_path, rng):
    x = rng.standard_normal((5, 7)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    rows = []
    for row in x:
        rows.append(np.array([7], dtype=np.int32).tobytes())
        rows.append(row.tobytes())
    with open(p, "wb") as f:
        f.write(b"".join(rows))
    np.testing.assert_array_equal(io.read_vecs(p), x)


def test_graph_roundtrip(tmp_path, rng):
    n, r = 50, 8
    degrees = rng.integers(0, r + 1, n).astype(np.int32)
    neighbors = rng.integers(0, n, (n, r)).astype(np.int32)
    mask = np.arange(r)[None, :] >= degrees[:, None]
    neighbors[mask] = 0
    p = str(tmp_path / "g.graph")
    io.write_graph(p, neighbors, degrees)
    nb2, dg2, maxdeg = io.read_graph(p)
    assert maxdeg == r
    np.testing.assert_array_equal(dg2, degrees)
    valid = ~mask
    np.testing.assert_array_equal(nb2[valid], neighbors[valid])
    # byte layout: [n, maxDeg] + degrees + flat edges, all uint32 (graph.h:206)
    raw = np.fromfile(p, dtype=np.uint32)
    assert raw[0] == n and raw[1] == r
    assert raw.size == 2 + n + degrees.sum()


def test_ibin_roundtrip(tmp_path, rng):
    ids = rng.integers(0, 1000, (20, 10)).astype(np.int32)
    dists = rng.standard_normal((20, 10)).astype(np.float32)
    p = str(tmp_path / "gt.ibin")
    io.write_ibin(p, ids, dists)
    i2, d2 = io.read_ibin(p)
    np.testing.assert_array_equal(ids, i2)
    np.testing.assert_array_equal(dists, d2)


def test_range_ibin_roundtrip(tmp_path, rng):
    lists = [rng.integers(0, 100, rng.integers(0, 9)).astype(np.int32) for _ in range(12)]
    p = str(tmp_path / "rgt.ibin")
    io.write_range_ibin(p, lists)
    out = io.read_range_ibin(p)
    assert len(out) == 12
    for a, b in zip(lists, out):
        np.testing.assert_array_equal(a, b)


def test_hdf5_roundtrip(tmp_path, rng):
    """HDF5 loaders (h5_ops.hpp parity): write/read + PointSet.from_file."""
    from parlayann_tpu.data import io
    from parlayann_tpu.data.pointset import PointSet

    x = rng.standard_normal((40, 12)).astype(np.float32)
    p = str(tmp_path / "x.h5")
    io.write_hdf5(p, x)
    np.testing.assert_array_equal(io.read_hdf5(p), x)
    ps = PointSet.from_file(p)
    assert ps.n == 40 and ps.d == 12
    import pytest
    with pytest.raises(KeyError):
        io.read_hdf5(p, dataset="nope")


def test_batch_search_from_string(rng):
    """graph_index.cpp:236-257 parity: queries as a .bin byte string."""
    import parlayann_tpu as pt
    from parlayann_tpu.index import Index

    X = rng.standard_normal((400, 16)).astype(np.float32)
    Q = rng.standard_normal((8, 16)).astype(np.float32)
    graph, ps, _ = pt.build_vamana_index(X, R=8, L=16)
    idx = Index(points=ps, graph=graph)
    blob = np.array([8, 16], np.uint32).tobytes() + Q.tobytes()
    ids, dists = idx.batch_search_from_string(blob, k=5, beam_size=16)
    ids2, dists2, _ = idx.batch_search(Q, k=5, beam_size=16)
    np.testing.assert_array_equal(ids, np.asarray(ids2))
