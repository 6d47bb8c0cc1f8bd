"""Boundary validation of the typed API (python/wrapper.py:3-116 +
diskannpy _common.py semantics): bad dtype/metric/shape raise ValueError
before any jit."""

import numpy as np
import pytest

import parlayann_tpu as pt
from parlayann_tpu import api


def test_valid_dtype():
    assert api.valid_dtype(np.float32) == np.float32
    assert api.valid_dtype("int8") == np.int8
    assert api.valid_dtype(np.ubyte) == np.uint8
    with pytest.raises(ValueError, match="dtype"):
        api.valid_dtype(np.float64)
    with pytest.raises(ValueError, match="dtype"):
        api.valid_dtype(np.int32)


def test_valid_metric():
    from parlayann_tpu.types import Metric

    assert api.valid_metric("Euclidian") is Metric.L2
    assert api.valid_metric("l2") is Metric.L2
    assert api.valid_metric("MIPS") is Metric.MIPS
    assert api.valid_metric(Metric.MIPS) is Metric.MIPS
    with pytest.raises(ValueError, match="metric"):
        api.valid_metric("cosine-ish")


def test_build_rejects_bad_args(rng):
    X = rng.standard_normal((50, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="metric"):
        pt.build_vamana_index(X, metric="chebyshev")
    with pytest.raises(ValueError, match="2-D"):
        pt.build_vamana_index(X[0])
    with pytest.raises(ValueError, match="dtype"):
        pt.build_vamana_index(X.astype(np.float64))
    with pytest.raises(ValueError, match="L"):
        pt.build_vamana_index(X, R=32, L=16)
    with pytest.raises(ValueError, match="alpha"):
        pt.build_vamana_index(X, alpha=9.0)
    with pytest.raises(ValueError, match="delta"):
        pt.build_pynndescent_index(X, delta=2.0)
    with pytest.raises(ValueError, match="cluster_size"):
        pt.build_hcnng_index(X, cluster_size=1)
    with pytest.raises(ValueError, match="m "):
        pt.build_hnsw_index(X, m=0)


def test_load_index_missing_files(tmp_path):
    with pytest.raises(ValueError, match="graph_path"):
        api.load_index(str(tmp_path / "no.graph"), str(tmp_path / "no.fbin"))


def test_validated_build_runs(rng):
    X = rng.standard_normal((300, 16)).astype(np.float32)
    graph, ps, stats = pt.build_vamana_index(X, metric="l2", R=8, L=16)
    assert graph.max_degree == 8 and ps.n == 300
