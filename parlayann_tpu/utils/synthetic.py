"""Synthetic datasets for tests and benchmarks.

Clustered Gaussian mixtures approximate the local structure of real ANN
benchmarks (SIFT-style): uniform random data has no neighborhood structure
and understates graph-index recall, so benchmarks default to clusters.
"""

from __future__ import annotations

import numpy as np


def clustered(
    n: int,
    d: int,
    n_queries: int = 0,
    n_clusters: int | None = None,
    cluster_std: float = 0.15,
    seed: int = 0,
    dtype=np.float32,
):
    """SIFT-like clustered data -> (base (n,d), queries (nq,d))."""
    rng = np.random.default_rng(seed)
    c = n_clusters if n_clusters is not None else max(16, n // 1000)
    centers = rng.standard_normal((c, d)).astype(np.float64)
    assign = rng.integers(0, c, n)
    base = centers[assign] + cluster_std * rng.standard_normal((n, d))
    queries = None
    if n_queries:
        qassign = rng.integers(0, c, n_queries)
        queries = centers[qassign] + cluster_std * rng.standard_normal((n_queries, d))
        queries = queries.astype(dtype)
    return base.astype(dtype), queries
