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


def uniform(n: int, d: int, n_queries: int = 0, seed: int = 0,
            dtype=np.float32):
    """Single-blob standard normal — the ADVERSARIAL distribution for
    IVF-family structures (all pairwise distances concentrate; a query's
    true top-k scatters across cells). Graph indexes degrade gracefully
    here; benchmarks include it so the headline is dataset-honest."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, d)).astype(dtype)
    queries = (rng.standard_normal((n_queries, d)).astype(dtype)
               if n_queries else None)
    return base, queries


def heavy_tailed(
    n: int,
    d: int,
    n_queries: int = 0,
    n_clusters: int | None = None,
    seed: int = 0,
    dtype=np.float32,
):
    """Power-law cluster MASSES and lognormal cluster RADII — the
    skew real embedding corpora show (a few huge dense regions, a long
    tail of sparse ones). Stresses capacity balancing (hot clusters
    overflow m) and the beam's cut rule (radius heterogeneity)."""
    rng = np.random.default_rng(seed)
    c = n_clusters if n_clusters is not None else max(16, n // 1000)
    centers = rng.standard_normal((c, d)).astype(np.float64)
    # Zipf masses, normalized; radii lognormal around 0.35
    w = 1.0 / np.arange(1, c + 1) ** 1.2
    w /= w.sum()
    stds = 0.35 * np.exp(0.6 * rng.standard_normal(c))
    assign = rng.choice(c, n, p=w)
    base = centers[assign] + stds[assign, None] * rng.standard_normal((n, d))
    queries = None
    if n_queries:
        qa = rng.choice(c, n_queries, p=w)
        queries = centers[qa] + stds[qa, None] * rng.standard_normal(
            (n_queries, d))
        queries = queries.astype(dtype)
    return base.astype(dtype), queries
