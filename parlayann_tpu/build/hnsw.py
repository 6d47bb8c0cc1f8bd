"""HNSW builder + layered search.

Reference: HNSW/HNSW.hpp. Multi-level structure: node levels drawn
geometrically (level = floor(-ln(U) * m_l), HNSW.hpp:505-518); level-0
degree cap 2m, upper levels m; insertion descends greedily from the
entrance through upper levels (ef=1), then per level runs an efc-beam
search whose frontier is alpha-occlusion pruned into forward edges
(prune_heuristic, HNSW.hpp:430-503); reverse edges resolve overflow by
sort-truncate-by-distance, NOT alpha-prune (HNSW.hpp:940-988); queries
descend with ef=1 and run the shared beam kernel at level 0
(HNSW.hpp:1089-1109 delegates to beam_search_impl).

TPU mapping: each level is a compact (members, adjacency, gathered
vectors) triple over LOCAL ids; every phase reuses the shared batched beam
kernel and the batched robustPrune. The reference's alpha compare is
``d(c, r) < alpha * d(c, q)`` (HNSW.hpp:462-471, alpha <= 1); robustPrune
implements ``a * d <= d'`` so we pass ``a = 1/alpha``. Levels are assigned
up-front (the whole dataset is known), insertion still runs in
prefix-doubling batches (HNSW.hpp:777-800); the entrance is the
highest-level point inserted so far (single entrance vs the reference's
entrance list).

Model persistence: a versioned binary ("HTPU" magic, version 1) holding
params + per-level member lists and adjacency. (The reference's "HNSW" v3
byte layout, HNSW.hpp:1615-1691, is not reproduced byte-for-byte.)
"""

from __future__ import annotations

import dataclasses
import struct
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from parlayann_tpu.types import BuildParams, Metric
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.data.graph import GraphIndexData
from parlayann_tpu.data.pointset import pad_to
from parlayann_tpu.ops.distance import INF
from parlayann_tpu.search.beam import beam_search_batch, top_k_from_beam
from parlayann_tpu.build.prune import robust_prune_chunked
from parlayann_tpu.build.reverse import exchange_reverse_edges


@dataclasses.dataclass
class Level:
    members: np.ndarray  # (ml,) global ids, ascending
    glob2loc: np.ndarray  # (n,) int32, -1 if absent
    points_l: jax.Array  # (ml_pad, d) gathered vectors
    nbrs: jax.Array  # (ml_pad, cap) LOCAL ids
    degs: jax.Array  # (ml_pad,)
    cap: int


@dataclasses.dataclass
class HNSWIndex:
    points: PointSet
    levels: list  # Level, index = level number (0 = base)
    entrance: int  # global id
    m: int
    efc: int
    alpha: float
    m_l: float

    @property
    def max_level(self) -> int:
        return len(self.levels) - 1

    # ---------------- search (HNSW.hpp:1570-1613) ----------------
    def batch_search(self, queries, k: int = 10, ef: int = 64,
                     cut: float = 1.35, expand: int = 1):
        q = jnp.asarray(np.asarray(queries))
        B = q.shape[0]
        entry = np.full(B, self.entrance, dtype=np.int32)
        # greedy descent ef=1 through upper levels (search_layer_to)
        for l in range(self.max_level, 0, -1):
            lv = self.levels[l]
            starts = jnp.asarray(lv.glob2loc[entry])[:, None]
            res = beam_search_batch(
                q, lv.points_l, lv.nbrs, lv.degs, starts,
                metric=self.points.metric, n_valid=len(lv.members),
                k=0, L=1,
            )
            loc = np.asarray(res.beam_ids[:, 0])
            entry = np.where(loc >= 0, lv.members[np.clip(loc, 0, None)], entry)
        lv0 = self.levels[0]
        res = beam_search_batch(
            q, lv0.points_l, lv0.nbrs, lv0.degs,
            jnp.asarray(lv0.glob2loc[entry])[:, None],
            metric=self.points.metric, n_valid=self.points.n,
            k=k, L=max(ef, k), cut=cut, expand=expand,
        )
        return top_k_from_beam(res, k)

    def base_graph(self) -> GraphIndexData:
        """The level-0 graph as a standard GraphIndexData (level-0 local ids
        are global ids)."""
        lv0 = self.levels[0]
        return GraphIndexData(
            neighbors=lv0.nbrs, degrees=lv0.degs, n=self.points.n,
            max_degree=lv0.cap,
        )

    # ---------------- persistence ----------------
    def save(self, path: str) -> None:
        lv_meta = []
        with open(path, "wb") as f:
            f.write(b"HTPU")
            f.write(struct.pack("<iiiffi", 1, self.points.n, self.m,
                                self.alpha, self.m_l, self.entrance))
            f.write(struct.pack("<ii", self.efc, len(self.levels)))
            for l, lv in enumerate(self.levels):
                nb = np.asarray(lv.nbrs)[: len(lv.members)]
                dg = np.asarray(lv.degs)[: len(lv.members)]
                f.write(struct.pack("<iii", len(lv.members), lv.cap, 0))
                lv.members.astype(np.int32).tofile(f)
                dg.astype(np.int32).tofile(f)
                nb.astype(np.int32).tofile(f)

    @staticmethod
    def load(path: str, points: PointSet) -> "HNSWIndex":
        with open(path, "rb") as f:
            assert f.read(4) == b"HTPU", "bad HNSW model file"
            ver, n, m, alpha, m_l, entrance = struct.unpack("<iiiffi", f.read(24))
            efc, n_levels = struct.unpack("<ii", f.read(8))
            levels = []
            for l in range(n_levels):
                ml, cap, _ = struct.unpack("<iii", f.read(12))
                members = np.fromfile(f, np.int32, ml)
                dg = np.fromfile(f, np.int32, ml)
                nb = np.fromfile(f, np.int32, ml * cap).reshape(ml, cap)
                levels.append(
                    _make_level(points, members, cap, nbrs=nb, degs=dg)
                )
        return HNSWIndex(points=points, levels=levels, entrance=entrance,
                         m=m, efc=efc, alpha=alpha, m_l=m_l)


def _make_level(points: PointSet, members: np.ndarray, cap: int,
                nbrs=None, degs=None) -> Level:
    n = points.n
    ml = len(members)
    ml_pad = pad_to(max(ml, 1), 8)
    glob2loc = np.full(n, -1, dtype=np.int32)
    glob2loc[members] = np.arange(ml, dtype=np.int32)
    pts = jnp.take(
        points.data, jnp.asarray(np.pad(members, (0, ml_pad - ml))), axis=0
    )
    if nbrs is None:
        nbrs_a = jnp.zeros((ml_pad, cap), jnp.int32)
        degs_a = jnp.zeros((ml_pad,), jnp.int32)
    else:
        nbrs_a = jnp.asarray(
            np.pad(nbrs, ((0, ml_pad - ml), (0, 0))).astype(np.int32)
        )
        degs_a = jnp.asarray(np.pad(degs, (0, ml_pad - ml)).astype(np.int32))
    return Level(members=members, glob2loc=glob2loc, points_l=pts,
                 nbrs=nbrs_a, degs=degs_a, cap=cap)


def assign_levels(n: int, m_l: float, rng: np.random.Generator) -> np.ndarray:
    """Geometric level per point (get_level_random, HNSW.hpp:505-518)."""
    u = rng.random(n)
    lev = np.floor(-np.log(np.maximum(u, 1e-12)) * m_l).astype(np.int32)
    return np.minimum(lev, 24)


def _insert_at_level(lv: Level, points: PointSet, batch_glob: np.ndarray,
                     entry_glob: np.ndarray, efc: int, a_vamana: float,
                     m_fwd: int, alpha_arr, bucket: int):
    """Batch-insert ``batch_glob`` into one level from per-point entries.
    Returns the closest-found global id per point (entry for next level)."""
    B0 = len(batch_glob)
    pad = bucket - B0
    bg = np.pad(batch_glob, (0, pad), constant_values=-1)
    eg = np.pad(entry_glob, (0, pad), constant_values=0)
    loc = lv.glob2loc[np.clip(bg, 0, None)]
    loc = np.where(bg >= 0, loc, -1).astype(np.int32)
    starts = jnp.asarray(lv.glob2loc[eg])[:, None]
    q = jnp.take(points.data, jnp.asarray(np.clip(bg, 0, None)), axis=0)

    res = beam_search_batch(
        q, lv.points_l, lv.nbrs, lv.degs, starts, jnp.asarray(loc),
        metric=points.metric, n_valid=len(lv.members), k=0, L=efc,
        exclude_self=True,
    )
    # forward edges: alpha-prune the efc frontier (select_neighbors)
    pr = robust_prune_chunked(
        jnp.asarray(loc), res.beam_ids,
        jnp.where(res.beam_ids >= 0, res.beam_dists, INF),
        lv.points_l, alpha_arr, R=m_fwd, metric=points.metric,
        n_valid=len(lv.members),
    )
    wt = jnp.where(jnp.asarray(loc) >= 0, jnp.asarray(loc), lv.nbrs.shape[0])
    if m_fwd < lv.cap:
        sel = jnp.pad(pr.ids, ((0, 0), (0, lv.cap - m_fwd)), constant_values=-1)
        seld = jnp.pad(pr.dists, ((0, 0), (0, lv.cap - m_fwd)),
                       constant_values=INF)
    else:
        sel, seld = pr.ids, pr.dists
    nbrs = lv.nbrs.at[wt].set(sel, mode="drop")
    degs = lv.degs.at[wt].set(pr.degree, mode="drop")
    # reverse edges: overflow -> sort-truncate (HNSW.hpp:940-988)
    nbrs, degs, _ = exchange_reverse_edges(
        nbrs, degs, jnp.asarray(loc), sel, seld, lv.points_l,
        alpha_arr, R=lv.cap, metric=points.metric,
        n_valid=len(lv.members), prune_budget=-1,
    )
    lv.nbrs, lv.degs = nbrs, degs
    closest = np.asarray(res.beam_ids[:, 0])[:B0]
    out = np.where(closest >= 0, lv.members[np.clip(closest, 0, None)],
                   entry_glob)
    return out


def _descend(lv: Level, points: PointSet, batch_glob: np.ndarray,
             entry_glob: np.ndarray, bucket: int):
    """Greedy ef=1 step through one level (HNSW.hpp:1532-1567)."""
    B0 = len(batch_glob)
    pad = bucket - B0
    bg = np.pad(batch_glob, (0, pad), constant_values=0)
    eg = np.pad(entry_glob, (0, pad), constant_values=0)
    q = jnp.take(points.data, jnp.asarray(bg), axis=0)
    res = beam_search_batch(
        q, lv.points_l, lv.nbrs, lv.degs,
        jnp.asarray(lv.glob2loc[eg])[:, None],
        metric=points.metric, n_valid=len(lv.members), k=0, L=1,
    )
    loc = np.asarray(res.beam_ids[:, 0])[:B0]
    return np.where(loc >= 0, lv.members[np.clip(loc, 0, None)],
                    entry_glob[:B0])


def build_hnsw_graph(points: PointSet, bp: BuildParams,
                     verbose: bool = False):
    """Build an HNSW index (ctor + insert, HNSW.hpp:748-1014)."""
    n = points.n
    m = bp.R if bp.R > 0 else 20
    efc = bp.L if bp.L > 0 else 50
    alpha = bp.alpha if bp.alpha > 0 else 0.9
    m_l = bp.m_l if bp.m_l > 0 else 0.34
    a_vam = jnp.float32(1.0 / alpha)
    rng = np.random.default_rng(bp.seed)
    t0 = time.perf_counter()

    levels_of = assign_levels(n, m_l, rng)
    max_level = int(levels_of.max())
    levels = []
    for l in range(max_level + 1):
        members = np.flatnonzero(levels_of >= l).astype(np.int32)
        cap = 2 * m if l == 0 else m
        levels.append(_make_level(points, members, cap))
    # level 0 membership is everyone in id order: local ids == global ids
    assert np.array_equal(levels[0].members, np.arange(n, dtype=np.int32))

    order = rng.permutation(n).astype(np.int32)
    entrance = int(order[0])
    ent_level = int(levels_of[entrance])

    max_batch = min(max(int(0.02 * n), 1), 1_000_000)
    # prefix-doubling boundaries (HNSW.hpp:777-800)
    bounds = []
    lo = 0
    size = 1
    while lo < n:
        hi = min(lo + size, n)
        bounds.append((lo, hi))
        lo = hi
        size = min(size * 2, max_batch)
    upper_bucket = 256

    for bi, (lo, hi) in enumerate(bounds):
        batch = order[lo:hi]
        blev = levels_of[batch]
        entry = np.full(len(batch), entrance, dtype=np.int32)
        # start at the batch's own max level, not just the entrance level —
        # points above the current entrance insert on ALL their levels
        # (HNSW.hpp:991-1007), not only after later reverse edges wire them
        for l in range(max(ent_level, int(blev.max())), -1, -1):
            ins_mask = blev >= l
            # only descend through levels the entrance actually reaches
            desc_mask = ~ins_mask & (l <= ent_level)
            if desc_mask.any() and l > 0:
                sub = np.flatnonzero(desc_mask)
                entry[sub] = _descend(
                    levels[l], points, batch[sub], entry[sub], max_batch
                )
            if ins_mask.any():
                sub = np.flatnonzero(ins_mask)
                bucket = max_batch if l == 0 else upper_bucket
                for c0 in range(0, len(sub), bucket):
                    cs = sub[c0 : c0 + bucket]
                    entry[cs] = _insert_at_level(
                        levels[l], points, batch[cs], entry[cs], efc,
                        1.0 / alpha, m, a_vam, bucket,
                    )
        # entrance update (HNSW.hpp:991-1007)
        top = int(blev.max())
        if top > ent_level:
            entrance = int(batch[int(np.argmax(blev))])
            ent_level = top
        if verbose and bi % 8 == 0:
            print(f"hnsw: batch {bi+1}/{len(bounds)}", flush=True)

    idx = HNSWIndex(points=points, levels=levels, entrance=entrance,
                    m=m, efc=efc, alpha=alpha, m_l=m_l)
    _ = int(jnp.sum(levels[0].degs))  # readback fence
    return idx, time.perf_counter() - t0


def build_hnsw_index(
    data,
    metric: Metric = Metric.L2,
    m: int = 20,
    efc: int = 50,
    alpha: float = 0.9,
    m_l: Optional[float] = None,
    verbose: bool = False,
    seed: int = 0,
):
    """Convenience wrapper (python/builder.cpp:202-237; defaults from
    docs/algorithms.md:77-81)."""
    metric = Metric.coerce(metric)
    ps = data if isinstance(data, PointSet) else PointSet.from_numpy(
        np.asarray(data), metric=metric
    )
    bp = BuildParams(
        R=m, L=efc, alpha=alpha, m_l=m_l if m_l is not None else 0.34,
        seed=seed,
    )
    idx, dt = build_hnsw_graph(ps, bp, verbose=verbose)
    return idx, ps, dt
