"""Vamana / DiskANN builder — batch-synchronous prefix-doubling insertion.

Reference: vamana/index.h:150-316 (build_index / batch_insert) and
vamana/neighbors.h:113-186 (driver). The reference's batches are already
read-phase/write-phase separated (the paper's determinism trick), so each
batch maps to ONE jitted device step:

  batched beam search (record visited)       index.h:247-266
    -> batched robustPrune (forward edges)   index.h:63-120
    -> scatter forward rows                  index.h:268-270
    -> reverse-edge exchange                 index.h:278-300

Host code only slices the shuffled insert order into the prefix-doubling
schedule (1, 2, 4, ..., then fixed 0.02*n-capped batches — index.h:206-233)
and pads each batch to a power-of-two so the step compiles O(log n) times.
Passes: all but the last run with alpha=1.0, the last with BP.alpha
(index.h:171-176). Rows are distance-sorted once at the end
(index.h:180-185).
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from parlayann_tpu.types import BuildParams, Metric
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.data.graph import GraphIndexData
from parlayann_tpu.ops import distance
from parlayann_tpu.ops.distance import INF
from parlayann_tpu.search.beam import beam_search_batch
from parlayann_tpu.build.prune import robust_prune_chunked
from parlayann_tpu.build.reverse import (
    exchange_reverse_edges,
    prepare_reverse_append,
    prune_reverse_chunk,
    prune_reverse_all,
)
from parlayann_tpu.ops.pallas.expand import build_inline

# per-steady-batch inline rebuild (see build_vamana_graph): one chunked
# full-graph gather compiled once per (n_pad, R) shape
_build_inline_jit = jax.jit(build_inline)


def _build_inline_ext_lazy():
    from parlayann_tpu.ops.pallas.fusedbeam import build_inline_ext

    return jax.jit(build_inline_ext)


@partial(
    jax.jit,
    static_argnames=("R", "L", "vmax", "metric", "n_valid"),
)
def _fused_read_phase(
    nbrs, degs, points_data, batch_ids, start, inline_ext,
    *, R, L, vmax, metric, n_valid,
):
    """Read phase on the fused Pallas beam kernel (build_beam_fused):
    single-expansion steps whose per-step algebra runs in packed lanes
    inside one kernel instead of XLA lane sorts — the same kernel that
    won the search-side A/B. Candidates = stacked expansion sequence
    (the visited list) ∪ current out-edges, exactly the hybrid
    _beam_phase_impl contract (index.h:251-262). Self is masked from
    the visited list on the way out (the hybrid excludes it from the
    beam; here it costs one wasted expansion on passes >= 2 and its
    out-neighbors re-enter as candidates anyway)."""
    from parlayann_tpu.ops.pallas.fusedbeam import build_beam_fused

    safe_ids = jnp.clip(batch_ids, 0, points_data.shape[0] - 1)
    queries = jnp.take(points_data, safe_ids, axis=0)
    qf = queries.astype(jnp.float32)
    vis_ids, vis_d, nvv, cm = build_beam_fused(
        qf, points_data, inline_ext, start,
        metric=metric, n_valid=n_valid, L=L, vmax=vmax,
    )
    vis_d = jnp.where(vis_ids == batch_ids[:, None], INF, vis_d)
    old_row = jnp.take(nbrs, safe_ids, axis=0)
    odeg = jnp.take(degs, safe_ids, axis=0)
    old_ok = jnp.arange(R, dtype=jnp.int32)[None, :] < odeg[:, None]
    old_vecs = jnp.take(
        points_data, jnp.clip(old_row, 0, points_data.shape[0] - 1), axis=0
    )
    old_d = jnp.where(old_ok, distance.gathered(queries, old_vecs, metric), INF)
    cand_ids = jnp.concatenate([vis_ids, old_row], axis=1)
    cand_d = jnp.concatenate([vis_d, old_d], axis=1)
    active = batch_ids >= 0
    return (cand_ids, cand_d,
            jnp.sum(jnp.where(active, nvv, 0)),
            jnp.sum(jnp.where(active, cm, 0)))


class BuildStats(NamedTuple):
    build_time: float
    beam_time: float  # t_beam (index.h:217)
    bidirect_time: float  # t_bidirect (index.h:218)
    prune_time: float  # t_prune (index.h:219)
    total_visited: int
    total_cmps: int
    n_fallback: int


def _beam_phase_impl(
    nbrs, degs, points_data, batch_ids, start, inline=None,
    *, R, L, vmax, metric, n_valid, expand, expand_group=4,
):
    """Read phase: beam search from the start point, k=0 (no cut), recording
    the expanded/visited list as prune candidates (index.h:251-262).
    Candidates = visited ∪ current out-edges (add=true, index.h:70-76 —
    rows are non-empty on passes >= 2).

    ``inline``: optional (n_pad, R8, d) inline neighbor vectors rebuilt per
    steady batch by the caller — routes the per-step candidate-vector fetch
    through the Pallas grouped-DMA expand kernel (~150 GB/s sequential
    reads) instead of XLA's ~35 GB/s row gather. The beam phase is the
    build's gather-bound bottleneck, so this is the main build byte-rate
    lever. Queries are cast to f32 (the kernel's dynamic row loads require
    f32; distances are computed in f32 either way)."""
    safe_ids = jnp.clip(batch_ids, 0, points_data.shape[0] - 1)
    queries = jnp.take(points_data, safe_ids, axis=0)
    bq = queries.astype(jnp.float32) if inline is not None else queries
    res = beam_search_batch(
        bq,
        points_data,
        nbrs,
        degs,
        start,
        batch_ids,
        inline,
        metric=metric,
        n_valid=n_valid,
        k=0,
        L=L,
        limit=vmax,
        expand=expand,
        record_visited=True,
        exclude_self=True,
        use_inline=inline is not None,
        expand_group=expand_group,
    )
    old_row = jnp.take(nbrs, safe_ids, axis=0)
    odeg = jnp.take(degs, safe_ids, axis=0)
    old_ok = jnp.arange(R, dtype=jnp.int32)[None, :] < odeg[:, None]
    old_vecs = jnp.take(
        points_data, jnp.clip(old_row, 0, points_data.shape[0] - 1), axis=0
    )
    old_d = jnp.where(old_ok, distance.gathered(queries, old_vecs, metric), INF)
    # visited_dists already carries INF in unused slots (scan-stacked order)
    cand_ids = jnp.concatenate([res.visited_ids, old_row], axis=1)
    cand_d = jnp.concatenate([res.visited_dists, old_d], axis=1)
    return cand_ids, cand_d, jnp.sum(res.num_visited), jnp.sum(res.dist_cmps)


def _fwd_phase_impl(
    nbrs, degs, points_data, batch_ids, cand_ids, cand_d, alpha,
    *, R, metric, n_valid, chunk,
):
    """Forward robustPrune + row scatter (index.h:63-120, :268-270)."""
    n_pad = nbrs.shape[0]
    pr = robust_prune_chunked(
        batch_ids, cand_ids, cand_d, points_data, alpha,
        R=R, metric=metric, n_valid=n_valid, chunk=chunk,
    )
    wt = jnp.where(batch_ids >= 0, batch_ids, n_pad)
    from parlayann_tpu.build.reverse import scatter_rows

    nbrs, degs = scatter_rows(nbrs, degs, wt, pr.ids, pr.degree)
    return nbrs, degs, pr.ids, pr.dists


def _exact_phase_impl(
    nbrs, degs, points_data, batch_ids, inserted, start, samples,
    *, R, L, vmax, metric, n_valid, k1=8, k2=16, expand=0,
):
    """Multi-scale exact-candidate read phase. The beam search's only job
    here is to collect a candidate pool for robustPrune (index.h:251-262),
    but its visited set carries points at MANY scales — the walk from the
    medoid passes long-range waypoints, and those are what robustPrune
    turns into the navigable long edges. A plain exact top-L supplies only
    the immediate neighborhood and the graph disconnects on clustered data
    (measured: recall .49 vs .71 at Q=10 on synth100k). So the pool is the
    HNSW-hierarchy answer computed with matmuls instead of walks: the
    exact top-k of a ~1% sample, of a ~10% sample, and of the full
    inserted prefix — nearest-in-a-sparse-sample IS a long-range waypoint
    (HNSW.hpp's level construction makes the same argument). Costs ~1.1
    full MXU scans; robustPrune's sort_dedup collapses overlap.

    ``inserted`` is the device-resident validity mask (read phase: the
    current batch is excluded by ``exclude_ids`` and not yet marked)."""
    from parlayann_tpu.search.flat import flat_search_batch

    safe_ids = jnp.clip(batch_ids, 0, points_data.shape[0] - 1)
    queries = jnp.take(points_data, safe_ids, axis=0)
    kc = min(vmax, max(L, R + 8))
    # trace-time backend choice: the Pallas flat-scan kernel is ~20x the
    # XLA select paths on TPU; its interpret fallback would crawl on CPU
    on_tpu = jax.default_backend() == "tpu"
    sel = "pallas" if on_tpu else "approx"
    cids, cd = flat_search_batch(
        queries, points_data, inserted, batch_ids,
        k=kc, metric=metric, n_valid=n_valid, select=sel,
    )
    cd = jnp.where(cids >= 0, cd, INF)
    scale_ids, scale_d = [cids], [cd]
    for sids, sdata in samples:
        kk = k2 if sdata.shape[0] > 4096 else k1
        ssel = (sel if sdata.shape[0] > 2048 else "sort")
        rid, rd = flat_search_batch(
            queries, sdata, jnp.take(inserted, sids), None,
            k=kk, metric=metric, n_valid=sdata.shape[0], select=ssel,
        )
        gid = jnp.where(
            rid >= 0, jnp.take(sids, jnp.clip(rid, 0, sids.shape[0] - 1)), -1
        )
        rd = jnp.where((gid >= 0) & (gid != batch_ids[:, None]), rd, INF)
        scale_ids.append(gid)
        scale_d.append(rd)
    old_row = jnp.take(nbrs, safe_ids, axis=0)
    odeg = jnp.take(degs, safe_ids, axis=0)
    old_ok = jnp.arange(R, dtype=jnp.int32)[None, :] < odeg[:, None]
    old_vecs = jnp.take(
        points_data, jnp.clip(old_row, 0, points_data.shape[0] - 1), axis=0
    )
    old_d = jnp.where(old_ok, distance.gathered(queries, old_vecs, metric), INF)
    cand_ids = jnp.concatenate(scale_ids + [old_row], axis=1)
    cand_d = jnp.concatenate(scale_d + [old_d], axis=1)
    active = (batch_ids >= 0).astype(jnp.int32)
    n_ins = jnp.sum(inserted.astype(jnp.int32))
    return cand_ids, cand_d, jnp.sum(active) * kc, jnp.sum(active) * n_ins


_exact_phase = partial(
    jax.jit,
    static_argnames=("R", "L", "vmax", "metric", "n_valid", "k1", "k2",
                     "expand"),
)(lambda *a, **k: _exact_phase_impl(*a, **k))


def _scale_samples(n, rng, points_data):
    """Waypoint sample ladder: uniform samples at ~4x spacing from n/4
    down to ~512 (pow2 sizes for stable compile shapes), gathered once per
    build -> list of (global_ids, data). The nearest-k within each sample
    plays the role of the beam walk's mid-trajectory visited nodes at that
    radius; 4x spacing mirrors HNSW's level geometry. Total extra scan
    cost ~ sum(n/4^i) ~ n/3. Empty below the scale where the full top-L
    already covers a few percent of the data."""
    if n < 8192:
        return []
    sizes = []
    s = n // 4
    while s >= 384:
        p = min(65536, max(512, _pow2_floor(s)))
        if not sizes or p < sizes[-1]:
            sizes.append(p)
        s //= 4
    out = []
    for p in sizes:
        ids = jnp.asarray(rng.choice(n, p, replace=False).astype(np.int32))
        out.append((ids, jnp.take(points_data, ids, axis=0)))
    return out


def _pow2_floor(x: int) -> int:
    p = 1
    while p * 2 <= x:
        p *= 2
    return p


@partial(jax.jit, donate_argnums=(0,))
def _mark_inserted(inserted, batch_ids):
    wt = jnp.where(batch_ids >= 0, batch_ids, inserted.shape[0])
    return inserted.at[wt].set(True, mode="drop")


# fused step (production path): every device phase INCLUDING the overflow
# α-prune in one dispatch — zero per-batch host syncs (relay latency is the
# enemy); skipped prune chunks cost nothing via the traced lax.cond
@partial(
    jax.jit,
    static_argnames=("R", "L", "vmax", "metric", "n_valid", "expand", "chunk"),
    donate_argnums=(0, 1),
)
def _insert_batch(
    nbrs, degs, points_data, batch_ids, alpha, start,
    *, R: int, L: int, vmax: int, metric: Metric, n_valid: int,
    expand: int = 1, chunk: int = 2048,
):
    cand_ids, cand_d, tot_vis, tot_cmp = _beam_phase_impl(
        nbrs, degs, points_data, batch_ids, start,
        R=R, L=L, vmax=vmax, metric=metric, n_valid=n_valid, expand=expand,
    )
    nbrs, degs, sel_ids, sel_dists = _fwd_phase_impl(
        nbrs, degs, points_data, batch_ids, cand_ids, cand_d, alpha,
        R=R, metric=metric, n_valid=n_valid, chunk=chunk,
    )
    nbrs, degs, ctx, rstats = prepare_reverse_append(
        nbrs, degs, batch_ids, sel_ids, sel_dists, R=R, n_valid=n_valid,
    )
    nbrs, degs = prune_reverse_all(
        nbrs, degs, ctx, points_data, alpha,
        R=R, metric=metric, n_valid=n_valid, chunk=4096,
    )
    return nbrs, degs, (tot_vis, tot_cmp, rstats.n_overflow)


# write step: forward prune + scatter + reverse append + overflow α-prune in
# ONE dispatch. Production runs _beam_phase + _write_batch back-to-back with
# NO fence: the two dispatches pipeline like one, and XLA's fusion of the
# beam scan is ~3x better when the beam compiles as its own program
# (23 vs 68 ms/batch device time, traced on the fused single-dispatch step)
@partial(
    jax.jit,
    static_argnames=("R", "metric", "n_valid", "chunk", "rev_chunk"),
    donate_argnums=(0, 1),
)
def _write_batch(
    nbrs, degs, points_data, batch_ids, cand_ids, cand_d, alpha,
    *, R: int, metric: Metric, n_valid: int, chunk: int = 2048,
    rev_chunk: int = 4096,
):
    nbrs, degs, sel_ids, sel_dists = _fwd_phase_impl(
        nbrs, degs, points_data, batch_ids, cand_ids, cand_d, alpha,
        R=R, metric=metric, n_valid=n_valid, chunk=chunk,
    )
    nbrs, degs, ctx, rstats = prepare_reverse_append(
        nbrs, degs, batch_ids, sel_ids, sel_dists, R=R, n_valid=n_valid,
    )
    nbrs, degs = prune_reverse_all(
        nbrs, degs, ctx, points_data, alpha,
        R=R, metric=metric, n_valid=n_valid, chunk=rev_chunk,
    )
    return nbrs, degs, rstats.n_overflow


# split steps (profiling path): same impl functions, one dispatch per phase
_beam_phase = partial(
    jax.jit,
    static_argnames=("R", "L", "vmax", "metric", "n_valid", "expand",
                     "expand_group"),
)(lambda *a, **k: _beam_phase_impl(*a, **k))
_fwd_phase = partial(
    jax.jit,
    static_argnames=("R", "metric", "n_valid", "chunk"),
    donate_argnums=(0, 1),
)(lambda *a, **k: _fwd_phase_impl(*a, **k))
_rev_append_phase = partial(
    jax.jit,
    static_argnames=("R", "n_valid"),
    donate_argnums=(0, 1),
)(lambda *a, **k: prepare_reverse_append(*a, **k))

_prune_chunk_step = partial(
    jax.jit,
    static_argnames=("R", "metric", "n_valid", "chunk"),
    donate_argnums=(0, 1),
)(lambda *a, **k: prune_reverse_chunk(*a, **k))
_prune_all_phase = partial(
    jax.jit,
    static_argnames=("R", "metric", "n_valid", "chunk"),
    donate_argnums=(0, 1),
)(lambda *a, **k: prune_reverse_all(*a, **k))


@partial(
    jax.jit,
    static_argnames=("R", "metric", "chunk"),
    donate_argnums=(0,),
)
def _sort_rows_by_distance(nbrs, degs, points_data, *, R, metric, chunk=8192):
    """Final per-row sort of neighbors by distance (index.h:180-185)."""
    n_pad = nbrs.shape[0]
    nch = n_pad // chunk if n_pad % chunk == 0 else (n_pad // chunk + 1)
    pad = nch * chunk - n_pad

    rows_all = jnp.arange(n_pad + pad, dtype=jnp.int32) % n_pad

    def one_chunk(carry, rows):
        nbrs = carry
        row = jnp.take(nbrs, rows, axis=0)
        deg = jnp.take(degs, rows, axis=0)
        ok = jnp.arange(R, dtype=jnp.int32)[None, :] < deg[:, None]
        pvec = jnp.take(points_data, rows, axis=0)
        nvec = jnp.take(points_data, jnp.clip(row, 0, points_data.shape[0] - 1), axis=0)
        d = jnp.where(ok, distance.gathered(pvec, nvec, metric), INF)
        sd, srow = jax.lax.sort((d, row), num_keys=1, is_stable=True)
        nbrs = nbrs.at[rows].set(srow)
        return nbrs, None

    nbrs, _ = jax.lax.scan(
        one_chunk, nbrs, rows_all.reshape(nch, chunk)
    )
    return nbrs


def batch_schedule(m: int, n: int, max_fraction: float = 0.02, base: float = 2.0):
    """Prefix-doubling batch boundaries (index.h:206-233): [2^i-1, 2^{i+1}-1)
    until the 0.02n / 1M cap, then fixed-size batches."""
    max_batch = min(int(max_fraction * n), 1_000_000)
    if max_batch == 0:
        max_batch = n
    out = []
    inc, count = 0, 0
    while count < m:
        if base**inc <= max_batch:
            floor = int(base**inc) - 1
            ceiling = min(int(base ** (inc + 1)) - 1, m)
            count = ceiling
        else:
            floor = count
            ceiling = min(count + max_batch, m)
            count = ceiling
        if ceiling > floor:
            out.append((floor, ceiling))
        inc += 1
    return out, max_batch


def _pad_pow2(ids: np.ndarray, cap: int, min_size: int = 256) -> np.ndarray:
    """Pad a batch to a power of two, at least ``min_size`` wide (pad slots
    are -1 = inactive). The floor collapses the prefix-doubling ramp from
    ~17 distinct compile shapes to ~4 — each shape costs a compile +
    program load through the TPU relay (~3s), which dominated the build at
    100K (54s of 70s measured)."""
    b = len(ids)
    size = 1
    while size < b:
        size *= 2
    size = max(size, min_size)
    size = min(size, cap) if cap >= b else size
    if size < b:
        size = b
    out = np.full(size, -1, dtype=np.int32)
    out[:b] = ids
    return out


def build_vamana_graph(
    points: PointSet,
    bp: BuildParams,
    verbose: bool = False,
    profile: bool = False,
    cand_mode: str = "beam",
) -> tuple[GraphIndexData, BuildStats]:
    """Build a Vamana graph over ``points``. Returns (graph, stats).

    ``profile=True`` runs the batch step as three separate dispatches with a
    device fence between them to fill the t_beam/t_bidirect/t_prune split
    (index.h:217-222) — slightly slower wall-clock, same result.

    ``cand_mode``: how the read phase collects robustPrune candidates.
    "beam" (default) = the reference's graph beam search (index.h:251-262).
    "exact" = MXU multi-scale flat top-k over the inserted prefix plus a
    waypoint sample ladder (see ``_exact_phase_impl``) — similar steady
    build time, but the measured A/B on clustered 100K (BENCHES.md round 3)
    gives a slightly worse graph: recall .9519 @ 175K QPS vs the walk's
    .9525 @ 203K at Q=8 with the sampled entry tier. The walk's visited
    set supplies intermediate-shell candidates at exactly the query
    trajectory's density, which the fixed sample ladder only approximates.
    single_batch mode always uses "beam" (its self-start search semantics
    have no prefix analogue).
    """
    n = points.n
    R, L = bp.R, bp.L
    # visit budget for the insertion search: the reference leaves it
    # unbounded (limit=n) but measured visited counts sit near L. The beam
    # phase is gather-bound (vmax*R point rows per insert), so the visit
    # budget is the build's main byte knob: vmax=L vs 1.5L measured
    # IDENTICAL search recall (.9523 @ Q=10, synth100k R=32 A/B,
    # diag_build_ab 2026-08-19) and 23% less build time (3.80 -> 2.93 s)
    vmax = max(L, R + 16)
    # PARLAYANN_BUILD_VMAX (trace-time, A/B only): the beam phase is
    # gather-bound (~vmax*R point rows per insert at XLA's ~35 GB/s
    # gather rate), so the visit budget is the build's main byte knob
    import os as _os

    if _os.environ.get("PARLAYANN_BUILD_VMAX"):
        vmax = max(int(_os.environ["PARLAYANN_BUILD_VMAX"]), R + 16)
    # graph padding aligned with the point padding
    nbrs = jnp.zeros((points.n_pad, R), jnp.int32)
    degs = jnp.zeros((points.n_pad,), jnp.int32)

    rng = np.random.default_rng(bp.seed)
    start = jnp.zeros((1,), dtype=jnp.int32)  # set_start (index.h:143)

    def fence(x):
        _ = np.asarray(x)[:1] if getattr(x, "ndim", 0) else np.asarray(x)

    t0 = time.perf_counter()
    tot_vis = tot_cmp = tot_fb = 0
    t_beam = t_bidirect = t_prune = 0.0
    prune_chunk = 4096
    stats_acc = []  # device scalars; read back once at the end
    if bp.single_batch:
        # random init edges + one batch per pass, each point searching from
        # itself (index.h:156-169, :239)
        deg0 = min(bp.single_batch, R)
        rnd = rng.integers(0, n, (points.n_pad, deg0)).astype(np.int32)
        nbrs = nbrs.at[:, :deg0].set(jnp.asarray(rnd))
        degs = jnp.full((points.n_pad,), deg0, jnp.int32)
        sched, max_batch = [(0, n)], n
        cand_mode = "beam"  # self-start search has no prefix analogue
    else:
        sched, max_batch = batch_schedule(n, n, bp.batch_cap_frac)
    inserted = None
    samples = []
    if cand_mode == "exact":
        inserted = jnp.zeros((points.n_pad,), bool).at[0].set(True)
        samples = _scale_samples(
            n, np.random.default_rng(bp.seed + 7919), points.data
        )
    # inline-expand read phase (see _beam_phase_impl): rebuilt once per
    # steady (max-width) batch — a ~20 ms full-graph gather that converts
    # the 32-step beam scan's candidate fetch from XLA row gathers
    # (~35 GB/s) into grouped Pallas DMA (~150 GB/s). Ramp batches keep the
    # XLA path (the rebuild would dominate their cost). "auto" enables it
    # on TPU when the inline array fits comfortably in HBM.
    inline_env = _os.environ.get("PARLAYANN_BUILD_INLINE", "auto")
    R8 = (R + 7) // 8 * 8
    inline_bytes = points.n_pad * R8 * points.d * points.data.dtype.itemsize
    if inline_env == "1":
        inline_ok, inline_min_w = True, 0
    elif inline_env == "auto":
        inline_ok = (jax.default_backend() == "tpu"
                     and inline_bytes <= (6 << 30))
        inline_min_w = 4096
    else:
        inline_ok, inline_min_w = False, 0
    egroup = int(_os.environ.get("PARLAYANN_BUILD_EGROUP", "4"))
    # fused read phase (PARLAYANN_BUILD_FUSED=1|auto|0): the packed-lane
    # Pallas kernel replaces the per-step XLA lane sorts for steady
    # batches. Needs an int8 tier (the ext rows carry id byte planes in
    # the d lanes, d >= R8). See _fused_read_phase.
    fused_env = _os.environ.get("PARLAYANN_BUILD_FUSED", "0")
    iext_bytes = points.n_pad * (R8 + 8) * points.d
    fused_ok = (
        fused_env == "1"
        or (fused_env == "auto" and jax.default_backend() == "tpu"
            and iext_bytes <= (6 << 30))
    ) and points.data.dtype == jnp.int8 and points.d >= R8
    _iext_jit = _build_inline_ext_lazy() if fused_ok else None
    for p in range(bp.num_passes):
        alpha = bp.alpha if p == bp.num_passes - 1 else 1.0
        order = rng.permutation(n).astype(np.int32)
        for bi, (lo, hi) in enumerate(sched):
            batch = _pad_pow2(order[lo:hi], max_batch)
            if bp.single_batch:
                start = jnp.asarray(np.maximum(batch, 0))[:, None]
            batch_j = jnp.asarray(batch)
            alpha_j = jnp.float32(alpha)
            use_inline_batch = (
                inline_ok and cand_mode != "exact"
                and (hi - lo) >= max(max_batch, inline_min_w)
            )
            use_fused_batch = (
                fused_ok and cand_mode != "exact" and not bp.single_batch
                and (hi - lo) >= max(max_batch, 4096)
            )
            def read_phase(nbrs, degs, batch_j):
                if cand_mode == "exact":
                    out = _exact_phase(
                        nbrs, degs, points.data, batch_j, inserted, start,
                        samples,
                        R=R, L=L, vmax=vmax, metric=points.metric, n_valid=n,
                    )
                elif use_fused_batch:
                    iext = _iext_jit(points.data, nbrs, degs)
                    out = _fused_read_phase(
                        nbrs, degs, points.data, batch_j, start, iext,
                        R=R, L=L, vmax=vmax, metric=points.metric, n_valid=n,
                    )
                else:
                    inline = (
                        _build_inline_jit(points.data, nbrs)
                        if use_inline_batch else None
                    )
                    # PARLAYANN_BUILD_EXPAND (trace-time, A/B only):
                    # vertices expanded per beam step. 2 is the shipped
                    # default (halves the step count vs the reference's 1
                    # at <0.3% recall cost, see vmax note above).
                    out = _beam_phase(
                        nbrs, degs, points.data, batch_j, start, inline,
                        R=R, L=L, vmax=vmax, metric=points.metric, n_valid=n,
                        expand=int(_os.environ.get(
                            "PARLAYANN_BUILD_EXPAND", "2")),
                        expand_group=egroup,
                    )
                return out

            if profile:
                # split dispatches with fences: fills the phase split at the
                # cost of per-phase relay syncs — numbers include latency
                tb = time.perf_counter()
                cand_ids, cand_d, v, c = read_phase(nbrs, degs, batch_j)
                fence(cand_d)
                t_beam += time.perf_counter() - tb
                tb = time.perf_counter()
                nbrs, degs, sel_ids, sel_dists = _fwd_phase(
                    nbrs, degs, points.data, batch_j, cand_ids, cand_d,
                    alpha_j, R=R, metric=points.metric, n_valid=n, chunk=2048,
                )
                fence(degs)
                t_prune += time.perf_counter() - tb
                tb = time.perf_counter()
                nbrs, degs, ctx, rstats = _rev_append_phase(
                    nbrs, degs, batch_j, sel_ids, sel_dists, R=R, n_valid=n,
                )
                n_over = int(rstats.n_overflow)
                t_bidirect += time.perf_counter() - tb
                tb = time.perf_counter()
                # α-prune EVERY overflow target (index.h:289-300)
                for off in range(0, n_over, prune_chunk):
                    nbrs, degs = _prune_chunk_step(
                        nbrs, degs, ctx, off, points.data, alpha_j,
                        R=R, metric=points.metric, n_valid=n, chunk=prune_chunk,
                    )
                fence(degs)
                t_prune += time.perf_counter() - tb
                stats_acc.append((v, c))
            else:
                # production path: TWO pipelined dispatches per batch (read
                # then write), nothing read back — see _write_batch note
                cand_ids, cand_d, v, c = read_phase(nbrs, degs, batch_j)
                nbrs, degs, _ = _write_batch(
                    nbrs, degs, points.data, batch_j, cand_ids, cand_d,
                    alpha_j, R=R, metric=points.metric, n_valid=n,
                    chunk=2048, rev_chunk=4096,
                )
                stats_acc.append((v, c))
            if inserted is not None and p == 0:
                inserted = _mark_inserted(inserted, batch_j)
            if verbose and bi % 8 == 0:
                print(f"pass {p}: batch {bi+1}/{len(sched)} ({hi}/{n})", flush=True)

    nbrs = _sort_rows_by_distance(
        nbrs, degs, points.data, R=R, metric=points.metric
    )
    _ = int(jnp.sum(degs))  # readback fence (relay block_until_ready is unreliable)
    dt = time.perf_counter() - t0
    # ONE stacked readback: per-scalar int() here cost ~26 ms of relay RTT
    # each (~3.7 s/build at 100K — measured as the 10.7s-wall vs 7.0s-inner gap)
    if stats_acc:
        flat = np.asarray(jnp.stack([jnp.stack(vc) for vc in stats_acc]))
        tot_vis = int(flat[:, 0].sum())
        tot_cmp = int(flat[:, 1].sum())
    graph = GraphIndexData(neighbors=nbrs, degrees=degs, n=n, max_degree=R)
    stats = BuildStats(dt, t_beam, t_bidirect, t_prune, tot_vis, tot_cmp, tot_fb)
    if verbose:
        avg, mx = graph.stats()
        print(f"Vamana build: {dt:.2f}s  avg/max degree {avg:.2f}/{mx}  "
              f"visited {tot_vis}  cmps {tot_cmp}  fallback {tot_fb}")
    return graph, stats


def profile_one_batch(
    points: PointSet,
    bp: BuildParams,
    graph: GraphIndexData,
    repeats: int = 2,
) -> tuple[float, float, float]:
    """Measure the t_beam/t_bidirect/t_prune split (index.h:217-222) of ONE
    max-width steady-state batch insert against ``graph``'s final state, as
    three fenced dispatches, best-of-``repeats``. Totals via fenced split
    dispatches cost ~0.5s/batch of relay latency; this is a 2*3-dispatch
    estimate of the per-batch steady-state split. Leaves ``graph``
    untouched (operates on copies)."""
    n, R, L = points.n, bp.R, bp.L
    vmax = max(L, R + 16)  # production default (see build_vamana_graph)
    _, max_batch = batch_schedule(n, n, bp.batch_cap_frac)
    size = 1
    while size < max_batch:
        size *= 2
    rng = np.random.default_rng(123)
    batch_j = jnp.asarray(
        _pad_pow2(rng.permutation(n)[:max_batch].astype(np.int32), size)
    )
    start = jnp.zeros((1,), dtype=jnp.int32)
    alpha_j = jnp.float32(bp.alpha)

    def fence(x):
        _ = np.asarray(x)[:1] if getattr(x, "ndim", 0) else np.asarray(x)

    import os as _os

    R8 = (R + 7) // 8 * 8
    inline_bytes = points.n_pad * R8 * points.d * points.data.dtype.itemsize
    use_inline = (
        _os.environ.get("PARLAYANN_BUILD_INLINE", "auto") != "0"
        and jax.default_backend() == "tpu" and inline_bytes <= (6 << 30)
        and max_batch >= 4096
    )
    best = [float("inf")] * 3
    for _ in range(repeats + 1):  # first rep warms the compile cache
        nbrs = jnp.array(graph.neighbors)  # fresh copies (donated args)
        degs = jnp.array(graph.degrees)
        fence(degs)
        t0 = time.perf_counter()
        inline = _build_inline_jit(points.data, nbrs) if use_inline else None
        cand_ids, cand_d, v, c = _beam_phase(
            nbrs, degs, points.data, batch_j, start, inline,
            R=R, L=L, vmax=vmax, metric=points.metric, n_valid=n, expand=2,
        )
        fence(cand_d)
        t1 = time.perf_counter()
        nbrs, degs, sel_ids, sel_dists = _fwd_phase(
            nbrs, degs, points.data, batch_j, cand_ids, cand_d,
            alpha_j, R=R, metric=points.metric, n_valid=n, chunk=2048,
        )
        fence(degs)
        t2 = time.perf_counter()
        nbrs, degs, ctx, rstats = _rev_append_phase(
            nbrs, degs, batch_j, sel_ids, sel_dists, R=R, n_valid=n,
        )
        fence(degs)
        t3 = time.perf_counter()
        nbrs, degs = _prune_all_phase(
            nbrs, degs, ctx, points.data, alpha_j,
            R=R, metric=points.metric, n_valid=n, chunk=4096,
        )
        fence(degs)
        t4 = time.perf_counter()
        best = [
            min(best[0], t1 - t0),
            min(best[1], t3 - t2),
            min(best[2], (t2 - t1) + (t4 - t3)),
        ]
    return tuple(best)


def build_vamana_index(
    data,
    metric: Metric = Metric.L2,
    R: int = 64,
    L: int = 128,
    alpha: float = 1.2,
    two_pass: bool = True,
    quantize_build: bool = True,
    verbose: bool = False,
    seed: int = 0,
):
    """diskannpy-style convenience wrapper (python/builder.cpp:40-90):
    MIPS data is normalized with a dimension-dependent alpha
    (builder.cpp:45-54), and float inputs build on the 1-byte quantized
    tier (builder.cpp:60-87) — 4x smaller gathers during construction;
    search reranks at full precision."""
    from parlayann_tpu.ops import quantize

    metric = Metric.coerce(metric)
    ps = data if isinstance(data, PointSet) else PointSet.from_numpy(
        np.asarray(data), metric=metric, normalize=(metric is Metric.MIPS)
    )
    if metric is Metric.MIPS and ps.d <= 200:
        alpha = 1.0 if ps.d < 100 else 0.98
    build_ps = ps
    # uint8 inputs must build on the int8 tier too: Mosaic kernels
    # cannot cast uint8 rows (the q8 remap of uint8 is exact-affine)
    if quantize_build and ps.data.dtype in (jnp.float32, jnp.uint8):
        build_ps = quantize.quantize_pointset(ps, bits=8)
    bp = BuildParams(R=R, L=L, alpha=alpha, num_passes=2 if two_pass else 1, seed=seed)
    graph, stats = build_vamana_graph(build_ps, bp, verbose=verbose)
    return graph, ps, stats
