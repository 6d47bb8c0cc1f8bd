"""Fused cluster-beam search kernel (the ClusterIndex query side).

The structural answer to the vertex-beam step floor (see
build/clusterindex.py for the physics): beam over CLUSTERS, not points.
One expansion DMAs one packed cluster row — ALL m member vectors + ids
plus the Rc adjacent-cluster centroid vectors + ids — so one descriptor
feeds m result candidates and Rc navigation candidates at once.

Two state machines per query, updated in one kernel step:

  * the CLUSTER beam (Wc = pow2(Lc) lanes, dist + packed id*2+unexpanded
    bit, the fusedbeam packing): navigation. Candidates are the expanded
    cluster's Rc adjacent centroids; dedup is the same hashless
    compare-against-beam (exact: beam eviction is permanent — the worst
    kept entry only improves — so an expanded cluster can never re-enter
    and is expanded at most once).
  * the POINT pool ((m, M)-lane accumulator): results. The expanded
    cluster's m member distances bubble-insert into an M-deep per-lane
    accumulator (the flatscan trick) — M compare-swaps per step instead
    of a sort+merge, and NO point dedup is needed at all because clusters
    partition the points and each cluster is expanded at most once.

Per-step algebra is tiny (Rcp-lane sort + 2*Wc-lane merge + M bubble
rounds, all on <=32-lane vregs) vs the vertex kernel's Rp=64-lane sort +
2*Wb merge, and convergence takes ~n_probe in (4..16) steps vs ~L+2.

Reference counterparts: the two-level QQ filter (beamSearch.h:119-146)
and beam_search_rerank (beamSearch.h:394-454), recast as one structure.
The DMA ring (streaming lookahead across grid blocks, frozen-block
passthrough) is the same design as ops/pallas/fusedbeam.py — see the
measured rationale there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parlayann_tpu.types import Metric
from parlayann_tpu.ops import quantize
from parlayann_tpu.ops.distance import INF
from parlayann_tpu.ops.pallas.bitonic import bitonic_merge, bitonic_sort
from parlayann_tpu.ops.pallas.fusedbeam import (
    _kroll, _pack_factor, _pack_lanes, _unpack_lanes,
)
from parlayann_tpu.search.rerank import rerank_topk

_INF = float(INF)

from parlayann_tpu.utils.arrays import pow2 as _pow2

# past this many centroid rows the one-tile (B, C) argmin seed stops
# paying (the tile is GBs at C ~ 200K); large-C indexes carry a
# meta-routed seed instead (ClusterIndex.seed_meta)
ARGMIN_SEED_CUTOFF = 32768


def _auto_block_cluster(block_b, G, m, M, Wc):
    """Shrink block_b until phase B's intermediates fit the 16 MiB
    scoped-VMEM stack. Usage scales with block_b x (pool width m*M +
    merge width ~8*Wc); the budget is calibrated to the proven config
    (block_b=512, m*M=256, Wc=16 compiles; Wc=64 at 512 measured 18.9M
    > 16M on v5e). Stays a multiple of G."""
    units = m * M + 8 * Wc
    while block_b > G and block_b * units > 512 * (256 + 8 * 16):
        block_b = max(G, (block_b // 2 // G) * G)
    return block_b


def _step_kernel(
    exp_ref,  # scalar prefetch: (B,) int32 cluster to expand (-1 = frozen)
    q_ref,  # (block_b, d) f32 (tier domain)
    cbd_ref,  # (block_b, Wc) f32 cluster-beam dists
    cbp_ref,  # (block_b, Wc) int32 cluster-beam packed ids
    pd_ref,  # (block_b, m*M) f32 point-pool dists
    pi_ref,  # (block_b, m*M) int32 point-pool ids
    nv_ref,  # (block_b, 1) int32 probes done
    expv_ref,  # (block_b, 1) int32 exp ids as a vector block
    ext_hbm,  # (C_pad, m + Rc + 8, d) int8, ANY
    ocbd, ocbp, opd, opi, onv, onext,  # outputs
    vmem, sems, mdbuf, mibuf, adbuf, aibuf,  # scratch
    *, m, Rc, Rcp, d, Wc, Lc, M, C, n_points, metric, cut, n_probe,
    min_probe, block_b, G, n_buf, ext_f32=False,
):
    bi = pl.program_id(0)
    n_grp = block_b // G
    assert n_grp >= n_buf, "block_b // G must cover the DMA ring"
    g0 = bi * n_grp
    n_grp_total = pl.num_programs(0) * n_grp

    n_active = jnp.sum((expv_ref[:] >= 0).astype(jnp.int32))

    def dma(slot, gg, j):
        v = exp_ref[gg * G + j]
        vc = jnp.clip(v, 0, ext_hbm.shape[0] - 1)
        return v, pltpu.make_async_copy(
            ext_hbm.at[vc], vmem.at[slot, j], sems.at[slot, j],
        )

    # frozen rows (exp id -1) issue NO DMA: with adaptive early stop (cut)
    # most rows freeze after ~min_probe expansions, and the tail steps
    # would otherwise re-stream row 0 for every frozen query. The start
    # and wait predicates are the same function of exp_ref, so the ring
    # stays consistent; stale VMEM for skipped rows is masked by exp_ok
    # in phase B.
    def dma_start(slot, gg, j):
        v, cp = dma(slot, gg, j)

        @pl.when(v >= 0)
        def _():
            cp.start()

    def dma_wait(slot, gg, j):
        v, cp = dma(slot, gg, j)

        @pl.when(v >= 0)
        def _():
            cp.wait()

    def lookahead(gg):
        @pl.when(gg < n_grp_total)
        def _():
            slot = jax.lax.rem(gg, n_buf)
            for j in range(G):
                dma_start(slot, gg, j)

    @pl.when(bi == 0)
    def _():
        for s in range(n_buf):
            lookahead(s)

    @pl.when(n_active == 0)
    def _():
        ocbd[:] = cbd_ref[:]
        ocbp[:] = cbp_ref[:]
        opd[:] = pd_ref[:]
        opi[:] = pi_ref[:]
        onv[:] = nv_ref[:]
        onext[:] = expv_ref[:]
        for s in range(n_buf):
            gg = g0 + s
            slot = jax.lax.rem(gg, n_buf)
            for j in range(G):
                dma_wait(slot, gg, j)
            lookahead(gg + n_grp)

    @pl.when(n_active > 0)
    def _active():
        # ---- phase A: per-group DMA + row-local compute -> scratch ----
        def loop(g, _):
            gg = g0 + g
            slot = jax.lax.rem(gg, n_buf)
            for j in range(G):
                dma_wait(slot, gg, j)
            rows = vmem[slot]  # (G, m + Rc + 8, d) int8
            sl = pl.ds(g * G, G)
            q = q_ref[sl, :]  # (G, d) f32

            if ext_f32:
                # f32 layout: one id plane per section, ids stored as
                # exact float values (build_cluster_ext_f32)
                def planes(base, width):
                    ids = rows[:, base, :].astype(jnp.int32)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (G, d), 1)
                    return jnp.where(lane < width, ids, -1)[:, :width]

                mid = planes(m, m)
                aid = planes(m + 1 + Rc, Rc)
                mvecs = rows[:, :m, :]
                avecs = rows[:, m + 1:m + 1 + Rc, :]
            else:
                def planes(base, width):
                    b0 = rows[:, base + 0, :].astype(jnp.int32) & 0xFF
                    b1 = rows[:, base + 1, :].astype(jnp.int32) & 0xFF
                    b2 = rows[:, base + 2, :].astype(jnp.int32) & 0xFF
                    b3 = rows[:, base + 3, :].astype(jnp.int32) & 0xFF
                    ids = b0 + (b1 << 8) + (b2 << 16) + (b3 << 24)  # (G, d)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (G, d), 1)
                    # lanes >= width hold zero pad (id 0, NOT -1): mask
                    return jnp.where(lane < width, ids, -1)[:, :width]

                mid = planes(m, m)  # (G, m) member ids
                aid = planes(m + 4 + Rc, Rc)  # (G, Rc) adjacent ids
                mvecs = rows[:, :m, :].astype(jnp.float32)
                avecs = rows[:, m + 4:m + 4 + Rc, :].astype(jnp.float32)

            # one MXU contraction scores members AND adjacent centroids
            vecs = jnp.concatenate([mvecs, avecs], axis=1)  # (G, m+Rc, d)
            if metric is Metric.MIPS:
                prod = vecs * q[:, None, :]
            else:
                diff = vecs - q[:, None, :]
                prod = diff * diff
            dall = jax.lax.dot_general(
                prod.reshape(G * (m + Rc), d), jnp.ones((d, 1), jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(G, m + Rc)
            if metric is Metric.MIPS:
                dall = -dall
            md = dall[:, :m]
            ad = dall[:, m:]
            if Rcp != Rc:
                ad = jnp.concatenate(
                    [ad, jnp.full((G, Rcp - Rc), _INF)], axis=1
                )
                aid = jnp.concatenate(
                    [aid, jnp.full((G, Rcp - Rc), -1, jnp.int32)], axis=1
                )
            mdbuf[sl, :] = md
            mibuf[sl, :] = mid
            adbuf[sl, :] = ad
            aibuf[sl, :] = aid
            lookahead(gg + n_buf)
            return 0

        jax.lax.fori_loop(0, n_grp, loop, 0)

        # ---- phase B: block-wide state update ----
        cbd = cbd_ref[:]  # (block_b, Wc)
        cbp = cbp_ref[:]
        nv = nv_ref[:]  # (block_b, 1)
        exp_ok = expv_ref[:] >= 0  # (block_b, 1)
        md = mdbuf[:]  # (block_b, m)
        mid = mibuf[:]
        ad = adbuf[:]  # (block_b, Rcp)
        aid = aibuf[:]

        # members -> point pool (bubble insert, M rounds; no dedup: each
        # cluster is expanded at most once and clusters partition points)
        mvalid = (mid >= 0) & (mid < n_points) & exp_ok
        md = jnp.where(mvalid, md, _INF)
        cv, ci = md, mid
        for mm in range(M):
            sl = slice(mm * m, (mm + 1) * m)
            adc = pd_ref[:, sl]
            aic = pi_ref[:, sl]
            w = cv < adc
            opd[:, sl] = jnp.where(w, cv, adc)
            opi[:, sl] = jnp.where(w, ci, aic)
            cv = jnp.where(w, adc, cv)
            ci = jnp.where(w, aic, ci)

        # adjacent clusters -> cluster beam (sort desc + bitonic merge)
        lane_wc = jax.lax.broadcasted_iota(jnp.int32, (block_b, Wc), 1)
        lane_wc_f = lane_wc.astype(jnp.float32)
        lane_rcp = jax.lax.broadcasted_iota(jnp.int32, (block_b, Rcp), 1)
        avalid = (aid >= 0) & (aid < C) & exp_ok
        ad = jnp.where(avalid, ad, _INF)
        bid = jax.lax.shift_right_logical(cbp, 1)
        dup = jnp.zeros(ad.shape, bool)
        for l in range(Wc):
            dup = dup | (aid == bid[:, l:l + 1])
        ad = jnp.where(dup, _INF, ad)
        apack = jnp.where(ad < _INF, aid * 2 + 1, (C + lane_rcp) * 2 + 1)
        # packed sort/merge: see fusedbeam phase B — narrow lane counts
        # (Rcp=16, 2*Wc=32 at defaults) waste most of each 128-lane vreg
        import os
        _packb = os.environ.get("PARLAYANN_PACKB", "1") == "1"
        Pc = _pack_factor(Rcp, block_b) if _packb else 1
        if Pc > 1:
            negd_p, apack_p = bitonic_sort(
                _pack_lanes(-ad, Pc), _pack_lanes(apack, Pc),
                seg=Rcp, roll=_kroll,
            )
            negd = _unpack_lanes(negd_p, Pc)
            apack_s = _unpack_lanes(apack_p, Pc)
        else:
            negd, apack_s = bitonic_sort(-ad, apack, roll=_kroll)
        c_take = min(Wc, Rcp)
        adp = -negd[:, Rcp - c_take:]  # smallest c_take, descending
        app = apack_s[:, Rcp - c_take:]
        pad = Wc - c_take
        parts_d = [cbd]
        parts_p = [cbp]
        if pad:
            lane_pad = jax.lax.broadcasted_iota(jnp.int32, (block_b, pad), 1)
            parts_d.append(jnp.full((block_b, pad), _INF))
            parts_p.append((C + Rcp + lane_pad) * 2 + 1)
        parts_d.append(adp)
        parts_p.append(app)
        mgd = jnp.concatenate(parts_d, axis=1)
        mgp = jnp.concatenate(parts_p, axis=1)
        Pm = _pack_factor(2 * Wc, block_b) if _packb else 1
        if Pm > 1:
            ncbd_p, ncbp_p = bitonic_merge(
                _pack_lanes(mgd, Pm), _pack_lanes(mgp, Pm),
                seg=2 * Wc, roll=_kroll,
            )
            ncbd = _unpack_lanes(ncbd_p, Pm)
            ncbp = _unpack_lanes(ncbp_p, Pm)
        else:
            ncbd, ncbp = bitonic_merge(mgd, mgp, roll=_kroll)
        ncbd = ncbd[:, :Wc]
        ncbp = ncbp[:, :Wc]
        ncbd = jnp.where(lane_wc < Lc, ncbd, _INF)
        ncbp = jnp.where(lane_wc < Lc, ncbp,
                         (C + 2 * Rcp + lane_wc) * 2 + 1)

        # ---- next expansion ----
        unexp = ((ncbp & 1) == 1) & (ncbd < _INF)
        nv_new = nv + exp_ok.astype(jnp.int32)
        if cut > 0.0 and metric.is_metric:
            # adaptive stop: a cluster whose centroid is > cut x the best
            # seen centroid distance is unlikely to hold top-k points;
            # min_probe floors the rule (the 2nd/3rd-best clusters carry
            # most of the residual recall even when the cut would stop)
            best = ncbd[:, :1]
            workable = unexp & (
                (ncbd < cut * best) | (nv_new < min_probe)
            )
        else:
            workable = unexp
        has_work = jnp.max(
            workable.astype(jnp.int32), axis=1, keepdims=True
        ) > 0
        done_new = ~exp_ok | ~has_work | (nv_new >= n_probe)
        first = jnp.min(
            jnp.where(workable, lane_wc_f, float(2 * Wc)),
            axis=1, keepdims=True,
        )
        nid = jax.lax.shift_right_logical(ncbp, 1)
        nxt = jnp.sum(
            jnp.where(lane_wc_f == first, nid, 0), axis=1, keepdims=True
        ).astype(jnp.int32)
        nxt = jnp.where(done_new, -1, nxt)
        flip = (lane_wc_f == first) & ~done_new
        ncbp = ncbp - flip.astype(jnp.int32)

        ocbd[:] = jnp.where(exp_ok, ncbd, cbd)
        ocbp[:] = jnp.where(exp_ok, ncbp, cbp)
        onv[:] = jnp.where(exp_ok, nv_new, nv)
        onext[:] = jnp.where(exp_ok, nxt, -1)
        # pool outputs for frozen rows: copy state through
        for mm in range(M):
            sl = slice(mm * m, (mm + 1) * m)
            opd[:, sl] = jnp.where(exp_ok, opd[:, sl], pd_ref[:, sl])
            opi[:, sl] = jnp.where(exp_ok, opi[:, sl], pi_ref[:, sl])


@functools.partial(
    jax.jit,
    static_argnames=("m", "Rc", "Rcp", "d", "Wc", "Lc", "M", "C",
                     "n_points", "metric", "cut", "n_probe", "min_probe",
                     "block_b", "G", "n_buf", "interpret"),
)
def cluster_step(
    exp_ids,  # (B,) int32 (-1 = frozen)
    queries,  # (B, d) f32
    cbd, cbp,  # (B, Wc)
    pd, pi,  # (B, m*M)
    nv,  # (B, 1)
    ext,  # (C_pad, m + Rc + 8, d) int8
    *, m, Rc, Rcp, d, Wc, Lc, M, C, n_points, metric, cut, n_probe,
    min_probe=0, block_b=512, G=16, n_buf=8, interpret=False,
):
    B = queries.shape[0]
    if jax.default_backend() != "tpu":
        interpret = True
    block_b = max(G, (min(block_b, B) // G) * G)
    block_b = _auto_block_cluster(block_b, G, m, M, Wc)
    n_buf = min(n_buf, block_b // G)
    kernel = functools.partial(
        _step_kernel, m=m, Rc=Rc, Rcp=Rcp, d=d, Wc=Wc, Lc=Lc, M=M, C=C,
        n_points=n_points, metric=metric, cut=cut, n_probe=n_probe,
        min_probe=min_probe, block_b=block_b, G=G, n_buf=n_buf,
        ext_f32=(ext.dtype == jnp.float32),
    )
    grid = (B // block_b,)

    def bspec(w):
        return pl.BlockSpec((block_b, w), lambda i, ids: (i, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                bspec(d), bspec(Wc), bspec(Wc), bspec(m * M), bspec(m * M),
                bspec(1), bspec(1),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[bspec(Wc), bspec(Wc), bspec(m * M), bspec(m * M),
                       bspec(1), bspec(1)],
            scratch_shapes=[
                pltpu.VMEM((n_buf, G, ext.shape[1], d), ext.dtype),
                pltpu.SemaphoreType.DMA((n_buf, G)),
                pltpu.VMEM((block_b, m), jnp.float32),
                pltpu.VMEM((block_b, m), jnp.int32),
                pltpu.VMEM((block_b, Rcp), jnp.float32),
                pltpu.VMEM((block_b, Rcp), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Wc), jnp.float32),
            jax.ShapeDtypeStruct((B, Wc), jnp.int32),
            jax.ShapeDtypeStruct((B, m * M), jnp.float32),
            jax.ShapeDtypeStruct((B, m * M), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(exp_ids, queries, cbd, cbp, pd, pi, nv, exp_ids.reshape(B, 1), ext)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "C", "m", "Rc", "n_points", "k", "n_probe",
                     "cut", "S", "pool", "tier_bits", "Lc", "M", "block_b",
                     "G", "n_buf", "rerank", "min_probe", "seed_mode",
                     "select_mode", "seed_probes"),
)
def cluster_search_fused(
    q_full,  # (B, d) raw f32 queries
    centroids_q,  # (C_pad, d) int8, q8 domain
    ext,  # (C_pad, m + Rc + 8, d) int8
    points_full,  # (n_pad, d) full precision (rerank)
    slope, offset,  # q8 domain params
    meta_cents=None,  # (Cm, d) f32 — meta-seed coarse centroids
    meta_blocks=None,  # (Cm, cap, d) f32 — per-cell centroid blocks
    meta_idtab=None,  # (Cm, cap) int32 — per-cell centroid ids
    *,
    metric: Metric,
    C: int,
    m: int,
    Rc: int,
    n_points: int,
    k: int = 10,
    n_probe: int = 8,
    min_probe: int = 0,
    cut: float = 0.0,
    S: int = 2,
    pool: int = 20,
    tier_bits: int = 8,
    Lc: int = 0,
    M: int = 4,
    block_b: int = 512,
    G: int = 16,
    n_buf: int = 8,
    rerank: str = "full",
    seed_mode: str = "argmin",
    select_mode: str = "sort",
    seed_probes: int = 8,
):
    """Single-dispatch cluster search -> (ids (B,k), dists (B,k),
    (n_probes (B,), dist_cmps (B,))). Distances are full-precision with
    ``rerank="full"``; ``rerank="tier"`` skips the full-precision gather
    (the XLA row gather is the slow path on TPU: ~30-40 GB/s vs the
    kernel's 150) and returns the pool's exact int8-domain scores —
    candidates are already deduplicated (clusters partition the points),
    so the top-k is direct.

    ``S`` exact nearest centroids seed the beam (one tiny MXU scan over
    all C centroids); ``n_probe`` bounds expansions; ``cut`` (L2 only,
    0 = off) stops early when the best remaining cluster is > cut x the
    best centroid distance seen.

    ``Lc`` (0 = auto): the cluster beam must hold MORE than n_probe live
    lanes — an expanded entry occupies its lane permanently (that
    permanence is exactly what makes the hashless dedup exact), so a
    beam of Lc supports at most Lc expansions before exhausting.
    """
    B0, d = q_full.shape
    Rcp = _pow2(Rc)
    Lc = Lc or (n_probe + 4)
    Wc = _pow2(max(Lc, S, 8))

    # translate into the q8 domain (graph_index.cpp:144-177)
    if tier_bits < 32 and slope is not None:
        if metric is Metric.L2:
            q = quantize.euclidean_translate(q_full, slope, offset,
                                             tier_bits)
        else:
            q = quantize.mips_translate(q_full, slope, offset, tier_bits)
        q = q.astype(jnp.float32)
    else:
        q = q_full.astype(jnp.float32)

    block_b = max(G, min(block_b, ((B0 + G - 1) // G) * G))
    block_b = _auto_block_cluster(block_b, G, m, M, Wc)
    B = ((B0 + block_b - 1) // block_b) * block_b
    if B != B0:
        q = jnp.pad(q, ((0, B - B0), (0, 0)))

    # ---- seed: exact top-S centroids, in the same distance domain the
    # kernel's phase A computes (true squared distances / neg-dots) ----
    Cp_rows = centroids_q.shape[0]
    if seed_mode == "argmin" and S <= 4 and Cp_rows <= ARGMIN_SEED_CUTOFF:
        # small C: one (B, C) MXU tile + S exact argmin passes. Pure
        # reductions — the streamed top-k path's per-group lane SORTS were
        # most of the search's fixed (probe-independent) cost at B=10K
        # (A/B: argmin 1.60M vs stream 1.00M QPS, m=64 probes=4, 100K).
        cf = centroids_q.astype(jnp.float32)
        dot = jax.lax.dot_general(
            q, cf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if metric is Metric.MIPS:
            dall = -dot
        else:
            cn = jnp.sum(cf * cf, axis=1)
            dall = cn[None, :] - 2.0 * dot
        cid_lane = jnp.arange(Cp_rows, dtype=jnp.int32)[None, :]
        dall = jnp.where(cid_lane < C, dall, _INF)
        sd_l, sid_l = [], []
        for _ in range(S):
            am = jnp.argmin(dall, axis=1).astype(jnp.int32)[:, None]
            sd_l.append(jnp.min(dall, axis=1, keepdims=True))
            sid_l.append(am)
            dall = jnp.where(cid_lane == am, _INF, dall)
        sd = jnp.concatenate(sd_l, axis=1)  # (B, S) ascending
        sids = jnp.concatenate(sid_l, axis=1)
        if metric is not Metric.MIPS:
            qn = jnp.sum(q * q, axis=1, keepdims=True)
            sd = jnp.where(sd < _INF, jnp.maximum(sd + qn, 0.0), _INF)
    elif meta_cents is not None and seed_mode in ("argmin", "meta"):
        # big C, meta-routed: scan the ~C/96 meta-centroids (one small
        # MXU tile), DMA only the top-P cells' packed centroid blocks
        # (ops/pallas/expand.py — one descriptor per cell), take the
        # exact top-S within them. The streamed exact scan at C=234K was
        # the 10M QPS ceiling (~21K QPS probe-independent: its per-group
        # lane sorts dominate); this is ~C/(P*cap) times less select
        # work at a small top-P coverage risk the beam's Rc-adjacency
        # navigation absorbs. Same approximation family as the build's
        # approx_assign (clusterindex.py).
        from parlayann_tpu.ops.pallas.expand import expand_distances
        from parlayann_tpu.search.flat import _select_sort, \
            flat_search_batch

        Cm, cap, _ = meta_blocks.shape
        P = max(1, min(seed_probes, Cm))
        mt_i, _ = flat_search_batch(
            q, meta_cents, k=P, metric=metric, n_valid=Cm,
            chunk=min(meta_cents.shape[0], 32768), select="sort",
        )
        ds_l, id_l = [], []
        for p in range(P):
            mi = jnp.clip(mt_i[:, p], 0, Cm - 1)
            dp = expand_distances(meta_blocks, mi, q, metric=metric,
                                  block_b=256, group=4)
            ip = jnp.take(meta_idtab, mi, axis=0)
            dp = jnp.where((ip >= 0) & (mt_i[:, p:p + 1] >= 0), dp, _INF)
            ds_l.append(dp)
            id_l.append(jnp.where(ip >= 0, ip, -1))
        sd, sids = _select_sort(
            jnp.concatenate(ds_l, axis=1), jnp.concatenate(id_l, axis=1), S
        )  # (B, S) ascending, true-metric domain (expand == phase A)
    else:
        # big C (10M-scale: C ~ 200K): streamed top-k, the (B, C_pad)
        # tile never materializes (would be ~8 GB)
        from parlayann_tpu.search.flat import flat_search_batch

        sids, sd = flat_search_batch(
            q, centroids_q, k=S, metric=metric, n_valid=C,
            chunk=min(centroids_q.shape[0], 8192), select="sort",
        )  # (B, S) ascending

    lane = jnp.arange(Wc, dtype=jnp.int32)[None, :]
    cbd = jnp.concatenate([sd, jnp.full((B, Wc - S), _INF)], axis=1)
    sent = jnp.broadcast_to((C + lane[:, :Wc - S]) * 2 + 1, (B, Wc - S))
    cbp = jnp.concatenate([sids.astype(jnp.int32) * 2 + 1, sent], axis=1)
    lmask = lane < Lc
    cbd = jnp.where(lmask, cbd, _INF)
    cbp = jnp.where(lmask, cbp, (C + Wc + lane) * 2 + 1)

    pd = jnp.full((B, m * M), _INF, jnp.float32)
    pi = jnp.full((B, m * M), -1, jnp.int32)
    nv = jnp.zeros((B, 1), jnp.int32)

    # expand the nearest centroid first (lane 0; sorted seed)
    exp_ids = jnp.where(cbd[:, 0] < _INF, cbp[:, 0] >> 1, -1).astype(
        jnp.int32
    )
    cbp = cbp - jnp.where(
        (lane == 0) & (exp_ids[:, None] >= 0), 1, 0
    ).astype(jnp.int32)

    step = functools.partial(
        cluster_step, m=m, Rc=Rc, Rcp=Rcp, d=d, Wc=Wc, Lc=Lc, M=M, C=C,
        n_points=n_points, metric=metric, cut=cut, n_probe=n_probe,
        min_probe=min_probe, block_b=block_b, G=G, n_buf=n_buf,
    )

    def cond(state):
        e, *_ = state
        return jnp.any(e >= 0)

    def body(state):
        e, cbd, cbp, pd, pi, nv = state
        cbd, cbp, pd, pi, nv, nxt = step(e, q, cbd, cbp, pd, pi, nv, ext)
        return (nxt[:, 0], cbd, cbp, pd, pi, nv)

    _, cbd, cbp, pd, pi, nv = jax.lax.while_loop(
        cond, body, (exp_ids, cbd, cbp, pd, pi, nv)
    )

    # ---- pool -> rerank candidates -> full precision. Default is the
    # full (B, m*M)-lane sort: A/B (scripts/diag_cluster_ab.py, m=64
    # probes=4 at 100K) measured the grouped two-level select 3x SLOWER
    # end-to-end (322K vs 1.60M QPS) despite touching fewer lanes — the
    # per-group bitonic stages don't pay at m*M = 256 width. Kept as a
    # knob for wide-pool configs. ----
    if select_mode == "group":
        from parlayann_tpu.search.flat import _select_sort

        want = k if rerank == "tier" else pool
        pd_s, pi_s = _select_sort(pd, pi, want)
    else:
        pd_s, pi_s = jax.lax.sort((pd, pi), num_keys=1)
    if rerank == "tier":
        ids = jnp.where(pd_s[:B0, :k] < _INF, pi_s[:B0, :k], -1)
        dists = pd_s[:B0, :k]
    else:
        cand = jnp.where(pd_s[:, :pool] < _INF, pi_s[:, :pool], -1)
        ids, dists = rerank_topk(
            q_full.astype(jnp.float32), points_full, cand[:B0],
            k=k, pool=pool, metric=metric,
        )
    nvo = nv[:B0, 0]
    cmps = C + nvo * (m + Rc)
    return ids, dists, (nvo, cmps)
