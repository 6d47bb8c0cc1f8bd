"""Fully-fused beam-search step kernel.

One Pallas dispatch per beam iteration does, for every query: DMA the
expanded vertex's extended inline row (neighbor vectors AND neighbor ids
in one copy), compute candidate distances, bitonic-merge candidates into
the beam with exact hashless dedup, apply the frontier-full cutoff and
the cut rule, and emit the next vertex to expand. The XLA loop between
steps is reduced to feeding each step's output ids into the next step's
scalar prefetch — no per-step XLA sorts, gathers, or fusion boundaries.

Semantics match ``search.beam.beam_search_batch`` with E=1 (the search
configuration) up to sentinel bookkeeping and distance-tie order; valid
(dist < INF) beam entries are verified equal in tests/test_fusedbeam.py.

Extended inline layout (``build_inline_ext``): row v is ``(R8 + 8, d)``
int8 — R8 sublanes of neighbor vectors (R rounded to 8), then 4 sublanes
of neighbor-id byte planes (byte b of id j at sublane R8+b, lane j; ids
reassemble in-kernel with four shifts — works identically under
interpret), then pad to a sublane multiple of 8. One DMA per expansion
moves vectors + ids together, keeping the kernel at the DMA-issue-rate
floor (~8.8M rows/s measured) instead of doubling the copy count.

Beam state is carried as ``W`` lanes (W = pow2 ≥ L + R8): lanes < L hold
the beam (dist f32 ascending + packed id*2+unexpanded-bit int32, the
same packing as search.beam._merge); lanes ≥ L are INF/sentinel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parlayann_tpu.types import Metric
from parlayann_tpu.ops.distance import INF
from parlayann_tpu.ops.pallas.bitonic import bitonic_merge, bitonic_sort

_INF = float(INF)


def build_inline_ext(points_data: jax.Array, nbrs: jax.Array,
                     degs: jax.Array) -> jax.Array:
    """(n_pad, d) int8, (n_pad, R), (n_pad,) -> (n_pad, R8 + 8, d) int8
    extended inline rows (neighbor vectors + neighbor-id byte planes).

    Invalid slots (>= degree) carry id -1 (byte planes 0xff) and vector 0.
    Requires d >= R8 (id j lives at lane j of each plane) and an int8
    tier; both hold for every shipped config (d = 128 >= R8 = 64).
    """
    n_pad, R = nbrs.shape
    d = points_data.shape[1]
    R8 = (R + 7) // 8 * 8
    assert d >= R8, f"id planes need d >= R8 ({d} < {R8})"
    slot = jnp.arange(R, dtype=jnp.int32)[None, :]
    ids_all = jnp.where(slot < degs[:, None], nbrs, -1)
    if R8 != R:
        ids_all = jnp.pad(ids_all, ((0, 0), (0, R8 - R)), constant_values=-1)

    def chunk_fn(idr):
        v = jnp.take(
            points_data, jnp.clip(idr, 0, n_pad - 1), axis=0
        ).astype(jnp.int8)
        v = jnp.where((idr >= 0)[:, :, None], v, 0)
        planes = []
        for b in range(4):
            byte = jnp.right_shift(idr, 8 * b) & 0xFF  # (chunk, R8)
            plane = jnp.pad(byte, ((0, 0), (0, d - R8)))
            planes.append(plane.astype(jnp.int8)[:, None, :])
        ext = jnp.concatenate(
            [v] + planes + [jnp.zeros((v.shape[0], 4, d), jnp.int8)], axis=1
        )
        return ext

    chunk = max(1, 1_000_000 // max(R8, 1))
    chunk = min(chunk, n_pad)
    while n_pad % chunk:
        chunk -= 1
    return jax.lax.map(
        chunk_fn, ids_all.reshape(n_pad // chunk, chunk, R8)
    ).reshape(n_pad, R8 + 8, d)


def _at_lane(x, lane_f, pos):
    """(G, W) value at static lane ``pos`` -> (G, 1) (keepdims: Mosaic
    prefers 2-D vectors throughout)."""
    return jnp.sum(
        jnp.where(lane_f == float(pos), x, 0.0), axis=1, keepdims=True
    )


def _step_kernel(
    exp_ref,  # scalar prefetch: (B,) int32 vertex to expand (-1 = none)
    q_ref,  # (block_b, d) f32
    bdist_ref,  # (block_b, W) f32
    bpack_ref,  # (block_b, W) int32
    nv_ref,  # (block_b, 1) int32
    cmps_ref,  # (block_b, 1) int32
    expv_ref,  # (block_b, 1) int32 — exp_ids again, as a vector block
    inline_hbm,  # (n_pad, R8 + 8, d) int8, ANY
    obdist, obpack, onv, ocmps, onext,  # outputs
    vmem, sems,  # scratch
    *, R8, d, W, L, k, n_valid, metric, cut, limit, block_b, G, n_buf,
    ablate="full",
):
    bi = pl.program_id(0)
    n_grp = block_b // G

    def dma(slot, g, j):
        v = exp_ref[bi * block_b + g * G + j]
        # clamp hard: an out-of-range address faults the TPU worker
        v = jnp.clip(v, 0, inline_hbm.shape[0] - 1)
        return pltpu.make_async_copy(
            inline_hbm.at[v], vmem.at[slot, j], sems.at[slot, j],
        )

    for s in range(n_buf):
        for j in range(G):
            dma(s, s, j).start()

    lane_f = jax.lax.broadcasted_iota(jnp.int32, (G, W), 1).astype(jnp.float32)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (G, W), 1)

    def _roll(v, s):
        # measured: jnp.roll (slice+concat lowering) beats pltpu.roll's
        # native rotate here — 69K vs 40K QPS end-to-end on the r64 bench
        return jnp.roll(v, s, axis=-1)

    def loop(g, _):
        slot = jax.lax.rem(g, n_buf)
        for j in range(G):
            dma(slot, g, j).wait()
        rows = vmem[slot]  # (G, R8 + 8, d) int8
        sl = pl.ds(g * G, G)
        q = q_ref[sl, :]  # (G, d) f32
        bdist = bdist_ref[sl, :]  # (G, W)
        bpack = bpack_ref[sl, :]  # (G, W)
        nv = nv_ref[sl, :]  # (G, 1)
        cmps = cmps_ref[sl, :]  # (G, 1)
        exp_v = expv_ref[sl, :]  # (G, 1) expand ids (-1 = frozen/none)
        exp_ok = exp_v >= 0  # (G, 1)

        # ---- candidate ids from the byte planes ----
        b0 = rows[:, R8 + 0, :].astype(jnp.int32) & 0xFF  # (G, d)
        b1 = rows[:, R8 + 1, :].astype(jnp.int32) & 0xFF
        b2 = rows[:, R8 + 2, :].astype(jnp.int32) & 0xFF
        b3 = rows[:, R8 + 3, :].astype(jnp.int32) & 0xFF
        cid_d = b0 + (b1 << 8) + (b2 << 16) + (b3 << 24)  # (G, d)
        # lanes >= R8 hold zero planes (id 0, NOT -1): mask them invalid
        lane_d = jax.lax.broadcasted_iota(jnp.int32, (G, d), 1)
        cid = jnp.where(lane_d < R8, cid_d, -1)[:, :R8]
        cvalid = (cid >= 0) & (cid < n_valid) & exp_ok

        # ---- candidate distances ----
        vecs = rows[:, :R8, :].astype(jnp.float32)  # (G, R8, d)
        if metric is Metric.MIPS:
            cd = -jnp.sum(vecs * q[:, None, :], axis=2)
        else:
            diff = vecs - q[:, None, :]
            cd = jnp.sum(diff * diff, axis=2)  # (G, R8)
        cmps_new = cmps + jnp.sum(
            cvalid.astype(jnp.int32), axis=1, keepdims=True
        )

        # ---- frontier-full cutoff (beamSearch.h:150-159) ----
        worst = _at_lane(bdist, lane_f, L - 1)  # (G, 1)
        cd = jnp.where(cvalid & (cd < worst), cd, _INF)
        lane_r8 = jax.lax.broadcasted_iota(jnp.int32, (G, R8), 1)
        cpack = jnp.where(cd < _INF, cid * 2 + 1,
                          (n_valid + lane_r8) * 2 + 1)

        # ---- dedup against the beam (hashless exactness argument in
        # search/beam.py): a candidate already present in the beam is
        # dropped, the beam copy (with its expanded flag) wins. Direct
        # compare against the <= L live beam lanes costs ~L vector ops —
        # half the price of the 28-stage id-sort it replaces. ----
        if ablate != "fullsort":
            bid = jax.lax.shift_right_logical(bpack, 1)
            dup = jnp.zeros(cd.shape, bool)
            for l in range(L):
                dup = dup | (cid == bid[:, l:l + 1])
            cd = jnp.where(dup, _INF, cd)
            cpack = jnp.where(cd < _INF, cpack,
                              (n_valid + lane_r8) * 2 + 1)
            # sort candidates DESCENDING (ascending by negated key): INF
            # slots land first, reals follow in decreasing distance —
            # appended after the ascending beam this forms one bitonic
            # sequence, so a single 7-stage merge finishes the job
            negd, cpack_s = bitonic_sort(-cd, cpack, roll=_roll)
            # concat puts the descending candidates in the TOP R8 lanes:
            # [beam asc (<L) | +INF plateau | candidates desc] is bitonic
            cdW = jnp.concatenate(
                [jnp.full((G, W - R8), _INF), -negd], axis=1
            )
            cpW = jnp.concatenate(
                [(n_valid + R8 + lane_i[:, : W - R8]) * 2 + 1, cpack_s],
                axis=1,
            )
        else:
            cdW = jnp.concatenate(
                [cd, jnp.full((G, W - R8), _INF)], axis=1
            )
            cpW = jnp.concatenate(
                [cpack, (n_valid + R8 + lane_i[:, : W - R8]) * 2 + 1], axis=1
            )
            cdW = jnp.roll(cdW, L, axis=-1)
            cpW = jnp.roll(cpW, L, axis=-1)
        mdist = jnp.where(lane_i < L, bdist, cdW)
        mpack = jnp.where(lane_i < L, bpack, cpW)
        if ablate == "dmaonly":
            obdist[sl, :] = mdist
            obpack[sl, :] = mpack
            onv[sl, :] = nv
            ocmps[sl, :] = cmps_new
            onext[sl, :] = exp_v
            nxt_g0 = g + n_buf

            @pl.when(nxt_g0 < n_grp)
            def _():
                for j in range(G):
                    dma(slot, nxt_g0, j).start()

            return 0
        if ablate == "fullsort":
            # reference variant: dedup by id-sort (expanded copy first),
            # then re-sort by distance — 2 full bitonic sorts
            spack, sdist = bitonic_sort(mpack, mdist, roll=_roll)
            sid = jax.lax.shift_right_logical(spack, 1)
            prev = jnp.roll(sid, 1, axis=-1)
            dup2 = (lane_i > 0) & (sid == prev)
            sdist = jnp.where(dup2, _INF, sdist)
            ndist, npack = bitonic_sort(sdist, spack, roll=_roll)
        else:
            # dedup already done against the beam; one bitonic merge
            # (log2 W stages) finishes ascending order
            ndist, npack = bitonic_merge(mdist, mpack, roll=_roll)
        ndist = jnp.where(lane_i < L, ndist, _INF)
        npack = jnp.where(lane_i < L, npack, (n_valid + W + lane_i) * 2 + 1)

        # ---- next expansion + cut-rule convergence (beamSearch.h:185) ----
        unexp = ((npack & 1) == 1) & (ndist < _INF)
        if k > 0 and metric.is_metric and k < L:
            dk = _at_lane(ndist, lane_f, k)  # (G, 1)
            thr = jnp.minimum(cut * dk, _INF)
            workable = unexp & (ndist < thr)
        else:
            workable = unexp
        has_work = jnp.max(
            workable.astype(jnp.int32), axis=1, keepdims=True
        ) > 0
        nv_new = nv + exp_ok.astype(jnp.int32)
        done_new = ~exp_ok | ~has_work | (nv_new >= limit)  # (G, 1)
        first = jnp.min(
            jnp.where(workable, lane_f, float(2 * W)), axis=1, keepdims=True
        )
        nid = jax.lax.shift_right_logical(npack, 1)
        nxt = jnp.sum(
            jnp.where(lane_f == first, nid, 0), axis=1, keepdims=True
        ).astype(jnp.int32)
        nxt = jnp.where(done_new, -1, nxt)
        # mark the chosen entry expanded NOW (the packed bit flips) so the
        # next step's kernel sees it as expanded
        flip = (lane_f == first) & ~done_new
        npack = npack - flip.astype(jnp.int32)

        # frozen queries pass through unchanged
        obdist[sl, :] = jnp.where(exp_ok, ndist, bdist)
        obpack[sl, :] = jnp.where(exp_ok, npack, bpack)
        onv[sl, :] = jnp.where(exp_ok, nv_new, nv)
        ocmps[sl, :] = jnp.where(exp_ok, cmps_new, cmps)
        onext[sl, :] = jnp.where(exp_ok, nxt, -1)

        nxt_g = g + n_buf

        @pl.when(nxt_g < n_grp)
        def _():
            for j in range(G):
                dma(slot, nxt_g, j).start()

        return 0

    jax.lax.fori_loop(0, n_grp, loop, 0)


@functools.partial(
    jax.jit,
    static_argnames=("R8", "d", "W", "L", "k", "n_valid", "metric",
                     "cut", "limit", "block_b", "G", "n_buf", "interpret",
                     "ablate"),
)
def fused_step(
    exp_ids,  # (B,) int32 (-1 = frozen)
    queries,  # (B, d) f32
    bdist,  # (B, W) f32
    bpack,  # (B, W) int32
    nv,  # (B, 1) int32
    cmps,  # (B, 1) int32
    inline_ext,  # (n_pad, R8 + 8, d) int8
    *, R8, d, W, L, k, n_valid, metric, cut, limit,
    block_b=256, G=8, n_buf=8, interpret=False, ablate="full",
):
    B = queries.shape[0]
    if jax.default_backend() != "tpu":
        interpret = True
    block_b = max(G, min(block_b, B))
    kernel = functools.partial(
        _step_kernel, R8=R8, d=d, W=W, L=L, k=k, n_valid=n_valid,
        metric=metric, cut=cut, limit=limit, block_b=block_b, G=G,
        n_buf=n_buf, ablate=ablate,
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
                bspec(d), bspec(W), bspec(W), bspec(1), bspec(1), bspec(1),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[bspec(W), bspec(W), bspec(1), bspec(1), bspec(1)],
            scratch_shapes=[
                pltpu.VMEM((n_buf, G, R8 + 8, d), inline_ext.dtype),
                pltpu.SemaphoreType.DMA((n_buf, G)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, W), jnp.float32),
            jax.ShapeDtypeStruct((B, W), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(exp_ids, queries, bdist, bpack, nv, cmps,
      exp_ids.reshape(B, 1), inline_ext)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "n_valid", "k", "L", "cut", "limit",
                     "max_steps", "block_b", "G", "n_buf"),
)
def beam_search_fused(
    queries,  # (B, d) — queries in the TIER's domain, f32 values
    tier_data,  # (n_pad, d) int8 tier (for start distances)
    inline_ext,  # (n_pad, R8 + 8, d) int8
    starts,  # (S,) or (B, S) int32
    *,
    metric: Metric,
    n_valid: int,
    k: int,
    L: int,
    cut: float = 1.35,
    limit: int = 2**30,
    max_steps: int = 0,
    block_b: int = 256,
    G: int = 8,
    n_buf: int = 8,
):
    """Drive ``fused_step`` to convergence -> (beam_ids (B, L) int32,
    beam_dists (B, L) f32, num_visited, dist_cmps). The while loop runs
    whole kernel steps; per-query freezing happens inside the kernel.
    """
    B0, d = queries.shape
    R8 = inline_ext.shape[1] - 8
    W = 1
    while W < L + R8:
        W *= 2
    limit = min(limit, n_valid)
    max_steps = max_steps or limit

    if starts.ndim == 1:
        starts = jnp.broadcast_to(starts[None, :], (B0, starts.shape[0]))
    S = starts.shape[1]

    # pad the batch to a block multiple: unprocessed tail rows would feed
    # garbage expand ids (= DMA addresses) into the next step
    block_b = max(G, min(block_b, ((B0 + 7) // 8) * 8))
    B = ((B0 + block_b - 1) // block_b) * block_b
    if B != B0:
        queries = jnp.pad(queries, ((0, B - B0), (0, 0)))
        starts = jnp.pad(starts, ((0, B - B0), (0, 0)),
                         constant_values=-1)

    # ---- init (XLA, one-off): seed beam with start distances ----
    sv = (starts >= 0) & (starts < n_valid)
    svecs = jnp.take(
        tier_data, jnp.clip(starts, 0, tier_data.shape[0] - 1), axis=0
    ).astype(jnp.float32)
    qf = queries.astype(jnp.float32)
    if metric is Metric.MIPS:
        sd = -jnp.sum(svecs * qf[:, None, :], axis=2)
    else:
        diff = svecs - qf[:, None, :]
        sd = jnp.sum(diff * diff, axis=2)
    sd = jnp.where(sv, sd, _INF)
    sids = jnp.where(
        sv, starts, n_valid + jnp.arange(S, dtype=jnp.int32)[None, :]
    )
    lane = jnp.arange(W, dtype=jnp.int32)[None, :]
    bdist = jnp.concatenate(
        [sd, jnp.full((B, W - S), _INF)], axis=1
    )
    sent = jnp.broadcast_to(
        (n_valid + S + lane[:, : W - S]) * 2 + 1, (B, W - S)
    )
    bpack = jnp.concatenate([sids * 2 + 1, sent], axis=1)
    bdist, bpack = jax.lax.sort((bdist, bpack), num_keys=1, is_stable=True)
    # dedup identical start ids (rare): keep first
    bid = jax.lax.shift_right_logical(bpack, 1)
    dup0 = jnp.concatenate(
        [jnp.zeros((B, 1), bool), bid[:, 1:] == bid[:, :-1]], axis=1
    )
    bdist = jnp.where(dup0, _INF, bdist)
    bdist, bpack = jax.lax.sort((bdist, bpack), num_keys=1, is_stable=True)

    nv = jnp.zeros((B, 1), jnp.int32)
    cmps = jnp.sum(sv, axis=1, dtype=jnp.int32).reshape(B, 1)

    def select_first(bdist, bpack, nv):
        unexp = ((bpack & 1) == 1) & (bdist < _INF) & (lane < L)
        if k > 0 and metric.is_metric and k < L:
            thr = jnp.minimum(cut * bdist[:, k], _INF)
            workable = unexp & (bdist < thr[:, None])
        else:
            workable = unexp
        first = jnp.argmax(workable, axis=1)
        any_w = jnp.any(workable, axis=1) & (nv[:, 0] < limit)
        eid = jnp.take_along_axis(
            jax.lax.shift_right_logical(bpack, 1), first[:, None], axis=1
        )[:, 0]
        exp_ids = jnp.where(any_w, eid, -1).astype(jnp.int32)
        flip = (lane == first[:, None]) & any_w[:, None]
        return exp_ids, bpack - flip.astype(jnp.int32)

    exp_ids, bpack = select_first(bdist, bpack, nv)

    step = functools.partial(
        fused_step, R8=R8, d=d, W=W, L=L, k=k, n_valid=n_valid,
        metric=metric, cut=cut, limit=limit, block_b=block_b, G=G,
        n_buf=n_buf,
    )

    def cond(state):
        t, exp_ids, *_ = state
        return (t < max_steps) & jnp.any(exp_ids >= 0)

    def body(state):
        t, exp_ids, bdist, bpack, nv, cmps = state
        bdist, bpack, nv, cmps, nxt = step(
            exp_ids, queries, bdist, bpack, nv, cmps, inline_ext
        )
        return (t + 1, nxt[:, 0], bdist, bpack, nv, cmps)

    _, _, bdist, bpack, nv, cmps = jax.lax.while_loop(
        cond, body, (jnp.int32(0), exp_ids, bdist, bpack, nv, cmps)
    )
    out_ids = jnp.where(
        bdist[:, :L] < _INF,
        jax.lax.shift_right_logical(bpack[:, :L], 1), -1
    )
    return (out_ids[:B0], bdist[:B0, :L], nv[:B0, 0], cmps[:B0, 0])
