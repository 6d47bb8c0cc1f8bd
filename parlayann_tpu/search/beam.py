"""Batched beam search — the shared search kernel (L2 of the layer map).

TPU-native re-design of ``filtered_beam_search`` (beamSearch.h:27-214): where
the reference runs one sequential best-first loop per query on one core, here
B queries advance in lock-step through a ``lax.while_loop``; each step

  1. selects the E closest unexpanded beam entries per query (the reference
     expands 1/step; E>1 amortizes the merge and widens the gathers),
  2. gathers their neighbor rows ``(B, E, R)`` and vectors, computes all
     candidate distances in one fused batched reduction,
  3. drops already-seen candidates with a per-query lossy visit hash — same
     false-negative-only semantics as the reference's ``hash_filter``
     (beamSearch.h:52-59): a collision can only cause re-visiting, never a
     dropped result,
  4. merges beam + candidates with two batched stable sorts — sort by (id,
     dist) masks duplicates (the reference's ``std::unique`` + ``set_union``,
     beamSearch.h:173-181), sort by (dist, id) re-orders — then trims to the
     beam size and applies the metric-only ``cut`` pruning rule
     (beamSearch.h:185-195),
  5. freezes queries whose beam has no unexpanded entries or whose visit
     budget ``limit`` is spent (beamSearch.h:107).

Per-query state lives in padded device arrays; "done" queries are masked, so
a batch retires when its slowest query finishes. Expanded nodes are appended
to a visited buffer when ``record_visited`` (build needs them as robustPrune
candidates — beamSearch.h:499-521 ``beam_search_rerank__``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from parlayann_tpu.types import Metric, QueryParams
from parlayann_tpu.ops import distance
from parlayann_tpu.ops.distance import INF


class BeamResult(NamedTuple):
    beam_ids: jax.Array  # (B, L) int32, sorted by distance; invalid slots have dist INF
    beam_dists: jax.Array  # (B, L) f32
    visited_ids: jax.Array  # (B, vmax) int32 in expansion order
    visited_dists: jax.Array  # (B, vmax) f32
    num_visited: jax.Array  # (B,) int32
    dist_cmps: jax.Array  # (B,) int32 — full-precision comparisons


def default_hash_bits(beam_size: int) -> int:
    """bits = max(10, ceil(log2(beamSize^2)) - 2)  (beamSearch.h:52)."""
    return max(10, math.ceil(math.log2(max(beam_size, 2) ** 2)) - 2)


def _hash_ids(ids: jax.Array, bits: int) -> jax.Array:
    h = ids.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    h ^= h >> 15
    h *= jnp.uint32(0x85EBCA6B)
    return (h >> (32 - bits)).astype(jnp.int32)


def _pad_ids(n_valid: int, count: int) -> jax.Array:
    """Unique sentinel ids (> any real id) for INF-distance padding slots."""
    return n_valid + jnp.arange(count, dtype=jnp.int32)


def _merge(beam_ids, beam_dists, beam_exp, cand_ids, cand_dists, L: int):
    """Dedup-union beam with candidates, keep L closest.

    Two batched stable sorts: (id, dist) lexicographic to mask duplicate ids
    (beam copy wins ties by input order), then (dist, id) to restore beam
    order — the reference's sort + unique + set_union (beamSearch.h:173-181).
    """
    ids = jnp.concatenate([beam_ids, cand_ids], axis=1)
    dists = jnp.concatenate([beam_dists, cand_dists], axis=1)
    exp = jnp.concatenate(
        [beam_exp, jnp.zeros_like(cand_ids, dtype=jnp.int32)], axis=1
    )
    sid, sdist, sexp = jax.lax.sort((ids, dists, exp), num_keys=2, is_stable=True)
    dup = jnp.concatenate(
        [jnp.zeros_like(sid[:, :1], dtype=bool), sid[:, 1:] == sid[:, :-1]], axis=1
    )
    sdist = jnp.where(dup, INF, sdist)
    ndist, nid, nexp = jax.lax.sort((sdist, sid, sexp), num_keys=2, is_stable=True)
    return nid[:, :L], ndist[:, :L], nexp[:, :L]


@partial(
    jax.jit,
    static_argnames=(
        "metric",
        "n_valid",
        "k",
        "L",
        "cut",
        "limit",
        "degree_limit",
        "expand",
        "hash_bits",
        "record_visited",
        "vmax",
        "exclude_self",
    ),
)
def beam_search_batch(
    queries: jax.Array,  # (B, d) in the points' storage domain
    points_data: jax.Array,  # (n_pad, d)
    nbrs: jax.Array,  # (n_pad, R) int32
    degs: jax.Array,  # (n_pad,) int32
    starts: jax.Array,  # (S,) or (B, S) int32 start vertices
    self_ids: Optional[jax.Array] = None,  # (B,) id to exclude (build self)
    *,
    metric: Metric,
    n_valid: int,
    k: int = 10,
    L: int = 128,
    cut: float = 1.35,
    limit: int = 2**30,
    degree_limit: int = 2**30,
    expand: int = 1,
    hash_bits: Optional[int] = None,
    record_visited: bool = False,
    vmax: int = 1,
    exclude_self: bool = False,
) -> BeamResult:
    B, d = queries.shape
    R = int(nbrs.shape[1])
    rwidth = min(R, degree_limit)
    E = expand
    K = E * rwidth
    bits = hash_bits if hash_bits is not None else default_hash_bits(L)
    H = 1 << bits
    limit = min(limit, n_valid)
    vmax = max(vmax, E if record_visited else 1)
    brow = jnp.arange(B, dtype=jnp.int32)[:, None]

    if starts.ndim == 1:
        starts = jnp.broadcast_to(starts[None, :], (B, starts.shape[0]))
    S = starts.shape[1]

    qf = queries

    def cand_distances(ids, valid):
        vecs = jnp.take(points_data, jnp.clip(ids, 0, points_data.shape[0] - 1), axis=0)
        dd = distance.gathered(qf, vecs, metric)
        return jnp.where(valid, dd, INF)

    # ---- init: seed beam with start points (beamSearch.h:63-72) ----
    start_valid = (starts >= 0) & (starts < n_valid)
    if exclude_self and self_ids is not None:
        start_valid &= starts != self_ids[:, None]
    start_dists = cand_distances(starts, start_valid)
    start_ids = jnp.where(start_valid, starts, n_valid + jnp.arange(S, dtype=jnp.int32)[None, :])

    beam_ids = jnp.broadcast_to(_pad_ids(n_valid + S, L)[None, :], (B, L))
    beam_dists = jnp.full((B, L), INF, dtype=jnp.float32)
    beam_exp = jnp.zeros((B, L), dtype=jnp.int32)
    beam_ids, beam_dists, beam_exp = _merge(
        beam_ids, beam_dists, beam_exp, start_ids, start_dists, L
    )

    hash_tbl = jnp.full((B, H), -1, dtype=jnp.int32)
    hash_tbl = hash_tbl.at[brow, _hash_ids(start_ids, bits)].set(
        jnp.where(start_valid, start_ids, -1), mode="drop"
    )

    vis_ids = jnp.zeros((B, vmax), dtype=jnp.int32)
    vis_dists = jnp.full((B, vmax), INF, dtype=jnp.float32)
    num_visited = jnp.zeros((B,), dtype=jnp.int32)
    dist_cmps = jnp.sum(start_valid, axis=1).astype(jnp.int32)
    done = ~jnp.any(beam_dists < INF, axis=1)

    state = (beam_ids, beam_dists, beam_exp, hash_tbl, vis_ids, vis_dists,
             num_visited, dist_cmps, done)

    def cond(state):
        return jnp.any(~state[-1])

    def body(state):
        (beam_ids, beam_dists, beam_exp, hash_tbl, vis_ids, vis_dists,
         num_visited, dist_cmps, done) = state
        active = ~done

        # -- 1. pick the E closest unexpanded beam entries per query --
        unexp = (beam_exp == 0) & (beam_dists < INF)
        budget = jnp.minimum(E, limit - num_visited)
        pos_score = jnp.where(unexp, jnp.arange(L, dtype=jnp.int32)[None, :], L)
        neg_top, _ = jax.lax.top_k(-pos_score, E)  # E smallest positions
        pos = -neg_top  # (B, E), == L when not enough unexpanded
        e_rank = jnp.arange(E, dtype=jnp.int32)[None, :]
        valid_e = (pos < L) & (e_rank < budget[:, None]) & active[:, None]
        pos_c = jnp.minimum(pos, L - 1)
        exp_ids = jnp.take_along_axis(beam_ids, pos_c, axis=1)
        exp_dists = jnp.take_along_axis(beam_dists, pos_c, axis=1)
        exp_ids = jnp.where(valid_e, exp_ids, n_valid)

        # -- 2. mark expanded + append to visited buffer --
        beam_exp = beam_exp.at[brow, jnp.where(valid_e, pos, L)].set(1, mode="drop")
        n_new = jnp.sum(valid_e, axis=1).astype(jnp.int32)
        if record_visited:
            upd_i = jnp.where(valid_e, exp_ids, 0)
            upd_d = jnp.where(valid_e, exp_dists, INF)
            wpos = jnp.minimum(num_visited, max(vmax - E, 0))
            new_vi = jax.vmap(
                lambda buf, u, i: jax.lax.dynamic_update_slice(buf, u, (i,))
            )(vis_ids, upd_i, wpos)
            new_vd = jax.vmap(
                lambda buf, u, i: jax.lax.dynamic_update_slice(buf, u, (i,))
            )(vis_dists, upd_d, wpos)
            vis_ids = jnp.where(active[:, None], new_vi, vis_ids)
            vis_dists = jnp.where(active[:, None], new_vd, vis_dists)
        num_visited = num_visited + n_new

        # -- 3. gather neighbors, mask, hash-filter --
        rows = jnp.take(nbrs, jnp.clip(exp_ids, 0, nbrs.shape[0] - 1), axis=0)
        rows = rows[:, :, :rwidth]  # degree_limit (beamSearch.h:130)
        rdeg = jnp.take(degs, jnp.clip(exp_ids, 0, degs.shape[0] - 1), axis=0)
        slot = jnp.arange(rwidth, dtype=jnp.int32)[None, None, :]
        v = (slot < rdeg[:, :, None]) & valid_e[:, :, None]
        cand_ids = rows.reshape(B, K)
        cand_valid = v.reshape(B, K)
        cand_valid &= (cand_ids >= 0) & (cand_ids < n_valid)
        if exclude_self and self_ids is not None:
            cand_valid &= cand_ids != self_ids[:, None]

        slots = _hash_ids(cand_ids, bits)
        seen = jnp.take_along_axis(hash_tbl, slots, axis=1) == cand_ids
        cand_valid &= ~seen
        hash_tbl = hash_tbl.at[brow, jnp.where(cand_valid, slots, H)].set(
            jnp.where(cand_valid, cand_ids, -1), mode="drop"
        )
        dist_cmps = dist_cmps + jnp.sum(cand_valid, axis=1).astype(jnp.int32)

        # -- 4. distances + frontier-full cutoff (beamSearch.h:150-159) --
        cand_dists = cand_distances(cand_ids, cand_valid)
        worst = beam_dists[:, L - 1]
        cutoff = jnp.where(worst < INF, worst, INF)
        cand_dists = jnp.where(cand_dists >= cutoff[:, None], INF, cand_dists)
        cand_ids = jnp.where(
            cand_dists < INF, cand_ids, n_valid + jnp.arange(K, dtype=jnp.int32)[None, :]
        )

        prev_count = jnp.sum(beam_dists < INF, axis=1)
        nb_ids, nb_dists, nb_exp = _merge(
            beam_ids, beam_dists, beam_exp, cand_ids, cand_dists, L
        )

        # -- cut pruning (beamSearch.h:185-195), metric + query-time only --
        if k > 0 and metric.is_metric and k < L:
            thr = cut * nb_dists[:, k]
            keep = jnp.sum(nb_dists < thr[:, None], axis=1)
            keep = jnp.maximum(keep, prev_count)
            cut_mask = jnp.arange(L, dtype=jnp.int32)[None, :] >= keep[:, None]
            nb_dists = jnp.where(cut_mask, INF, nb_dists)
            nb_exp = jnp.where(cut_mask, 1, nb_exp)

        new_done = done | ~jnp.any((nb_exp == 0) & (nb_dists < INF), axis=1)
        new_done |= num_visited >= limit

        # freeze finished queries
        sel = active[:, None]
        beam_ids = jnp.where(sel, nb_ids, beam_ids)
        beam_dists = jnp.where(sel, nb_dists, beam_dists)
        beam_exp = jnp.where(sel, nb_exp, beam_exp)
        return (beam_ids, beam_dists, beam_exp, hash_tbl, vis_ids, vis_dists,
                num_visited, dist_cmps, new_done)

    state = jax.lax.while_loop(cond, body, state)
    (beam_ids, beam_dists, beam_exp, hash_tbl, vis_ids, vis_dists,
     num_visited, dist_cmps, done) = state

    beam_ids = jnp.where(beam_dists < INF, beam_ids, -1)
    return BeamResult(beam_ids, beam_dists, vis_ids, vis_dists, num_visited, dist_cmps)


def top_k_from_beam(res: BeamResult, k: int):
    """First k frontier entries -> (ids, dists); -1 id for missing."""
    return res.beam_ids[:, :k], res.beam_dists[:, :k]
