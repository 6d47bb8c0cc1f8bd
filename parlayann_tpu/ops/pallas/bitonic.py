"""Lane-wise bitonic sorting networks (kernel-side helpers).

Mosaic has no sort primitive; these build ascending sorts over the LAST
axis (lanes) out of roll + compare + select — the only data-movement
Mosaic offers. An XOR-butterfly stage (partner = lane ^ j) is expressed
as two rolls and a select on the j-th lane bit.

All functions are pure jnp and run identically inside a Pallas kernel,
under interpret mode, or as plain XLA ops (how the unit tests check them
against jax.lax.sort).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lane_iota(shape, axis=-1):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _butterfly(vals, j, up_mask, roll):
    """One compare-exchange stage at distance j along the last axis.

    vals: tuple of arrays (key first). up_mask: bool array — True where
    the lane keeps the MIN of (self, partner) (ascending position).
    Partner of lane l is l ^ j.
    """
    key = vals[0]
    lane = _lane_iota(key.shape)
    low = (lane & j) == 0  # partner is to the right
    rolled = tuple(
        jnp.where(low, roll(v, -j), roll(v, j)) for v in vals
    )
    pkey = rolled[0]
    # lexicographic on (key, tiebreak) is unnecessary: callers pack a
    # unique tiebreak into the key. (Expressed with &/| — Mosaic cannot
    # select between i1 vectors.)
    same = up_mask == low
    keep_self = (same & (key <= pkey)) | (~same & (key >= pkey))
    return tuple(
        jnp.where(keep_self, v, pv) for v, pv in zip(vals, rolled)
    )


def _default_roll(v, s):
    return jnp.roll(v, s, axis=-1)


def bitonic_sort(key, *payload, roll=_default_roll, seg=None):
    """Ascending sort of each row's lanes by ``key``; payload reordered
    alongside. Lane count must be a power of two. Returns (key, *payload).
    ``roll``: lane-rotate fn — kernels pass the native pltpu.roll (jnp.roll
    lowers to slice+concat pairs in Mosaic, ~2x the ops).

    ``seg``: sort each aligned ``seg``-lane segment independently (packed
    rows). The XOR-butterfly partner lane ``l ^ j`` never leaves an
    aligned pow2 segment for ``j < seg``, so the same full-row cyclic
    rolls implement the segment-local exchange; only the direction mask
    switches to lane-within-segment bits.
    """
    W = key.shape[-1]
    seg = seg or W
    assert W & (W - 1) == 0, "lane count must be a power of two"
    assert seg & (seg - 1) == 0 and W % seg == 0
    vals = (key,) + payload
    lane = _lane_iota(key.shape) & (seg - 1)
    k = 2
    while k <= seg:
        # direction of each k-block alternates to build bitonic runs;
        # at k == seg the mask is all-True (every segment sorts ascending)
        up = (lane & k) == 0
        j = k // 2
        while j >= 1:
            vals = _butterfly(vals, j, up, roll)
            j //= 2
        k *= 2
    return vals


def bitonic_merge(key, *payload, roll=_default_roll, seg=None):
    """Merge rows whose lanes form a bitonic sequence (e.g. an ascending
    half followed by a descending half) into ascending order. log2(W)
    stages — 4x cheaper than a full sort when both halves are pre-sorted.
    ``seg``: merge each aligned ``seg``-lane segment independently.
    """
    W = key.shape[-1]
    seg = seg or W
    assert W & (W - 1) == 0
    assert seg & (seg - 1) == 0 and W % seg == 0
    vals = (key,) + payload
    up = jnp.ones(key.shape, bool)
    j = seg // 2
    while j >= 1:
        vals = _butterfly(vals, j, up, roll)
        j //= 2
    return vals
