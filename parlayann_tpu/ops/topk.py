"""Top-k / sorted-merge primitives.

These replace the reference's per-query ``std::sort`` + ``set_union`` frontier
bookkeeping (beamSearch.h:173-181) with batched device sorts:
``jax.lax.sort`` with multiple operands gives a lexicographic stable sort of
(dist, id, flags...) rows, and duplicate suppression is a sort-by-id +
adjacent-equality mask instead of ``std::unique``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parlayann_tpu.ops.distance import INF


def smallest_k(dists: jax.Array, ids: jax.Array, k: int):
    """(B, M) -> (B, k) smallest distances with their ids."""
    neg, idx = jax.lax.top_k(-dists, k)
    return -neg, jnp.take_along_axis(ids, idx, axis=1)


def sort_by_dist(dists: jax.Array, *others: jax.Array):
    """Batched stable ascending sort of rows by distance, carrying payloads."""
    out = jax.lax.sort((dists,) + others, dimension=-1, num_keys=1)
    return out


def mask_duplicate_ids(dists: jax.Array, ids: jax.Array) -> jax.Array:
    """Return dists with duplicate ids (per row) masked to INF, keeping the
    smallest-distance occurrence of each id.

    Works by sorting rows by (id, dist); any entry equal to its left
    neighbor's id is a duplicate with a >= distance.
    """
    sid, sdist = jax.lax.sort((ids, dists), dimension=-1, num_keys=1)
    dup = jnp.concatenate(
        [jnp.zeros_like(sid[:, :1], dtype=bool), sid[:, 1:] == sid[:, :-1]], axis=1
    )
    sdist = jnp.where(dup, INF, sdist)
    # restore (dist-sorted not required by callers; return aligned to sorted-id
    # order alongside ids)
    return sdist, sid


def merge_topk(
    dists_a: jax.Array,
    ids_a: jax.Array,
    dists_b: jax.Array,
    ids_b: jax.Array,
    k: int,
    dedup: bool = False,
):
    """Merge two (B, *) candidate lists into the k smallest per row."""
    d = jnp.concatenate([dists_a, dists_b], axis=1)
    i = jnp.concatenate([ids_a, ids_b], axis=1)
    if dedup:
        d, i = mask_duplicate_ids(d, i)
    return smallest_k(d, i, k)
