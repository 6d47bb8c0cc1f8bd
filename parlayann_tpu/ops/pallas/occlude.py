"""Pallas fused robustPrune occlusion kernel.

The α-occlusion loop (vamana/index.h:90-120) is R sequential rounds of
"accept the closest surviving candidate, eliminate what it occludes". The
XLA implementation (build/prune.py) precomputes a (B, C, C) pairwise matrix
and re-reads it from HBM every round — 32 rounds × O(B·C²·4B) of pure HBM
traffic dominated the build's prune phases (~140 ms/batch measured).

This kernel keeps each block's candidate VECTORS in VMEM and runs all R
rounds in place: per round the star row is extracted with a one-hot MXU
matmul (no dynamic per-row gather — Mosaic has none) and star→candidate
distances come from a second small matmul. HBM traffic drops to reading
the candidate vectors once.

Output contract: instead of per-round column stores (dynamic lane stores
are not expressible), the kernel emits ``rounds[b, c]`` = the round at
which candidate c became the star (``R + C`` if never selected). The caller
recovers the (B, R) selection with one lane-wise stable sort — selection
round order IS distance order, matching the XLA path's output exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parlayann_tpu.types import Metric
from parlayann_tpu.ops.distance import INF

# plain float for in-kernel use: jnp constants captured by a kernel body
# trip pallas_call's no-captured-constants rule
_INF = float(INF)


def _occl_kernel(dist_ref, vecs_ref, alpha_ref, round_ref, *, R, C, block,
                 metric):
    alpha = alpha_ref[0]
    dist = dist_ref[...]  # (block, C) f32, ascending, INF = invalid
    vecs = vecs_ref[...].astype(jnp.float32)  # (block, C, d)
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (block, C), 1).astype(
        jnp.float32
    )
    # pairwise candidate-candidate distances ONCE, on the MXU, VMEM-resident
    # (the XLA path's _pairwise, but never touching HBM). The per-round work
    # is then a (block, C, C) one-hot row-extract on the VPU — cheaper than
    # re-deriving star distances from the (block, C, d) vectors each round.
    dots = jax.lax.dot_general(
        vecs, vecs, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (block, C, C)
    if metric is Metric.MIPS:
        pair_d = -dots
    else:
        nrm = jnp.sum(vecs * vecs, axis=-1)  # (block, C)
        pair_d = jnp.maximum(
            nrm[:, :, None] - 2.0 * dots + nrm[:, None, :], 0.0
        )

    # loop carries are f32 masks: Mosaic fails to legalize scf.for over
    # vector<i1> carries, and f32 is the VPU-native mask dtype anyway
    def body(r, state):
        elim, rounds = state
        alive = elim == 0.0
        any_alive = jnp.max(1.0 - elim, axis=1) > 0.0
        # first surviving candidate via f32 min-reduce over an iota (Mosaic
        # has no integer/bool argmax): star = min lane index where alive
        star = jnp.min(jnp.where(alive, lane_f, float(2 * C)), axis=1)
        onehot = lane_f == star[:, None]
        oh_f = onehot.astype(jnp.float32)
        d_sp = jnp.sum(oh_f[:, :, None] * pair_d, axis=1)  # (block, C)
        occl = alpha * d_sp <= dist  # index.h:111-113
        take = onehot & any_alive[:, None]
        rounds = jnp.where(take, r.astype(jnp.float32), rounds)
        hit = ((occl | onehot) & any_alive[:, None]).astype(jnp.float32)
        elim = jnp.maximum(elim, hit)
        return elim, rounds

    elim0 = (dist >= _INF).astype(jnp.float32)
    rounds0 = jnp.full((block, C), float(R + C), jnp.float32)
    _, rounds = jax.lax.fori_loop(0, R, body, (elim0, rounds0))
    round_ref[...] = rounds.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("R", "metric", "block", "interpret")
)
def occlusion_rounds(
    cand_dists: jax.Array,  # (B, C) f32 ascending per row, INF = invalid
    cand_vecs: jax.Array,  # (B, C, d) candidate vectors (any castable dtype)
    alpha,  # scalar f32 (traced)
    *,
    R: int,
    metric: Metric,
    block: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """-> (B, C) int32: selection round per candidate, R + C if unselected.

    ``jnp.argsort``-free recovery of the (B, R) selection:
    ``sort((rounds, ids, dists))`` and slice the first R columns.
    """
    B, C = cand_dists.shape
    d = cand_vecs.shape[2]
    # VMEM budget: f32 pair (block, C, C) + f32 vecs (block, C, d) ≤ ~8MB
    fit = (8 << 20) // (4 * C * (C + d))
    if fit < 8:
        # even an 8-row block would blow the budget — fail loudly instead
        # of silently clamping past it (C*(C+d) > 256K elements)
        raise ValueError(
            f"occlusion kernel: candidate width C={C} with d={d} exceeds "
            f"the ~8MB VMEM budget at the minimum 8-row block; use the "
            f"XLA path (PARLAYANN_OCCLUDE=xla) or reduce C"
        )
    block = max(8, min(block, B, (fit // 8) * 8))
    pad = (-B) % block
    if pad:
        cand_dists = jnp.pad(cand_dists, ((0, pad), (0, 0)),
                             constant_values=INF)
        cand_vecs = jnp.pad(cand_vecs, ((0, pad), (0, 0), (0, 0)))
    if jax.default_backend() != "tpu":
        interpret = True

    kernel = functools.partial(
        _occl_kernel, R=R, C=C, block=block, metric=metric,
    )
    out = pl.pallas_call(
        kernel,
        grid=((B + pad) // block,),
        in_specs=[
            pl.BlockSpec((block, C), lambda i: (i, 0)),
            pl.BlockSpec((block, C, d), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B + pad, C), jnp.int32),
        interpret=interpret,
    )(cand_dists, cand_vecs, jnp.asarray(alpha, jnp.float32).reshape(1))
    return out[:B]
