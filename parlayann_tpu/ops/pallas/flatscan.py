"""Fused brute-force top-k scan kernel (flat search at MXU speed).

XLA computes the (B, chunk) distance tile at full matmul rate but cannot
fuse a grouped top-k into the matmul epilogue — the tile round-trips HBM
and a reshape/reduce chain runs ~10x slower than the matmul (measured:
29.6 ms fused row-min vs 1900 ms grouped min at B=10K, N=131K, d=128).
This kernel IS that missing epilogue.

Grid (B/Bt, N/C); per step the MXU computes a (Bt, C) distance tile in
VMEM and a sort-free selection folds it into a running candidate pool:

  * pass A: lane-strided min tournament — lane j of a 128-wide register
    keeps the min over tile columns ≡ j (mod 128). One ``minimum`` per
    column; no Mosaic lane reshapes or rolls.
  * pass B: equality scan recovers each lane's winning slice (argmin).
  * bubble insert: the (val, id) chunk winner per lane is merged into an
    M-deep per-lane sorted accumulator (M*128 pool lanes) with ~5 vector
    ops per depth — replacing the in-kernel 256-lane bitonic sort of the
    first version, which cost ~50 us/step, 20x the matmul under it.

The final exact top-k over the (B, M*128) pool runs outside the kernel
(one small XLA lane sort). Selection is exact-per-(lane-class, chunk):
a true top-k entry is lost only when it shares BOTH its lane class and
chunk with a smaller one (16 columns at C=2048) or its lane-class chain
overflows M; for k=10, N>=100K the measured recall is ~0.999. The XLA
``select="sort"`` path remains the exact oracle (ground truth uses it).

Distance algebra is prefolded so the tile costs ONE vector op beyond the
matmul: queries are pre-scaled by -2 (L2; -1 for MIPS) and the bias row
carries ||x||^2 + validity masking (+INF for padded/masked points), so
dist = dot + bias. ||q||^2 is added back outside the kernel.

Reference counterpart: the linear scan in
data_tools/compute_groundtruth.cpp:22-60 — redesigned rather than
translated (the per-query scalar loop has no TPU analogue).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parlayann_tpu.types import Metric
from parlayann_tpu.ops.distance import INF
from parlayann_tpu.utils.arrays import pow2 as _pow2

_INF = float(INF)


def _kernel(
    q_ref,  # (Bt, d) f32 — queries pre-scaled by -2 (L2) / -1 (MIPS)
    x_ref,  # (d, S*C) bf16|f32 — TRANSPOSED + pre-cast outside: the MXU
    #          wants the contraction on lhs-last/rhs-first; a (C, d) tile
    #          forces an in-kernel transpose of every chunk
    bias_ref,  # (1, S*C) f32 (||x||^2 + INF masking; 0/INF for MIPS)
    accd_ref,  # out (Bt, 128*M) f32
    acci_ref,  # out (Bt, 128*M) int32
    *, Bt, C, S, d, M, metric, precision,
):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        accd_ref[:] = jnp.full((Bt, 128 * M), _INF, jnp.float32)
        acci_ref[:] = jnp.full((Bt, 128 * M), -1, jnp.int32)

    q = q_ref[:]
    if precision != "exact":
        q = q.astype(jnp.bfloat16)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, 128), 1)
    # S sub-chunks per grid step amortize the per-step fixed cost
    for s2 in range(S):
        x = x_ref[:, pl.ds(s2 * C, C)]  # (d, C), matmul dtype
        if precision == "exact":
            dot = jax.lax.dot_general(
                q, x, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        else:
            dot = jax.lax.dot_general(
                q, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dist = dot + bias_ref[0, pl.ds(s2 * C, C)][None, :]  # (Bt, C)

        ns = C // 128
        # pass A+B fused: per-lane-class running (min, slice) pair
        mval = dist[:, :128]
        ms = jnp.zeros((Bt, 128), jnp.int32)
        for s in range(1, ns):
            dsl = dist[:, s * 128:(s + 1) * 128]
            hit = dsl < mval
            mval = jnp.where(hit, dsl, mval)
            ms = jnp.where(hit, s, ms)
        mid = (c * S + s2) * C + ms * 128 + lane

        # bubble insert into the M-deep per-lane accumulator
        cv, ci = mval, mid
        for m in range(M):
            sl = slice(m * 128, (m + 1) * 128)
            ad = accd_ref[:, sl]
            ai = acci_ref[:, sl]
            w = cv < ad
            accd_ref[:, sl] = jnp.where(w, cv, ad)
            acci_ref[:, sl] = jnp.where(w, ci, ai)
            cv = jnp.where(w, ad, cv)
            ci = jnp.where(w, ai, ci)



@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "n_valid", "Bt", "C", "S", "M",
                     "precision", "interpret"),
)
def flat_topk_pallas(
    queries,  # (B, d) f32
    points_data,  # (n_pad, d) f32|int8
    valid_mask=None,  # (n_pad,) bool | None
    exclude_ids=None,  # (B,) int32 | None
    *,
    k: int,
    metric: Metric,
    n_valid: int,
    Bt: int = 512,
    C: int = 2048,
    S: int = 4,
    M: int = 0,
    precision: str = "fast",
    interpret: bool = False,
):
    """-> (ids (B, k) int32, dists (B, k) f32 — true squared for L2)."""
    if jax.default_backend() != "tpu":
        interpret = True
    B0, d = queries.shape
    n_pad = points_data.shape[0]
    if M == 0:
        M = 2 if k <= 16 else 4
    assert k <= 128 * M
    Bt = min(Bt, _pow2(B0))
    B = -(-B0 // Bt) * Bt
    qf = queries.astype(jnp.float32)
    scale = -1.0 if metric is Metric.MIPS else -2.0
    qs = qf * scale
    if B != B0:
        qs = jnp.pad(qs, ((0, B - B0), (0, 0)))
    # sub-chunks per grid step amortize the fixed per-step cost; shrink S
    # before C so small datasets keep full tiles
    while S > 1 and S * C > max(n_pad, C):
        S //= 2
    NC = -(-n_pad // (S * C)) * (S * C)
    if NC != n_pad:
        points_data = jnp.pad(points_data, ((0, NC - n_pad), (0, 0)))
    if metric is Metric.MIPS:
        bias = jnp.zeros((NC,), jnp.float32)
    else:
        xf = points_data.astype(jnp.float32)
        bias = jnp.sum(xf * xf, axis=1)
    ids_all = jnp.arange(NC, dtype=jnp.int32)
    ok = ids_all < n_valid
    if valid_mask is not None:
        ok = ok & jnp.pad(valid_mask, (0, NC - valid_mask.shape[0]))
    bias = jnp.where(ok, bias, _INF).reshape(1, NC)
    # pre-cast + pre-transpose the dataset ONCE (a per-tile int8 upcast
    # and transpose inside the kernel cost more than the tournament)
    xmm = points_data.astype(
        jnp.float32 if precision == "exact" else jnp.bfloat16
    ).T

    kernel = functools.partial(
        _kernel, Bt=Bt, C=C, S=S, d=d, M=M, metric=metric,
        precision=precision,
    )
    grid = (B // Bt, NC // (S * C))
    accd, acci = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, d), lambda b, c: (b, 0)),
            pl.BlockSpec((d, S * C), lambda b, c: (0, c)),
            pl.BlockSpec((1, S * C), lambda b, c: (0, c)),
        ],
        out_specs=[
            pl.BlockSpec((Bt, 128 * M), lambda b, c: (b, 0)),
            pl.BlockSpec((Bt, 128 * M), lambda b, c: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 128 * M), jnp.float32),
            jax.ShapeDtypeStruct((B, 128 * M), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qs, xmm, bias)

    accd = accd[:B0]
    acci = acci[:B0]
    if exclude_ids is not None:
        accd = jnp.where(
            acci == exclude_ids[:B0, None].astype(jnp.int32), _INF, accd
        )
    # exact top-k over the pool: one small XLA lane sort
    sd, si = jax.lax.sort((accd, acci), dimension=1, num_keys=1)
    out_d = sd[:, :k]
    out_i = jnp.where(out_d < _INF, si[:, :k], -1)
    if metric is not Metric.MIPS:
        qn = jnp.sum(qf[:B0] * qf[:B0], axis=1, keepdims=True)
        out_d = jnp.where(
            out_d < _INF, jnp.maximum(out_d + qn, 0.0), _INF
        )
    return out_i, out_d
