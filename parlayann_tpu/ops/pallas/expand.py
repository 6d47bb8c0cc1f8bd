"""Pallas fused frontier-expansion kernel.

The hot op of beam search: for B queries, gather each query's expanded
vertex's neighborhood vectors and compute all neighbor distances. XLA's
row gather runs far below HBM bandwidth on TPU (measured ~30-40 GB/s for
512B rows); this kernel instead reads *inline neighbor vectors* — a
``(n, R, d)`` array holding each vertex's R neighbor vectors contiguously
(the DiskANN SSD-layout idea reapplied to HBM: trade R-fold capacity for
sequential 16-64KB reads) — with a manually multi-buffered DMA pipeline,
and fuses the distance computation into the same kernel.

Layout contract: ``inline[v, j]`` is the vector of the j-th neighbor of
vertex v (built by ``build_inline`` from graph + points). Distances for
slots >= degree are garbage and must be masked by the caller (which
already masks by degree).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parlayann_tpu.types import Metric


def build_inline(points_data: jax.Array, nbrs: jax.Array, dtype=None) -> jax.Array:
    """(n_pad, d), (n_pad, R) -> (n_pad, R8, d) inline neighbor vectors,
    with R8 = R rounded up to a multiple of 8: Mosaic requires DMA slices
    sublane-aligned, and graphs like HCNNG have R = 90. Pad slots hold
    row 0's vector; callers mask by degree.

    Built by chunked gather (one pass over the graph); refreshed once
    post-build for search (or per batch during build).
    """
    n_pad, R = nbrs.shape
    if R % 8:
        nbrs = jnp.pad(nbrs, ((0, 0), (0, 8 - R % 8)))
        R = nbrs.shape[1]
    d = points_data.shape[1]
    dt = dtype or points_data.dtype

    def chunk_fn(rows):
        v = jnp.take(points_data, jnp.clip(rows, 0, n_pad - 1), axis=0)
        return v.astype(dt)

    chunk = max(1, 2_000_000 // max(R, 1))
    chunk = min(chunk, n_pad)
    while n_pad % chunk:
        chunk -= 1
    return jax.lax.map(
        chunk_fn, nbrs.reshape(n_pad // chunk, chunk, R)
    ).reshape(n_pad, R, d)


def _expand_kernel(ids_ref, q_ref, inline_hbm, out_ref, vmem, sems, *, R, d,
                   n_buf, block_b, metric, group, bits):
    """Grid: (B // block_b,). For each group of ``group`` queries in the
    block, DMA their rows of inline neighbor vectors HBM->VMEM (n_buf
    groups in flight), compute all group distances in one vector op.
    Grouping amortizes the per-iteration loop overhead (sem wait + address
    math + loop control) over ``group`` rows; the DMAs themselves are
    still one per row (rows are random HBM addresses).

    ``bits == 1``: inline rows and queries are packed 1-bit words (uint32,
    d == n_words); the distance is XOR + popcount hamming
    (euclidian_point.h:332-420, mips_point.h:625-700). The 32x-smaller
    inline array is the point: the kernel is DMA-issue-rate bound, so row
    bytes are nearly free, but a bit inline fits HBM at n where the int8
    inline cannot."""
    bi = pl.program_id(0)
    n_grp = block_b // group

    def dma(slot, g, j):
        return pltpu.make_async_copy(
            inline_hbm.at[ids_ref[bi * block_b + g * group + j]],
            vmem.at[slot, j] if group > 1 else vmem.at[slot],
            sems.at[slot, j] if group > 1 else sems.at[slot],
        )

    for s in range(n_buf):  # warm-up: fill the pipeline
        for j in range(group):
            dma(s, s, j).start()

    def dist_of(rows, q):
        """rows (..., R, d), q (..., 1, d) -> (..., R)."""
        if bits == 1:
            x = jnp.bitwise_xor(rows, q)
            return jnp.sum(
                jax.lax.population_count(x).astype(jnp.int32), axis=-1
            ).astype(jnp.float32)
        rows = rows.astype(jnp.float32)
        q = q.astype(jnp.float32)
        if metric is Metric.MIPS:
            return -jnp.sum(rows * q, axis=-1)
        diff = rows - q
        return jnp.sum(diff * diff, axis=-1)

    def loop(g, _):
        slot = jax.lax.rem(g, n_buf)
        for j in range(group):
            dma(slot, g, j).wait()
        rows = vmem[slot]  # (G, R, d) or (R, d)
        if group > 1:
            q = q_ref[pl.ds(g * group, group), :]
            out_ref[pl.ds(g * group, group), :] = dist_of(rows, q[:, None, :])
        else:
            out_ref[g, :] = dist_of(rows, q_ref[g, :][None, :])

        nxt = g + n_buf

        @pl.when(nxt < n_grp)
        def _():
            for j in range(group):
                dma(slot, nxt, j).start()

        return 0

    jax.lax.fori_loop(0, n_grp, loop, 0)


@functools.partial(
    jax.jit, static_argnames=("metric", "block_b", "n_buf", "interpret",
                              "group", "bits")
)
def expand_distances(
    inline: jax.Array,  # (n_pad, R, d)
    expand_ids: jax.Array,  # (B,) vertex to expand per query (clipped valid)
    queries: jax.Array,  # (B, d)
    *,
    metric: Metric,
    block_b: int = 256,
    n_buf: int = 8,
    interpret: bool = False,
    group: int = 1,
    bits: int = 32,
) -> jax.Array:
    """-> (B, R) distances from query b to the R inline neighbors of
    expand_ids[b]. Caller masks invalid slots. ``group``: rows processed
    per pipeline step (must divide block_b; amortizes loop overhead).
    ``bits=1``: packed-word hamming path (inline + queries are uint32)."""
    B0, d = queries.shape
    R = inline.shape[1]
    # the (B,) expand_ids ride in as a SCALAR PREFETCH operand, which
    # Mosaic stages through the 1 MiB SMEM: past ~256K rows the compile
    # fails ("allocation would exceed memory (size=1048576)", hit by 1M
    # build batches). Split oversized calls into row chunks.
    _SMEM_ROWS = 1 << 17
    if B0 > _SMEM_ROWS:
        outs = [
            expand_distances(
                inline, expand_ids[off:off + _SMEM_ROWS],
                queries[off:off + _SMEM_ROWS], metric=metric,
                block_b=block_b, n_buf=n_buf, interpret=interpret,
                group=group, bits=bits,
            )
            for off in range(0, B0, _SMEM_ROWS)
        ]
        return jnp.concatenate(outs, axis=0)
    # pad the batch so the query block tiles cleanly (sublane multiple of 8)
    block_b = max(8, min(block_b, ((B0 + 7) // 8) * 8))
    B = ((B0 + block_b - 1) // block_b) * block_b
    if B != B0:
        queries = jnp.pad(queries, ((0, B - B0), (0, 0)))
        expand_ids = jnp.pad(expand_ids, (0, B - B0))
    group = max(1, min(group, block_b))
    while block_b % group:
        group -= 1
    n_buf = min(n_buf, block_b // group)
    grid = (B // block_b,)
    if jax.default_backend() != "tpu":
        interpret = True  # CPU tests exercise the same kernel semantics

    kernel = functools.partial(
        _expand_kernel, R=R, d=d, n_buf=n_buf, block_b=block_b, metric=metric,
        group=group, bits=bits,
    )
    vshape = (n_buf, group, R, d) if group > 1 else (n_buf, R, d)
    sshape = (n_buf, group) if group > 1 else (n_buf,)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (block_b, d), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),  # inline stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (block_b, R), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM(vshape, inline.dtype),
                pltpu.SemaphoreType.DMA(sshape),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, R), jnp.float32),
        interpret=interpret,
    )(expand_ids, queries, inline)[:B0]


def build_inline_bits_flat(packed: jax.Array, nbrs: jax.Array) -> jax.Array:
    """(n_pad, W) packed uint32 words, (n_pad, R) -> (n_pad, rws, 128)
    uint32 flat bit-inline: neighbor r's words live at flat lanes
    [r*Wp, (r+1)*Wp) with Wp = W rounded up to a power of two (zero pad —
    XOR+popcount adds nothing for zero words).

    Why flat: Mosaic tiles the minor HBM dim to 128 lanes and rejects DMA
    row slices narrower than that ("slice shape along dimension 2 must be
    aligned to tiling (128)", v5e at W=4 for d=128). Flattening R x Wp
    words into full 128-lane rows keeps the per-vertex copy one aligned
    descriptor; the kernel reduces each Wp-lane group in place.
    Requires Wp <= 128 (d <= 4096 bits); callers fall back to the XLA
    path beyond that."""
    n_pad, R = nbrs.shape
    R8 = (R + 7) // 8 * 8
    if R8 != R:
        nbrs = jnp.pad(nbrs, ((0, 0), (0, R8 - R)))
    W = packed.shape[1]
    Wp = 1 << (W - 1).bit_length()
    assert Wp <= 128, f"flat bit inline needs <= 4096 bits (W={W})"
    flat = R8 * Wp
    rws = (flat + 127) // 128
    lanes = rws * 128

    def chunk_fn(rows):
        v = jnp.take(packed, jnp.clip(rows, 0, n_pad - 1), axis=0)
        if Wp != W:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, Wp - W)))
        v = v.reshape(v.shape[0], flat)
        if lanes != flat:
            v = jnp.pad(v, ((0, 0), (0, lanes - flat)))
        return v.reshape(v.shape[0], rws, 128)

    chunk = max(1, 2_000_000 // max(R8, 1))
    chunk = min(chunk, n_pad)
    while n_pad % chunk:
        chunk -= 1
    return jax.lax.map(
        chunk_fn, nbrs.reshape(n_pad // chunk, chunk, R8)
    ).reshape(n_pad, rws, 128)


def _expand_bits_kernel(ids_ref, q_ref, inline_hbm, out_ref, vmem, sems, *,
                        rws, Wp, n_buf, block_b, group):
    """q_ref: (block_b, rws*128) uint32 — the query's Wp words tiled across
    every lane group. out: (block_b, rws*128) f32 — lane r*Wp holds the
    hamming distance to flat neighbor r (other lanes carry partial sums
    the caller ignores)."""
    bi = pl.program_id(0)
    n_grp = block_b // group

    def dma(slot, g, j):
        return pltpu.make_async_copy(
            inline_hbm.at[ids_ref[bi * block_b + g * group + j]],
            vmem.at[slot, j], sems.at[slot, j],
        )

    for s in range(n_buf):
        for j in range(group):
            dma(s, s, j).start()

    def loop(g, _):
        slot = jax.lax.rem(g, n_buf)
        for j in range(group):
            dma(slot, g, j).wait()
        rows = vmem[slot]  # (group, rws, 128) uint32
        sl = pl.ds(g * group, group)
        q = q_ref[sl, :]  # (group, rws*128)
        for j in range(rws):
            x = jnp.bitwise_xor(rows[:, j, :], q[:, j * 128:(j + 1) * 128])
            s = jax.lax.population_count(x).astype(jnp.int32)
            sh = 1
            while sh < Wp:
                # s[l] += s[l + sh]: left-roll; group sums land on the
                # group-start lanes (r*Wp), which never wrap
                s = s + pltpu.roll(s, (128 - sh) % 128, axis=1)
                sh *= 2
            out_ref[sl, j * 128:(j + 1) * 128] = s.astype(jnp.float32)

        nxt = g + n_buf

        @pl.when(nxt < n_grp)
        def _():
            for j in range(group):
                dma(slot, nxt, j).start()

        return 0

    jax.lax.fori_loop(0, n_grp, loop, 0)


@functools.partial(
    jax.jit, static_argnames=("block_b", "n_buf", "interpret", "group")
)
def expand_bits_flat(
    inline: jax.Array,  # (n_pad, rws, 128) uint32 (build_inline_bits_flat)
    expand_ids: jax.Array,  # (B,)
    q_bits: jax.Array,  # (B, W) packed query words
    *,
    block_b: int = 256,
    n_buf: int = 8,
    interpret: bool = False,
    group: int = 4,
) -> jax.Array:
    """-> (B, R8c) hamming distances to the flat inline neighbors of
    expand_ids[b], R8c = rws*128/Wp >= R8 (tail slots garbage; callers
    mask by degree)."""
    B0, W = q_bits.shape
    rws = inline.shape[1]
    # same SMEM scalar-prefetch bound as expand_distances: chunk wide calls
    _SMEM_ROWS = 1 << 17
    if B0 > _SMEM_ROWS:
        outs = [
            expand_bits_flat(
                inline, expand_ids[off:off + _SMEM_ROWS],
                q_bits[off:off + _SMEM_ROWS], block_b=block_b,
                n_buf=n_buf, interpret=interpret, group=group,
            )
            for off in range(0, B0, _SMEM_ROWS)
        ]
        return jnp.concatenate(outs, axis=0)
    Wp = 1 << (W - 1).bit_length()
    if Wp != W:
        q_bits = jnp.pad(q_bits, ((0, 0), (0, Wp - W)))
    qt = jnp.tile(q_bits, (1, rws * (128 // Wp)))  # (B, rws*128)

    block_b = max(8, min(block_b, ((B0 + 7) // 8) * 8))
    B = ((B0 + block_b - 1) // block_b) * block_b
    if B != B0:
        qt = jnp.pad(qt, ((0, B - B0), (0, 0)))
        expand_ids = jnp.pad(expand_ids, (0, B - B0))
    # multi-word rows (rws > 1) store (group, 128) f32 slices at dynamic
    # row offset g*group with a nonzero lane offset; Mosaic requires the
    # dynamic row offset sublane-aligned ("dynamic store with unaligned
    # indices", hit by the 256-bit JL tier at 1M) — keep group a
    # multiple of 8
    group = max(8 if rws > 1 else 1, min(group, block_b))
    if rws > 1 and group % 8:
        group = ((group + 7) // 8) * 8
    while block_b % group:
        group -= 8 if rws > 1 and group > 8 else 1
    n_buf = min(n_buf, block_b // group)
    if jax.default_backend() != "tpu":
        interpret = True

    kernel = functools.partial(
        _expand_bits_kernel, rws=rws, Wp=Wp, n_buf=n_buf, block_b=block_b,
        group=group,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // block_b,),
            in_specs=[
                pl.BlockSpec((block_b, rws * 128), lambda i, ids: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((block_b, rws * 128),
                                   lambda i, ids: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((n_buf, group, rws, 128), inline.dtype),
                pltpu.SemaphoreType.DMA((n_buf, group)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, rws * 128), jnp.float32),
        interpret=interpret,
    )(expand_ids, qt, inline)
    # lane r*Wp of each rws-row holds neighbor r's distance
    return out.reshape(B, rws * 128 // Wp, Wp)[:B0, :, 0]


def expand_distances_multi(
    inline: jax.Array,
    expand_ids: jax.Array,  # (B, E)
    queries: jax.Array,  # (B, d)
    *,
    metric: Metric,
    block_b: int = 256,
    n_buf: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Multi-expand variant -> (B, E, R): E expansions per query, flattened
    through the single-expansion kernel with repeated queries."""
    B, E = expand_ids.shape
    d = queries.shape[1]
    qrep = jnp.repeat(queries, E, axis=0)  # (B*E, d)
    flat = expand_ids.reshape(B * E)
    dist = expand_distances(
        inline, flat, qrep, metric=metric, block_b=block_b, n_buf=n_buf,
        interpret=interpret,
    )
    return dist.reshape(B, E, inline.shape[1])
