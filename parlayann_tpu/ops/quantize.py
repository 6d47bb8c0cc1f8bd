"""Scalar / bit / JL quantization.

Quantization tiers are explicit arrays + translate functions instead of the
reference's templated point types:

  * Euclidean scalar quantization (euclidian_point.h:183-235): global
    min/max -> ``slope = (2^bits - 1)/(max-min)``, ``q = round((x-min)*slope)``
    clamped. Distances in the quantized domain are a monotone (slope^2)
    rescale of true squared-L2, so ranking is preserved; rerank restores
    precision (beamSearch.h:394-454).
  * MIPS symmetric quantization (mips_point.h:322-489): per-dataset
    ``max_abs`` (optionally trimmed by quantile, ``trim``), symmetric int
    levels.
  * Bit tiers (1 bit/dim vs median, euclidian_point.h:332-420;
    sign-bit MIPS, mips_point.h:625-700) with XOR+popcount distances.
  * JL projections (jl_point.h): dense sign projection then quantize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parlayann_tpu.types import Metric
from parlayann_tpu.data.pointset import PointSet


def euclidean_params(data: jax.Array, bits: int = 8):
    """Global min/max scan (euclidian_point.h:212-235) -> (slope, offset)."""
    lo = jnp.min(data).astype(jnp.float32)
    hi = jnp.max(data).astype(jnp.float32)
    slope = (2.0**bits - 1.0) / jnp.maximum(hi - lo, 1e-30)
    return slope, lo


def euclidean_translate(x: jax.Array, slope, offset, bits: int = 8) -> jax.Array:
    """Scalar-quantize with clamping (euclidian_point.h:183-209).

    Storage deviation: the reference stores levels 0..255 as uint8; here the
    8-bit tier stores ``level - 128`` as int8 — L2 distances are differences
    so the constant shift cancels exactly, and int8 is the dtype the Pallas
    TPU expansion kernel can cast to f32 (Mosaic has no uint8->f32 cast).
    """
    maxval = 2.0**bits - 1.0
    q = jnp.round((x.astype(jnp.float32) - offset) * slope)
    q = jnp.clip(q, 0.0, maxval)
    if bits <= 8:
        return (q - 128.0).astype(jnp.int8)
    return q.astype(jnp.uint16)


def mips_params(data: jax.Array, bits: int = 8, trim: float = 0.0):
    """Symmetric scale from (optionally trimmed) max-abs
    (mips_point.h:433-489) -> (slope, offset=0)."""
    absd = jnp.abs(data.astype(jnp.float32))
    if trim > 0.0:
        max_abs = jnp.quantile(absd.reshape(-1), 1.0 - trim)
    else:
        max_abs = jnp.max(absd)
    levels = 2.0 ** (bits - 1) - 1.0
    slope = levels / jnp.maximum(max_abs, 1e-30)
    return slope, jnp.float32(0.0)


def mips_translate(x: jax.Array, slope, offset, bits: int = 8) -> jax.Array:
    levels = 2.0 ** (bits - 1) - 1.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * slope), -levels, levels)
    return q.astype(jnp.int8 if bits <= 8 else jnp.int16)


def quantize_pointset(ps: PointSet, bits: int = 8, trim: float = 0.0) -> PointSet:
    """Build a quantized tier of a PointSet (the re-quantizing PointRange
    constructor, point_range.h:55-66). Returns a new PointSet whose
    ``translate_query`` counterpart is :func:`translate_query`."""
    if ps.metric is Metric.L2:
        slope, offset = euclidean_params(ps.data, bits)
        qdata = euclidean_translate(ps.data, slope, offset, bits)
    else:
        slope, offset = mips_params(ps.data, bits, trim)
        qdata = mips_translate(ps.data, slope, offset, bits)
    return PointSet(
        data=qdata,
        n=ps.n,
        d=ps.d,
        metric=ps.metric,
        bits=bits,
        quant_slope=jnp.asarray(slope, jnp.float32),
        quant_offset=jnp.asarray(offset, jnp.float32),
    )


def translate_query(q: jax.Array, ps: PointSet) -> jax.Array:
    """Quantize queries on the fly into ``ps``'s domain
    (graph_index.cpp:144-177)."""
    if ps.bits >= 32 or ps.quant_slope is None:
        return q
    if ps.metric is Metric.L2:
        return euclidean_translate(q, ps.quant_slope, ps.quant_offset, ps.bits)
    return mips_translate(q, ps.quant_slope, ps.quant_offset, ps.bits)


# ---------------------------------------------------------------------------
# Bit tiers: 1 bit/dim packed into uint32 lanes, hamming (XOR+popcount)
# distances. Euclidean: bit = coord > per-dim median (euclidian_point.h:
# 332-420 uses the global median; per-dim is strictly more informative and
# costs the same here). MIPS: sign bit (mips_point.h:625-700).
# On TPU these tiers matter as *smaller inline arrays* (32x less DMA than
# f32); the reference's two-level filtered search (beamSearch.h:119-146)
# is subsumed by searching the cheap tier and reranking
# (beamSearch.h:394-454) — masked filtering saves nothing in batch mode.
# ---------------------------------------------------------------------------


def _pack_bits(bits: jax.Array) -> jax.Array:
    """(n, d) {0,1} -> (n, ceil(d/32)) uint32, little-endian within words."""
    n, d = bits.shape
    words = (d + 31) // 32
    pad = words * 32 - d
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    b = bits.reshape(n, words, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(b << shifts, axis=2, dtype=jnp.uint32)


def bit_quantize(ps: PointSet) -> PointSet:
    """1-bit tier of a PointSet; thresholds stored in quant_offset."""
    data = ps.data.astype(jnp.float32)
    if ps.metric is Metric.L2:
        thr = jnp.median(data[: ps.n], axis=0)  # (d,)
    else:
        thr = jnp.zeros((ps.d,), jnp.float32)  # sign bit
    packed = _pack_bits((data > thr[None, :]).astype(jnp.uint32))
    return PointSet(
        data=packed, n=ps.n, d=ps.d, metric=ps.metric, bits=1,
        quant_slope=None, quant_offset=thr,
    )


def bit_translate_query(q: jax.Array, bps: PointSet) -> jax.Array:
    thr = bps.quant_offset
    return _pack_bits((q.astype(jnp.float32) > thr[None, :]).astype(jnp.uint32))


def hamming_distance(q_bits: jax.Array, c_bits: jax.Array) -> jax.Array:
    """(B, W) vs (B, K, W) packed words -> (B, K) popcount distances."""
    x = jnp.bitwise_xor(q_bits[:, None, :], c_bits)
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)


def hamming_all_pairs(q_bits: jax.Array, p_bits: jax.Array) -> jax.Array:
    """(B, W) vs (N, W) -> (B, N)."""
    x = jnp.bitwise_xor(q_bits[:, None, :], p_bits[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss projections (jl_point.h): dense random sign
# projection to jl_dims, then 8-bit or 1-bit quantization. The reference's
# sparse variants trade matmul cost for memory traffic; on the MXU the dense
# projection is one matmul, so only the dense form is provided.
# ---------------------------------------------------------------------------


def jl_projection_matrix(d: int, jl_dims: int, seed: int = 0) -> jax.Array:
    """Dense +-1 projection (jl_point.h:22-104), scaled by 1/sqrt(jl_dims)."""
    key = jax.random.key(seed)
    signs = jax.random.rademacher(key, (d, jl_dims), dtype=jnp.float32)
    return signs / jnp.sqrt(jl_dims)


def jl_project(ps: PointSet, jl_dims: int = 64, bits: int = 8,
               seed: int = 0) -> PointSet:
    """JL tier: project then quantize (jl_point.h). ``bits``=1 gives the
    sign-bit XOR-distance variant (Mips_JL_Bit_Point, jl_point.h:108-191)."""
    P = jl_projection_matrix(ps.d, jl_dims, seed)
    proj = ps.data.astype(jnp.float32) @ P  # (n_pad, jl_dims)
    projected = PointSet(
        data=proj, n=ps.n, d=jl_dims, metric=Metric.MIPS, bits=32
    )
    out = bit_quantize(projected) if bits == 1 else quantize_pointset(
        projected, bits=bits
    )
    # remember the projection so queries can follow (seeded, regenerable)
    out.quant_offset = jnp.float32(seed) if bits != 1 else out.quant_offset
    return out
