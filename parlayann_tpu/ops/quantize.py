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
