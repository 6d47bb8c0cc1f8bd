"""Index — the query-side handle (graph + points + quantized tiers).

Parity target: ``GraphIndex`` in python/graph_index.cpp:82-305 (load points
+ graph, build quantized side-ranges, batch_search / single_search /
check_recall) and the diskannpy-style wrappers in python/wrapper.py.

Search tiers (graph_index.cpp:86-101 builds them at load): the full-
precision PointSet plus an optional 1-byte scalar-quantized tier. When the
quantized tier is active, beam search runs on quantized inline-neighbor
vectors (4x less HBM traffic per hop) and the frontier is reranked at full
precision (beamSearch.h:394-454).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from parlayann_tpu.types import Metric, QueryParams
from parlayann_tpu.data.pointset import PointSet
from parlayann_tpu.data.graph import GraphIndexData
from parlayann_tpu.ops import quantize
from parlayann_tpu.search.beam import beam_search_batch, top_k_from_beam
from parlayann_tpu.search.rerank import rerank_topk
from parlayann_tpu.ops.distance import INF
from parlayann_tpu.utils.arrays import as_device


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("metric",))
def _entry_top1(q, evecs, eids, *, metric: Metric):
    """Exact nearest sampled point per query -> (B, 1) start ids. One
    (B, E) MXU matmul with a fused row argmin (a pure reduction, so XLA
    never materializes the tile in HBM)."""
    qf = q.astype(jnp.float32)
    ev = evecs.astype(jnp.float32)
    dot = jax.lax.dot_general(
        qf, ev, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if metric is Metric.MIPS:
        dist = -dot
    else:
        dist = jnp.sum(ev * ev, axis=1)[None, :] - 2.0 * dot
    j = jnp.argmin(dist, axis=1).astype(jnp.int32)
    return jnp.take(eids, j)[:, None]


@_partial(
    jax.jit,
    static_argnames=("metric", "tier_bits", "k", "L", "cut", "limit",
                     "n_valid", "pool", "ladder_spec", "use_entry",
                     "dedup", "fused_e"),
)
def _fused_search_1d(
    q_full, evecs, eids, starts, slope, offset, tier_data, ext,
    points_full, *, metric, tier_bits, k, L, cut, limit, n_valid, pool,
    ladder_spec, use_entry, dedup="loop", fused_e=1,
):
    """The whole fused-path search as ONE jitted program: entry top-1 (or
    caller starts) -> query translation into the tier domain -> fused
    Pallas beam -> full-precision rerank. Each extra dispatch through the
    remote TPU relay costs milliseconds of launch latency at 10K-query
    batches, so the previous entry/translate/beam/rerank chain of separate
    dispatches was ~15-20% of end-to-end search time."""
    from parlayann_tpu.ops.pallas.fusedbeam import beam_search_fused

    qf = q_full.astype(jnp.float32)
    if use_entry:
        starts = _entry_top1(qf, evecs, eids, metric=metric)
    if tier_bits >= 32 or slope is None:
        q_t = qf
    elif metric is Metric.L2:
        q_t = quantize.euclidean_translate(qf, slope, offset, tier_bits)
    else:
        q_t = quantize.mips_translate(qf, slope, offset, tier_bits)
    fid, fdist, nv, cmps, n_left = beam_search_fused(
        q_t.astype(jnp.float32), tier_data, ext, starts, metric=metric,
        n_valid=n_valid, k=k, L=L, cut=cut, limit=limit,
        ladder_spec=ladder_spec, dedup=dedup, expand=fused_e,
    )
    ids, dists = rerank_topk(
        qf, points_full, fid, k=k, pool=pool, metric=metric,
    )
    return ids, dists, nv, cmps, n_left


@dataclasses.dataclass
class Index:
    points: PointSet
    graph: GraphIndexData
    start_point: int = 0
    qpoints: Optional[PointSet] = None  # 1-byte tier (graph_index.cpp:86-101)
    # inline neighbor vectors (n, R, d) — HBM-bandwidth layout for the Pallas
    # expansion kernel; built lazily, costs R x points memory (in the tier's
    # storage dtype: uint8/int8 when quantized)
    inline: Optional[object] = None
    use_inline: bool = True
    bit_points: Optional[PointSet] = None  # packed 1-bit tier
    inline_bits: Optional[object] = None  # (n, rws, 128) flat packed-word inline
    jl_tier: Optional[object] = None  # quantize.JLTier
    t2_points: Optional[PointSet] = None  # ternary 2-bit MIPS tier
    t4_points: Optional[PointSet] = None  # packed int4 MIPS tier
    # extended inline rows (n, R8+8, d) int8 for the fully-fused beam
    # kernel (ops/pallas/fusedbeam.py): neighbor vectors + id byte planes
    inline_ext: Optional[object] = None
    use_fused: bool = True
    # sampled entry tier: per-query exact top-1 over a fixed ~4K uniform
    # sample (one fused MXU matmul+argmin, ~1 ms per 10K queries) replaces
    # the single-medoid start — the query enters the graph a few hops from
    # its target (the same economics as HNSW's upper levels, computed
    # dense). use_entry=False restores reference start semantics.
    entry_ids: Optional[object] = None
    entry_vecs: Optional[object] = None
    use_entry: bool = True
    entry_min_n: int = 20_000  # below this the medoid start is fine
    # fused-path straggler compaction ladder ((div, budget), ...) — see
    # beam_search_fused; () = the kernel's default ladder
    ladder_spec: tuple = ()
    _inline_bits_src: Optional[int] = None  # id() of inline_bits's source

    @staticmethod
    def load(
        graph_path: str,
        data_path: str,
        metric: Metric = Metric.L2,
        dtype=None,
        quantize_bits: int = 8,
        auto_tier: bool = True,
    ) -> "Index":
        ps = PointSet.from_file(data_path, dtype=dtype, metric=Metric.coerce(metric))
        g = GraphIndexData.load(graph_path)
        idx = Index(points=ps, graph=g)
        # uint8 input (BIGANN/SIFT-u8 class) also routes through the
        # q8 tier: an exact affine remap into int8 — the storage dtype
        # the Pallas kernels can cast (Mosaic has no uint8->f32 cast)
        if quantize_bits and ps.data.dtype in (jnp.float32, jnp.uint8):
            idx.qpoints = quantize.quantize_pointset(ps, bits=quantize_bits)
        if auto_tier:
            # the reference auto-builds aggressive side-tiers at load
            # (graph_index.cpp:86-101): Euclid d>800 -> JL bit tier;
            # MIPS d>200 -> 2-bit ternary tier
            if ps.metric is Metric.L2 and ps.d > 800:
                idx.enable_jl(jl_dims=1024, bits=1)
            elif ps.metric is Metric.MIPS and ps.d > 200:
                idx.enable_mips_2bit()
        return idx

    def save(self, graph_path: str) -> None:
        self.graph.save(graph_path)

    def enable_quantized(self, bits: int = 8, trim: float = 0.0) -> "Index":
        """Build the scalar-quantized search tier (graph_index.cpp:86-101)."""
        self.qpoints = quantize.quantize_pointset(self.points, bits=bits, trim=trim)
        self.inline = None  # rebuild inline in the quantized dtype
        return self

    def enable_bit_tier(self) -> "Index":
        """Build the packed 1-bit tier (Euclidean_Bit_Point /
        Mips_Bit_Point, euclidian_point.h:332-420, mips_point.h:625-700):
        beam search runs on hamming distances, rerank restores precision."""
        self.bit_points = quantize.bit_quantize(self.points)
        return self

    def enable_jl(self, jl_dims: int = 64, bits: int = 8, seed: int = 0,
                  sparse_nnz: int = 0) -> "Index":
        """Build a JL search tier (jl_point.h; graph_index.cpp:86-101):
        beam search runs on quantized random projections, rerank restores
        precision. ``bits=1`` -> sign-bit hamming variant."""
        self.jl_tier = quantize.JLTier(
            self.points, jl_dims=jl_dims, bits=bits, seed=seed,
            sparse_nnz=sparse_nnz,
        )
        return self

    def enable_mips_2bit(self) -> "Index":
        """Ternary 2-bit MIPS tier (Mips_2Bit_Point, mips_point.h:495-621)."""
        self.t2_points = quantize.mips_2bit_quantize(self.points)
        return self

    def enable_mips_4bit(self, trim: float = 0.0) -> "Index":
        """Packed int4 MIPS tier (Mips_4Bit_Point, mips_point.h:706-849)."""
        self.t4_points = quantize.mips_4bit_quantize(self.points, trim=trim)
        return self

    def build_inline_cache(self, hbm_budget_bytes: int = 6 << 30):
        """Inline neighbor vectors cost n*R*d*itemsize HBM; skip the layout
        (fall back to XLA gathers) when it would not fit the budget."""
        from parlayann_tpu.ops.pallas.expand import build_inline

        if self.inline is None and self.use_inline:
            src = self.qpoints if self.qpoints is not None else self.points
            est = (
                src.data.shape[0] * self.graph.max_degree * src.d
                * src.data.dtype.itemsize
            )
            if est > hbm_budget_bytes:
                self.use_inline = False
                return None
            self.inline = build_inline(src.data, self.graph.neighbors)
        return self.inline

    def build_inline_ext_cache(self, hbm_budget_bytes: int = 6 << 30):
        """Extended inline rows for the fused beam kernel
        (ops/pallas/fusedbeam.py). Eligibility: an int8 tier (the ext row
        stores int8 vectors) and d >= R8 (the id byte planes live in the
        vector lanes). Returns None (hybrid path) otherwise or when the
        (n, R8+8, d) layout would not fit the HBM budget."""
        from parlayann_tpu.ops.pallas.fusedbeam import build_inline_ext

        if self.inline_ext is not None:
            return self.inline_ext
        src = self.qpoints
        if src is None or not self.use_fused:
            return None
        R8 = (self.graph.max_degree + 7) // 8 * 8
        if src.d < R8 or src.data.dtype != jnp.int8:
            return None
        est = src.data.shape[0] * (R8 + 8) * src.d
        if est > hbm_budget_bytes:
            return None
        self.inline_ext = build_inline_ext(
            src.data, self.graph.neighbors, self.graph.degrees
        )
        return self.inline_ext

    def build_entry_cache(self, E: int = 4096, seed: int = 0):
        """Fixed uniform sample for the entry tier (see field docstring).
        Vectors are gathered once from the full-precision points; the
        per-search cost is one (B, E) matmul + row argmin."""
        E = min(E, self.points.n)
        if self.entry_ids is not None and self.entry_ids.shape[0] == E:
            return
        ids = np.random.default_rng(seed).choice(
            self.points.n, E, replace=False
        ).astype(np.int32)
        self.entry_ids = jnp.asarray(ids)
        self.entry_vecs = jnp.take(self.points.data, self.entry_ids, axis=0)

    def build_inline_bits_cache(self, src: PointSet):
        """Flat packed-word inline cache for the 1-bit tiers
        (n, rws, 128) uint32 — 32x smaller than the f32 inline, so it fits
        HBM at n where the scalar tiers cannot; feeds the flat popcount
        expansion kernel (build_inline_bits_flat documents why the words
        are flattened into 128-lane rows). Keyed on the source PointSet:
        the 1-bit tier and the JL sign-bit tier have different word
        widths, so a stale cache from the other tier would compute wrong
        hamming distances."""
        from parlayann_tpu.ops.pallas.expand import build_inline_bits_flat

        if self.use_inline and (
            self.inline_bits is None or self._inline_bits_src != id(src)
        ):
            self.inline_bits = build_inline_bits_flat(
                src.data, self.graph.neighbors
            )
            self._inline_bits_src = id(src)
        return self.inline_bits

    # ------------------------------------------------------------------
    def batch_search(
        self,
        queries,
        k: int = 10,
        beam_size: int = 128,
        cut: float = 1.35,
        limit: Optional[int] = None,
        degree_limit: Optional[int] = None,
        expand: int = 1,
        rerank_factor: int = 10,
        two_phase: bool = True,
        expand_group: int = 1,
        random_starts: int = 0,
        seed: int = 0,
        starts=None,
    ):
        """Search all query rows -> (ids (B,k), dists (B,k), result).

        ``starts``: optional per-query start ids, (B,) or (B, S) — used by
        layered indexes (HNSW) whose upper-level descent supplies the
        level-0 entry; takes precedence over the entry tier and
        ``start_point``.

        ``random_starts > 0``: every query starts from that many uniformly
        random vertices instead of ``start_point`` (beamSearchRandom,
        beamSearch.h:309-351 — the reference draws one). Required for
        graphs without a navigable entry, e.g. pyNNDescent's k-NN graph.

        Mirrors GraphIndex::batch_search (graph_index.cpp:192-216):
        QueryParams(k, Q, cut, visit_limit, degree_limit); runs quantized +
        rerank automatically when the quantized tier exists (the reference's
        search_dispatch, graph_index.cpp:120-190). ``rerank_factor``: the
        rerank pool is min(k*rerank_factor, beam).

        The full/q8 tier path runs as ONE fused jitted dispatch
        (search/fused.py): translate -> beam -> in-jit straggler compaction
        (``two_phase``, on by default for large batches) -> rerank. Each
        extra dispatch costs ~60 ms through the TPU relay.
        """
        qp = QueryParams(
            k=k, beamSize=beam_size, cut=cut, limit=limit, degree_limit=degree_limit
        ).resolved(self.graph.max_degree, self.points.n)
        # never round-trip device-resident queries (as_device docstring)
        q_full = as_device(queries)
        entry_start = False
        if starts is not None:
            start_arr = jnp.asarray(starts, dtype=jnp.int32)
            if start_arr.ndim == 1:
                start_arr = start_arr[:, None]
        elif random_starts > 0:
            rs = np.random.default_rng(seed).integers(
                0, self.points.n, (q_full.shape[0], random_starts)
            )
            start_arr = jnp.asarray(rs, dtype=jnp.int32)
        elif self.use_entry and self.points.n >= self.entry_min_n:
            # entry-tier start: computed lazily — the fused path folds the
            # top-1 matmul into its single dispatch (_fused_search_1d).
            # Never clobber a caller-built tier (build_entry_cache(E=64K)
            # at 10M was silently rebuilt at the 4K default here)
            if self.entry_ids is None:
                self.build_entry_cache()
            entry_start = True
            start_arr = None
        else:
            start_arr = jnp.asarray([self.start_point], dtype=jnp.int32)

        def _starts():
            nonlocal start_arr
            if start_arr is None:
                start_arr = _entry_top1(
                    q_full, self.entry_vecs, self.entry_ids,
                    metric=self.points.metric,
                )
            return start_arr
        # tier priority: 1-bit > JL > 2-bit > 4-bit > scalar-q > full.
        # Coarse tiers (bit/JL-bit/2-bit) have huge tie classes, so the
        # metric cut rule is unusable: search with k=0 (pure beam) and let
        # the mandatory rerank restore precision (beamSearch.h:394-454).
        inline = None
        if self.bit_points is not None:
            ps = self.bit_points
            q = quantize.bit_translate_query(q_full, ps)
            bits, search_k = 1, 0
            inline = self.build_inline_bits_cache(ps)
        elif self.jl_tier is not None:
            ps = self.jl_tier.points
            q = self.jl_tier.translate_query(q_full)
            bits = 1 if self.jl_tier.bits == 1 else 32
            search_k = 0 if bits == 1 else k
            if bits == 1:
                inline = self.build_inline_bits_cache(ps)
        elif self.t2_points is not None:
            ps = self.t2_points
            q = quantize.mips_2bit_translate_query(q_full, ps)
            bits, search_k = 2, 0
        elif self.t4_points is not None:
            ps = self.t4_points
            q = quantize.mips_4bit_translate_query(q_full, ps)
            bits, search_k = 4, k
        else:
            # full / q8 tier. Preferred: the fully-fused Pallas beam-step
            # kernel (one dispatch per hop, block-wide merges, straggler
            # compaction ladder — ops/pallas/fusedbeam.py); falls back to
            # the hybrid XLA+expand path when the config is ineligible
            # (no int8 tier, d < R8, multi-expand, or bit tiers).
            L = max(qp.beamSize, k)
            B = q_full.shape[0]
            # XLA pins the while-loop beam state (two (B, pow2(L)) carries)
            # in VMEM for the fused kernel; past ~10MB the step's scoped
            # VMEM allocation overflows the 16MB core limit (observed at
            # B=10240, L>=129). Large beams fall back to the hybrid path.
            _wb = 1
            while _wb < max(L, 8):
                _wb *= 2
            fused_state_ok = B * _wb * 8 <= 10 * 1024 * 1024
            ext = (
                self.build_inline_ext_cache()
                if (self.use_fused and expand == 1 and fused_state_ok
                    and qp.degree_limit >= self.graph.max_degree) else None
            )
            if ext is not None:
                from parlayann_tpu.search.fused import FusedResult

                tier = self.qpoints
                pool = min(max(k * rerank_factor, k), L)
                dummy_i = jnp.zeros((1,), jnp.int32)
                dummy_f = jnp.zeros((1, q_full.shape[1]), jnp.float32)
                ids, dists, nv, cmps, n_left = _fused_search_1d(
                    q_full,
                    self.entry_vecs if entry_start else dummy_f,
                    self.entry_ids if entry_start else dummy_i,
                    start_arr if start_arr is not None else dummy_i,
                    tier.quant_slope, tier.quant_offset, tier.data, ext,
                    self.points.data,
                    metric=tier.metric, tier_bits=tier.bits, k=k, L=L,
                    cut=qp.cut, limit=qp.limit, n_valid=tier.n, pool=pool,
                    ladder_spec=self.ladder_spec, use_entry=entry_start,
                    # resolved per CALL (not per trace): flipping the env
                    # mid-process re-keys the jit cache (ADVICE r4)
                    dedup=os.environ.get("PARLAYANN_DEDUP", "loop"),
                    # fused multi-expansion (E nearest workable per step;
                    # E>1 forces merge dedup in-kernel)
                    fused_e=int(os.environ.get("PARLAYANN_FUSED_E", "1")),
                )
                res = FusedResult(ids, dists, nv, cmps, n_left)
                return ids, dists, res

            from parlayann_tpu.search.fused import fused_search

            ps = self.qpoints if self.qpoints is not None else self.points
            inline = self.build_inline_cache() if self.use_inline else None
            use_tp = two_phase and B >= 2048 and qp.limit > 2 * L
            cw = 256
            while cw < B // 4:
                cw *= 2
            res = fused_search(
                q_full.astype(jnp.float32), ps.data, self.points.data,
                self.graph.neighbors, self.graph.degrees,
                _starts(),
                inline, ps.quant_slope, ps.quant_offset,
                metric=ps.metric, n_valid=ps.n, k=k, L=L, cut=qp.cut,
                limit=qp.limit, degree_limit=qp.degree_limit, expand=expand,
                use_inline=self.use_inline and inline is not None,
                tier_bits=ps.bits,
                t1=2 * L if use_tp else 0,
                compact_w=min(cw, B) if use_tp else 0,
                rerank_pool=min(max(k * rerank_factor, k), L),
                do_rerank=ps is not self.points,
                expand_group=expand_group,
            )
            return res.ids, res.dists, res
        L = max(qp.beamSize, k)
        B = q.shape[0]
        common = dict(
            metric=ps.metric, n_valid=ps.n, k=search_k, L=L, cut=qp.cut,
            degree_limit=qp.degree_limit, expand=expand,
            use_inline=self.use_inline and inline is not None, bits=bits,
            expand_group=expand_group,
        )
        start = _starts()
        res = beam_search_batch(
            q, ps.data, self.graph.neighbors, self.graph.degrees,
            start, None, inline, limit=qp.limit, **common,
        )
        if ps is not self.points:
            pool = min(max(k * rerank_factor, k), L)
            ids, dists = rerank_topk(
                q_full.astype(jnp.float32), self.points.data, res.beam_ids,
                k=k, pool=pool, metric=self.points.metric,
            )
        else:
            ids, dists = top_k_from_beam(res, k)
        return ids, dists, res

    def batch_search_timed(self, queries, warmup: bool = True,
                           rounds: int = 1, **kw):
        """Timed steady-state search (compile + host->device query upload
        excluded, matching the reference's query-only timer,
        check_nn_recall.h:41-50) -> (ids, dists, res, seconds-per-round).

        ``rounds``: back-to-back searches with ONE final fence, like the
        reference's time_loop (parse_results.h) — the per-round time then
        reflects sustained device throughput. This matters enormously in
        this dev environment: the TPU sits behind a relay whose
        dispatch+readback round trip is a measured ~26 ms FLAT (a trivial
        add pays the same), while e.g. the full flat scan's device time is
        ~2 ms. Enqueues are async (~0.3 ms), so R rounds + one fence pays
        the RTT once. On a production TPU host the RTT is microseconds and
        rounds=1 measures the same thing."""
        queries = as_device(queries)
        queries.block_until_ready()
        if warmup:
            out = self.batch_search(queries, **kw)
            _ = np.asarray(out[0][:1])  # readback fence
        t0 = time.perf_counter()
        out = None
        for _ in range(rounds):
            out = self.batch_search(queries, **kw)
        # fence with a tiny host readback: block_until_ready has been
        # observed to return early through the remote TPU relay
        _ = np.asarray(out[0][:1])
        dt = (time.perf_counter() - t0) / rounds
        return (*out, dt)

    def batch_search_from_string(self, queries: bytes, k: int = 10,
                                 beam_size: int = 128,
                                 visit_limit: Optional[int] = None, **kw):
        """Search queries given as a big-ann ``.bin`` byte string
        ([u32 n][u32 d] + rows), the zero-copy convenience of
        GraphIndex::batch_search_from_string (graph_index.cpp:236-257).
        Returns (ids (n, k), dists (n, k))."""
        hdr = np.frombuffer(queries, dtype=np.uint32, count=2)
        n, d = int(hdr[0]), int(hdr[1])
        if d != self.points.d:
            raise ValueError(
                f"query dim {d} != index dim {self.points.d}"
            )
        itemsize = (len(queries) - 8) // max(n * d, 1)
        if itemsize == 1:
            # 1-byte payloads decode in the index's own dtype: an i8bin
            # query parsed as uint8 corrupts every negative component
            dt = (np.int8 if self.points.data.dtype == jnp.int8
                  else np.uint8)
        else:
            dt = np.float32
        q = np.frombuffer(queries, dtype=dt, offset=8,
                          count=n * d).reshape(n, d)
        ids, dists, _ = self.batch_search(
            q.astype(np.float32), k=k, beam_size=beam_size,
            limit=visit_limit, **kw,
        )
        return np.asarray(ids), np.asarray(dists)

    def single_search(self, query, k: int = 10, beam_size: int = 128, **kw):
        ids, dists, _ = self.batch_search(
            np.asarray(query)[None, :], k=k, beam_size=beam_size, **kw
        )
        return np.asarray(ids[0]), np.asarray(dists[0])

    def check_recall(self, queries, gt_ids, gt_dists=None, k: int = 10,
                     beam_size: int = 64, **kw):
        """Search + tie-aware recall (GraphIndex::check_recall,
        graph_index.cpp:259-305)."""
        from parlayann_tpu.harness.recall import compute_recall

        ids, _, _ = self.batch_search(queries, k=k, beam_size=beam_size, **kw)
        return compute_recall(np.asarray(ids), np.asarray(gt_ids),
                              None if gt_dists is None else np.asarray(gt_dists), k)
