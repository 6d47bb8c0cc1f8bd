"""High-beam collapse diagnosis (VERDICT r4 weak #5 / next #5).

BENCH_r04 hard_distributions (uniform 100K): Q=110 -> 71.3K QPS but
Q=350 -> 5.0K — ~14x drop for 3.2x beam. Suspects, each isolated here on
the same uniform graph:

  A. per-step cost growth: fixed-step runs (max_steps pinned) at each Q
     with ablate=full vs dmaonly — separates phase-B algebra growth
     (O(Wb log^2 Wb) unpacked at Wb>=64) from DMA.
  B. VMEM block clamp: _auto_block shrinks block_b to 16384/max(Wb,Rp)
     (64 rows at Wb=256, 32 at Wb=512) which also collapses the DMA ring
     to n_buf = block_b/G in (2, 4); sweep explicit block_b/n_buf.
  C. step count: converged total steps per query at each Q (uniform data
     needs more hops; QPS = steps * step_cost).
  D. the XLA lock-step path (beam_search_batch, lane sorts ~free at
     hundreds wide) as an A/B at the same operating points.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_highbeam.py
Env: BENCH_N (100K), BENCH_Q (4096), QS ("110,160,240,350").
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parlayann_tpu.types import BuildParams
    from parlayann_tpu.data.pointset import PointSet
    from parlayann_tpu.build.vamana import build_vamana_graph
    from parlayann_tpu.index import Index
    from parlayann_tpu.search import exact
    from parlayann_tpu.harness.recall import compute_recall
    from parlayann_tpu.ops import quantize
    from parlayann_tpu.ops.pallas.fusedbeam import (
        build_inline_ext, beam_search_fused)
    from parlayann_tpu.utils import synthetic

    n = int(os.environ.get("BENCH_N", 100_000))
    d = 128
    nq = int(os.environ.get("BENCH_Q", 4096))
    k = 10
    qs = [int(x) for x in os.environ.get("QS", "110,160,240,350").split(",")]
    rounds = int(os.environ.get("BENCH_ROUNDS", 5))
    log(f"devices: {jax.devices()}  n={n} nq={nq}")

    X, Q = synthetic.uniform(n, d, n_queries=nq, seed=7)
    ps = PointSet.from_numpy(X)
    build_ps = quantize.quantize_pointset(ps, bits=8)
    cdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "bench_cache")
    import pickle
    gpath = os.path.join(cdir, f"hb_uniform_{n}.pkl")
    if os.path.exists(gpath):
        with open(gpath, "rb") as f:
            nbrs, degs = pickle.load(f)
        from parlayann_tpu.data.graph import GraphIndexData
        graph = GraphIndexData(neighbors=jnp.asarray(nbrs),
                               degrees=jnp.asarray(degs), n=n,
                               max_degree=nbrs.shape[1])
        log("graph: cached")
    else:
        bp = BuildParams(R=32, L=64, alpha=1.2, num_passes=2)
        t0 = time.perf_counter()
        graph, _ = build_vamana_graph(build_ps, bp)
        log(f"graph built {time.perf_counter()-t0:.1f}s")
        with open(gpath, "wb") as f:
            pickle.dump((np.asarray(graph.neighbors),
                         np.asarray(graph.degrees)), f)
    gt = os.path.join(cdir, f"hb_gt_{n}_{nq}.npz")
    if os.path.exists(gt):
        z = np.load(gt)
        gt_ids, gt_d = z["ids"], z["dists"]
    else:
        gt_ids, gt_d = exact.compute_groundtruth(ps, Q, 2 * k)
        np.savez(gt, ids=gt_ids, dists=gt_d)

    idx = Index(points=ps, graph=graph).enable_quantized(bits=8)
    Qd = jnp.asarray(Q)

    # ---- C + baseline QPS: converged runs (amortized timing) ----
    log("== converged QPS / recall / visited (the headline numbers) ==")
    for dd in ("loop", "merge"):
        os.environ["PARLAYANN_DEDUP"] = dd  # explicit arg, re-keys jit
        for L in qs:
            best = 1e9
            for r in range(3):
                ids, dists, res, dt = idx.batch_search_timed(
                    Qd, k=k, beam_size=L, rounds=rounds, warmup=(r == 0))
                best = min(best, dt)
            rec = compute_recall(np.asarray(ids), gt_ids, gt_d, k)
            nv = float(np.mean(np.asarray(res.num_visited))) if hasattr(
                res, "num_visited") else -1
            log(f"Q={L} dedup={dd}: recall={rec:.4f} QPS={nq/best:,.0f} "
                f"mean_visited={nv:.1f}")
    os.environ["PARLAYANN_DEDUP"] = "loop"

    # ---- A/B: fixed-step per-step cost via beam_search_fused ----
    tier = idx.qpoints
    ext = idx.inline_ext
    q_t = quantize.translate_query(Qd, tier).astype(jnp.float32)
    starts = jnp.zeros((1,), jnp.int32)
    log("== fixed-step per-step cost (64 steps, no ladder) ==")
    for L in qs:
        # suspects: the O(Wb)-pass loop dedup (512 passes at Q=350 vs
        # the merge mode's O(log^2) packed stages) and the VMEM block
        # clamp (block_b=16384/Wb collapses the DMA ring depth)
        for dd in ("loop", "merge"):
            for bb in (0, 128, 256):  # 0 = auto (the clamp)
                kw = dict(metric=tier.metric, n_valid=tier.n, k=k, L=L,
                          max_steps=64, compact=False,
                          ladder_spec=((1, 64),), dedup=dd)
                if bb:
                    kw["block_b"] = bb
                try:
                    t_best = 1e9
                    for r in range(3):
                        o = beam_search_fused(q_t, tier.data, ext, starts,
                                              **kw)
                        jax.block_until_ready(o[0])
                        t0 = time.perf_counter()
                        for _ in range(rounds):
                            o = beam_search_fused(q_t, tier.data, ext,
                                                  starts, **kw)
                        _ = np.asarray(o[0][:1])
                        t_best = min(t_best,
                                     (time.perf_counter() - t0) / rounds)
                    log(f"Q={L} dedup={dd} block_b={bb or 'auto'}: "
                        f"{t_best*1e3:.2f} ms"
                        f" ({t_best/64*1e6:.1f} us/step)")
                except Exception as e:
                    log(f"Q={L} dedup={dd} block_b={bb or 'auto'}: FAILED "
                        f"{type(e).__name__} {str(e)[:120]}")

    # ---- E: exact flat MXU scan — the real high-recall operating point
    # at this n (recall 1.0 by construction; if this beats every >= .95
    # graph config, the routing rule is "flat when n*d is MXU-sized") ----
    log("== exact flat scan (recall 1.0) ==")
    from parlayann_tpu.search.flat import flat_search_batch
    try:
        t_best = 1e9
        o = flat_search_batch(Qd, ps.data, k=k, metric=ps.metric, n_valid=n)
        jax.block_until_ready(o[0])
        for r in range(3):
            t0 = time.perf_counter()
            for _ in range(rounds):
                o = flat_search_batch(Qd, ps.data, k=k, metric=ps.metric,
                                      n_valid=n)
            _ = np.asarray(o[0][:1])
            t_best = min(t_best, (time.perf_counter() - t0) / rounds)
        rec = compute_recall(np.asarray(o[0]), gt_ids, gt_d, k)
        log(f"flat: recall={rec:.4f} QPS={nq/t_best:,.0f}")
    except Exception as e:
        log(f"flat: FAILED {type(e).__name__} {str(e)[:120]}")

    # ---- D: XLA lock-step path at the same operating points ----
    log("== XLA beam_search_batch A/B ==")
    from parlayann_tpu.search.beam import beam_search_batch
    for L in qs:
        try:
            t_best = 1e9
            res = beam_search_batch(
                q_t, tier.data, graph.neighbors, graph.degrees, starts,
                metric=tier.metric, n_valid=tier.n, k=k, L=L)
            jax.block_until_ready(res.beam_ids)
            for r in range(3):
                t0 = time.perf_counter()
                for _ in range(rounds):
                    res = beam_search_batch(
                        q_t, tier.data, graph.neighbors, graph.degrees,
                        starts, metric=tier.metric, n_valid=tier.n, k=k, L=L)
                _ = np.asarray(res.beam_ids[:1])
                t_best = min(t_best, (time.perf_counter() - t0) / rounds)
            rec = compute_recall(np.asarray(res.beam_ids)[:, :k], gt_ids,
                                 gt_d, k)
            log(f"Q={L} xla: recall={rec:.4f} QPS={nq/t_best:,.0f}")
        except Exception as e:
            log(f"Q={L} xla: FAILED {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
