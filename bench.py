"""Benchmark: Vamana build + search on synthetic SIFT-like data (real TPU).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): ParlayANN Vamana on SIFT-100K, 72 cores — 1.15M QPS
at recall@10 = 0.958, build 0.81 s. Here: clustered synthetic 100K x 128
float32 (no network egress for real SIFT), same graph parameters
(R=32, L=64, alpha=1.2, two passes), 10K queries, beam sweep; the reported
value is max batched QPS at recall@10 >= 0.95 on one chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _cluster_section(ps, Q, gt_ids, gt_dists, k, nq, rounds, log):
    """ClusterIndex builds (one per slack) + probe sweeps -> (extras
    dict, best, m). Two slacks cover the two operating regimes measured
    on v5e (BENCHES round 3): 1.5 wins the ≥.95 headline (.9655 @ 1.82M
    QPS at 3 probes), 2.0 wins the high-recall band (.9953 @ 1.03M at 8
    probes — displacement rate sets the coverage ceiling, see
    ClusterIndex.build). Falls back from f32 to int8 ext if the f32
    kernel path fails on the target (the f32 decode is newer Mosaic
    surface)."""
    import jax as _jax

    from parlayann_tpu.build.clusterindex import ClusterIndex
    from parlayann_tpu.harness.recall import compute_recall
    import time

    # ext-row layout needs m <= d and Rc <= d (id byte planes live in
    # the d-lane row) — clamp for small-dim sanity runs
    cb_m = min(int(os.environ.get("CB_M", 64)), ps.d // 8 * 8)
    cb_rc = min(16, ps.d // 8 * 8)
    cb_dt = os.environ.get("CB_DTYPE", "auto")
    slacks = [float(s) for s in
              os.environ.get("CB_SLACKS", "1.5,2.0").split(",")]
    Qd = _jax.device_put(np.asarray(Q))
    Qd.block_until_ready()

    def run(dtype, slack, m=None):
        m = m if m is not None else cb_m
        t0 = time.perf_counter()
        ci = ClusterIndex.build(ps, m=m, Rc=cb_rc, ext_dtype=dtype,
                                slack=slack)
        ci_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        ci = ClusterIndex.build(ps, m=m, Rc=cb_rc, ext_dtype=dtype,
                                slack=slack)
        ci_build = time.perf_counter() - t0
        log(f"cluster build: m={m} slack={slack} cold {ci_cold:.2f}s "
            f"steady {ci_build:.2f}s C={ci.C} ext={ci.ext_dtype}")
        # smoke the search path once before committing to the sweep
        _ = np.asarray(ci.search(Qd[:16], k=k, n_probe=4, cut=0.0)[0])
        return ci, ci_build

    cbest = (0, 0.0, 0.0)
    cluster = {"configs": []}
    # (m, slack) configs: m=64 wins the >= .95 headline; m=96 @ 4 probes
    # is the high-recall row (.9720 @ 1.31M on v5e 100K, r5 — beats the
    # 72-core baseline's .971 @ 956K at its own operating point)
    mslacks = [(cb_m, sl) for sl in slacks]
    if cb_m == 64 and ps.d >= 96 and "CB_MS" not in os.environ:
        mslacks.append((min(96, ps.d // 8 * 8), 1.5))
    elif "CB_MS" in os.environ:
        mslacks = [(int(p.split(":")[0]), float(p.split(":")[1]))
                   for p in os.environ["CB_MS"].split(",")]
    for cb_m, slack in mslacks:
        try:
            ci, ci_build = run(cb_dt, slack, cb_m)
        except Exception as e:
            if cb_dt != "int8":
                log(f"cluster ext={cb_dt} failed ({type(e).__name__}: "
                    f"{e}); retrying int8")
                ci, ci_build = run("int8", slack, cb_m)
            else:
                raise
        crows = []
        # fixed probe budgets + adaptive early-stop configs (min_probe
        # floor + centroid cut; frozen rows skip their DMA entirely)
        cfgs = [(12, 2, 1.35)]
        cfgs += [(npr, 0, 0.0) for npr in (3, 4, 6, 8, 12, 16)]
        for npr, mnp, ccut in cfgs:
            dt = float("inf")
            out_ = None
            for _ in range(3):
                t0 = time.perf_counter()
                for _r in range(rounds):
                    out_ = ci.search(Qd, k=k, n_probe=npr,
                                     min_probe=mnp, cut=ccut)
                _ = np.asarray(out_[0][:1])
                dt = min(dt, (time.perf_counter() - t0) / rounds)
            rec = compute_recall(np.asarray(out_[0]), gt_ids, gt_dists, k)
            qps = nq / dt
            tag = f"probes={npr:3d}" if not mnp else \
                f"adapt min={mnp} cut={ccut} cap={npr}"
            crows.append((f"{npr}/{mnp}/{ccut}", rec, qps))
            log(f"  [cluster s={slack}] {tag} recall={rec:.4f} "
                f"QPS={qps:,.0f}")
            if rec >= 0.95 and qps > cbest[2]:
                cbest = (f"s{slack}/{npr}/{mnp}/{ccut}", rec, qps)
            if not mnp and rec > 0.995:
                break
        cluster["configs"].append({
            "m": cb_m, "slack": slack, "C": ci.C,
            "ext_dtype": ci.ext_dtype,
            "build_time_s": round(ci_build, 2),
            "sweep": [(p, round(r, 4), round(q, 1)) for p, r, q in crows],
        })
    cluster["n_probe"] = cbest[0]
    cluster["recall"] = round(cbest[1], 4)
    cluster["qps"] = round(cbest[2], 1)
    return cluster, cbest, cb_m


def _find_real_dataset():
    """Auto-detect a real ANN benchmark on disk -> (base, queries,
    gt_ids or None, name) or None. Looked for (BENCH_DATA_DIR first):
    big-ann .fbin/.u8bin triples and TEXMEX .fvecs/.bvecs layouts —
    readers in data/io.py. No network egress exists here, but a machine
    with real SIFT/BIGANN files gets the dataset-honest headline
    automatically (VERDICT r3 #4)."""
    import glob

    roots = [os.environ.get("BENCH_DATA_DIR", "")]
    roots += ["/root/data", "/root/datasets", "./data",
              os.path.join(os.path.dirname(__file__), "bench_cache")]
    pats = [
        ("{r}/sift/sift_base.fvecs", "{r}/sift/sift_query.fvecs",
         "{r}/sift/sift_groundtruth.ivecs", "sift1m"),
        ("{r}/sift*base*.fvecs", "{r}/sift*query*.fvecs", None, "sift"),
        ("{r}/*base*.fbin", "{r}/*query*.fbin", None, "fbin"),
        ("{r}/*base*.u8bin", "{r}/*query*.u8bin", None, "u8bin"),
    ]
    for r in roots:
        if not r or not os.path.isdir(r):
            continue
        for bpat, qpat, gpat, name in pats:
            bs = sorted(glob.glob(bpat.format(r=r)))
            qs = sorted(glob.glob(qpat.format(r=r)))
            if not bs or not qs:
                continue
            from parlayann_tpu.data import io as pio

            # a malformed/partial file (e.g. truncated download) must
            # not abort the whole benchmark — fall through to the next
            # candidate / the synthetic dataset (ADVICE r4)
            try:
                X = pio.read_vecs(bs[0]) if bs[0].endswith("vecs") else \
                    pio.read_bin(bs[0], dtype=pio.infer_bin_dtype(bs[0]))
                Q = pio.read_vecs(qs[0]) if qs[0].endswith("vecs") else \
                    pio.read_bin(qs[0], dtype=pio.infer_bin_dtype(qs[0]))
                gt = None
                if gpat:
                    gs = sorted(glob.glob(gpat.format(r=r)))
                    if gs:
                        gt = pio.read_vecs(gs[0])
            except Exception as e:
                print(f"[bench] skipping unreadable dataset {bs[0]}: {e}",
                      flush=True)
                continue
            return X, Q, gt, name
    return None


def _hard_section(k, nq, rounds, log):
    """Dataset-honest extras (VERDICT r3 #4): uniform + heavy-tailed
    100K distributions, BOTH index families swept on each. On uniform
    data the IVF-family path degrades by design (clusterindex.py
    docstring) and the GRAPH path carries the result — reporting both
    keeps the headline honest about distribution sensitivity."""
    import jax as _jax

    from parlayann_tpu.types import BuildParams
    from parlayann_tpu.data.pointset import PointSet
    from parlayann_tpu.build.vamana import build_vamana_graph
    from parlayann_tpu.build.clusterindex import ClusterIndex
    from parlayann_tpu.index import Index
    from parlayann_tpu.search import exact
    from parlayann_tpu.harness.recall import compute_recall
    from parlayann_tpu.ops import quantize
    from parlayann_tpu.utils import synthetic

    n = int(os.environ.get("BENCH_HARD_N", 100_000))
    d = int(os.environ.get("BENCH_D", 128))
    out = {}
    cdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_cache")
    for name, gen in (("uniform", synthetic.uniform),
                      ("heavy_tail", synthetic.heavy_tailed)):
        X, Q = gen(n, d, n_queries=nq, seed=29)
        ps = PointSet.from_numpy(X)
        gtp = os.path.join(cdir, f"gt_{name}_{n}x{d}_{nq}.npz")
        if os.path.exists(gtp):
            z = np.load(gtp)
            gt_i, gt_d = z["ids"], z["dists"]
        else:
            gt_i, gt_d = exact.compute_groundtruth(ps, Q, 2 * k)
            gt_i, gt_d = np.asarray(gt_i), np.asarray(gt_d)
            np.savez(gtp, ids=gt_i, dists=gt_d)
        sec = {}
        # graph path (r32 quickstart config, q8 tier)
        bp = BuildParams(R=32, L=64, alpha=1.2, num_passes=2,
                         batch_cap_frac=0.16)
        bps = quantize.quantize_pointset(ps, bits=8)
        t0 = time.perf_counter()
        graph, _ = build_vamana_graph(bps, bp)
        sec["vamana_build_s"] = round(time.perf_counter() - t0, 2)
        idx = Index(points=ps, graph=graph).enable_quantized(bits=8)
        vrows = []
        vbest = (0, 0.0, 0.0)
        for beam in (10, 15, 22, 33, 50, 75, 110, 160, 240, 350):
            dt = float("inf")
            ids = None
            for _ in range(3):
                ids, _d, _r, dt_i = idx.batch_search_timed(
                    Q, k=k, beam_size=beam, rounds=rounds)
                dt = min(dt, dt_i)
            rec = compute_recall(np.asarray(ids), gt_i, gt_d, k)
            qps = nq / dt
            vrows.append((beam, round(rec, 4), round(qps, 1)))
            log(f"  [hard:{name} vamana] Q={beam} recall={rec:.4f} "
                f"QPS={qps:,.0f}")
            if rec >= 0.95 and qps > vbest[2]:
                vbest = (beam, rec, qps)
            if rec > 0.995:
                break
        sec["vamana_sweep"] = vrows
        sec["vamana_best95"] = [vbest[0], round(vbest[1], 4),
                                round(vbest[2], 1)]
        # cluster path (documented to degrade on uniform — report it)
        try:
            t0 = time.perf_counter()
            ci = ClusterIndex.build(ps, m=64)
            sec["cluster_build_s"] = round(time.perf_counter() - t0, 2)
            Qd = _jax.device_put(np.asarray(Q))
            Qd.block_until_ready()
            crows = []
            for npr in (4, 8, 16, 32):
                dt = float("inf")
                o = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _r in range(rounds):
                        o = ci.search(Qd, k=k, n_probe=npr, cut=0.0)
                    _ = np.asarray(o[0][:1])
                    dt = min(dt, (time.perf_counter() - t0) / rounds)
                rec = compute_recall(np.asarray(o[0]), gt_i, gt_d, k)
                crows.append((npr, round(rec, 4), round(nq / dt, 1)))
                log(f"  [hard:{name} cluster] probes={npr} "
                    f"recall={rec:.4f} QPS={nq/dt:,.0f}")
            sec["cluster_sweep"] = crows
        except Exception as e:
            sec["cluster_error"] = f"{type(e).__name__}: {e}"
        out[name] = sec
    return out


def main():
    import jax

    try:
        cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is best-effort
        log("compile cache unavailable:", e)

    from parlayann_tpu.types import BuildParams, Metric
    from parlayann_tpu.data.pointset import PointSet
    from parlayann_tpu.build.vamana import build_vamana_graph
    from parlayann_tpu.index import Index
    from parlayann_tpu.search import exact
    from parlayann_tpu.harness.recall import compute_recall
    from parlayann_tpu.utils import synthetic

    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 128))
    nq = int(os.environ.get("BENCH_Q", 10_000))
    k = 10

    log(f"devices: {jax.devices()}")
    real = _find_real_dataset()
    cdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_cache")
    os.makedirs(cdir, exist_ok=True)
    if real is not None:
        X, Q, gt_pre, dataset = real
        X = np.ascontiguousarray(X)
        Q = np.ascontiguousarray(Q[:nq]).astype(np.float32)
        n, d = X.shape
        nq = len(Q)
        log(f"dataset: {dataset} (REAL, {n}x{d}, {nq} queries)")
        ps = PointSet.from_numpy(X)
        gtpath = os.path.join(cdir, f"gt_{dataset}_{n}x{d}_{nq}.npz")
    else:
        dataset = "synth.clustered"
        log(f"dataset: {dataset} {n}x{d}, {nq} queries")
        X, Q = synthetic.clustered(n, d, n_queries=nq,
                                   n_clusters=max(64, n // 100),
                                   cluster_std=0.35, seed=7)
        ps = PointSet.from_numpy(X)
        gt_pre = None
        gtpath = os.path.join(cdir, f"gt_{n}x{d}_{nq}.npz")
    if gt_pre is not None:
        gt_ids = np.asarray(gt_pre)[:nq, : 2 * k]
        gt_dists = None  # tie-aware recall falls back to id matching
        log("ground truth: from dataset file")
    elif os.path.exists(gtpath):
        z = np.load(gtpath)
        gt_ids, gt_dists = z["ids"], z["dists"]
        log("ground truth: cached")
    else:
        t0 = time.perf_counter()
        gt_ids, gt_dists = exact.compute_groundtruth(ps, Q, 2 * k)
        log(f"ground truth: {time.perf_counter()-t0:.2f}s")
        np.savez(gtpath, ids=gt_ids, dists=gt_dists)

    # quickstart-parity config: full-precision build (docs/quickstart.md),
    # quantized+rerank search tier
    # build tier: q8 matches the reference's canonical SIFT config
    # (algorithms/vamana/scripts/sift: quantize_bits 8); f32 matches the
    # quickstart run the 0.81s baseline comes from
    tier = os.environ.get("BENCH_TIER", "q8")
    build_ps = ps
    if tier == "q8":
        from parlayann_tpu.ops import quantize
        build_ps = quantize.quantize_pointset(ps, bits=8)
    # batch_cap_frac 0.16 vs the reference's 0.02 (index.h:206): measured
    # same recall at every step of the 0.02->0.32 ladder (diag_build_ab)
    # and monotonically faster builds — wider batches amortize fixed
    # per-batch costs and prune each overflow target once per batch
    bp = BuildParams(R=32, L=64, alpha=1.2, num_passes=2,
                     batch_cap_frac=0.16)
    # BENCH_PROFILE=1 opts into the split-dispatch phase timers; measured
    # cost through the relay is ~0.5s/batch of pure fence latency (154s vs
    # ~20s fused on 100K), so the headline build time uses the fused path
    profile_build = os.environ.get("BENCH_PROFILE", "0") == "1"
    # first build pays remote compiles (~40s/program through the relay
    # when the persistent cache is cold); report it as cold, re-run for
    # the steady number the baseline's 0.81s is comparable to
    t0 = time.perf_counter()
    graph, stats = build_vamana_graph(build_ps, bp, verbose=False, profile=profile_build)
    build_cold = time.perf_counter() - t0
    log(f"build cold (incl. compile): {build_cold:.2f}s")
    t0 = time.perf_counter()
    graph, stats = build_vamana_graph(build_ps, bp, verbose=False, profile=profile_build)
    build_time = time.perf_counter() - t0
    avg_deg, max_deg = graph.stats()
    log(f"build: {build_time:.2f}s (kernel {stats.build_time:.2f}s), "
        f"deg {avg_deg:.2f}/{max_deg}, fallback {stats.n_fallback}, "
        f"phases beam={stats.beam_time:.2f}s bidirect={stats.bidirect_time:.2f}s "
        f"prune={stats.prune_time:.2f}s")

    phase_note = "totals (fenced split dispatches)"
    if not profile_build:
        # cheap steady-state phase split: re-run ONE max-width batch insert
        # against the final graph as three fenced dispatches (best-of-2).
        # Totals would cost ~0.5s/batch of relay fence latency; this is
        # 6 dispatches and labeled as a per-batch steady-state estimate.
        try:
            from parlayann_tpu.build.vamana import profile_one_batch

            ph = profile_one_batch(build_ps, bp, graph, repeats=2)
            stats = stats._replace(
                beam_time=ph[0], bidirect_time=ph[1], prune_time=ph[2]
            )
            phase_note = "seconds per steady-state batch (estimate)"
            log(f"steady-batch phases: beam={ph[0]:.3f}s bidirect={ph[1]:.3f}s "
                f"prune={ph[2]:.3f}s")
        except Exception as e:
            log("phase estimate failed:", e)

    # G=4 grouped-DMA expansion: ~1.5x QPS (amortizes the per-row DMA
    # issue overhead in the Pallas inline kernel over 4 queries)
    egroup = int(os.environ.get("BENCH_EXPAND_GROUP", 4))

    # sustained-throughput timing (reference time_loop parity): R
    # back-to-back searches, one fence — amortizes the relay's measured
    # ~26 ms flat dispatch+readback RTT, which a production TPU host
    # does not pay (see Index.batch_search_timed)
    rounds = int(os.environ.get("BENCH_ROUNDS", 10))

    def sweep(idx, beams, tag):
        """Beam sweep -> (best ≥.95 row or best-recall row, all rows)."""
        best = (0, 0.0, 0.0)  # (beam, recall, qps)
        rows = []
        for beam in beams:
            # keep the fastest of 3: dispatch latency through the remote
            # TPU relay is noisy (+-2x observed)
            dt = float("inf")
            for _ in range(3):
                ids, dists, res, dt_i = idx.batch_search_timed(
                    Q, k=k, beam_size=beam, two_phase=True,
                    expand_group=egroup, rounds=rounds,
                )
                dt = min(dt, dt_i)
            rec = compute_recall(np.asarray(ids), gt_ids, gt_dists, k)
            qps = nq / dt
            rows.append((beam, rec, qps))
            log(f"  [{tag}] Q={beam:4d} recall={rec:.4f} QPS={qps:,.0f} "
                f"cmps={np.asarray(res.dist_cmps).mean():.0f}")
            if rec >= 0.95 and qps > best[2]:
                best = (beam, rec, qps)
            if rec > 0.995:
                break
        if best[2] == 0.0 and rows:
            # recall target not reached: report the best-recall row so the
            # metric is never degenerate
            best = max(rows, key=lambda r: r[1])
        return best, rows

    idx = Index(points=ps, graph=graph).enable_quantized(bits=8)
    (best_beam, best_rec, best_qps), results = sweep(
        idx, [10, 12, 15, 18, 22, 27, 33, 40, 50, 65, 85, 110, 150,
              220, 320, 450], "r32",
    )

    # reference's own suggested SIFT config (algorithms/vamana/scripts/
    # sift:2-4): R=64 L=128 alpha=1.15 q8 — the denser graph needs a beam
    # ~4x narrower for the same recall, trading build time for QPS
    r64 = {}
    if os.environ.get("BENCH_R64", "1") == "1":
        bp64 = BuildParams(R=64, L=128, alpha=1.15, num_passes=2,
                           batch_cap_frac=0.16)
        t0 = time.perf_counter()
        graph64, _ = build_vamana_graph(build_ps, bp64, verbose=False)
        r64_build = time.perf_counter() - t0
        avg64, _ = graph64.stats()
        log(f"r64 build: {r64_build:.2f}s deg {avg64:.2f}")
        idx64 = Index(points=ps, graph=graph64).enable_quantized(bits=8)
        (b64, rec64, qps64), rows64 = sweep(
            idx64, [8, 10, 12, 14, 17, 20, 25, 32, 45], "r64")
        r64 = {
            "build_time_s": round(r64_build, 2),
            "avg_degree": round(avg64, 2),
            "beam": b64, "recall": round(rec64, 4), "qps": round(qps64, 1),
            "sweep": [(b, round(r, 4), round(q, 1)) for b, r, q in rows64],
        }
        # headline = best ≥.95 row across BOTH shipped configs — the R=64
        # graph is the reference's own suggested SIFT config and trades
        # ~4x build time for ~2x QPS at equal recall
        if rec64 >= 0.95 and qps64 > best_qps:
            best_beam, best_rec, best_qps = b64, rec64, qps64
            headline_cfg = "R=64 L=128 a=1.15"
        else:
            headline_cfg = "R=32 L=64 a=1.2"
    else:
        headline_cfg = "R=32 L=64 a=1.2"

    # ClusterIndex: the TPU-native two-level structure (one DMA
    # descriptor per probe scores a whole 64-point cluster). Included in
    # the headline best-of like the r64 config: the reference's headline
    # is QPS at recall, not a specific index family.
    cluster = {}
    if os.environ.get("BENCH_CLUSTER", "1") == "1":
        # fail-safe: a cluster-path failure must never lose the vamana
        # headline already measured above (one pool window is precious)
        try:
            cluster, cbest, cm = _cluster_section(
                ps, Q, gt_ids, gt_dists, k, nq, rounds, log,
            )
            if cbest[1] >= 0.95 and cbest[2] > best_qps:
                best_beam, best_rec, best_qps = cbest
                headline_cfg = f"cluster m={cm} n_probe={cbest[0]}"
        except Exception as e:
            log(f"cluster section failed: {type(e).__name__}: {e}")
            cluster = {"error": f"{type(e).__name__}: {e}"}

    # dataset-honest extras: hard distributions, both index families
    hard = {}
    if os.environ.get("BENCH_HARD", "1") == "1" and real is None:
        try:
            hard = _hard_section(k, nq, rounds, log)
        except Exception as e:
            log(f"hard-distribution section failed: {type(e).__name__}: {e}")
            hard = {"error": f"{type(e).__name__}: {e}"}

    baseline_qps = 1.15e6  # BASELINE.md: 72-core @ recall .958
    out = {
        "metric": f"vamana_qps_at_recall0.95_{'real_' + dataset if real else 'synth100k'}",
        "value": round(best_qps, 1),
        "unit": "QPS/chip",
        "vs_baseline": round(best_qps / baseline_qps, 4),
        "extras": {
            "recall": round(best_rec, 4),
            "beam": best_beam,
            "config": headline_cfg,
            "build_tier": tier,
            "build_time_s": round(build_time, 2),
            "build_cold_s": round(build_cold, 2),
            "build_vs_baseline_s": 0.81,
            "build_phases_s": {
                "beam": round(stats.beam_time, 3),
                "bidirect": round(stats.bidirect_time, 3),
                "prune": round(stats.prune_time, 3),
                "note": phase_note,
            },
            "avg_degree": round(avg_deg, 2),
            "sweep": [(b, round(r, 4), round(q, 1)) for b, r, q in results],
            "r64_config": r64,
            "cluster_config": cluster,
            "dataset": dataset,
            "hard_distributions": hard,
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
