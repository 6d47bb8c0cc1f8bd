"""Microbench one fused_step dispatch: full vs dmaonly ablation (real TPU).

Times N back-to-back steps with all queries active (worst case) for
several (block_b, G, n_buf) combos. Env: BENCH_N/BENCH_D, B, L, STEPS.
"""

from __future__ import annotations

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parlayann_tpu.types import Metric
    from parlayann_tpu.data.pointset import PointSet
    from parlayann_tpu.data.graph import GraphIndexData
    from parlayann_tpu.ops import quantize
    from parlayann_tpu.utils import synthetic
    from parlayann_tpu.ops.pallas.fusedbeam import (
        build_inline_ext, fused_step, _pow2,
    )

    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 128))
    B = int(os.environ.get("B", 10240))
    L = int(os.environ.get("L", 10))
    steps = int(os.environ.get("STEPS", 20))
    k = 10

    X, Q = synthetic.clustered(n, d, n_queries=B, n_clusters=max(64, n // 100),
                               cluster_std=0.35, seed=7)
    ps = PointSet.from_numpy(X)
    qps8 = quantize.quantize_pointset(ps, bits=8)
    r_fake = int(os.environ.get("R_FAKE", 0))
    if r_fake:
        rngf = np.random.default_rng(1)
        import jax.numpy as _j
        nbrs_f = _j.asarray(rngf.integers(0, n, (qps8.data.shape[0], r_fake)).astype(np.int32))
        degs_f = _j.full((qps8.data.shape[0],), r_fake, _j.int32)
        ext = build_inline_ext(qps8.data, nbrs_f, degs_f)
    else:
        gpath = os.path.join(os.path.dirname(__file__), "..", "bench_cache",
                             f"r64_{n}x{d}.graph")
        graph = GraphIndexData.load(gpath)
        ext = build_inline_ext(qps8.data, graph.neighbors, graph.degrees)
    ext.block_until_ready()

    R8 = ext.shape[1] - 8
    Rp = _pow2(R8)
    Wb = _pow2(max(L, 8))
    q_t = quantize.translate_query(jnp.asarray(Q), qps8).astype(jnp.float32)

    rng = np.random.default_rng(0)
    exp_ids = jnp.asarray(rng.integers(0, n, B).astype(np.int32))
    bdist = jnp.tile(
        jnp.linspace(10.0, 50.0, Wb, dtype=jnp.float32)[None, :], (B, 1))
    bpack = jnp.asarray(
        (rng.integers(0, n, (B, Wb)) * 2 + 1).astype(np.int32))
    nv = jnp.zeros((B, 1), jnp.int32)
    cmps = jnp.zeros((B, 1), jnp.int32)

    import functools

    combos = os.environ.get("COMBOS", "256,8,8;256,8,16;256,16,8")
    ablates = os.environ.get("ABLATES", "nocompute,dmaonly,full").split(",")
    for combo in combos.split(";"):
        block_b, G, n_buf = (int(x) for x in combo.split(","))
        for ablate in ablates:
            step = functools.partial(
                fused_step, R8=R8, Rp=Rp, d=d, Wb=Wb, L=L, k=k, n_valid=n,
                metric=Metric.L2, cut=1.35, limit=n, block_b=block_b, G=G,
                n_buf=n_buf, ablate=ablate,
            )

            @jax.jit
            def many(exp_ids, q, bd, bp, nv, cm, ext):
                def body(i, s):
                    e, bd, bp, nv, cm = s
                    bd, bp, nv, cm, nxt = step(e, q, bd, bp, nv, cm, ext)
                    # keep feeding the same ids (all active, random rows)
                    return (e, bd, bp, nv, cm)

                s = jax.lax.fori_loop(
                    0, steps, body, (exp_ids, bd, bp, nv, cm))
                return s[1]

            out = many(exp_ids, q_t, bdist, bpack, nv, cmps, ext)
            _ = np.asarray(out[:1])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = many(exp_ids, q_t, bdist, bpack, nv, cmps, ext)
                _ = np.asarray(out[:1])
                best = min(best, time.perf_counter() - t0)
            per = best / steps
            rate = B / per / 1e6
            print(f"block_b={block_b:5d} G={G} n_buf={n_buf:2d} "
                  f"{ablate:8s}: {per*1000:7.3f} ms/step "
                  f"({rate:6.2f} M rows/s)", flush=True)


if __name__ == "__main__":
    main()
