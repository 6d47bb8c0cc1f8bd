"""A/B the packed-lane phase B on real TPU: fused_step + cluster_step
micro-timings on a random graph (semantics-free; pure step cost).

Env: PARLAYANN_PACKB / PARLAYANN_PACK_MODE set by the caller per run.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from parlayann_tpu.types import Metric
    from parlayann_tpu.ops.pallas import fusedbeam as fb

    tag = (f"PACKB={os.environ.get('PARLAYANN_PACKB', '1')} "
           f"mode={os.environ.get('PARLAYANN_PACK_MODE', 'roll')}")
    print(f"devices: {jax.devices()}  {tag}", flush=True)

    n, d, R, B = 100_000, 128, 64, 10_240
    L, k = 10, 10
    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(key):
        k1, k2, k3 = jax.random.split(key, 3)
        pts = jax.random.randint(k1, (n, d), -127, 127, jnp.int32).astype(
            jnp.int8)
        nbrs = jax.random.randint(k2, (n, R), 0, n, jnp.int32)
        q = jax.random.normal(k3, (B, d), jnp.float32) * 40.0
        return pts, nbrs, q

    pts, nbrs, q = gen(key)
    degs = jnp.full((n,), R, jnp.int32)
    inline_ext = fb.build_inline_ext(pts, nbrs, degs)
    inline_ext.block_until_ready()

    R8 = inline_ext.shape[1] - 8
    Rp, Wb = 64, 16
    import functools
    step = functools.partial(
        fb.fused_step, R8=R8, Rp=Rp, d=d, Wb=Wb, L=L, k=k, n_valid=n,
        metric=Metric.L2, cut=1.35, limit=n, block_b=512, G=16, n_buf=8,
    )
    exp = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, n, jnp.int32)
    bdist = jnp.full((B, Wb), 1e30, jnp.float32)
    bdist = bdist.at[:, 0].set(0.0)
    bpack = (jnp.arange(Wb, dtype=jnp.int32)[None, :] + n) * 2 + 1
    bpack = jnp.broadcast_to(bpack, (B, Wb))
    nv = jnp.zeros((B, 1), jnp.int32)
    cm = jnp.zeros((B, 1), jnp.int32)

    # warm
    out = step(exp, q, bdist, bpack, nv, cm, inline_ext)
    jax.block_until_ready(out)
    RND = 50
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = (exp, bdist, bpack, nv, cm)
        e = exp
        for _r in range(RND):
            bd, bp, nvv, cmm, nxt = step(e, q, bdist, bpack, nv, cm,
                                         inline_ext)
            e = jnp.where(nxt[:, 0] >= 0, nxt[:, 0], exp)
        jax.block_until_ready(e)
        best = min(best, (time.perf_counter() - t0) / RND)
    print(f"fused_step: {best*1e3:.3f} ms/step  ({tag})", flush=True)

    # cluster step
    from parlayann_tpu.ops.pallas import clusterbeam as cb
    m, Rc, C = 64, 16, 2048
    Cp = C
    ext = jax.random.randint(jax.random.PRNGKey(2), (Cp, m + Rc + 8, d),
                             -127, 127, jnp.int32).astype(jnp.int8)
    ext.block_until_ready()
    Wc, Lc, M = 16, 12, 4
    cstep = functools.partial(
        cb.cluster_step, m=m, Rc=Rc, Rcp=16, d=d, Wc=Wc, Lc=Lc, M=M, C=C,
        n_points=n, metric=Metric.L2, cut=0.0, n_probe=8, min_probe=0,
        block_b=512, G=16, n_buf=8,
    )
    cexp = jax.random.randint(jax.random.PRNGKey(3), (B,), 0, C, jnp.int32)
    cbd = jnp.full((B, Wc), 1e30, jnp.float32).at[:, 0].set(0.0)
    cbp = jnp.broadcast_to(
        (jnp.arange(Wc, dtype=jnp.int32)[None, :] + C) * 2 + 1, (B, Wc))
    pd = jnp.full((B, m * M), 1e30, jnp.float32)
    pi = jnp.full((B, m * M), -1, jnp.int32)
    out = cstep(cexp, q, cbd, cbp, pd, pi, nv, ext)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        e = cexp
        for _r in range(RND):
            _cbd, _cbp, _pd, _pi, _nv, nxt = cstep(e, q, cbd, cbp, pd, pi,
                                                   nv, ext)
            e = jnp.where(nxt[:, 0] >= 0, nxt[:, 0], cexp)
        jax.block_until_ready(e)
        best = min(best, (time.perf_counter() - t0) / RND)
    print(f"cluster_step: {best*1e3:.3f} ms/step  ({tag})", flush=True)


if __name__ == "__main__":
    main()
