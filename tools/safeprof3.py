"""Third probe: binary-search the nested-cond slowdown in safe_lookup.

safeprof2: nested cond + cap=256 = 15 ms; flat cond or cap=64 = 6.7 ms;
ablating patched's gather/scatter changes nothing.  Isolate the minimal
structure that reproduces the 8.3 ms.

Run: python tools/safeprof3.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

I32, U32 = jnp.int32, jnp.uint32


def main():
    from tools.roofline import timeit, fence_floor
    from hashjoin3d_tpu.ops.strands_windowed import _pad_table
    from hashjoin3d_tpu.ops.windowed import windowed_lookup, chunk_bases
    from hashjoin3d_tpu.utils.measure import fence

    P, T = 1 << 24, 1 << 20
    W, C = 8192, 1024
    rng = np.random.default_rng(5)
    vals = jnp.asarray(rng.integers(1, 2**31, T, dtype=np.uint32))
    pk = rng.integers(0, T, P, dtype=np.uint32)
    sk = jnp.asarray(np.sort(pk.reshape(-1, 1 << 18), axis=1)
                     .reshape(-1).astype(np.int32))
    fence((vals, sk))
    print(f"fence floor {fence_floor()*1e3:.1f} ms", flush=True)

    def row(name, fn, *xs):
        t = timeit(fn, *xs, min_time=0.4)
        print(f"  {name:58s} {t*1e3:8.2f} ms", flush=True)
        return t

    nchunks = P // C

    def build(patched_body, cap):
        """nested-cond scaffold with a configurable patched body."""
        def fn(v, k):
            vp = _pad_table(v, W)
            k2 = k.reshape(-1, C)
            bases = chunk_bases(k, vp.shape[0], C, W)
            delta = k2 - bases[:, None]
            in_range = (k2 >= 0) & (k2 < T)
            covered = (~in_range) | ((delta >= 0) & (delta < 2 * W))
            bad = ~jnp.all(covered, axis=1)
            nbad = jnp.sum(bad.astype(I32))

            def windowed(_):
                return windowed_lookup(vp, k, W=W, C=C)

            def patched(_):
                out = windowed_lookup(vp, k, W=W, C=C)
                return patched_body(out, bad, v, k, cap)

            def gather(_):
                in_r = (k >= 0) & (k < T)
                return jnp.where(in_r, v[jnp.clip(k, 0, T - 1)],
                                 jnp.uint32(0))

            def degraded(_):
                return lax.cond(nbad <= cap, patched, gather, None)
            return lax.cond(nbad == 0, windowed, degraded, None)
        return fn

    def body_full(out, bad, v, k, cap):
        pos = jnp.cumsum(bad.astype(I32)) - 1
        tgt = jnp.where(bad & (pos < cap), pos, cap)
        bad_ids = (jnp.full(cap + 1, nchunks, I32)
                   .at[tgt].set(jnp.arange(nchunks, dtype=I32),
                                mode="drop")[:cap])
        rows = (bad_ids.astype(I32)[:, None] * jnp.int32(C)
                + jnp.arange(C, dtype=I32)[None, :])
        safe_rows = jnp.clip(rows, 0, k.shape[0] - 1)
        pkeys = k[safe_rows]
        p_ok = (pkeys >= 0) & (pkeys < T)
        pvals = jnp.where(p_ok, v[jnp.clip(pkeys, 0, T - 1)], jnp.uint32(0))
        return out.at[rows.reshape(-1)].set(pvals.reshape(-1), mode="drop")

    def body_trivial(out, bad, v, k, cap):
        return out

    def body_no_krows_gather(out, bad, v, k, cap):
        # rows from iota only, no k[safe_rows] gather
        pos = jnp.cumsum(bad.astype(I32)) - 1
        tgt = jnp.where(bad & (pos < cap), pos, cap)
        bad_ids = (jnp.full(cap + 1, nchunks, I32)
                   .at[tgt].set(jnp.arange(nchunks, dtype=I32),
                                mode="drop")[:cap])
        rows = (bad_ids.astype(I32)[:, None] * jnp.int32(C)
                + jnp.arange(C, dtype=I32)[None, :])
        return out.at[rows.reshape(-1)].set(
            jnp.zeros((cap * C,), U32), mode="drop")

    def body_scatter_only(out, bad, v, k, cap):
        rows = (jnp.arange(cap, dtype=I32)[:, None] * jnp.int32(C)
                + jnp.arange(C, dtype=I32)[None, :])
        return out.at[rows.reshape(-1)].set(
            jnp.zeros((cap * C,), U32), mode="drop")

    row("nested, cap=256, trivial patched body",
        jax.jit(build(body_trivial, 256)), vals, sk)
    row("nested, cap=256, full body (reference)",
        jax.jit(build(body_full, 256)), vals, sk)
    row("nested, cap=256, no k-rows gather",
        jax.jit(build(body_no_krows_gather, 256)), vals, sk)
    row("nested, cap=256, scatter only",
        jax.jit(build(body_scatter_only, 256)), vals, sk)
    row("nested, cap=128, full body",
        jax.jit(build(body_full, 128)), vals, sk)
    row("nested, cap=512, full body",
        jax.jit(build(body_full, 512)), vals, sk)


if __name__ == "__main__":
    main()
