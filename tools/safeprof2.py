"""Follow-up: which part of safe_lookup's PATCHED branch costs 8.4 ms?

tools/safeprof.py pinned the overhead to the patched-branch presence:
coverage + cond(windowed, gather) = 6.7 ms but the full safe_lookup = 15.0.
This reconstructs safe_lookup feature by feature.

Run: python tools/safeprof2.py
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
    from hashjoin3d_tpu.ops.strands_windowed import _pad_table, safe_lookup
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
        print(f"  {name:56s} {t*1e3:8.2f} ms", flush=True)
        return t

    nchunks = P // C
    cap = min(max(64, nchunks // 64), nchunks)
    print(f"  [cap={cap}]", flush=True)

    def build(patch_cap, with_scatter=True, with_gather=True,
              nested_cond=True):
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
                pos = jnp.cumsum(bad.astype(I32)) - 1
                tgt = jnp.where(bad & (pos < patch_cap), pos, patch_cap)
                bad_ids = (jnp.full(patch_cap + 1, nchunks, I32)
                           .at[tgt].set(jnp.arange(nchunks, dtype=I32),
                                        mode="drop")[:patch_cap])
                rows = (bad_ids.astype(I32)[:, None] * jnp.int32(C)
                        + jnp.arange(C, dtype=I32)[None, :])
                safe_rows = jnp.clip(rows, 0, k.shape[0] - 1)
                pkeys = k[safe_rows]
                if with_gather:
                    p_ok = (pkeys >= 0) & (pkeys < T)
                    pvals = jnp.where(p_ok, v[jnp.clip(pkeys, 0, T - 1)],
                                      jnp.uint32(0))
                else:
                    pvals = pkeys.astype(U32)
                if with_scatter:
                    return out.at[rows.reshape(-1)].set(
                        pvals.reshape(-1), mode="drop")
                return out + pvals.reshape(-1)[:1].astype(U32)

            def gather(_):
                in_r = (k >= 0) & (k < T)
                return jnp.where(in_r, v[jnp.clip(k, 0, T - 1)],
                                 jnp.uint32(0))

            if nested_cond:
                def degraded(_):
                    return lax.cond(nbad <= patch_cap, patched, gather, None)
                return lax.cond(nbad == 0, windowed, degraded, None)
            return lax.cond(nbad == 0, windowed, patched, None)
        return fn

    row("full structure (= safe_lookup, no route rec)",
        jax.jit(build(cap)), vals, sk)
    row("patched w/o inner value-gather", jax.jit(
        build(cap, with_gather=False)), vals, sk)
    row("patched w/o scatter-back", jax.jit(
        build(cap, with_scatter=False)), vals, sk)
    row("cap=64 instead of 256", jax.jit(build(64)), vals, sk)
    row("no nested cond (windowed vs patched only)", jax.jit(
        build(cap, nested_cond=False)), vals, sk)
    row("safe_lookup itself (reference)", jax.jit(
        lambda v, k: safe_lookup(v, k, W=W)), vals, sk)


if __name__ == "__main__":
    main()
