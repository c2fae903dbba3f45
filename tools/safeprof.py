"""Micro-probe: where do safe_lookup's ~8.6 ms of overhead go?

tools/csrprof.py measured safe_lookup(direct, W=8192) at 15.1 ms where the
raw windowed_lookup is 6.1 ms and the coverage reductions 0.3 ms.  This
probes each wrapper layer in isolation: the padded-table copy, the coverage
block, the lax.cond envelope, and the patched branch's presence.

Run: python tools/safeprof.py
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
    from hashjoin3d_tpu.ops.strands_windowed import safe_lookup, _pad_table
    from hashjoin3d_tpu.ops.windowed import windowed_lookup, chunk_bases
    from hashjoin3d_tpu.utils.measure import fence

    P, T = 1 << 24, 1 << 20
    W, C = 8192, 1024
    rng = np.random.default_rng(5)
    vals = jnp.asarray(rng.integers(1, 2**31, T, dtype=np.uint32))
    # segment-sorted keys, chunk 2^18 (the headline stream shape)
    pk = rng.integers(0, T, P, dtype=np.uint32)
    sk = jnp.asarray(np.sort(pk.reshape(-1, 1 << 18), axis=1)
                     .reshape(-1).astype(np.int32))
    fence((vals, sk))
    print(f"fence floor {fence_floor()*1e3:.1f} ms", flush=True)

    def row(name, fn, *xs):
        t = timeit(fn, *xs, min_time=0.4)
        print(f"  {name:52s} {t*1e3:8.2f} ms", flush=True)
        return t

    row("safe_lookup full (W=8192)", jax.jit(
        lambda v, k: safe_lookup(v, k, W=W)), vals, sk)
    row("windowed_lookup raw (W=8192)", jax.jit(
        lambda v, k: windowed_lookup(v, k, W=W)), vals, sk)

    def coverage(v, k):
        vp = _pad_table(v, W)
        k2 = k.reshape(-1, C)
        bases = chunk_bases(k, vp.shape[0], C, W)
        delta = k2 - bases[:, None]
        in_range = (k2 >= 0) & (k2 < T)
        covered = (~in_range) | ((delta >= 0) & (delta < 2 * W))
        bad = ~jnp.all(covered, axis=1)
        return jnp.sum(bad.astype(I32))
    row("coverage block alone", jax.jit(coverage), vals, sk)

    def cond_windowed(v, k):
        nbad = coverage(v, k)
        vp = _pad_table(v, W)
        return lax.cond(nbad == 0,
                        lambda _: windowed_lookup(vp, k, W=W),
                        lambda _: jnp.zeros(k.shape[0], U32), None)
    row("coverage + cond(windowed, zeros)", jax.jit(cond_windowed), vals, sk)

    def cond_windowed_gather(v, k):
        nbad = coverage(v, k)
        vp = _pad_table(v, W)

        def gat(_):
            in_r = (k >= 0) & (k < T)
            return jnp.where(in_r, v[jnp.clip(k, 0, T - 1)], jnp.uint32(0))
        return lax.cond(nbad == 0,
                        lambda _: windowed_lookup(vp, k, W=W), gat, None)
    row("coverage + cond(windowed, gather)", jax.jit(cond_windowed_gather),
        vals, sk)

    row("_pad_table alone", jax.jit(lambda v: _pad_table(v, W)), vals)

    # does the pad COPY of the padded keys matter? (n % C == 0 here: no pad)
    # try the no-cond everything-fused version
    def nocond(v, k):
        nbad = coverage(v, k)
        vp = _pad_table(v, W)
        out = windowed_lookup(vp, k, W=W)
        return jnp.where(nbad == 0, out, out)
    row("coverage + windowed, no cond", jax.jit(nocond), vals, sk)


if __name__ == "__main__":
    main()
