"""Roofline microbenchmarks: what the v5e chip actually gives us per op.

Establishes the hardware (or toolchain) bound behind every number in PERF.md:

* achievable HBM bandwidth (elementwise copy on 134 MB),
* XLA's random-gather cost and its (in)dependence on table size/sortedness
  -- the evidence that ~10 ns/element is a lowering serialization, not HBM,
* sort cost (the engine's workhorse),
* the Pallas windowed lookup (ops/windowed.py) vs the XLA gather, and the
  full sorted-probe pipeline (sort + windowed lookup) vs gather-only.

Run on the real TPU:  python tools/roofline.py [--quick]
Prints a markdown table (pasted into PERF.md's roofline section).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from hashjoin3d_tpu.ops.windowed import (
    windowed_lookup, windowed_coverage_ok)
from hashjoin3d_tpu.utils.measure import fence

HBM_GBS = 819.0  # v5e HBM bandwidth (public spec: 16 GB @ 819 GB/s)


_floor_cache = {}


def fence_floor():
    """Measured cost of one fence round trip (tiny jit + device read)."""
    if "f" not in _floor_cache:
        x = jnp.zeros((8,), jnp.int32)
        fence(x)
        t0 = time.perf_counter()
        for _ in range(8):
            fence(x)
        _floor_cache["f"] = (time.perf_counter() - t0) / 8
    return _floor_cache["f"]


def timeit(fn, *args, min_time=0.5, min_repeat=4):
    """Per-dispatch time with the tunnel fence amortized out.

    Dispatches K async invocations, fences once, and reports
    (batch - fence_floor) / K -- otherwise every op measures >= the ~31 ms
    RPC round trip of this environment's remote backend and the fast ops
    (sub-ms copies) are invisible.
    """
    floor = fence_floor()
    out = fn(*args)
    fence(out)  # compile + warm
    del out

    # calibrate K from a single fenced dispatch
    t0 = time.perf_counter()
    fence(fn(*args))
    t1 = max(time.perf_counter() - t0 - floor, 1e-5)
    K = max(min_repeat, int(min_time / t1) + 1)

    t0 = time.perf_counter()
    last = None
    for _ in range(K):
        last = fn(*args)
    fence(last)
    batch = time.perf_counter() - t0
    return max(batch - floor, 1e-9) / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="0.2s min per case instead of 0.5s")
    ap.add_argument("--n", type=int, default=24, help="log2 #probes")
    ap.add_argument("--t", type=int, default=20, help="log2 table size")
    args = ap.parse_args()
    mt = 0.2 if args.quick else 0.5

    n, T = 1 << args.n, 1 << args.t
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(7)
    table_np = rng.integers(1, 2**32, T, dtype=np.uint32)
    idx_np = rng.integers(0, T, n).astype(np.int32)
    table = jnp.asarray(table_np)
    idx = jnp.asarray(idx_np)
    idx_sorted = jnp.asarray(np.sort(idx_np))
    small = jnp.asarray(table_np[:2048])
    idx_small = jnp.asarray((idx_np % 2048).astype(np.int32))

    rows = []
    print(f"fence floor (1 RPC round trip): {fence_floor()*1e3:.2f} ms",
          flush=True)

    def report(name, secs, bytes_moved=None, per_elem=n):
        ns = secs * 1e9 / per_elem
        bw = (bytes_moved / secs / 1e9) if bytes_moved else float("nan")
        sol = (bw / HBM_GBS * 100) if bytes_moved else float("nan")
        rows.append((name, secs * 1e3, ns, bw, sol))
        print(f"{name:36s} {secs*1e3:9.2f} ms  {ns:7.2f} ns/elem"
              f"  {bw:7.1f} GB/s  {sol:5.1f}% SoL", flush=True)

    copy = jax.jit(lambda x: x + jnp.uint32(1))
    report("copy 64Mi u32 (r+w)", timeit(copy, jnp.asarray(
        rng.integers(0, 2**32, 1 << 26, dtype=np.uint32)), min_time=mt),
        bytes_moved=2 * (1 << 26) * 4, per_elem=1 << 26)

    gather = jax.jit(lambda t, i: t[i])
    report(f"XLA gather {n>>20}Mi from {T>>20}Mi", timeit(
        gather, table, idx, min_time=mt), bytes_moved=n * 4)
    report("XLA gather (sorted idx)", timeit(
        gather, table, idx_sorted, min_time=mt), bytes_moved=n * 4)
    report("XLA gather (2Ki table, VMEM-size)", timeit(
        gather, small, idx_small, min_time=mt), bytes_moved=n * 4)

    upd = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32))
    scatter = jax.jit(lambda t, i, u: t.at[i].set(u, mode="drop"))
    zeros = jnp.zeros(T, jnp.int32)
    report("XLA scatter n->T i32", timeit(
        scatter, zeros, idx, upd, min_time=mt), bytes_moved=n * 4)

    # -- scans (the build pipeline's other workhorse) --------------------------
    cumsum = jax.jit(lambda x: jnp.cumsum(x))
    cummax = jax.jit(lambda x: jax.lax.cummax(x, 0))
    cummin_r = jax.jit(lambda x: jax.lax.cummin(x, 0, reverse=True))
    ones = jnp.ones(n, jnp.int32)
    report("cumsum i32", timeit(cumsum, ones, min_time=mt),
           bytes_moved=2 * n * 4)
    report("cummax i32", timeit(cummax, upd, min_time=mt),
           bytes_moved=2 * n * 4)
    report("cummin i32 (reverse)", timeit(cummin_r, upd, min_time=mt),
           bytes_moved=2 * n * 4)

    from hashjoin3d_tpu.ops.layout import run_boundaries
    rb = jax.jit(lambda k, v: run_boundaries(k, v))
    skeys = jnp.asarray(np.sort(rng.integers(0, T, n).astype(np.uint32)))
    report("run_boundaries (3 scans fused)", timeit(
        rb, skeys, jnp.int32(n), min_time=mt), bytes_moved=8 * n * 4)

    # -- inverse permutation: scatter vs sort formulation ----------------------
    perm = jnp.asarray(rng.permutation(np.arange(n, dtype=np.int32)))
    inv_scatter = jax.jit(lambda p, v: jnp.zeros(n, jnp.int32).at[p].set(v))
    inv_sort = jax.jit(
        lambda p, v: jax.lax.sort((p, v), num_keys=1)[1])
    report("inv-perm scatter n->n i32", timeit(
        inv_scatter, perm, upd, min_time=mt), bytes_moved=2 * n * 4)
    report("inv-perm 2-op sort", timeit(
        inv_sort, perm, upd, min_time=mt), bytes_moved=4 * n * 4)

    sort1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
    sort2 = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    row_ids = jnp.arange(n, dtype=jnp.int32)
    report("sort u32 (1 op)", timeit(sort1, idx.view(jnp.uint32),
                                     min_time=mt), bytes_moved=2 * n * 4)
    report("sort u32+i32 (2 op)", timeit(
        sort2, idx.view(jnp.uint32), row_ids, min_time=mt),
        bytes_moved=4 * n * 4)

    # -- Pallas windowed lookup ------------------------------------------------
    # W sweep sizes the segment-policy tradeoff (ops/sort.py): if wider
    # windows are ~free (DMA-latency-bound, not select-loop-bound), smaller
    # sort segments + W=4096/8192 lookups beat (16, 2^20) + W=2048
    for W in (1024, 2048, 4096, 8192):
        ok = bool(windowed_coverage_ok(idx_sorted, T, W=W))
        if not ok:
            print(f"windowed W={W}: coverage FAILED (spread too wide)",
                  flush=True)
            continue
        try:
            t_win = timeit(lambda t, k: windowed_lookup(t, k, W=W),
                           table, idx_sorted, min_time=mt)
        except Exception as e:  # Mosaic/toolchain failure: report, continue
            print(f"windowed W={W}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        got = np.asarray(windowed_lookup(table, idx_sorted, W=W))
        want = table_np[np.asarray(idx_sorted)]
        assert np.array_equal(got, want), f"windowed W={W} WRONG RESULTS"
        report(f"pallas windowed lookup W={W}", t_win, bytes_moved=n * 4)
        try:
            t_db = timeit(lambda t, k: windowed_lookup(t, k, W=W, db=True),
                          table, idx_sorted, min_time=mt)
            got_db = np.asarray(windowed_lookup(table, idx_sorted, W=W,
                                                db=True))
            assert np.array_equal(got_db, want), f"windowed db W={W} WRONG"
            report(f"pallas windowed db W={W}", t_db, bytes_moved=n * 4)
        except Exception as e:
            print(f"windowed db W={W}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # full sorted pipeline: sort (key,row) + windowed lookup
    @jax.jit
    def sorted_pipeline(t, k, r):
        ks, rs = jax.lax.sort((k, r), num_keys=1)
        return windowed_lookup(t, ks.view(jnp.int32)), rs

    try:
        t_pipe = timeit(sorted_pipeline, table, idx.view(jnp.uint32),
                        row_ids, min_time=mt)
        report("sort + windowed (full pipeline)", t_pipe, bytes_moved=n * 4)
    except Exception as e:
        print(f"sorted pipeline FAILED: {type(e).__name__}: {e}", flush=True)

    # u64 values as (hi, lo) u32 planes: two windowed passes over the same
    # sorted key stream (VERDICT r3 item 7; CLAUDE.md "i64 gather = exactly
    # two i32 gathers" -- the windowed twin should land at ~2x the u32 row)
    @jax.jit
    def windowed_u64_pair(thi, tlo, k):
        return windowed_lookup(thi, k), windowed_lookup(tlo, k)

    try:
        t64 = timeit(windowed_u64_pair, table, table, idx_sorted,
                     min_time=mt)
        report("pallas windowed (hi,lo) u64 value pair", t64,
               bytes_moved=2 * n * 4)
    except Exception as e:
        print(f"windowed u64 pair FAILED: {type(e).__name__}: {e}",
              flush=True)

    # -- strand-level: u64 merged vs u32 keydirect probe (n over T) -----------
    # the VERDICT r2 item-6 bar: u64 probes must run <= 2x the u32 windowed
    # strand, not fall back to the serialized gather
    from hashjoin3d_tpu.ops.nested import build_nested_host
    from hashjoin3d_tpu.ops.strands_windowed import (
        keydirect_nested_strand_sorted, merged_nested_strand_sorted)

    bk32 = rng.permutation(np.arange(T, dtype=np.uint32))
    pk32 = rng.integers(0, T, n, dtype=np.uint32)
    hi = np.uint64(0xAB) << np.uint64(40)
    bk64 = bk32.astype(np.uint64) | hi
    pk64 = pk32.astype(np.uint64) | hi
    try:
        tbl32 = build_nested_host(jnp.asarray(bk32), T, n_keys=T,
                                  key_domain=T)
        report("u32 keydirect nested strand", timeit(
            lambda t, p: keydirect_nested_strand_sorted(t, p, n),
            tbl32, jnp.asarray(pk32), min_time=mt))
        report("u32 merged nested strand", timeit(
            lambda t, p: merged_nested_strand_sorted(t, p, n),
            tbl32, jnp.asarray(pk32), min_time=mt))
        tbl64 = build_nested_host(jnp.asarray(bk64), T, n_keys=T)
        report("u64 merged nested strand", timeit(
            lambda t, p: merged_nested_strand_sorted(t, p, n),
            tbl64, jnp.asarray(pk64), min_time=mt))
    except Exception as e:
        print(f"strand rows FAILED: {type(e).__name__}: {e}", flush=True)

    print("\n| op | ms | ns/elem | GB/s | % HBM SoL |")
    print("|---|---|---|---|---|")
    for name, ms, ns, bw, sol in rows:
        print(f"| {name} | {ms:.1f} | {ns:.2f} | {bw:.1f} | {sol:.1f} |")


if __name__ == "__main__":
    main()
