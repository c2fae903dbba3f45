"""Skew handling for distributed joins: detection + broadcast strategy.

A zipf-skewed key column routes a large fraction of rows to one shard
(BASELINE.md: the hottest chain holds 1.16M of 16.8M rows at s=1.0), blowing
the partition-exchange capacity of that shard.  Two standard remedies, both
provided here:

* :func:`detect_skew` -- host-side heavy-hitter analysis of a key column
  (sampled): the max key frequency and the implied per-shard imbalance, used
  by planners to size exchange capacities or switch strategies;
* :func:`dist_broadcast_join` -- replicate the (small) build side to every
  shard with ``all_gather`` and probe purely locally: probe rows never move,
  so probe-side skew cannot imbalance the exchange.  The classic
  broadcast-vs-partition plan choice: pick broadcast when
  ``|build| * n_shards`` fits comfortably in per-chip HBM.

Per-key replication of heavy directory entries inside the partitioned join
(the hybrid strategy) is planned on top of these primitives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import (
    build_chaining,
    build_nested,
    materialize_chaining_join,
    probe_chaining,
    probe_nested,
    unnest,
)
from ..ops.layout import I32
from .mesh import SHARD_AXIS


def detect_skew(keys, num_shards: int, sample: int = 1 << 20, seed: int = 0):
    """Host-side skew report for a key column.

    Returns a dict with the top key frequency fraction, the max/mean shard
    load ratio under hash partitioning, and a recommended strategy
    ("partition" or "broadcast").
    """
    keys = np.asarray(keys)
    n = keys.size
    if n > sample:
        idx = np.random.default_rng(seed).integers(0, n, sample)
        ks = keys[idx]
    else:
        ks = keys
    _, counts = np.unique(ks, return_counts=True)
    top_frac = counts.max() / ks.size

    from ..ops.hashing import murmur32_np
    shard = murmur32_np(murmur32_np(ks)) % np.uint32(num_shards)
    loads = np.bincount(shard, minlength=num_shards)
    imbalance = loads.max() / max(loads.mean(), 1)

    return dict(
        top_key_fraction=float(top_frac),
        shard_imbalance=float(imbalance),
        strategy="broadcast" if top_frac * num_shards > 1.0 else "partition",
    )


def suggest_capacity(n_local: int, num_shards: int, imbalance: float,
                     slack: float = 1.25) -> int:
    """Exchange capacity per (src, dst) pair covering the measured imbalance."""
    per_dst = n_local / num_shards
    return int(per_dst * max(imbalance, 1.0) * slack) + 64


def dist_broadcast_join(mesh: Mesh, num_buckets: int, out_capacity: int,
                        nested: bool = True, unique: bool = False,
                        axis: str = SHARD_AXIS):
    """Broadcast-build distributed join: build side replicated, probes local.

    ``step(build_keys, probe_keys)``: build keys sharded along ``axis`` are
    all-gathered onto every shard (one ICI ring pass), each shard builds the
    full table and probes its local probe rows -- no probe exchange, so probe
    skew is irrelevant.  Counters psum'd; result pairs in global row ids.
    """

    def step(build_keys, probe_keys):
        nb_local = build_keys.shape[0]
        np_local = probe_keys.shape[0]
        all_build = lax.all_gather(build_keys, axis, tiled=True)
        my = lax.axis_index(axis).astype(jnp.int32)
        probe_gids = my * np_local + jnp.arange(np_local, dtype=I32)

        if nested:
            table = build_nested(all_build, num_buckets)
            res = probe_nested(table, probe_keys)
            prow_l, brow_l, ovalid, total = unnest(table, res, out_capacity)
            n_out = dict(num_unnested=lax.psum(total, axis))
        else:
            table = build_chaining(all_build, num_buckets)
            res = probe_chaining(table, probe_keys, unique=unique)
            prow_l, brow_l, ovalid, total = materialize_chaining_join(
                table, res, out_capacity, unique=unique)
            n_out = dict(num_results=lax.psum(total, axis))

        probe_row = jnp.where(ovalid, probe_gids[jnp.maximum(prow_l, 0)], -1)
        build_row = jnp.where(ovalid, brow_l, -1)  # all_gather order is global
        return dict(
            num_matches=lax.psum(res.num_matches, axis),
            num_cmps=lax.psum(res.num_cmps, axis),
            probe_row=probe_row,
            build_row=build_row,
            out_valid=ovalid,
            **n_out,
        )

    specs_out = dict(
        num_matches=P(), num_cmps=P(),
        probe_row=P(axis), build_row=P(axis), out_valid=P(axis),
    )
    specs_out["num_unnested" if nested else "num_results"] = P()
    return jax.jit(shard_map(step, mesh=mesh, in_specs=(P(axis), P(axis)),
                             out_specs=specs_out))
