"""Full distributed pipeline query: filter -> 3D hash join -> hash aggregate.

The composite workload of BASELINE.json config 5: over hash-partitioned base
relations on an N-chip mesh, filter the probe side, join it against the build
side through the 3D table, and aggregate the join result by key -- all inside
one ``shard_map``-ped SPMD program:

  per shard:  filter(probe cols) -> exchange both sides by join key
              -> local 3D build+probe -> local unnest
              -> local partial aggregate by key (groups are key-partitioned by
                 the exchange, so shard-local aggregates ARE global: no second
                 exchange needed)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import build_nested, hash_aggregate, probe_nested, unnest
from .mesh import SHARD_AXIS
from .shuffle import partition_exchange


def dist_filter_join_aggregate(mesh: Mesh, num_buckets_per_shard: int,
                               build_capacity: int, probe_capacity: int,
                               out_capacity: int, predicate,
                               axis: str = SHARD_AXIS):
    """Build a jitted distributed filter->join->aggregate step.

    ``step(build_keys, build_vals, probe_keys, probe_payload) -> dict`` with
    all columns sharded along ``axis``.  ``predicate(payload) -> bool`` filters
    probe rows *before* the exchange (predicate pushdown: filtered rows are
    never shuffled).  The result aggregates ``build_vals`` over join key:
    per-key count/sum of the joined rows, plus global totals.
    """
    ns = mesh.shape[axis]

    def step(build_keys, build_vals, probe_keys, probe_payload):
        keep = predicate(probe_payload)

        bkeys, bpay, bvalid, bovf = partition_exchange(
            axis, build_keys, {"val": build_vals}, ns, build_capacity)
        table = build_nested(bkeys, num_buckets_per_shard, valid=bvalid)

        pkeys, _, pvalid, povf = partition_exchange(
            axis, probe_keys, {}, ns, probe_capacity, valid=keep)
        res = probe_nested(table, pkeys, mask=pvalid)

        prow_l, brow_l, ovalid, total = unnest(table, res, out_capacity)

        # aggregate joined build values by join key; keys are partitioned by
        # the exchange so local groups are globally complete
        # keep the key dtype: the exchange ships u64 keys intact and
        # hash_aggregate is dtype-generic -- truncating here would merge
        # distinct u64 groups
        jkeys = jnp.where(ovalid, pkeys[jnp.maximum(prow_l, 0)],
                          pkeys.dtype.type(0))
        jvals = jnp.where(ovalid, bpay["val"][jnp.maximum(brow_l, 0)], 0)
        agg = hash_aggregate(jkeys, {"v": jvals}, mask=ovalid)

        return dict(
            num_filtered=lax.psum(jnp.sum(keep.astype(jnp.int64)), axis),
            num_matches=lax.psum(res.num_matches, axis),
            num_joined=lax.psum(total, axis),
            sum_v=lax.psum(jnp.sum(jnp.where(ovalid, jvals, 0)
                                   .astype(jnp.int64)), axis),
            overflow=bovf + povf,
            group_keys=agg.keys,
            group_count=agg.count,
            group_sum=agg.sums["v"],
            n_groups=lax.psum(agg.n_keys.astype(jnp.int64), axis),
        )

    specs_in = (P(axis),) * 4
    specs_out = dict(
        num_filtered=P(), num_matches=P(), num_joined=P(), sum_v=P(),
        overflow=P(), group_keys=P(axis), group_count=P(axis),
        group_sum=P(axis), n_groups=P(),
    )
    return jax.jit(shard_map(step, mesh=mesh, in_specs=specs_in,
                             out_specs=specs_out))
