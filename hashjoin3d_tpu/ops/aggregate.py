"""Hash aggregate: vectorized group-by over key columns.

Part of the engine's operator set alongside the joins (BASELINE.json north
star).  The reference has no aggregate operator; the natural TPU design reuses
the distinct-key directory (``layout.key_group_index`` -- the same structure as
the 3D hash table's MainNode directory) and computes per-group reductions with
segment scatters, which XLA fuses with the surrounding pipeline.

Aggregates: count, sum, min, max (and mean = sum/count).  Results are padded
group-major arrays (valid prefix ``n_keys``), matching the engine's static
shape discipline.
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from .layout import GroupIndex, key_group_index


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AggregateResult:
    """Per-distinct-key aggregates; rows beyond ``n_keys`` are padding."""

    groups: GroupIndex
    count: jax.Array          # i32[n]
    sums: dict                # name -> i64[n] (or f32 for float inputs)
    mins: dict                # name -> input dtype[n]
    maxs: dict                # name -> input dtype[n]

    @property
    def keys(self):
        return self.groups.ukey

    @property
    def n_keys(self):
        return self.groups.n_keys


@jax.jit
def hash_aggregate(keys: jax.Array, values: dict,
                   mask: jax.Array | None = None) -> AggregateResult:
    """Group ``values`` columns by ``keys``; compute count/sum/min/max per key.

    ``values`` is a dict of equal-length columns.  ``mask`` excludes rows.
    One sort (the group index) + one scatter per aggregate -- no chains.
    """
    groups = key_group_index(keys, mask)
    n = keys.shape[0]
    gid = groups.gid_by_row  # -1 for masked-out rows
    tgt = jnp.where(gid >= 0, gid, n)  # park dead rows past the end

    sums, mins, maxs = {}, {}, {}
    for name, col in values.items():
        if jnp.issubdtype(col.dtype, jnp.floating):
            acc_dtype = col.dtype
            big = jnp.array(jnp.inf, col.dtype)
            small = jnp.array(-jnp.inf, col.dtype)
        else:
            acc_dtype = jnp.int64
            big = jnp.iinfo(col.dtype).max
            small = jnp.iinfo(col.dtype).min
        sums[name] = (jnp.zeros(n, acc_dtype)
                      .at[tgt].add(col.astype(acc_dtype), mode="drop"))
        mins[name] = (jnp.full(n, big, col.dtype)
                      .at[tgt].min(col, mode="drop"))
        maxs[name] = (jnp.full(n, small, col.dtype)
                      .at[tgt].max(col, mode="drop"))

    return AggregateResult(
        groups=groups,
        count=groups.group_len,
        sums=sums,
        mins=mins,
        maxs=maxs,
    )
