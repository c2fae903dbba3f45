"""Nested ("3D") hash-table equivalent: build, probe, and deferred unnest.

TPU-native re-design of ``HtNested1`` (``ht_nested.hh:71-251``) and the
``AlgNestJoinBuild`` / ``AlgNestJoinProbe`` / ``AlgUnnestHt`` operators
(``algebra.hh:362-552``).

The reference's core idea (the CIDR 2022 paper): store *one* MainNode per
distinct build key with the duplicate rows in a SubNode list, so the probe walks
one node per distinct key and can emit a single *nested tuple*
``(probe_row, match_group)`` whose expansion (unnesting) is deferred
(``algebra.hh:404-473, 476-552``).

The dense equivalent:

* MainNode directory  -> sorted distinct keys + per-bucket main-chain CSR
* SubNode lists       -> contiguous ``group_rows`` runs (see ``layout.py``)
* nested tuple        -> ``(probe index, group id, hit mask)`` -- a
  :class:`NestedBatch` column triple, no pointers
* unnest              -> prefix-sum segment expansion

Counter semantics preserved exactly (``ht_nested.hh::findMainNodeByOther``,
``ht_nested.hh:354-382``):

* per probe, comparisons = 1-based position of the matching MainNode in its
  bucket's main chain, or the full main-chain length on a miss (0 if the bucket
  is empty).  Main-chain order is *first-occurrence* order: new distinct keys
  append at the chain tail (``ht_nested.hh:286-311``).
* probe ``_count`` = number of probe tuples with >= 1 match (at most one nested
  tuple per probe row, ``algebra.hh:446-458``).
* unnest ``_count`` = number of expanded output tuples; expansion order per
  group is [first-inserted row, then remaining duplicates LIFO]
  (``algebra.hh:510-541`` + head-insert in ``ht_nested.hh:398-412``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .hashing import murmur32
from .layout import I32, U32, GroupIndex, expand, key_group_index, lookup


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NestedTable:
    """Dense 3D hash-table state.

    ``main_pos_by_group[g]`` is the 0-based position of distinct key ``g`` in
    its bucket's main chain; ``bucket_main_len[b]`` the number of distinct keys
    (MainNodes) hashed to bucket ``b``.  Groups beyond ``groups.n_keys`` are
    padding.
    """

    groups: GroupIndex
    main_pos_by_group: jax.Array  # i32[n]
    bucket_main_len: jax.Array    # i32[nb]
    keys: jax.Array               # u32[n] original build key column
    num_buckets: int = field(metadata=dict(static=True), default=1)

    @property
    def size(self):
        return self.keys.shape[0]


@partial(jax.jit, static_argnames=("num_buckets",))
def build_nested(keys: jax.Array, num_buckets: int,
                 valid: jax.Array | None = None) -> NestedTable:
    """Build the 3D table from a build-side key column.

    Equivalent of scanning the build relation through ``AlgNestJoinBuild::step``
    (``algebra.hh:386-389``).  Grouping duplicates under one directory entry is
    *naturally* a sort + run-length encode on TPU -- no per-tuple chain walks.
    ``valid`` marks live rows (padded shuffle outputs / filtered batches).
    """
    keys = keys.astype(U32)
    n = keys.shape[0]

    groups = key_group_index(keys, valid)

    h_main = murmur32(groups.ukey)
    valid = groups.group_len > 0
    b_main = jnp.where(
        valid, (h_main % jnp.uint32(num_buckets)).astype(I32), num_buckets
    )

    # Main-chain CSR over buckets (padding groups counted into bin nb, dropped).
    blen_ext = jnp.bincount(b_main, length=num_buckets + 1).astype(I32)
    bucket_main_len = blen_ext[:num_buckets]
    bucket_main_start = (
        jnp.cumsum(bucket_main_len) - bucket_main_len
    ).astype(I32)

    # Main-chain position: distinct keys ordered by first occurrence within each
    # bucket (tail append, ht_nested.hh:299-308).
    gid = jnp.arange(n, dtype=I32)
    _, first_sorted, gid_sorted = lax.sort(
        (b_main, groups.first_row, gid), num_keys=2
    )
    b_resorted = b_main[gid_sorted]
    pos_sorted = jnp.arange(n, dtype=I32) - bucket_main_start[
        jnp.minimum(b_resorted, num_buckets - 1)
    ]
    main_pos_by_group = jnp.zeros(n, I32).at[gid_sorted].set(pos_sorted)

    return NestedTable(
        groups=groups,
        main_pos_by_group=main_pos_by_group,
        bucket_main_len=bucket_main_len,
        keys=keys,
        num_buckets=num_buckets,
    )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NestedBatch:
    """A batch of nested tuples: the vectorized ``(probe*, MainNode*)`` pair.

    ``probe_row[i]`` pairs with match group ``g[i]`` when ``hit[i]``; rows with
    ``hit[i] == False`` carry no nested tuple (the reference simply does not
    call ``step`` downstream for them, ``algebra.hh:451-458``).
    """

    probe_row: jax.Array   # i32[P]
    g: jax.Array           # i32[P]
    hit: jax.Array         # bool[P]
    group_len: jax.Array   # i32[P] (0 where no hit)
    num_matches: jax.Array  # i64[] probes with a match (probe op _count)
    num_cmps: jax.Array     # i64[] main-chain comparisons (numCmps)


def probe_nested(
    table: NestedTable,
    probe_keys: jax.Array,
    mask: jax.Array | None = None,
) -> NestedBatch:
    """Vectorized ``AlgNestJoinProbe`` (``algebra.hh:435-459``).

    Emits at most one nested tuple per live probe row.  Cost is independent of
    duplicates-per-key: one binary search over distinct keys plus O(1) gathers.
    """
    pk = probe_keys.astype(U32)
    h = murmur32(pk)
    b = (h % jnp.uint32(table.num_buckets)).astype(I32)

    g, hit = lookup(table.groups, pk)
    if mask is not None:
        hit = hit & mask

    cmps = jnp.where(hit, table.main_pos_by_group[g] + 1, table.bucket_main_len[b])
    if mask is not None:
        cmps = jnp.where(mask, cmps, 0)
    glen = jnp.where(hit, table.groups.group_len[g], 0)

    return NestedBatch(
        probe_row=jnp.arange(pk.shape[0], dtype=I32),
        g=g,
        hit=hit,
        group_len=glen,
        num_matches=jnp.sum(hit.astype(jnp.int64)),
        num_cmps=jnp.sum(cmps.astype(jnp.int64)),
    )


@partial(jax.jit, static_argnames=("out_size",))
def unnest(table: NestedTable, nested: NestedBatch, out_size: int):
    """Vectorized ``AlgUnnestHt`` (``algebra.hh:510-541``).

    Expands each nested tuple into one output row per duplicate of the matched
    key, in [MainNode row, then SubNodes] order.  Returns
    ``(probe_row i32[out_size], build_row i32[out_size], valid bool[out_size],
    total i64[])`` where ``total`` is the unnest operator's ``_count``.
    """
    p, within, valid, total = expand(nested.group_len, out_size)
    g = nested.g[p]
    build_row = table.groups.group_rows[table.groups.group_start[g] + within]
    probe_row = jnp.where(valid, nested.probe_row[p], -1)
    build_row = jnp.where(valid, build_row, -1)
    return probe_row, build_row, valid, total.astype(jnp.int64)
