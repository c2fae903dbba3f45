"""Whole-column operators: hashing, table layouts, joins, unnest, filter."""

from .hashing import murmur32, murmur32_np
from .layout import (GroupIndex, key_group_index, lookup, expand,
                     inverse_permute, set_invperm_impl, set_headcompact_impl)
from .chaining import (
    ChainingTable,
    ChainProbeResult,
    build_chaining,
    probe_chaining,
    materialize_chaining_join,
)
from .aggregate import AggregateResult, hash_aggregate
from .filter import apply_predicate, compact
from .sort import radix_partition, sort_by_key, sort_rows
from .nested import (
    NestedTable,
    NestedBatch,
    build_nested,
    probe_nested,
    unnest,
)

__all__ = [
    "murmur32",
    "murmur32_np",
    "GroupIndex",
    "key_group_index",
    "lookup",
    "expand",
    "ChainingTable",
    "ChainProbeResult",
    "build_chaining",
    "probe_chaining",
    "materialize_chaining_join",
    "NestedTable",
    "NestedBatch",
    "build_nested",
    "probe_nested",
    "unnest",
    "AggregateResult",
    "hash_aggregate",
    "apply_predicate",
    "compact",
    "radix_partition",
    "sort_by_key",
    "sort_rows",
]
