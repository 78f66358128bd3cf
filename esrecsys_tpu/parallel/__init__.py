"""Parallelism: row-sharded embedding tables and partition rules."""

from esrecsys_tpu.parallel.sharding import apply_partition_rules, partition_spec_for
from esrecsys_tpu.parallel.table import ShardedTable, lookup, lookup_pooled

__all__ = [
    "ShardedTable",
    "lookup",
    "lookup_pooled",
    "apply_partition_rules",
    "partition_spec_for",
]
