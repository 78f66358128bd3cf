"""Partition rules: map param-pytree paths to PartitionSpecs.

Convention: any param whose path matches a *table rule* is row-sharded over
``model``; everything else (dense tower weights, biases, batch stats) is
replicated, with DP gradient sync handled by XLA along ``data``. Optimizer
state inherits its param's spec automatically because optax state mirrors the
param tree structure.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from esrecsys_tpu.core.mesh import MODEL_AXIS

# Default: any table-like param name is row-sharded.
DEFAULT_TABLE_PATTERNS = (r"embedding", r"_table", r"embed")


def _path_str(path: Tuple) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def partition_spec_for(
    path: Tuple, leaf: Any, table_patterns: Sequence[str] = DEFAULT_TABLE_PATTERNS
) -> P:
    name = _path_str(path).lower()
    ndim = getattr(leaf, "ndim", 0)
    if ndim >= 2 and any(re.search(pat, name) for pat in table_patterns):
        return P(MODEL_AXIS, *([None] * (ndim - 1)))
    return P()


def apply_partition_rules(
    tree: Any,
    mesh: Mesh,
    table_patterns: Sequence[str] = DEFAULT_TABLE_PATTERNS,
    constraint: bool = False,
):
    """Place (or constrain) every leaf of a pytree per the rules.

    constraint=False: device_put (for init-time placement).
    constraint=True: with_sharding_constraint (for use inside jit).
    """

    def place(path, leaf):
        spec = partition_spec_for(path, leaf, table_patterns)
        sharding = NamedSharding(mesh, spec)
        if constraint:
            return jax.lax.with_sharding_constraint(leaf, sharding)
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map_with_path(place, tree)


def sharding_tree(tree: Any, mesh: Mesh, table_patterns=DEFAULT_TABLE_PATTERNS):
    """The NamedSharding pytree for a param tree (for jit in/out_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, partition_spec_for(path, leaf, table_patterns)),
        tree,
    )
