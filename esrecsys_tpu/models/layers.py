"""Shared flax layers.

``TableEmbed`` is the single embedding-table layer used by every model,
replacing per-model ``nn.Embed`` instances in the reference (e.g.
wikipedia/models.py:16-19, spotify/models.py:30-31). Its param is named
``embedding`` so the default partition rules
(:mod:`esrecsys_tpu.parallel.sharding`) row-shard it over ``model``; the
lookup applies a sharding constraint so GSPMD keeps the table sharded under
jit rather than gathering it to one device.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from esrecsys_tpu.core.mesh import MODEL_AXIS, pad_to_multiple


def default_embed_init(key, shape, dtype=jnp.float32):
    """Match flax nn.Embed's default (normal, stddev=1/sqrt(features))."""
    return jax.random.normal(key, shape, dtype) / jnp.sqrt(shape[-1]).astype(dtype)


class TableEmbed(nn.Module):
    """Row-shardable embedding table.

    Attributes:
      num_embeddings: logical vocab size.
      features: embedding dim.
      mesh: if set, rows are padded to the model-axis size and the param is
        sharding-constrained to P(model, None) at every use.
      embedding_init: param initializer.
      dtype: compute dtype for lookups (params stay float32).
    """

    num_embeddings: int
    features: int
    mesh: Optional[Mesh] = None
    embedding_init: Callable = default_embed_init
    dtype = None
    rows_multiple: int = 1  # extra row-count alignment, e.g. 128//features
    # so the table admits the 128-lane packed physical layout
    # (ops/optim.pack_rows; padded rows are unreachable past the id guard)

    def setup(self):
        n_shards = self.mesh.shape[MODEL_AXIS] if self.mesh is not None else 1
        # pad ONCE to lcm(n_shards, rows_multiple): sequential padding
        # (pad-to-shards then pad-to-multiple) can break shard divisibility
        # (e.g. n_shards=3, rows_multiple=128 -> 128 rows), and lcm also
        # keeps the row count shard-INDEPENDENT whenever n_shards divides
        # rows_multiple (any power of two <= 128 for the packed layouts),
        # so sharded and unsharded states share shapes.
        rows = pad_to_multiple(
            self.num_embeddings, math.lcm(n_shards, self.rows_multiple))
        self.embedding = self.param(
            "embedding", self.embedding_init, (rows, self.features)
        )

    def _constrained(self) -> jax.Array:
        table = self.embedding
        if self.mesh is not None:
            table = jax.lax.with_sharding_constraint(
                table, NamedSharding(self.mesh, P(MODEL_AXIS, None))
            )
        return table

    def __call__(self, ids: jax.Array) -> jax.Array:
        from esrecsys_tpu.ops import guards

        ids = guards.check_ids(ids, self.num_embeddings, self.name or "embed")
        table = self._constrained()
        out = jnp.take(table, ids, axis=0)
        if self.dtype is not None:
            out = out.astype(self.dtype)
        return out

    def attend(self, query: jax.Array) -> jax.Array:
        """Scores of ``query`` (..., D) against every row: (..., rows).

        Direct matmul against the (sharded) table — unlike the reference's
        ``score_all`` which materializes the full table through an
        arange-gather (wikipedia/models.py:50-54).
        """
        table = self._constrained()
        if self.dtype is not None:
            table = table.astype(self.dtype)
            query = query.astype(self.dtype)
        return jnp.dot(query, table.T)
