"""Row-sharded embedding tables over the ``model`` mesh axis.

This is the tensor-parallel core the reference doesn't have (SURVEY.md §2.5):
its embedding tables live whole on one device (flax ``nn.Embed`` — e.g. the
295,861-row artist table at spotify/models.py:31, the 1+65536+500k-row token
table implied by token_dictionary.py:66-68). Here a table's rows are sharded
over ``model``; lookups and gradient scatters stay sharded.

Two lookup strategies, numerically identical:

  * ``auto``  — plain gather under ``jit``; the table carries a
    ``NamedSharding(P(model, None))`` constraint and GSPMD inserts the
    collectives. Best when XLA's choice (usually all-gather of the *ids* +
    local gather + reduce-scatter of results) is fine.
  * ``shard_map`` — explicit owner-computes: every shard masks the ids it
    owns, gathers locally, and the partial results are ``psum``-ed over
    ``model``. Communication is exactly one psum of the output block
    (B × D), independent of table size; the backward pass is the mirrored
    masked scatter-add, kept local to the owning shard. Predictable ICI
    traffic, no chance of XLA materializing a gathered table.

Padding: row counts are padded up to a multiple of the model-axis size
(ids never reference padding because vocab sizes are <= row count).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from esrecsys_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, pad_to_multiple


def init_table(
    key: jax.Array,
    num_rows: int,
    dim: int,
    mesh: Optional[Mesh] = None,
    scale: Optional[float] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Init a (padded) table, placed row-sharded on the mesh if given.

    Default init matches flax ``nn.Embed``'s variance scaling so single-chip
    training trajectories are comparable to the reference models.
    """
    n_shards = mesh.shape[MODEL_AXIS] if mesh is not None else 1
    rows = pad_to_multiple(num_rows, n_shards)
    if scale is None:
        scale = 1.0 / jnp.sqrt(dim)
    table = jax.random.normal(key, (rows, dim), dtype) * jnp.asarray(scale, dtype)
    if mesh is not None:
        table = jax.device_put(table, NamedSharding(mesh, P(MODEL_AXIS, None)))
    return table


def lookup(
    table: jax.Array,
    ids: jax.Array,
    mesh: Optional[Mesh] = None,
    strategy: str = "auto",
    ids_data_sharded: bool = True,
) -> jax.Array:
    """Gather rows ``table[ids]`` with the table row-sharded over ``model``.

    Args:
      table: (R, D) array (R divisible by the model axis when sharded).
      ids: int array of any shape; values in [0, R).
      mesh: mesh for the explicit strategy; None = single-device gather.
      strategy: "auto" (GSPMD) or "shard_map" (owner-computes + psum).
      ids_data_sharded: whether ids' leading dim is sharded over ``data``.
    """
    from esrecsys_tpu.ops import guards

    # id-range guard (ops/guards.py): the shard_map path would silently
    # return ZERO rows for out-of-range ids (no shard owns them), the auto
    # path would clamp — both mask corruption; error mode catches it
    ids = guards.check_ids(ids, table.shape[0], "sharded_table")
    if mesh is None or strategy == "auto":
        if mesh is not None:
            table = jax.lax.with_sharding_constraint(
                table, NamedSharding(mesh, P(MODEL_AXIS, None))
            )
        return jnp.take(table, ids, axis=0)
    if strategy != "shard_map":
        raise ValueError(f"unknown strategy {strategy!r}")

    id_spec = P(DATA_AXIS) if ids_data_sharded else P()
    ids_flat_shape = ids.shape

    def local_fn(table_shard: jax.Array, ids_block: jax.Array) -> jax.Array:
        rows_per_shard = table_shard.shape[0]
        shard_idx = jax.lax.axis_index(MODEL_AXIS)
        local_ids = ids_block - shard_idx * rows_per_shard
        owned = (local_ids >= 0) & (local_ids < rows_per_shard)
        safe = jnp.where(owned, local_ids, 0)
        emb = jnp.take(table_shard, safe, axis=0)
        emb = jnp.where(owned[..., None], emb, jnp.zeros_like(emb))
        return jax.lax.psum(emb, MODEL_AXIS)

    out_spec = (
        P(DATA_AXIS, *([None] * len(ids_flat_shape)))
        if ids_data_sharded
        else P(*([None] * (len(ids_flat_shape) + 1)))
    )
    # ids' leading dim sharded over data; replicated over model inside.
    in_specs = (P(MODEL_AXIS, None), id_spec)
    fn = shard_map(local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_spec)
    return fn(table, ids)


def lookup_pooled(
    table: jax.Array,
    ids: jax.Array,
    pool: str = "mean",
    mask_id: Optional[int] = 0,
    mesh: Optional[Mesh] = None,
    strategy: str = "auto",
) -> jax.Array:
    """Fused multi-id lookup + pooling: ids (..., K) → pooled (..., D).

    ``mask_id`` rows (default the reserved 0 index, token_dictionary.py:58-64)
    are excluded from the pool; an all-masked context pools to zeros.
    For the single-chip hot path a Pallas fused kernel is available in
    :mod:`esrecsys_tpu.ops.lookup` — this is the portable composition.
    """
    emb = lookup(table, ids, mesh=mesh, strategy=strategy)  # (..., K, D)
    if mask_id is None:
        valid = jnp.ones(ids.shape, dtype=emb.dtype)
    else:
        valid = (ids != mask_id).astype(emb.dtype)
    vexp = valid[..., None]
    if pool == "sum":
        return jnp.sum(emb * vexp, axis=-2)
    if pool == "mean":
        denom = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1.0)
        return jnp.sum(emb * vexp, axis=-2) / denom[..., :]
    if pool == "max":
        neg = jnp.finfo(emb.dtype).min
        masked = jnp.where(vexp > 0, emb, neg)
        out = jnp.max(masked, axis=-2)
        any_valid = jnp.sum(valid, axis=-1, keepdims=True) > 0
        return jnp.where(any_valid, out, jnp.zeros_like(out))
    raise ValueError(f"unknown pool {pool!r}")


@dataclasses.dataclass
class ShardedTable:
    """A named, row-sharded embedding table + its lookup configuration.

    Param pytrees hold plain arrays; this carries the static config
    (true vocab size vs padded rows, strategy, pooling defaults).
    """

    name: str
    num_rows: int
    dim: int
    strategy: str = "auto"

    def padded_rows(self, mesh: Optional[Mesh]) -> int:
        n = mesh.shape[MODEL_AXIS] if mesh is not None else 1
        return pad_to_multiple(self.num_rows, n)

    def init(self, key: jax.Array, mesh: Optional[Mesh] = None, dtype=jnp.float32):
        return init_table(key, self.num_rows, self.dim, mesh=mesh, dtype=dtype)

    def __call__(self, table, ids, mesh: Optional[Mesh] = None):
        return lookup(table, ids, mesh=mesh, strategy=self.strategy)

    def pooled(self, table, ids, pool="mean", mask_id=0, mesh=None):
        return lookup_pooled(
            table, ids, pool=pool, mask_id=mask_id, mesh=mesh, strategy=self.strategy
        )
