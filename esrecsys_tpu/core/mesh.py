"""Device mesh and sharding conventions.

The whole framework runs over one 2-axis named mesh:

  * ``data``  — batch dimension of dense towers (CNNs, sequence encoders) and of
    id batches feeding embedding lookups. DP gradient sync for dense params rides
    this axis (XLA inserts the reduce-scatter/all-gather).
  * ``model`` — row dimension of sharded embedding tables
    (:class:`esrecsys_tpu.parallel.table.ShardedEmbeddingTable`) and the catalog
    dimension of sharded MIPS retrieval (:mod:`esrecsys_tpu.retrieval`).

The reference is single-device throughout — no pmap/pjit/shard_map exists there
(SURVEY.md §2.5; reference train loops e.g. train_shop_the_look.py:181,
train_spotify.py:247 use plain ``jax.jit``). This module is the net-new
TPU-native scaling layer.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def distributed_init_if_needed() -> None:
    """Initialize multi-process JAX when launched under a multi-host runtime.

    Safe no-op on a single host. The reference logs ``jax.process_index/count``
    but never initializes or branches on them (train_cooccurence.py:148-150).
    """
    try:
        if jax.process_count() > 1:
            return  # already initialized by the launcher
    except RuntimeError:
        jax.distributed.initialize()


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create the framework's ``(data, model)`` mesh.

    Args:
      n_data: size of the data axis; defaults to ``len(devices) // n_model``.
      n_model: size of the model (table-shard) axis.
      devices: devices to use; defaults to all of ``jax.devices()``.
    """
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_data is None:
        if n_dev % n_model != 0:
            raise ValueError(f"{n_dev} devices not divisible by n_model={n_model}")
        n_data = n_dev // n_model
    if n_data * n_model != n_dev:
        raise ValueError(
            f"mesh {n_data}x{n_model} != {n_dev} devices; pass matching devices"
        )
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    """A 1x1 mesh on the first device — lets every code path be mesh-shaped."""
    return make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over ``data``; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def table_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Row-shard an embedding table / catalog matrix over ``model``."""
    spec = P(MODEL_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n`` (static-shape padding)."""
    return ((n + m - 1) // m) * m


def round_up_rows(num_rows: int, mesh: Mesh) -> int:
    """Pad a table's row count so it divides evenly over the model axis."""
    return pad_to_multiple(num_rows, mesh.shape[MODEL_AXIS])


def local_batch(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data={n}")
    return global_batch // n


def shard_files_for_process(files: Sequence[str]) -> list:
    """Partition input files across hosts for per-host data loading.

    Multi-host input sharding keyed by ``jax.process_index()`` (the reference
    logs process_index but never branches on it, train_cooccurence.py:148-150).
    Deterministic: host i takes files i, i+P, i+2P, ...
    """
    p = jax.process_index()
    n = jax.process_count()
    return sorted(files)[p::n]
