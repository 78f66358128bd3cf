"""Device mesh and sharding conventions.

The whole framework runs over one 2-axis named mesh:

  * ``data``  — batch dimension of dense towers (CNNs, sequence encoders) and of
    id batches feeding embedding lookups. DP gradient sync for dense params rides
    this axis (XLA inserts the reduce-scatter/all-gather).
  * ``model`` — row dimension of sharded embedding tables
    (:class:`esrecsys_tpu.parallel.table.ShardedTable`) and the catalog
    dimension of sharded MIPS retrieval (:mod:`esrecsys_tpu.retrieval`).

The reference is single-device throughout — no pmap/pjit/shard_map exists there
(SURVEY.md §2.5; reference train loops e.g. train_shop_the_look.py:181,
train_spotify.py:247 use plain ``jax.jit``). This module is the net-new
TPU-native scaling layer.
"""

from __future__ import annotations

import logging
import math
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def _distributed_initialized() -> bool:
    try:
        return bool(jax.distributed.is_initialized())
    except AttributeError:  # older jax: peek at the client singleton
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None


def distributed_init_if_needed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-process JAX when multi-host coordinates are present.

    Called from every workload's ``train()``. Coordinates come from explicit
    args or the standard env vars (``JAX_COORDINATOR_ADDRESS`` /
    ``COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``); with
    none present this is a safe single-host no-op. Returns True when running
    multi-process after the call.

    The reference logs ``jax.process_index/count`` but never initializes or
    branches on them (train_cooccurence.py:148-150); this plus
    :func:`shard_files_for_process` is the live multi-host path it lacks.
    """
    if _distributed_initialized():
        return jax.process_count() > 1
    env = os.environ
    addr = (coordinator_address or env.get("JAX_COORDINATOR_ADDRESS")
            or env.get("COORDINATOR_ADDRESS"))
    nproc = num_processes if num_processes is not None else env.get("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else env.get("JAX_PROCESS_ID")
    if addr is None and nproc is None and pid is None:
        return False  # no coordinates: plain single-process run
    if addr is None or nproc is None:
        raise ValueError(
            "partial multi-host coordinates: need both "
            "JAX_COORDINATOR_ADDRESS and JAX_NUM_PROCESSES "
            f"(got coordinator_address={addr!r}, num_processes={nproc!r}, "
            f"process_id={pid!r})")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(nproc) if nproc is not None else None,
        process_id=int(pid) if pid is not None else None,
    )
    log.info("jax.distributed initialized: process %d/%d",
             jax.process_index(), jax.process_count())
    return jax.process_count() > 1


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
    warn_if_model_axis_spans_slices(dev_array)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def warn_if_model_axis_spans_slices(dev_array) -> bool:
    """Warn loudly when the ``model`` axis would cross slice boundaries.

    The framework's collectives on ``model`` (all-to-all for sharded-table
    lookups, the all-gather candidate exchange of sharded MIPS/eval) are
    per-step and latency-sensitive; the HLO collective accounting
    (tools/scaling_study.py --mode hlo, parity_runs/r4_scaling_hlo.json)
    measured 0.47-0.57 scaling efficiency when they ride DCN vs >=0.98 on
    ICI. On a multi-slice topology the ``model`` axis must therefore stay
    intra-slice: put ``data`` (whose gradient all-reduce amortizes over the
    step) across slices instead, i.e. order devices so each data row's
    model group shares one ``slice_index``.

    Returns True when a warning fired (the hazard exists). Non-TPU devices
    (no ``slice_index``) and single-slice topologies are silent.
    """
    rows_spanning = 0
    for row in np.atleast_2d(dev_array):
        slices = {getattr(d, "slice_index", None) for d in row}
        slices.discard(None)
        if len(slices) > 1:
            rows_spanning += 1
    if rows_spanning:
        log.warning(
            "model axis spans slice boundaries on %d/%d data rows — its "
            "per-step collectives (table all-to-all, candidate all-gather) "
            "would ride DCN at a measured 0.47-0.57 efficiency vs >=0.98 "
            "on ICI (parity_runs/r4_scaling_hlo.json). Reorder devices so "
            "each model group stays within one slice; span slices with "
            "the data axis instead.",
            rows_spanning, np.atleast_2d(dev_array).shape[0])
    return bool(rows_spanning)


def make_mesh_for_batch(global_batch: int, n_model: int = 1) -> Mesh:
    """A ``(data, model)`` mesh whose data axis evenly divides the batch.

    ``data = gcd(devices // n_model, global_batch)`` — uses fewer devices
    than available when the batch is small rather than failing placement
    (e.g. debug runs with batch 4 on an 8-device host). Production configs
    should pick batch sizes divisible by the device count to use everything.
    """
    avail = len(jax.devices())
    if avail % n_model:
        raise ValueError(f"{avail} devices not divisible by n_model={n_model}")
    n_data = math.gcd(avail // n_model, max(1, global_batch))
    if jax.process_count() > 1 and n_data * n_model != avail:
        # shrinking the mesh would drop whole hosts' devices and break
        # global-batch assembly; multi-host runs must pick a batch size
        # divisible by the device count
        raise ValueError(
            f"global batch {global_batch} does not divide over "
            f"{avail} devices x {jax.process_count()} processes; "
            f"choose a batch divisible by {avail // n_model}")
    return make_mesh(n_data=n_data, n_model=n_model,
                     devices=jax.devices()[: n_data * n_model])


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


def process_local_files(files: Sequence[str]) -> list:
    """:func:`shard_files_for_process` with a starvation guard.

    Every input pipeline routes its globbed file list through here: on a
    single process it is the identity, under multi-process each host reads
    its deterministic slice. A host whose slice is empty (fewer files than
    processes) falls back to ALL files so training can proceed — per-host
    seeds keep the duplication from producing identical batch streams; the
    warning tells the operator to re-shard the dataset.
    """
    mine = shard_files_for_process(files)
    if not mine and files:
        log.warning(
            "process %d/%d got 0 of %d input files — falling back to all "
            "files on this host; write >= process_count shards to fix",
            jax.process_index(), jax.process_count(), len(files))
        return sorted(files)
    return mine


def process_local_slice(items: Sequence) -> list:
    """Example-level multi-host sharding: deterministic ``p::n`` slice in the
    given order (for datasets that are a list of examples rather than files,
    e.g. STL image triplets). Identity on a single process. Starvation
    guard as in :func:`process_local_files`: an empty slice falls back to
    all items so the starved host doesn't hang the collective."""
    mine = list(items)[jax.process_index()::jax.process_count()]
    if not mine and items:
        log.warning(
            "process %d/%d got 0 of %d examples — falling back to all",
            jax.process_index(), jax.process_count(), len(items))
        return list(items)
    return mine


def process_local_batch(global_batch: int) -> int:
    """Per-host batch size: the global batch divided over processes.

    ``fit`` reassembles per-host batches into global arrays with
    ``jax.make_array_from_process_local_data`` (train/loop.py place()).
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes")
    return global_batch // n
