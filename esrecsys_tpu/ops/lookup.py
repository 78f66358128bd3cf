"""Pallas fused embedding lookup + pooling kernel (TPU).

Pools K context embeddings per example directly out of the HBM-resident
table: ids are scalar-prefetched to SMEM, each program DMAs its block's rows
HBM→VMEM with double buffering across batch rows, and pooling happens in VMEM
— the (B, K, D) gathered tensor is never materialized in HBM. This is the
fused kernel SURVEY.md §7 calls out for multi-id contexts (e.g. the 5-track
playlist context, spotify/input_pipeline.py:24-26; the reference gathers then
pools in separate XLA ops).

Backward is an XLA segment scatter-add via ``custom_vjp`` (gradient equals
``d(pool)/d(rows)`` scattered to the looked-up rows).

Use :func:`fused_lookup_pool`; it falls back to the stock XLA composition
(:func:`esrecsys_tpu.parallel.table.lookup_pooled`) off-TPU or for
unsupported shapes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esrecsys_tpu.core.mesh import pad_to_multiple

_SUPPORTED_POOLS = ("sum", "mean")


def _pool_kernel(ids_ref, table_ref, out_ref, scratch, sems, *, block_b, k_ids,
                 mask_id, pool, pack, d_logical):
    """One program pools ``block_b`` batch rows.

    All block_b × K row DMAs are launched back-to-back (the DMA engine
    pipelines them; per-row latency is amortized across the whole block),
    then pooling runs vectorized on the VPU over the (block_b, K, lanes)
    scratch (lanes = 128 for lane-packed D < 128; lanes = D otherwise,
    including wide rows D > 128).

    ids_ref:   SMEM (block_b, K) int32 — this program's id block (blocking
               the ids instead of scalar-prefetching the full (B, K) array
               keeps SMEM usage constant; a prefetched full array overflows
               the ~1 MB SMEM budget at production batch sizes)
    table_ref: HBM (R·D/128, 128) — the table's 128-lane PHYSICAL view
               (free reshape; ops/optim.pack_rows layout). For D < 128 a
               logical row occupies the ``id % pack`` D-lane slot of
               physical row ``id // pack`` (``pack = 128 // D``); the DMA
               fetches the whole physical row (one descriptor either way —
               random logical rows never share a physical row, so lane
               packing trades 128-lane fetches for D-lane ones, not fewer
               DMAs) and the slot is selected vectorized in VMEM.
    out_ref:   VMEM (block_b, D) block of the output
    scratch:   VMEM (block_b, K, lanes) — one DMA'd row per (b, k)
    sems:      DMA semaphores (block_b,) — one per batch row, shared by its K
               row copies (each completion signals +1; K waits drain it).
               TPU caps semaphore scratch at ~512 entries per program, so
               per-(b, k) semaphores overflow at production block sizes.
    """
    phys_rows = table_ref.shape[0]
    for b in range(block_b):
        for k in range(k_ids):
            # clamp: a corrupt id must not DMA outside the table (XLA's
            # gather clamps too; ops/guards.py "error" mode catches it
            # loudly at the step boundary before it ever reaches here)
            idx = jnp.clip(ids_ref[b, k] // pack, 0, phys_rows - 1)
            pltpu.make_async_copy(
                table_ref.at[idx],
                scratch.at[b, k],
                sems.at[b],
            ).start()
    for b in range(block_b):
        for k in range(k_ids):
            pltpu.make_async_copy(
                table_ref.at[0], scratch.at[b, k], sems.at[b]
            ).wait()

    # Vectorized masked pool over K (+ slot select for packed layouts).
    ids_block = jnp.stack(
        [
            jnp.stack([ids_ref[b, k] for k in range(k_ids)])
            for b in range(block_b)
        ]
    )  # (block_b, K) from SMEM scalars
    valid = (ids_block != mask_id).astype(jnp.float32)
    rows_lanes = scratch[...]  # (block_b, K, lanes)
    if pack > 1:
        # physical row → (pack, D) slots; keep only each id's own slot.
        # Mosaic cannot shape-cast the 128-lane axis into (pack, D), so the
        # slot select stays lane-shaped: zero every lane outside the id's
        # D-lane slot, then fold lanes→D with a constant (128, D) matmul
        # F[l, d] = (l % D == d) — sum over the pack groups has exactly one
        # non-zero term per output element.
        slot = ids_block % pack  # (block_b, K)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (block_b, k_ids, 128), 2)
        lane_mask = (lane // d_logical == slot[..., None]).astype(
            rows_lanes.dtype)
        masked = rows_lanes * lane_mask  # (block_b, K, 128)
        fold = (jax.lax.broadcasted_iota(jnp.int32, (128, d_logical), 0)
                % d_logical
                == jax.lax.broadcasted_iota(
                    jnp.int32, (128, d_logical), 1)).astype(rows_lanes.dtype)
        rows = jax.lax.dot_general(
            masked.reshape(block_b * k_ids, 128), fold,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(block_b, k_ids, d_logical)  # leading-dim reshapes only
    else:
        rows = rows_lanes
    acc = jnp.sum(rows * valid[..., None], axis=1)  # (block_b, D)
    if pool == "mean":
        count = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1.0)
        acc = acc / count  # (block_b, D) / (block_b, 1)
    out_ref[...] = acc


def _forward(table: jax.Array, ids: jax.Array, pool: str, mask_id: int,
             block_b: int, interpret: bool = False) -> jax.Array:
    b, k = ids.shape
    r, d = table.shape
    pack = 128 // d if (d < 128 and 128 % d == 0) else 1
    lanes = 128 if pack > 1 else d  # scratch row width = DMA'd row width
    if pack > 1:
        assert (r * d) % 128 == 0, (r, d)  # pad tables at creation
        table = table.reshape(r * d // 128, 128)  # free physical view
    grid = (b // block_b,)
    kernel = functools.partial(
        _pool_kernel, block_b=block_b, k_ids=k, mask_id=mask_id, pool=pool,
        pack=pack, d_logical=d,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, d), table.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, k), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table in HBM
        ],
        out_specs=pl.BlockSpec(
            (block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, k, lanes), table.dtype),
            pltpu.SemaphoreType.DMA((block_b,)),
        ],
        interpret=interpret,
    )(ids, table)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused(table, ids, pool, mask_id, block_b):
    return _forward(table, ids, pool, mask_id, block_b)


def _fused_fwd(table, ids, pool, mask_id, block_b):
    return _forward(table, ids, pool, mask_id, block_b), (table.shape, ids)


def _fused_bwd(pool, mask_id, block_b, residuals, g):
    (table_shape, ids) = residuals
    valid = (ids != mask_id).astype(g.dtype)  # (B, K)
    if pool == "mean":
        denom = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1.0)
        per_row = (g / denom)[:, None, :] * valid[..., None]  # (B, K, D)
    else:
        per_row = g[:, None, :] * valid[..., None]
    flat_ids = ids.reshape(-1)
    flat_g = per_row.reshape(-1, g.shape[-1])
    dtable = jnp.zeros(table_shape, g.dtype).at[flat_ids].add(flat_g)
    return (dtable, None)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_lookup_pool(
    table: jax.Array,
    ids: jax.Array,
    pool: str = "mean",
    mask_id: int = 0,
    block_b: int = 64,
    force: bool = False,
) -> jax.Array:
    """Fused ``pool_k(table[ids[b, k]])`` → (B, D).

    Falls back to the XLA composition when not on TPU, when shapes don't fit
    the kernel's constraints (D a multiple of 128, or a divisor of 128 with
    R·D % 128 == 0 for the lane-packed path; B a multiple of block_b), or
    when the pool mode is unsupported. ``force=True`` raises instead of
    falling back (for tests).
    """
    from esrecsys_tpu.parallel.table import lookup_pooled

    b, k = ids.shape
    r, d = table.shape
    on_tpu = jax.default_backend() == "tpu"
    # TPU semaphore scratch caps at ~512 entries/program (one sem per batch
    # row here); also keep the (block_b, K, 128) VMEM scratch modest (the
    # scratch holds full 128-lane physical rows even for D < 128).
    lanes = max(d, 128)
    while block_b > 1 and (block_b > 256 or block_b * k * lanes * 4 > 4 << 20
                           or b % block_b):
        block_b //= 2
    ok = (
        pool in _SUPPORTED_POOLS
        # D a lane multiple, or a lane DIVISOR with the table physically
        # packable (lane-packed path: D in {32, 64} with R·D % 128 == 0)
        and (d % 128 == 0 or (128 % d == 0 and (r * d) % 128 == 0))
        and b % block_b == 0
        and table.dtype == jnp.float32
    )
    if not ok or (not on_tpu and not force):
        if force:
            raise ValueError(
                f"fused_lookup_pool unsupported: pool={pool} d={d} b={b} "
                f"dtype={table.dtype} backend={jax.default_backend()}"
            )
        return lookup_pooled(table, ids, pool=pool, mask_id=mask_id)
    return _fused(table, ids, pool, mask_id, block_b)


def fused_lookup_pool_interpret(table, ids, pool="mean", mask_id=0, block_b=8):
    """Interpreter-mode version for CPU testing of the kernel logic."""
    return _forward(table, ids, pool, mask_id, block_b, interpret=True)


def gather_rows(table: jax.Array, ids: jax.Array, block_b: int = 256,
                interpret: bool = False) -> jax.Array:
    """Raw row gather ``table[ids]`` through the per-row-DMA kernel.

    The flagship sparse step gathers its touched rows OUTSIDE the grad
    (workloads/playlist.py make_sparse_train_step), so no custom VJP is
    needed — this is the K=1, unmasked case of the pooled kernel (sum over
    one row == the row), lane-packed for D < 128. Falls back to
    ``jnp.take`` off-TPU or for unsupported shapes. Measured against XLA's
    gather in BENCHMARKS.md's gather study (tools/gather_study.py).
    """
    n = ids.shape[0]
    r, d = table.shape
    on_tpu = jax.default_backend() == "tpu"
    ok = (table.dtype == jnp.float32
          and (d % 128 == 0 or (128 % d == 0 and (r * d) % 128 == 0)))
    if not ok or not (on_tpu or interpret):
        return jnp.take(table, ids, axis=0)
    while block_b > 1 and (block_b > 256 or block_b * max(d, 128) * 4 > 4 << 20):
        block_b //= 2
    pad = (-n) % block_b
    ids_p = jnp.pad(ids, (0, pad))[:, None]  # (n_pad, 1) == K=1
    out = _forward(table, ids_p, "sum", -1, block_b, interpret=interpret)
    return out[:n] if pad else out
