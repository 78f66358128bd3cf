"""Pallas MXU scatter-add: sorted-id row updates as block one-hot matmuls.

``table.at[ids].add(updates)`` is the hot op of embedding training. XLA's
TPU scatter sorts the ids (cheap) and then applies updates through a
row-at-a-time loop (~8-14 ns/row on v5e — BENCHMARKS.md); at bench shapes
the two table scatters are >50% of the train step. This kernel replaces the
application phase with MXU matmuls:

  1. (XLA) sort ids, permute updates, pack everything 128 lanes wide
     (``P = 128/D`` logical rows per physical row; each update lands in its
     row's D-lane slot), ``searchsorted`` per-block segment boundaries;
  2. (Pallas) grid over physical table blocks: DMA the block to VMEM, then
     for each fixed-size chunk of its sorted updates build a
     (chunk, block) one-hot of local physical-row offsets and accumulate
     ``one_hotᵀ @ packed_updates`` into the block on the MXU (f32
     accumulation), then DMA the block back.

Every update lands in exactly one block (ids are sorted), so total matmul
FLOPs are n·block·128·2 — independent of table size; the table streams
HBM→VMEM→HBM once. TPU DMA requires 128-lane-aligned shapes, hence the
XLA-side packing (narrow tables are viewed as (R/P, 128)).

``compute_dtype=bfloat16`` runs the one-hot matmul on the fast MXU path
(updates round to bf16; the f32 default matches XLA scatter up to f32
summation order of duplicate ids).

``scatter_add_rows`` is the public entry; it falls back to
``table.at[ids].add`` off-TPU or for unsupported shapes.

STATUS — experimental, measured on v5e (BENCHMARKS.md): ~1.1x XLA scatter
for a 100k x 32 table at bench shapes, 0.6x for 296k x 32. The reformulation
pays (128/D)x extra matmul FLOPs for narrow tables and the 1024-element
chunk alignment (1-D int32 DMA tiling) forces up to 2x wasted rows per
block; XLA's row-loop scatter remains the default in every train step.
Kept as a working reference for block-matmul scatter patterns (it wins when
D=128 and segments are dense) and for future Mosaic improvements.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, ids_ref, upd_ref, table_ref, out_ref,
            tab_vmem, ids_vmem, upd_vmem, sems, *,
            block_rows, chunk, compute_dtype):
    """One program owns one (block_rows, 128) physical table block.

    starts_ref: SMEM (nblk+1,) — sorted-update index range per block.
    ids_ref:    HBM (n_pad,) physical row ids, sorted, padded past the end.
    upd_ref:    HBM (n_pad, 128) packed updates (row i's D lanes at its slot).
    table/out:  HBM (R_phys, 128), aliased.
    """
    b = pl.program_id(0)
    lo = starts_ref[b]
    hi = starts_ref[b + 1]

    cp = pltpu.make_async_copy(
        table_ref.at[pl.ds(b * block_rows, block_rows)], tab_vmem, sems.at[0])
    cp.start()
    cp.wait()

    base = (lo // chunk) * chunk  # 1024-aligned DMA start (1-D i32 tiling)
    nchunks = pl.cdiv(hi - base, chunk)

    def chunk_body(i, _):
        s = base + i * chunk  # inputs padded by >= chunk rows: no overrun
        c1 = pltpu.make_async_copy(ids_ref.at[pl.ds(s, chunk)], ids_vmem,
                                   sems.at[1])
        c2 = pltpu.make_async_copy(upd_ref.at[pl.ds(s, chunk)], upd_vmem,
                                   sems.at[2])
        c1.start()
        c2.start()
        c1.wait()
        c2.wait()
        pos = jax.lax.broadcasted_iota(jnp.int32, (chunk, block_rows), 0)
        valid = ((s + pos) >= lo) & ((s + pos) < hi)  # rows of THIS block
        local = ids_vmem[...][:, None] - b * block_rows  # (chunk, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, block_rows), 1)
        one_hot = ((local == cols) & valid).astype(compute_dtype)
        upd = upd_vmem[...].astype(compute_dtype)
        # TPU default matmul precision is single-pass bf16 — the f32 mode
        # must force HIGHEST or every update rounds at bf16 granularity
        # (confirmed ~1e-2 relative error on v5e at default precision).
        prec = (jax.lax.Precision.HIGHEST
                if compute_dtype == jnp.float32 else None)
        tab_vmem[...] += jax.lax.dot_general(
            one_hot, upd, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return 0

    jax.lax.fori_loop(0, nchunks, chunk_body, 0, unroll=False)

    cp2 = pltpu.make_async_copy(
        tab_vmem, out_ref.at[pl.ds(b * block_rows, block_rows)], sems.at[3])
    cp2.start()
    cp2.wait()


def _mxu_scatter_packed(table128, phys_ids, upd128, starts, *,
                        block_rows, chunk, compute_dtype, interpret=False):
    rows = table128.shape[0]
    nblk = rows // block_rows
    kernel = functools.partial(
        _kernel, block_rows=block_rows, chunk=chunk,
        compute_dtype=compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # phys ids
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed updates
            pl.BlockSpec(memory_space=pltpu.ANY),  # table (aliased out)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((block_rows, 128), jnp.float32),
            pltpu.VMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(table128.shape, table128.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},  # table (incl. scalar prefetch) -> out
        interpret=interpret,
    )(starts, phys_ids, upd128, table128)


def scatter_add_rows(
    table: jax.Array,      # (R, D) f32, D in {32, 64, 128}
    ids: jax.Array,        # (n,) int32 in [0, R)
    updates: jax.Array,    # (n, D) f32
    *,
    block_rows: int = 512,   # physical (128-lane) rows per program
    chunk: int = 1024,       # sorted updates per inner matmul; multiple of
    # 1024 (1-D int32 DMA slices must align to their 1024-element tiling)
    compute_dtype=jnp.float32,
    force: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """``table.at[ids].add(updates)`` via the sorted MXU block kernel.

    Exact for ``compute_dtype=float32`` up to f32 summation order (the MXU
    accumulates a block's duplicates in one dot, where XLA's scatter adds
    sequentially). ``bfloat16`` rounds each update to bf16 before the f32
    accumulation. Falls back to XLA scatter off-TPU or for unsupported
    shapes unless ``force``/``interpret``.
    """
    rows, dim = table.shape
    n = ids.shape[0]
    if chunk % 1024:
        raise ValueError("chunk must be a multiple of 1024")
    ok = table.dtype == jnp.float32 and 128 % dim == 0
    on_tpu = jax.default_backend() == "tpu"
    if not (ok and (on_tpu or interpret or force)):
        return table.at[ids].add(updates.astype(table.dtype))

    pack = 128 // dim
    # ---- XLA prep: sort, permute, pack 128 lanes wide, boundaries ----
    sorted_ids, perm = jax.lax.sort_key_val(ids, jax.lax.iota(jnp.int32, n))
    sorted_upd = jnp.take(updates, perm, axis=0)
    if pack > 1:
        slot = (sorted_ids % pack)[:, None]  # this row's D-lane slot
        placed = jnp.where(
            slot == jnp.arange(pack)[None, :], 1.0, 0.0
        )[:, :, None] * sorted_upd[:, None, :]
        upd128 = placed.reshape(n, 128)
        phys_ids = sorted_ids // pack
    else:
        upd128 = sorted_upd
        phys_ids = sorted_ids

    logical_per_block = block_rows * pack
    pad_rows = (-rows) % logical_per_block
    tpad = jnp.pad(table, ((0, pad_rows), (0, 0))) if pad_rows else table
    table128 = tpad.reshape(-1, 128)
    nblk = table128.shape[0] // block_rows
    starts = jnp.searchsorted(
        phys_ids, jnp.arange(nblk + 1, dtype=jnp.int32) * block_rows
    ).astype(jnp.int32)
    # pad so aligned fixed-size chunk DMAs never overrun (ids past the end
    # point beyond the last block and mask out via the [lo, hi) check)
    phys_ids = jnp.pad(phys_ids, (0, 2 * chunk),
                       constant_values=table128.shape[0])
    upd128 = jnp.pad(upd128, ((0, 2 * chunk), (0, 0)))

    out128 = _mxu_scatter_packed(
        table128, phys_ids, upd128, starts,
        block_rows=block_rows, chunk=chunk, compute_dtype=compute_dtype,
        interpret=interpret)
    out = out128.reshape(-1, dim)
    return out[:rows] if pad_rows else out
