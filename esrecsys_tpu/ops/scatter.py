"""Pallas MXU scatter-add: sorted-id row updates as block one-hot matmuls.

``table.at[ids].add(updates)`` is the hot op of embedding training. XLA's
TPU scatter applies updates through a row-at-a-time random-write loop whose
per-row latency GROWS with table size (~8 ns/id for a 100k-row table,
~130 ns/id at 2.26M rows — BENCHMARKS.md); at bench shapes the two table
scatters are >50% of the train step. This kernel replaces the application
phase with MXU matmuls that stream the table once at HBM bandwidth:

  1. (XLA) sort ids, permute updates, pack everything 128 lanes wide
     (``P = 128/D`` logical rows per physical row; each update lands in its
     row's D-lane slot), ``searchsorted`` per-block segment boundaries;
  2. (Pallas) grid over physical table blocks, table block I/O pipelined by
     Pallas itself (in/out BlockSpecs over the aliased buffer): for each
     fixed-size chunk of the block's sorted updates — fetched by a
     double-buffered manual DMA — build a (chunk, block) one-hot of local
     physical-row offsets and accumulate ``one_hotᵀ @ packed_updates`` into
     the block on the MXU with f32 accumulation.

Every update lands in exactly one block (ids are sorted), so total matmul
FLOPs are n·block·128·2·passes — independent of table size; the table
streams HBM→VMEM→HBM exactly once.

Precision runs as bf16 *passes* against the (exactly representable) one-hot:
``precision="bf16"`` rounds each update to bf16 (1 pass),
``"bf16x2"`` (default) splits updates into bf16 hi+lo terms (~17-bit
mantissa, 2 passes), ``"f32"`` uses 3 terms (~f32 mantissa, 3 passes —
half the MXU passes of a HIGHEST-precision f32 matmul, which is where the
round-1 version of this kernel lost its budget). Accumulation is always
f32; duplicates of a row sum inside one dot rather than sequentially.

``scatter_add_rows`` is the public entry; it falls back to
``table.at[ids].add`` off-TPU or for unsupported shapes.

STATUS — measured on v5e at bench shapes (BENCHMARKS.md): parity with XLA's
scatter at best for the flagship tables (the one-hot reformulation pays
~block_rows·128/n fake FLOPs per applied row plus 1024-aligned DMA
over-fetch), so XLA's scatter remains the default in every train step; the
production-path scatter win came from the packed physical VIEW instead
(:func:`packed_scatter_add` below, ops/optim.py packed lazy updates). The
kernel is kept, tested (interpret + hardware), and documented as the
block-matmul scatter pattern — it wins when D=128 and segments are dense.

Reference context: the reference's embedding updates are dense torch/keras
optimizer passes (spotify/train_spotify.py:238-243); no sparse-update path
exists there at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PASSES = {"bf16": 1, "bf16x2": 2, "f32": 3}


def _split_bf16(x: jax.Array, passes: int):
    """x (f32) as a sum of `passes` bf16 terms (exact one-hot contraction
    then loses only the residual below the last term: ~2^-8/-17/-25 rel)."""
    terms = []
    rest = x
    for _ in range(passes - 1):
        t = rest.astype(jnp.bfloat16)
        terms.append(t)
        rest = rest - t.astype(jnp.float32)
    terms.append(rest.astype(jnp.bfloat16))
    return terms


def _kernel(starts_ref, ids_hbm, upd_hbm, tab_ref, out_ref,
            ids0, ids1, upd0, upd1, sems, *, block_rows, chunk, passes):
    """One program owns one (block_rows, 128) physical table block.

    starts_ref: SMEM (nblk+1,) — sorted-update index range per block.
    ids_hbm:    HBM (n_pad,) physical row ids, sorted, padded past the end.
    upd_hbm:    HBM (n_pad, 128) packed updates (row i's D lanes at its slot).
    tab_ref/out_ref: (block_rows, 128) VMEM blocks of the aliased table,
        load/store pipelined by Pallas across grid steps.
    ids0/ids1 (chunk,) i32, upd0/upd1 (chunk, 128) f32 — double buffer as two
    explicit buffer pairs (Mosaic cannot dynamically slice dim 0 of a 2-D
    (2, chunk) scratch: 1-D i32 values tile (sublane, 128) and a size-1
    dim-0 slice breaks the tiling).
    """
    b = pl.program_id(0)
    lo = starts_ref[b]
    hi = starts_ref[b + 1]
    # 1-D i32 DMA slices must start tile-aligned; over-fetch from the
    # aligned base and mask non-block rows below.
    base = (lo // chunk) * chunk
    nchunks = pl.cdiv(hi - base, chunk)
    bufs = ((ids0, upd0), (ids1, upd1))

    def start_fetch(slot, i):
        s = base + i * chunk  # inputs padded by >= 2*chunk rows: no overrun
        ids_v, upd_v = bufs[slot]
        pltpu.make_async_copy(ids_hbm.at[pl.ds(s, chunk)],
                              ids_v, sems.at[slot, 0]).start()
        pltpu.make_async_copy(upd_hbm.at[pl.ds(s, chunk)],
                              upd_v, sems.at[slot, 1]).start()

    def wait_fetch(slot, i):
        s = base + i * chunk
        ids_v, upd_v = bufs[slot]
        pltpu.make_async_copy(ids_hbm.at[pl.ds(s, chunk)],
                              ids_v, sems.at[slot, 0]).wait()
        pltpu.make_async_copy(upd_hbm.at[pl.ds(s, chunk)],
                              upd_v, sems.at[slot, 1]).wait()

    @pl.when(nchunks > 0)
    def _():
        start_fetch(0, 0)

    out_ref[...] = tab_ref[...]

    def process(i, slot):
        wait_fetch(slot, i)
        ids_v, upd_v = bufs[slot]
        s = base + i * chunk
        pos = jax.lax.broadcasted_iota(jnp.int32, (chunk, block_rows), 0)
        valid = ((s + pos) >= lo) & ((s + pos) < hi)  # rows of THIS block
        local = ids_v[...][:, None] - b * block_rows  # (chunk, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, block_rows), 1)
        one_hot = ((local == cols) & valid).astype(jnp.bfloat16)
        acc = jnp.zeros((block_rows, 128), jnp.float32)
        for term in _split_bf16(upd_v[...], passes):
            acc += jax.lax.dot_general(
                one_hot, term, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[...] += acc

    def chunk_body(i, _):
        even = jax.lax.rem(i, 2) == 0

        @pl.when(even & (i + 1 < nchunks))
        def _():
            start_fetch(1, i + 1)

        @pl.when(jnp.logical_not(even) & (i + 1 < nchunks))
        def _():
            start_fetch(0, i + 1)

        @pl.when(even)
        def _():
            process(i, 0)

        @pl.when(jnp.logical_not(even))
        def _():
            process(i, 1)

        return 0

    jax.lax.fori_loop(0, nchunks, chunk_body, 0, unroll=False)


def _mxu_scatter_packed(table128, phys_ids, upd128, starts, *,
                        block_rows, chunk, passes, interpret=False):
    rows = table128.shape[0]
    nblk = rows // block_rows
    kernel = functools.partial(
        _kernel, block_rows=block_rows, chunk=chunk, passes=passes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # phys ids (manual DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed updates
            pl.BlockSpec((block_rows, 128), lambda b, s: (b, 0),
                         memory_space=pltpu.VMEM),  # table block (pipelined)
        ],
        out_specs=pl.BlockSpec((block_rows, 128), lambda b, s: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk,), jnp.int32),
            pltpu.VMEM((chunk, 128), jnp.float32),
            pltpu.VMEM((chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(table128.shape, table128.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},  # table (incl. scalar prefetch) -> out
        interpret=interpret,
    )(starts, phys_ids, upd128, table128)


def packed_scatter_add(
    table: jax.Array,      # (R, D), R a multiple of 128 // D
    ids: jax.Array,        # (n,) int32 in [0, R)
    updates: jax.Array,    # (n, D)
) -> jax.Array:
    """``table.at[ids].add(updates)`` through the 128-lane physical view.

    XLA's TPU scatter applies one update ROW at a time at a per-row latency
    that grows with table row count (~8 ns/id at 100k rows to ~130 ns/id at
    2.26M — BENCHMARKS.md). Viewing the (R, D) table as its row-major
    (R·D/128, 128) physical layout (a free reshape) and scattering each
    update as a 128-lane row with the payload placed in its ``id % pack``
    D-lane slot cuts the target row count by ``pack = 128/D``, which moves
    big tables out of the slow regime: measured 6.3x at (2.26M rows, 76k
    updates), 1.7x at (565k, 4k), ~1x at 100k and below (BENCHMARKS.md —
    the win is shape-dependent; measure in context before adopting).

    Requires R % (128//D) == 0 (pad the table at creation; extra rows are
    never touched by valid ids). Exact: each update lands in its own lane
    slot, duplicate ids accumulate exactly as the logical scatter would.
    """
    rows, dim = table.shape
    pack = 128 // dim if dim and 128 % dim == 0 else 1
    if pack <= 1 or dim * rows % 128:
        return table.at[ids].add(updates.astype(table.dtype))
    phys = packed_scatter_add_phys(table.reshape(rows // pack, 128),
                                   ids, updates, dim)
    return phys.reshape(rows, dim)


def packed_scatter_add_phys(
    table_p: jax.Array,    # (R·D/128, 128) physical layout (optim.pack_rows)
    ids: jax.Array,        # (n,) int32 LOGICAL row ids in [0, R)
    updates: jax.Array,    # (n, D)
    dim: int,
) -> jax.Array:
    """:func:`packed_scatter_add` on an already-physical table — for STORED
    packed carriers (the reshape-per-step variant loses; see pack_rows)."""
    pack = 128 // dim
    n = ids.shape[0]
    slot = (ids % pack)[:, None, None]
    placed = jnp.where(slot == jnp.arange(pack)[None, :, None],
                       updates[:, None, :], 0.0).reshape(n, 128)
    return table_p.at[ids // pack].add(placed.astype(table_p.dtype))


def _vmem_scatter_kernel(ids_ref, tab_hbm, upd_ref, out_ref, copy_sem,
                         *, chunk):
    """One grid step: apply ``chunk`` updates to the VMEM-resident table.

    ids_ref:  SMEM (chunk,) physical row ids of this chunk (pad rows carry
              id 0 with all-zero update rows — harmless adds).
    tab_hbm:  ANY/HBM full (R_phys, 128) table; DMA'd into ``out_ref`` once
              at grid step 0 (the aliased output IS the accumulator).
    upd_ref:  VMEM (chunk, 128) placed update rows.
    out_ref:  VMEM (R_phys, 128) — the whole table, resident across the
              grid (constant index map); written back once at the end.
    """
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _load_table():
        pltpu.make_async_copy(tab_hbm, out_ref, copy_sem).start()
        pltpu.make_async_copy(tab_hbm, out_ref, copy_sem).wait()

    def body(i, _):
        r = ids_ref[i]
        out_ref[pl.ds(r, 1), :] += upd_ref[pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=False)


def vmem_scatter_add_phys(
    table_p: jax.Array,    # (R_phys, 128) physical layout
    ids: jax.Array,        # (n,) int32 LOGICAL row ids
    updates: jax.Array,    # (n, D)
    dim: int,
    *,
    chunk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Scatter-add through a VMEM-RESIDENT table: one Pallas kernel holds
    the whole physical table in VMEM across the grid, streams the update
    rows through once, and applies each with a dynamic (1, 128) VMEM
    read-modify-write — no sort, no per-row HBM round-trip.

    The VERDICT r4 #3 attempt to beat XLA's ~70-110 M rows/s per-row
    scatter issue ceiling: HBM traffic drops to one table load + one
    writeback + one pass over the update rows (vs a per-row RMW), so IF
    dynamic VMEM stores were cheap this would run at bandwidth. Only
    tables whose packed form fits VMEM qualify (~13 MB → the flagship
    album table yes, the artist table no).

    STATUS — measured on v5e at flagship shapes
    (parity_runs/r5_scatter_attempt.json, BENCHMARKS.md round-5 scatter
    attempt): NEGATIVE RESULT. chunk<1024 fails Mosaic lowering on real
    v5e (tpu_compile_helper exit 1; the CPU interpreter compiles all
    chunks — hardware-only failure class). chunk=1024 compiles and at the
    flagship album table (100k rows) runs 35.9 M rows/s vs XLA's packed
    scatter at 34.3 M — a tie inside noise — and LOSES at 50k rows
    (29.2 M vs 41.1 M): the serial per-update VMEM RMW loop replaces the
    per-row HBM RMW cost one-for-one. XLA's scatter stays the production
    path; kept as the measured record of the bin-into-VMEM design point,
    like the per-row-DMA and one-hot attempts.
    """
    rows_phys, lanes = table_p.shape
    if lanes != 128 or 128 % dim:
        raise ValueError(f"need a ({rows_phys}, 128) physical table and "
                         f"dim | 128 (got {table_p.shape}, dim={dim})")
    vmem_bytes = rows_phys * 128 * table_p.dtype.itemsize
    if vmem_bytes > 13 * 1024 * 1024:
        raise ValueError(
            f"table ({vmem_bytes / 2**20:.1f} MiB) does not fit the VMEM "
            "residency budget (~13 MiB); use packed_scatter_add_phys")
    pack = 128 // dim
    n = ids.shape[0]
    slot = (ids % pack)[:, None, None]
    placed = jnp.where(slot == jnp.arange(pack)[None, :, None],
                       updates[:, None, :], 0.0).reshape(n, 128)
    phys_ids = (ids // pack).astype(jnp.int32)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:  # pad with id 0 + zero rows (adds nothing)
        phys_ids = jnp.pad(phys_ids, (0, n_pad - n))
        placed = jnp.pad(placed, ((0, n_pad - n), (0, 0)))
    nchunks = n_pad // chunk

    kernel = functools.partial(_vmem_scatter_kernel, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda b: (b,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),     # table (manual DMA)
            pl.BlockSpec((chunk, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_phys, 128), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(table_p.shape, table_p.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(phys_ids, table_p, placed)


# Row count at/above which the packed physical view measurably beats the
# logical scatter for small-n updates (BENCHMARKS.md scatter study).
PACKED_SCATTER_MIN_ROWS = 400_000

# Table-size ceiling for the RESHAPE-around-scatter packed path. XLA may
# satisfy the (R, D) -> (R*D/128, 128) reshape by relayouting the logical
# table to a lane-padded T(8,128) tiling first — a materialized copy of
# 128/D x the table bytes (observed on chip: a (100M, 32) bf16 table drew
# a 25.6 GB copy and OOMed 16 GB HBM). Tables larger than this must STORE
# packed (ops/optim.pack_rows carriers) instead of reshaping per call.
PACKED_SCATTER_MAX_BYTES = 2_000_000_000


def auto_scatter_add(table: jax.Array, ids: jax.Array, updates: jax.Array,
                     allow_packed: bool = True) -> jax.Array:
    """Pick the measured-faster scatter-add strategy by shape.

    Packed view for narrow rows on big tables (the slow XLA regime), plain
    ``at[].add`` otherwise. Both are exact; see :func:`packed_scatter_add`.
    Pass ``allow_packed=False`` for row-sharded tables: the packed reshape
    crosses the sharded row dimension and GSPMD would re-gather the table
    every step (tracers hide sharding, so the caller must say).
    """
    rows, dim = table.shape
    pack = 128 // dim if dim and 128 % dim == 0 else 1
    if (allow_packed and pack > 1 and rows >= PACKED_SCATTER_MIN_ROWS
            and rows * dim * table.dtype.itemsize <= PACKED_SCATTER_MAX_BYTES
            and (dim * rows) % 128 == 0):
        return packed_scatter_add(table, ids, updates)
    return table.at[ids].add(updates.astype(table.dtype))


def scatter_add_rows(
    table: jax.Array,      # (R, D) f32, D in {32, 64, 128}
    ids: jax.Array,        # (n,) int32 in [0, R)
    updates: jax.Array,    # (n, D) f32
    *,
    block_rows: int = 1024,  # physical (128-lane) rows per program
    chunk: int = 1024,       # sorted updates per inner matmul; multiple of
    # 1024 (1-D int32 DMA slices must align to their 1024-element tiling)
    precision: str = "bf16x2",  # "bf16" | "bf16x2" | "f32" (see module doc)
    force: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """``table.at[ids].add(updates)`` via the sorted MXU block kernel.

    ``precision="f32"`` matches XLA's scatter to ~f32 mantissa (duplicates
    accumulate in one f32 dot, where XLA adds sequentially — summation-order
    differences only); ``"bf16x2"`` (default) carries ~17 mantissa bits per
    update into an f32 accumulation — measured loss-trajectory impact at
    bench shapes is below run-to-run noise. Falls back to XLA scatter
    off-TPU or for unsupported shapes unless ``force``/``interpret``.
    """
    rows, dim = table.shape
    n = ids.shape[0]
    if chunk % 1024:
        raise ValueError("chunk must be a multiple of 1024")
    passes = _PASSES[precision]
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
        block_rows=block_rows, chunk=chunk, passes=passes,
        interpret=interpret)
    out = out128.reshape(-1, dim)
    return out[:rows] if pad_rows else out
