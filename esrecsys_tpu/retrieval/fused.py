"""Fused MIPS scan+select: a Pallas TPU kernel that never materializes scores.

Every other scan in :mod:`esrecsys_tpu.retrieval.mips` alternates two XLA
ops per block — an MXU matmul producing a (B, block) score tile, then a
selection op (``lax.top_k`` / ``approx_max_k``) reading it back. The score
tile round-trips through VMEM between the two, and on TPU ``lax.top_k``
costs ~1 ns/element, which BENCHMARKS.md's chip serving table shows is the
actual bottleneck at k=500 (the int8 scan moves 4x fewer bytes yet wins
only 7%).

This kernel removes selection from the streamed loop entirely:

  * The catalog lives TRANSPOSED and bf16: a (D, M) matrix streamed through
    VMEM in (D, L) blocks. The transpose matters as much as the fusion —
    scoring is ``(B, D) x (D, L)`` in the MXU's natural feed order; the
    row-major (L, D) layout forces a per-block VMEM transpose that measured
    17x slower end-to-end on v5e (30 ms vs 1.7 ms per 64-query batch at
    2.26M items).
  * Item ``g`` maps to bin ``g mod L``; because the block length IS the bin
    count, each block contributes exactly one candidate per bin, so the
    cross-block "keep the best two per bin" update is pure elementwise VPU
    work (4 compares + 8 selects per score) on (B, L) accumulators that
    live in VMEM for the whole scan. No sort, no top_k, no score tile ever
    leaves the chip.
  * The kernel returns the per-bin top-2 (values and catalog ids); the host
    wrapper finishes with one small ``lax.top_k`` over (B, 2L) and an exact
    ``Precision.HIGHEST`` rescore of the k winners, mirroring the
    select-approx/rescore-exact contract of the sibling paths.

Recall: a true top-k item is lost only if two higher-scoring items share
its bin, i.e. three of the true top-k collide in one bin. For score-random
item order the expected number of lost items is C(k,3)/L^2 — at k=500,
L=4096 that is ~1.2 of 500 (recall ~0.9975), falling quadratically with L.
Like ``approx_topk_over_matrix``'s ``per_block_k`` caveat, a catalog SORTED
by score-correlated position (e.g. popularity) violates the randomness
assumption; shuffle ids or raise ``num_bins``.

Reference behavior covered: the one-shot full-matrix score+top_k of
pinterest/make_recommendations.py:49-65 and spotify/train_spotify.py:113-131,
re-architected so the (B, M) score matrix never exists anywhere.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esrecsys_tpu.core.mesh import pad_to_multiple

NEG_INF = np.float32(-np.inf)

# VMEM budget for the resident kernel state: 4 accumulators (2 f32 + 2 i32)
# at (B, L), the (B, L) f32 score tile, and the double-buffered (D, L) bf16
# catalog block. 12 MB leaves headroom in a 16 MB core.
_VMEM_STATE_BUDGET = 12 * 1024 * 1024


def auto_bins(batch: int, requested: int = 4096, dim: int = 64) -> int:
    """Largest bin count <= requested whose kernel state fits VMEM."""
    bins = max(128, pad_to_multiple(requested, 128))
    while bins > 128:
        state = batch * bins * (4 * 4 + 4) + dim * bins * 2 * 2
        if state <= _VMEM_STATE_BUDGET:
            break
        bins //= 2
    return bins


def _batch_free_bytes(bins: int, dim: int, use_mask: bool,
                      use_scales: bool) -> int:
    """Batch-independent VMEM footprint of the fused scan at ``bins``:
    double-buffered catalog block (bf16 figure — conservative for int8)
    plus the payload/scale tiles the mode streams."""
    over = dim * bins * 2 * 2
    if use_mask:
        over += 2 * 32 * bins
    if use_scales:
        over += 2 * 8 * bins * 4
    return over


def validate_fused_bins(bins: int, dim: int, use_mask: bool = False,
                        use_scales: bool = False) -> None:
    """Raise ValueError when ``bins`` cannot fit the kernel's VMEM budget.

    Query chunking bounds the per-batch (B, L) accumulator state, but the
    batch-independent footprint (catalog block + payload/scale tiles) plus
    the minimum 8-query state is a floor no chunking can shrink — past it
    the kernel fails Mosaic lowering on real TPU (invisible to the CPU
    interpreter). Call at construction time (serving does) so the failure
    is a clear error, not a compile crash."""
    L = max(128, pad_to_multiple(bins, 128))
    need = _batch_free_bytes(L, dim, use_mask, use_scales) + 8 * L * 20
    if need > _VMEM_STATE_BUDGET:
        raise ValueError(
            f"fused scan at num_bins={L}, dim={dim} needs "
            f"{need / 2**20:.1f} MiB of VMEM even at the minimum 8-query "
            f"chunk (budget {_VMEM_STATE_BUDGET / 2**20:.0f} MiB) — lower "
            f"num_bins/fused_bins or max_k (bins >= ceil(max_k/2))")


def pack_catalog(items: jax.Array, num_bins: int = 4096,
                 shards: int = 1) -> jax.Array:
    """(M, D) rows -> the kernel's scan layout: (D, Mp) bf16, Mp padded to a
    multiple of ``num_bins`` (times ``shards`` when the columns will be
    sharded over a mesh axis, so each shard's slice still divides into
    whole bin blocks). Do this ONCE at index build; transposing per query
    would relayout the whole catalog on device each call."""
    L = max(128, pad_to_multiple(num_bins, 128))
    M = items.shape[0]
    padded = pad_to_multiple(M, L * shards)
    it = items.astype(jnp.bfloat16)
    if padded != M:
        it = jnp.pad(it, ((0, padded - M), (0, 0)))
    return it.T


def pack_catalog_codes(q_items: jax.Array, scales: jax.Array,
                       num_bins: int = 4096):
    """Lay out PREQUANTIZED int8 rows + per-item scales for the int8 scan.

    ``q_items`` (M, D) int8 / ``scales`` (M,) f32 from
    ``mips.quantize_rows`` (or its host twin — serving pins the quantizer
    host-side under rescore_int8). Returns ``(codes (D, Mp) int8,
    scales_binned (ceil8(Mp/L), L) f32)``: codes transposed like
    :func:`pack_catalog`, scales in the kernel's (8, L)-blocked layout —
    row b holds the scales of catalog block b (a row-major reshape of the
    flat per-item scales, so a flat index maps to ``(i // L, i % L)``).
    Padding columns carry code 0 / scale 0; the kernel's valid-count bound
    masks them to -inf regardless.
    """
    L = max(128, pad_to_multiple(num_bins, 128))
    M = q_items.shape[0]
    padded = pad_to_multiple(M, L)
    q = q_items.astype(jnp.int8)
    sc = scales.astype(jnp.float32)
    if padded != M:
        q = jnp.pad(q, ((0, padded - M), (0, 0)))
        sc = jnp.pad(sc, (0, padded - M))
    nblk = padded // L
    sc = sc.reshape(nblk, L)
    nblk8 = pad_to_multiple(nblk, 8)
    if nblk8 != nblk:
        sc = jnp.pad(sc, ((0, nblk8 - nblk), (0, 0)))
    return q.T, sc


def pack_catalog_int8(items: jax.Array, num_bins: int = 4096):
    """(M, D) f32 rows -> the int8 scan layout: quantize per item
    (``mips.quantize_rows``) and lay out via :func:`pack_catalog_codes`.
    Halves the fused scan's streamed bytes vs the bf16 layout (D int8 +
    4/8 scale vs 2·D bf16 per item) at a small selection-noise cost the
    exact rescore absorbs (BENCHMARKS.md). Single-shard layout; the
    sharded fused path scans bf16."""
    from esrecsys_tpu.retrieval.mips import quantize_rows

    q, sc = quantize_rows(items.astype(jnp.float32))
    return pack_catalog_codes(q, sc, num_bins=num_bins)


def _pack_payload_rows(rows, padded: int, bins: int,
                       fills) -> jax.Array:
    """Per-item i32 sidecar data in a Mosaic-legal block layout.

    Mosaic requires a VMEM block's second-minor dim to be divisible by 8
    (or equal the array's), so a (nblk, L) array with (1, L) blocks does
    NOT lower on real TPU (it does in the interpreter — which is how the
    shape bug could hide on CPU test meshes). Payload rows are therefore
    packed as (nblk, 8, L) with block (1, 8, L): row r of the middle dim
    is ``rows[r]``'s slice for that catalog block, unused rows zero. The
    8x layout costs 32 B/item of HBM against the catalog's 2*D — +25% at
    D=64 — and keeps every in-kernel op 2-D.
    """
    L = bins
    out = []
    for arr, fill in zip(rows, fills):
        a = jnp.pad(arr.astype(jnp.int32), (0, padded - arr.shape[0]),
                    constant_values=fill)
        out.append(a.reshape(padded // L, 1, L))
    pad_rows = 8 - len(out)
    zero = jnp.zeros((padded // L, pad_rows, L), jnp.int32)
    return jnp.concatenate(out + [zero], axis=1)


def _kernel(bound_ref, q_ref, items_ref, m1_ref, id1_ref, m2_ref, id2_ref,
            *, bins: int, use_mask: bool, mask_ref=None, scales_ref=None):
    """One grid step: score a (D, L) catalog block, fold into the bin top-2.

    With ``scales_ref`` the catalog block is int8 (per-item symmetric
    quantization, ``mips.quantize_rows``): int8 values are exact in bf16
    (|v| <= 127 < 2^8), so the MXU pass loses nothing beyond the
    quantization itself; the per-item f32 scale multiplies the score tile
    AFTER the dot. Scales stream as (8, L) f32 blocks shared by 8
    consecutive grid steps (Pallas skips the re-fetch while the block
    index is unchanged), so their HBM cost is 4/8 B per item per scan.
    """
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        m1_ref[:] = jnp.full(m1_ref.shape, NEG_INF, jnp.float32)
        m2_ref[:] = jnp.full(m2_ref.shape, NEG_INF, jnp.float32)
        id1_ref[:] = jnp.zeros(id1_ref.shape, jnp.int32)
        id2_ref[:] = jnp.zeros(id2_ref.shape, jnp.int32)

    blk = items_ref[:]
    if scales_ref is not None:
        blk = blk.astype(jnp.bfloat16)  # int8 -> bf16, exact
    # (B, D) x (D, L) -> (B, L), bf16 in, f32 accumulation on the MXU
    s = jax.lax.dot_general(
        q_ref[:], blk, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if scales_ref is not None:
        # this block's scale row: row b%8 of the (8, L) group block
        sub = jax.lax.rem(b, 8)
        rows = jax.lax.broadcasted_iota(jnp.int32, scales_ref.shape, 0)
        scale = jnp.sum(jnp.where(rows == sub, scales_ref[:], 0.0),
                        axis=0, keepdims=True)          # (1, L) f32, > 0
        s = s * scale
    gid = b * bins + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(gid < bound_ref[0, 0], s, NEG_INF)
    if use_mask:
        # payload row 0 = eligibility 0/1 for this block's items
        elig = mask_ref[0][0:1, :]             # (1, L) i32
        s = jnp.where(elig != 0, s, NEG_INF)

    m1, id1 = m1_ref[:], id1_ref[:]
    better1 = s > m1
    loser_v = jnp.where(better1, m1, s)        # whichever lost the m1 duel
    loser_i = jnp.where(better1, id1, gid)
    m1_ref[:] = jnp.where(better1, s, m1)
    id1_ref[:] = jnp.where(better1, gid, id1)
    m2 = m2_ref[:]
    better2 = loser_v > m2
    m2_ref[:] = jnp.where(better2, loser_v, m2)
    id2_ref[:] = jnp.where(better2, loser_i, id2_ref[:])


def binned_candidates(
    queries: jax.Array,       # (B, D) any float dtype
    items_packed: jax.Array,  # (D, Mp): bf16 from pack_catalog, or int8
                              # from pack_catalog_int8 (+ item_scales)
    num_items: int,
    num_bins: int = 4096,
    valid_count: Optional[jax.Array] = None,
    item_mask: Optional[jax.Array] = None,
    item_scales: Optional[jax.Array] = None,
    query_chunk: int = 0,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-bin top-2 candidates: (vals (B, 2L) f32, ids (B, 2L) i32).

    ``interpret=None`` auto-selects: compiled Mosaic on TPU, the Pallas
    interpreter elsewhere (CPU test meshes), same semantics either way.

    ``item_scales``: the (ceil8(Mp/L), L) f32 layout from
    :func:`pack_catalog_codes` — presence selects the int8 scan (then
    ``items_packed`` must be int8; half the streamed bytes of bf16).

    ``query_chunk``: VMEM cap on the kernel's resident batch (the (B, L)
    accumulators live in VMEM for the whole scan). Batches larger than
    the chunk run sequentially (``lax.map``), each re-streaming the
    catalog — so throughput-mode serving at batch >> 64 keeps the full
    bin count (recall) instead of shrinking L to fit VMEM. 0 = auto:
    the largest multiple of 8 whose state fits the VMEM budget.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, D = queries.shape
    L = max(128, pad_to_multiple(num_bins, 128))
    padded = items_packed.shape[1]
    if items_packed.shape[0] != D or padded % L:
        raise ValueError(
            f"items_packed {items_packed.shape} does not match dim {D} / "
            f"num_bins {L}; build it with pack_catalog(items, num_bins={L})")
    nblk = padded // L
    use_scales = item_scales is not None
    if use_scales:
        nblk8 = pad_to_multiple(nblk, 8)
        if items_packed.dtype != jnp.int8:
            raise ValueError("item_scales selects the int8 scan: pack the "
                             "catalog with pack_catalog_int8/_codes")
        if item_scales.shape != (nblk8, L):
            raise ValueError(
                f"item_scales {item_scales.shape} != {(nblk8, L)}; build "
                f"with pack_catalog_codes(..., num_bins={L})")
    use_mask = item_mask is not None
    over = _batch_free_bytes(L, D, use_mask, use_scales)
    if not query_chunk:
        query_chunk = max(8, ((_VMEM_STATE_BUDGET - over) // (L * 20)) & ~7)
    Bc = pad_to_multiple(min(B, query_chunk), 8)
    if Bc * L * 20 + over > _VMEM_STATE_BUDGET:
        # explicit query_chunk too large, or L itself past the floor —
        # either way Mosaic lowering would fail on real TPU; raise the
        # same clear error the construction-time validator gives
        validate_fused_bins(L, D, use_mask, use_scales)
        raise ValueError(
            f"query_chunk={query_chunk} at num_bins={L} overflows the "
            f"fused kernel's VMEM budget; lower it or pass 0 for auto")
    Bp = pad_to_multiple(B, Bc)
    q = queries.astype(jnp.bfloat16)
    if Bp != B:
        q = jnp.pad(q, ((0, Bp - B), (0, 0)))
    bound = num_items if valid_count is None else jnp.minimum(
        valid_count, num_items)
    bound = jnp.asarray(bound, jnp.int32).reshape(1, 1)

    extras = []
    in_specs = [
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((Bc, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, L), lambda b: (0, b), memory_space=pltpu.VMEM),
    ]
    if use_scales:
        extras.append(item_scales)
        in_specs.append(
            pl.BlockSpec((8, L), lambda b: (b // 8, 0),
                         memory_space=pltpu.VMEM))
    if use_mask:
        extras.append(_pack_payload_rows(
            [item_mask.astype(jnp.int32)], padded, L, fills=[0]))
        in_specs.append(
            pl.BlockSpec((1, 8, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM))

    def kernel(bound_r, q_r, it_r, *rest):
        i = 0
        scales_r = mask_r = None
        if use_scales:
            scales_r, i = rest[i], i + 1
        if use_mask:
            mask_r, i = rest[i], i + 1
        m1, i1, m2, i2 = rest[i:i + 4]
        _kernel(bound_r, q_r, it_r, m1, i1, m2, i2, bins=L,
                use_mask=use_mask, mask_ref=mask_r, scales_ref=scales_r)

    acc = pl.BlockSpec((Bc, L), lambda b: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=(acc, acc, acc, acc),
        out_shape=(
            jax.ShapeDtypeStruct((Bc, L), jnp.float32),
            jax.ShapeDtypeStruct((Bc, L), jnp.int32),
            jax.ShapeDtypeStruct((Bc, L), jnp.float32),
            jax.ShapeDtypeStruct((Bc, L), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bc * D * padded,
            bytes_accessed=padded * D * (1 if use_scales else 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )

    if Bp == Bc:
        m1, id1, m2, id2 = call(bound, q, items_packed, *extras)
    else:
        nq = Bp // Bc
        m1, id1, m2, id2 = jax.lax.map(
            lambda qc: call(bound, qc, items_packed, *extras),
            q.reshape(nq, Bc, D))
        m1, id1 = m1.reshape(Bp, L), id1.reshape(Bp, L)
        m2, id2 = m2.reshape(Bp, L), id2.reshape(Bp, L)
    vals = jnp.concatenate([m1, m2], axis=-1)[:B]
    ids = jnp.concatenate([id1, id2], axis=-1)[:B]
    return vals, ids


def binned_topk_over_matrix(
    queries: jax.Array,   # (B, D)
    items: jax.Array,     # (M, D) rescore rows: f32, or int8 with
                          # rescore_scales (f32-free residency)
    k: int,
    num_bins: int = 4096,
    valid_count: Optional[jax.Array] = None,
    item_mask: Optional[jax.Array] = None,
    items_packed: Optional[jax.Array] = None,
    item_scales: Optional[jax.Array] = None,
    rescore_scales: Optional[jax.Array] = None,
    rescore: bool = True,
    query_chunk: int = 0,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused-scan top-k, API-compatible with ``mips.topk_over_matrix``.

    ``items_packed``: the (D, Mp) bf16 scan copy from :func:`pack_catalog`
    — or the int8 codes from :func:`pack_catalog_int8` when
    ``item_scales`` is given (half the streamed bytes). Pass it whenever
    the catalog is long-lived (serving keeps it resident); when omitted it
    is packed on the fly, which relayouts the catalog on device EVERY call
    — fine for one-shot offline jobs, wrong for a query loop.

    Selection happens at the kernel's bf16-matmul precision; the k winners
    are rescored exactly at ``Precision.HIGHEST`` (``rescore=False`` skips
    it and returns the kernel's own scores). With ``rescore_scales``,
    ``items`` holds int8 rows that are dequantized per candidate — the
    mips ``rescore_int8`` contract, no f32 catalog anywhere.
    """
    num_items = items.shape[0]
    if rescore and items.dtype == jnp.int8 and rescore_scales is None:
        raise ValueError(
            "items is int8 but rescore_scales is missing: the rescore "
            "einsum would score raw codes (wrongly scaled, no error) — "
            "pass the per-item scales from mips.quantize_rows")
    if rescore_scales is not None and items.dtype != jnp.int8:
        raise ValueError(
            "rescore_scales given but items is not int8 — the f32-free "
            "rescore contract dequantizes int8 rows (mips rescore_int8)")
    k_eff = min(k, num_items)
    # fewer than k/2 bins would guarantee losses; keep 2L >= k
    L = max(num_bins, pad_to_multiple(-(-k_eff // 2), 128))
    if items_packed is None:
        items_packed = pack_catalog(items, num_bins=L)
    vals, ids = binned_candidates(
        queries, items_packed, num_items, num_bins=L,
        valid_count=valid_count, item_mask=item_mask,
        item_scales=item_scales, query_chunk=query_chunk,
        interpret=interpret)
    bvals, sel = jax.lax.top_k(vals, k_eff)
    cand = jnp.take_along_axis(ids, sel, axis=-1)        # (B, k_eff)
    if rescore:
        rows = jnp.take(items, cand.reshape(-1), axis=0)
        rows = rows.reshape(cand.shape + (items.shape[-1],))
        if rescore_scales is not None:
            sc = jnp.take(rescore_scales, cand, axis=0)  # (B, k_eff)
            rows = rows.astype(jnp.float32) * sc[..., None]
        exact = jnp.einsum("bd,bnd->bn", queries, rows,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        exact = jnp.where(jnp.isfinite(bvals), exact, NEG_INF)
        out_vals, order = jax.lax.top_k(exact, k_eff)
        out_idxs = jnp.take_along_axis(cand, order, axis=-1)
    else:
        out_vals, out_idxs = bvals, cand
    # -inf slots (catalog smaller than k, masked rows) index 0, like siblings
    out_idxs = jnp.where(jnp.isfinite(out_vals), out_idxs, 0)
    if k_eff < k:
        pad = k - k_eff
        out_vals = jnp.pad(out_vals, ((0, 0), (0, pad)),
                           constant_values=NEG_INF)
        out_idxs = jnp.pad(out_idxs, ((0, 0), (0, pad)))
    return out_vals, out_idxs


def _affinity_kernel(bound_ref, q_ref, actx_ref, artx_ref, items_ref,
                     ids_ref, m1_ref, id1_ref, m2_ref, id2_ref,
                     *, bins: int, n_ctx: int):
    """One grid step of the playlist-affinity scan: max-over-context-slot
    dots + 0.1 album/artist membership boosts (models/playlist.py
    affinity_scores, spotify/models.py:74-80), folded into the per-bin
    top-2 accumulators. All in-kernel math is 2-D (leading-dim indexed
    loads only) — the safest Mosaic lowering."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        m1_ref[:] = jnp.full(m1_ref.shape, NEG_INF, jnp.float32)
        m2_ref[:] = jnp.full(m2_ref.shape, NEG_INF, jnp.float32)
        id1_ref[:] = jnp.zeros(id1_ref.shape, jnp.int32)
        id2_ref[:] = jnp.zeros(id2_ref.shape, jnp.int32)

    s = None
    for c in range(n_ctx):  # static, unrolled: C is the context width (~5)
        d = jax.lax.dot_general(
            q_ref[c], items_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (B, L)
        s = d if s is None else jnp.maximum(s, d)
    ids = ids_ref[0]                                   # (8, L) payload tile
    alb = ids[0:1, :]                                  # (1, L) album ids
    art = ids[1:2, :]                                  # (1, L) artist ids
    in_alb = None
    in_art = None
    for c in range(n_ctx):
        ea = actx_ref[c] == alb                        # (B, 1) == (1, L)
        er = artx_ref[c] == art
        in_alb = ea if in_alb is None else (in_alb | ea)
        in_art = er if in_art is None else (in_art | er)
    s = s + 0.1 * in_alb.astype(jnp.float32)
    s = s + 0.1 * in_art.astype(jnp.float32)

    gid = b * bins + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(gid < bound_ref[0, 0], s, NEG_INF)

    m1, id1 = m1_ref[:], id1_ref[:]
    better1 = s > m1
    loser_v = jnp.where(better1, m1, s)
    loser_i = jnp.where(better1, id1, gid)
    m1_ref[:] = jnp.where(better1, s, m1)
    id1_ref[:] = jnp.where(better1, gid, id1)
    m2 = m2_ref[:]
    better2 = loser_v > m2
    m2_ref[:] = jnp.where(better2, loser_v, m2)
    id2_ref[:] = jnp.where(better2, loser_i, id2_ref[:])


def binned_affinity_candidates(
    ctx_embed: jax.Array,     # (B, C, D) per-slot context embeddings
    items_packed: jax.Array,  # (D, Mp) bf16 from pack_catalog
    item_album: jax.Array,    # (M,) i32 album id per catalog row
    item_artist: jax.Array,   # (M,) i32
    album_ctx: jax.Array,     # (B, C) i32 membership-boost id sets
    artist_ctx: jax.Array,    # (B, C) i32
    num_items: int,
    num_bins: int = 4096,
    valid_count: Optional[jax.Array] = None,
    query_chunk: int = 0,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-bin top-2 of the playlist affinity score, fused into the scan.

    The full-corpus eval (workloads/playlist.py make_eval_step) scores
    every catalog row as ``max_c dot(ctx_c, item) + 0.1*isin(album) +
    0.1*isin(artist)`` then top-k's 2.26M scores per eval batch; this
    kernel computes that exact score block-by-block in VMEM and keeps
    only the per-bin top-2, so neither the (B, M) affinity matrix nor a
    corpus-wide ``lax.top_k`` exists. Same recall model as
    :func:`binned_candidates` (expected losses C(k,3)/L^2).

    ``query_chunk``: VMEM cap on the kernel's resident batch. The (B, L)
    accumulators live in VMEM for the whole scan, so large eval batches
    cannot run in one shot; chunks of this many queries run sequentially
    (``lax.map``), each re-streaming the catalog — at B=2048, chunk=64 and
    2.26M items that is 32 streams of the bf16 catalog (~9 GB), still far
    cheaper than the (B, M) score pass + corpus-wide top_k it replaces.
    0 = auto: the largest multiple of 8 whose state fits the VMEM budget.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, C, D = ctx_embed.shape
    L = max(128, pad_to_multiple(num_bins, 128))
    padded = items_packed.shape[1]
    if items_packed.shape[0] != D or padded % L:
        raise ValueError(
            f"items_packed {items_packed.shape} does not match dim {D} / "
            f"num_bins {L}; build it with pack_catalog(items, num_bins={L})")
    over = _batch_free_bytes(L, D, use_mask=True, use_scales=False)
    if not query_chunk:
        # accumulators+score (B, L)*20B dominate; the catalog block and
        # the (album, artist) payload tile are B-independent
        query_chunk = max(8, ((_VMEM_STATE_BUDGET - over) // (L * 20)) & ~7)
    Bc = pad_to_multiple(min(B, query_chunk), 8)
    if Bc * L * 20 + over > _VMEM_STATE_BUDGET:
        validate_fused_bins(L, D, use_mask=True)
        raise ValueError(
            f"query_chunk={query_chunk} at num_bins={L} overflows the "
            f"fused kernel's VMEM budget; lower it or pass 0 for auto")
    Bp = pad_to_multiple(B, Bc)
    q = ctx_embed.astype(jnp.bfloat16)
    actx = album_ctx.astype(jnp.int32)
    artx = artist_ctx.astype(jnp.int32)
    if Bp != B:
        q = jnp.pad(q, ((0, Bp - B), (0, 0), (0, 0)))
        # pad context ids with -1: never equal to a real catalog id, so
        # padded queries can't perturb accumulator traffic patterns
        actx = jnp.pad(actx, ((0, Bp - B), (0, 0)), constant_values=-1)
        artx = jnp.pad(artx, ((0, Bp - B), (0, 0)), constant_values=-1)
    # payload rows 0/1 = album/artist ids; -2 pad never matches a context
    payload = _pack_payload_rows([item_album, item_artist], padded, L,
                                 fills=[-2, -2])
    nblk = padded // L
    bound = num_items if valid_count is None else jnp.minimum(
        valid_count, num_items)
    bound = jnp.asarray(bound, jnp.int32).reshape(1, 1)

    acc = pl.BlockSpec((Bc, L), lambda b: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_affinity_kernel, bins=L, n_ctx=C),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, Bc, D), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bc, 1), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Bc, 1), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, L), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(acc, acc, acc, acc),
        out_shape=(
            jax.ShapeDtypeStruct((Bc, L), jnp.float32),
            jax.ShapeDtypeStruct((Bc, L), jnp.int32),
            jax.ShapeDtypeStruct((Bc, L), jnp.float32),
            jax.ShapeDtypeStruct((Bc, L), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bc * C * D * padded,
            bytes_accessed=padded * D * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def one_chunk(args):
        qc, ac, rc = args  # (Bc, C, D), (Bc, C), (Bc, C)
        # kernel layouts: (C, Bc, D) for leading-dim slot indexing;
        # (C, Bc, 1) so a static-c load yields the (Bc, 1) compare operand
        return call(bound, qc.transpose(1, 0, 2), ac.T[:, :, None],
                    rc.T[:, :, None], items_packed, payload)

    if Bp == Bc:
        m1, id1, m2, id2 = one_chunk((q, actx, artx))
    else:
        nq = Bp // Bc
        m1, id1, m2, id2 = jax.lax.map(
            one_chunk, (q.reshape(nq, Bc, C, D),
                        actx.reshape(nq, Bc, C),
                        artx.reshape(nq, Bc, C)))
        m1, id1 = m1.reshape(Bp, L), id1.reshape(Bp, L)
        m2, id2 = m2.reshape(Bp, L), id2.reshape(Bp, L)
    vals = jnp.concatenate([m1, m2], axis=-1)[:B]
    ids = jnp.concatenate([id1, id2], axis=-1)[:B]
    return vals, ids


def sharded_fused_topk_over_matrix(
    queries: jax.Array,       # (B, D) replicated
    items: jax.Array,         # (Mp, D) f32 rescore rows, P(model, None)
    items_packed: jax.Array,  # (D, Mp) bf16 scan copy, P(None, model)
    k: int,
    mesh,
    num_bins: int = 4096,
    valid_items: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Catalog-sharded fused scan+select: the fastest single-chip mode
    composed with the beyond-HBM lever.

    Per shard (``shard_map`` over the ``model`` axis): the Pallas kernel
    scans the LOCAL (D, Mp/n) slice of the transposed bf16 catalog into
    per-bin top-2 candidates, a small local ``top_k`` picks k, and the
    exact ``Precision.HIGHEST`` rescore reads LOCAL f32 rows — gathers
    never cross shards. Then the exact exchange of
    ``mips.sharded_topk_over_matrix``: all-gather k x n_shards rescored
    candidates over ICI, one final top-k. ICI cost is identical to the
    exact sharded scan (k x n_shards (f32, i32) pairs per query); the
    per-shard win is the fused kernel's (BENCHMARKS.md chip lattice:
    3.3x the exact scan at 2.26M/k=500).

    ``items``/``items_packed`` must share the padded row count Mp with
    Mp/n_shards a multiple of ``num_bins`` — build the scan copy with
    ``pack_catalog(items, num_bins, shards=n_shards)`` and pad the f32
    rows to its width. ``valid_items``: the true catalog size; padding
    rows score -inf and are never returned.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from esrecsys_tpu.core.mesh import MODEL_AXIS

    n_shards = mesh.shape[MODEL_AXIS]
    total = items.shape[0]
    L = max(128, pad_to_multiple(num_bins, 128))
    if total % n_shards or (total // n_shards) % L:
        raise ValueError(
            f"padded rows {total} must divide into {n_shards} shards of "
            f"whole {L}-wide bin blocks; use pack_catalog(..., shards=n)")
    if items_packed.shape[1] != total:
        raise ValueError(
            f"items_packed width {items_packed.shape[1]} != f32 rows "
            f"{total}; pad both to the same Mp")
    rps = total // n_shards
    valid = total if valid_items is None else valid_items
    k_local = min(k, rps)

    def local_fn(q, lres, lpacked):
        shard = jax.lax.axis_index(MODEL_AXIS)
        base = shard * rps
        bound = jnp.clip(valid - base, 0, rps)
        vals, ids = binned_candidates(
            q, lpacked, rps, num_bins=L, valid_count=bound,
            interpret=interpret)
        bvals, sel = jax.lax.top_k(vals, k_local)
        cand = jnp.take_along_axis(ids, sel, axis=-1)     # local rows
        rows = jnp.take(lres, cand.reshape(-1), axis=0)
        rows = rows.reshape(cand.shape + (lres.shape[-1],))
        exact = jnp.einsum("bd,bnd->bn", q, rows,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        exact = jnp.where(jnp.isfinite(bvals), exact, NEG_INF)
        v, order = jax.lax.top_k(exact, k_local)
        li = jnp.take_along_axis(cand, order, axis=-1)
        gi = jnp.where(jnp.isfinite(v), base + li, 0)
        v_g = jax.lax.all_gather(v, MODEL_AXIS, axis=-1, tiled=True)
        i_g = jax.lax.all_gather(gi, MODEL_AXIS, axis=-1, tiled=True)
        fv, sel2 = jax.lax.top_k(v_g, min(k, v_g.shape[-1]))
        fi = jnp.take_along_axis(i_g, sel2, axis=-1)
        fi = jnp.where(jnp.isfinite(fv), fi, 0)
        if fv.shape[-1] < k:
            pad = k - fv.shape[-1]
            fv = jnp.pad(fv, ((0, 0), (0, pad)), constant_values=NEG_INF)
            fi = jnp.pad(fi, ((0, 0), (0, pad)))
        return fv, fi

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P(None, MODEL_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, items, items_packed)


def reference_binned_candidates(
    queries: jax.Array,
    items: jax.Array,
    num_bins: int,
    valid_count: Optional[jax.Array] = None,
    item_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Pure-jnp oracle for the kernel's semantics (tests only).

    Scores with the same bf16-in/f32-out contract, then takes each bin's
    top-2 across blocks with ``lax.top_k`` — O(B*M) memory, so keep shapes
    small.
    """
    B, D = queries.shape
    M = items.shape[0]
    L = max(128, pad_to_multiple(num_bins, 128))
    padded = pad_to_multiple(M, L)
    items = jnp.pad(items, ((0, padded - M), (0, 0)))
    nblk = padded // L
    s = jax.lax.dot_general(
        queries.astype(jnp.bfloat16), items.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (B, padded)
    gid = jnp.arange(padded, dtype=jnp.int32)
    bound = M if valid_count is None else jnp.minimum(valid_count, M)
    s = jnp.where(gid[None, :] < bound, s, NEG_INF)
    if item_mask is not None:
        s = s + jnp.where(jnp.pad(item_mask, (0, padded - M)), 0.0, NEG_INF)
    s = s.reshape(B, nblk, L).transpose(0, 2, 1)     # (B, L, nblk)
    g = gid.reshape(nblk, L).T                        # (L, nblk)
    top = min(2, nblk)
    tv, ti = jax.lax.top_k(s, top)                    # (B, L, top)
    tg = jnp.take_along_axis(
        jnp.broadcast_to(g[None], (B, L, nblk)), ti, axis=-1)
    if top < 2:
        tv = jnp.pad(tv, ((0, 0), (0, 0), (0, 1)), constant_values=NEG_INF)
        tg = jnp.pad(tg, ((0, 0), (0, 0), (0, 1)))
    # kernel emits id 0 for never-updated slots; match it
    tg = jnp.where(jnp.isfinite(tv), tg, 0)
    vals = jnp.concatenate([tv[..., 0], tv[..., 1]], axis=-1)
    ids = jnp.concatenate([tg[..., 0], tg[..., 1]], axis=-1)
    return vals, ids
