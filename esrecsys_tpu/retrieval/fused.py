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


def pack_catalog(items: jax.Array, num_bins: int = 4096) -> jax.Array:
    """(M, D) rows -> the kernel's scan layout: (D, Mp) bf16, Mp padded to a
    multiple of ``num_bins``. Do this ONCE at index build; transposing per
    query would relayout the whole catalog on device each call."""
    L = max(128, pad_to_multiple(num_bins, 128))
    M = items.shape[0]
    padded = pad_to_multiple(M, L)
    it = items.astype(jnp.bfloat16)
    if padded != M:
        it = jnp.pad(it, ((0, padded - M), (0, 0)))
    return it.T


def _kernel(bound_ref, q_ref, items_ref, m1_ref, id1_ref, m2_ref, id2_ref,
            *, bins: int, use_mask: bool, mask_ref=None):
    """One grid step: score a (D, L) catalog block, fold into the bin top-2."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        m1_ref[:] = jnp.full(m1_ref.shape, NEG_INF, jnp.float32)
        m2_ref[:] = jnp.full(m2_ref.shape, NEG_INF, jnp.float32)
        id1_ref[:] = jnp.zeros(id1_ref.shape, jnp.int32)
        id2_ref[:] = jnp.zeros(id2_ref.shape, jnp.int32)

    # (B, D) x (D, L) -> (B, L), bf16 in, f32 accumulation on the MXU
    s = jax.lax.dot_general(
        q_ref[:], items_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gid = b * bins + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(gid < bound_ref[0, 0], s, NEG_INF)
    if use_mask:
        s = s + mask_ref[:]                    # (1, L) additive -inf mask

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
    items_packed: jax.Array,  # (D, Mp) bf16 from pack_catalog
    num_items: int,
    num_bins: int = 4096,
    valid_count: Optional[jax.Array] = None,
    item_mask: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-bin top-2 candidates: (vals (B, 2L) f32, ids (B, 2L) i32).

    ``interpret=None`` auto-selects: compiled Mosaic on TPU, the Pallas
    interpreter elsewhere (CPU test meshes), same semantics either way.
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
    Bp = pad_to_multiple(B, 8)
    q = queries.astype(jnp.bfloat16)
    if Bp != B:
        q = jnp.pad(q, ((0, Bp - B), (0, 0)))
    nblk = padded // L
    bound = num_items if valid_count is None else jnp.minimum(
        valid_count, num_items)
    bound = jnp.asarray(bound, jnp.int32).reshape(1, 1)

    use_mask = item_mask is not None
    inputs = [bound, q, items_packed]
    in_specs = [
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((Bp, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, L), lambda b: (0, b), memory_space=pltpu.VMEM),
    ]
    if use_mask:
        madd = jnp.where(
            jnp.pad(item_mask, (0, padded - item_mask.shape[0])),
            0.0, NEG_INF)
        inputs.append(madd.astype(jnp.float32).reshape(nblk, L))
        in_specs.append(
            pl.BlockSpec((1, L), lambda b: (b, 0), memory_space=pltpu.VMEM))

        def kernel(bound_r, q_r, it_r, mask_r, m1, i1, m2, i2):
            _kernel(bound_r, q_r, it_r, m1, i1, m2, i2,
                    bins=L, use_mask=True, mask_ref=mask_r)
    else:
        kernel = partial(_kernel, bins=L, use_mask=False)

    acc = pl.BlockSpec((Bp, L), lambda b: (0, 0), memory_space=pltpu.VMEM)
    m1, id1, m2, id2 = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=(acc, acc, acc, acc),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, L), jnp.float32),
            jax.ShapeDtypeStruct((Bp, L), jnp.int32),
            jax.ShapeDtypeStruct((Bp, L), jnp.float32),
            jax.ShapeDtypeStruct((Bp, L), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * D * padded,
            bytes_accessed=padded * D * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    vals = jnp.concatenate([m1, m2], axis=-1)[:B]
    ids = jnp.concatenate([id1, id2], axis=-1)[:B]
    return vals, ids


def binned_topk_over_matrix(
    queries: jax.Array,   # (B, D)
    items: jax.Array,     # (M, D) full-precision rows (used for the rescore)
    k: int,
    num_bins: int = 4096,
    valid_count: Optional[jax.Array] = None,
    item_mask: Optional[jax.Array] = None,
    items_packed: Optional[jax.Array] = None,
    rescore: bool = True,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused-scan top-k, API-compatible with ``mips.topk_over_matrix``.

    ``items_packed``: the (D, Mp) bf16 scan copy from :func:`pack_catalog`.
    Pass it whenever the catalog is long-lived (serving keeps it resident,
    +128 B/item over the f32 rows); when omitted it is packed on the fly,
    which relayouts the catalog on device EVERY call — fine for one-shot
    offline jobs, wrong for a query loop.

    Selection happens at the kernel's bf16-matmul precision; the k winners
    are rescored exactly at ``Precision.HIGHEST`` (``rescore=False`` skips
    it and returns the kernel's own scores).
    """
    num_items = items.shape[0]
    k_eff = min(k, num_items)
    # fewer than k/2 bins would guarantee losses; keep 2L >= k
    L = max(num_bins, pad_to_multiple(-(-k_eff // 2), 128))
    if items_packed is None:
        items_packed = pack_catalog(items, num_bins=L)
    vals, ids = binned_candidates(
        queries, items_packed, num_items, num_bins=L,
        valid_count=valid_count, item_mask=item_mask, interpret=interpret)
    bvals, sel = jax.lax.top_k(vals, k_eff)
    cand = jnp.take_along_axis(ids, sel, axis=-1)        # (B, k_eff)
    if rescore:
        rows = jnp.take(items, cand.reshape(-1), axis=0)
        rows = rows.reshape(cand.shape + (items.shape[-1],))
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
