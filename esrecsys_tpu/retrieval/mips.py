"""Brute-force maximum-inner-product search, TPU-shaped.

The reference's retrieval paths score every query against the WHOLE catalog
in one op and then ``lax.top_k`` over the full score vector:
  * pinterest/make_recommendations.py:49-65 (catalog matmul per scene),
  * spotify/train_spotify.py:113-131 (2.26M-track corpus per eval playlist),
  * wikipedia/models.py:40-55 (score_all materializes the table).
That materializes O(B × M) scores (and for spotify, the full M×D corpus
embedding matrix) in memory.

Here:
  * ``chunked_topk`` streams the catalog in blocks under ``lax.scan``,
    carrying a running (B, k) candidate set — peak memory O(B × (k + block)),
    compile-once, MXU-friendly block matmuls.
  * ``sharded_topk_over_matrix`` shards the catalog rows over the ``model``
    mesh axis with ``shard_map``: each shard computes its local top-k, then
    candidates are all-gathered (k × n_shards per query) and re-topped —
    the corpus-axis parallelism SURVEY.md §5 calls for. ICI traffic is
    O(B × k × n_shards), independent of catalog size.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from esrecsys_tpu.core.mesh import MODEL_AXIS, pad_to_multiple

# np (not jnp): a module-level jnp scalar would initialize the jax backend
# at import time — with JAX_PLATFORMS=axon and a dead relay, `python -m`
# entry points would then hang during import, BEFORE main()'s CPU-fallback
# preflight can run. np.float32 promotes identically in jnp ops.
NEG_INF = np.float32(-np.inf)


def chunked_topk(
    score_block_fn: Callable[[jax.Array], jax.Array],
    num_items: int,
    k: int,
    block_size: int = 8192,
    valid_bound: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming top-k over a virtual score matrix.

    Args:
      score_block_fn: start_index (scalar int) → (B, block_size) scores for
        items [start, start+block). Called inside ``lax.scan``; must be
        jit-traceable with static shapes.
      num_items: catalog size (items >= num_items in the last block are
        masked to -inf).
      k: candidates to keep.
      block_size: catalog rows per block.
      valid_bound: exclusive row bound BELOW ``num_items``, may be a traced
        scalar — the incremental-growth hook: the serving path compiles
        once at capacity ``num_items`` and moves only this bound as rows
        are appended (no recompile; shapes stay static).

    Returns:
      (values (B, k), indices (B, k)), sorted descending per row.

    The true block size is taken from ``score_block_fn``'s output shape;
    callers must return full blocks for out-of-range starts (pad the catalog)
    — rows at index >= num_items are masked to -inf here.
    """
    probe = jax.eval_shape(score_block_fn, jax.ShapeDtypeStruct((), jnp.int32))
    block_size = probe.shape[-1]
    num_blocks = -(-num_items // block_size)
    k_eff = min(k, num_items)
    bound = num_items if valid_bound is None else jnp.minimum(
        valid_bound, num_items)

    def body(carry, b):
        vals, idxs = carry
        start = b * block_size
        scores = score_block_fn(start)  # (B, S)
        local = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
        item_idx = start + local
        scores = jnp.where(item_idx < bound, scores, NEG_INF)
        cat_vals = jnp.concatenate([vals, scores], axis=-1)
        cat_idxs = jnp.concatenate([idxs, item_idx], axis=-1)
        new_vals, sel = jax.lax.top_k(cat_vals, k_eff)
        new_idxs = jnp.take_along_axis(cat_idxs, sel, axis=-1)
        return (new_vals, new_idxs), None

    batch_shape = probe.shape[:-1]
    init = (
        jnp.full(batch_shape + (k_eff,), NEG_INF, jnp.float32),
        jnp.zeros(batch_shape + (k_eff,), jnp.int32),
    )
    (vals, idxs), _ = jax.lax.scan(body, init, jnp.arange(num_blocks))
    if k_eff < k:  # honor requested k with -inf padding
        pad = k - k_eff
        vals = jnp.pad(vals, [(0, 0)] * (vals.ndim - 1) + [(0, pad)], constant_values=NEG_INF)
        idxs = jnp.pad(idxs, [(0, 0)] * (idxs.ndim - 1) + [(0, pad)])
    return vals, idxs


def chunked_grouped_topk(
    score_block_fn: Callable[[jax.Array], jax.Array],
    score_items_fn: Callable[[jax.Array], jax.Array],
    num_items: int,
    k: int,
    block_size: int = 8192,
    group: int = 8,
    valid_bound: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact streaming top-k with a group-max prefilter — ~4-6x cheaper than
    :func:`chunked_topk` on TPU, where ``lax.top_k`` cost is linear in the
    number of scored elements (~1 ns/element on v5e).

    Phase 1 streams the catalog keeping the top-k *groups* of ``group``
    consecutive items, ranked by group max (top_k over ``block/group``
    elements per block instead of ``block``). Phase 2 rescores the k·group
    candidate items and takes the final exact top-k.

    Exactness: any group containing a true top-k item has group-max >= that
    item's score; if such a group were outside the k selected groups, the k
    selected groups would each contain a distinct item scoring above it —
    contradiction. So the k top groups cover all true top-k items. (Exact
    score ties at the k-th boundary may resolve in a different-but-equally-
    scored order than ``lax.top_k``'s index order.)

    The proof assumes phase 1 and phase 2 score with the SAME function at the
    same precision. When the caller rescores at a higher matmul precision
    than phase 1 (e.g. ``Precision.HIGHEST`` rescoring after default
    single-pass-bf16 block scoring — :func:`topk_over_matrix`), the result is
    exact only up to phase-1 rounding at the k-th group boundary: a true
    top-k item whose bf16-rounded group max falls below the k-th group can be
    pruned before the rescore.

    Args:
      score_block_fn: start index → (B, block) scores, as in
        :func:`chunked_topk`.
      score_items_fn: item indices (B, n) → (B, n) scores for arbitrary
        items; used to rescore the k·group candidates. Indices may include
        padding >= num_items; their scores are ignored.
      num_items / k / block_size: as in :func:`chunked_topk`.
      group: items per group; ``block_size`` must be divisible by it.
      valid_bound: as in :func:`chunked_topk` (traced scalar OK) — applied
        in BOTH phases: a beyond-bound row can neither lift its group's
        max nor re-enter via the rescore.

    Returns:
      (values (B, k), indices (B, k)), sorted descending per row.
    """
    probe = jax.eval_shape(score_block_fn, jax.ShapeDtypeStruct((), jnp.int32))
    block_size = probe.shape[-1]
    if block_size % group:
        raise ValueError(f"block_size {block_size} not divisible by group {group}")
    batch_shape = probe.shape[:-1]
    num_blocks = -(-num_items // block_size)
    groups_per_block = block_size // group
    num_groups = num_blocks * groups_per_block
    kg = min(k, num_groups)
    bound = num_items if valid_bound is None else jnp.minimum(
        valid_bound, num_items)

    def body(carry, b):
        gvals, gidxs = carry
        start = b * block_size
        scores = score_block_fn(start)  # (B, S)
        local = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
        scores = jnp.where(start + local < bound, scores, NEG_INF)
        gmax = jnp.max(
            scores.reshape(batch_shape + (groups_per_block, group)), axis=-1)
        gid = (start // group) + jax.lax.broadcasted_iota(
            jnp.int32, gmax.shape, gmax.ndim - 1)
        cat_vals = jnp.concatenate([gvals, gmax], axis=-1)
        cat_idxs = jnp.concatenate([gidxs, gid], axis=-1)
        new_vals, sel = jax.lax.top_k(cat_vals, kg)
        return (new_vals, jnp.take_along_axis(cat_idxs, sel, axis=-1)), None

    init = (
        jnp.full(batch_shape + (kg,), NEG_INF, jnp.float32),
        # distinct out-of-range group ids: if a -inf init slot survives the
        # scan (k close to num_items), its candidates mask out in the rescore
        # instead of duplicating group 0's items
        jnp.broadcast_to(num_groups + jnp.arange(kg, dtype=jnp.int32),
                         batch_shape + (kg,)),
    )
    (gvals, win_groups), _ = jax.lax.scan(body, init, jnp.arange(num_blocks))

    # Phase 2: rescore the winning groups' members exactly.
    cand = win_groups[..., :, None] * group + jnp.arange(group)  # (B, kg, G)
    cand = cand.reshape(batch_shape + (kg * group,))
    # gather clamp stays at the STATIC capacity (safe shapes); validity is
    # the (possibly traced) bound
    cand_scores = score_items_fn(jnp.minimum(cand, num_items - 1))
    cand_scores = jnp.where(cand < bound, cand_scores, NEG_INF)
    k_eff = min(k, num_items)
    vals, sel = jax.lax.top_k(cand_scores, k_eff)
    idxs = jnp.take_along_axis(cand, sel, axis=-1)
    # -inf slots can carry the init's out-of-range group ids (>= capacity
    # when valid_bound < k) — sanitize to 0 like every sibling path so
    # callers can always index id arrays with the result
    idxs = jnp.where(jnp.isfinite(vals), idxs, 0)
    if k_eff < k:
        pad = k - k_eff
        vals = jnp.pad(vals, [(0, 0)] * (vals.ndim - 1) + [(0, pad)],
                       constant_values=NEG_INF)
        idxs = jnp.pad(idxs, [(0, 0)] * (idxs.ndim - 1) + [(0, pad)])
    return vals, idxs


def topk_over_matrix(
    queries: jax.Array,  # (B, D)
    items: jax.Array,    # (M, D)
    k: int,
    block_size: int = 8192,
    group: int = 8,
    valid_count: Optional[jax.Array] = None,
    item_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Dot-product top-k of each query against an in-memory catalog matrix.

    ``group > 0`` uses the group-max prefilter (:func:`chunked_grouped_topk`)
    with a ``Precision.HIGHEST`` rescore; on TPU the phase-1 block scoring
    runs at default (single-pass bf16) matmul precision, so the result is
    exact up to phase-1 rounding at the k-th group boundary (see the
    exactness note in :func:`chunked_grouped_topk`). ``group=0`` falls back
    to the plain streaming top-k at one consistent precision.

    ``valid_count`` (may be a traced scalar): only rows < valid_count are
    real; ``items`` beyond it are preallocated growth capacity (serving
    ``/admin/add_items`` appends rows and moves the bound — one compile
    per CAPACITY, not per catalog size).

    ``item_mask`` ((M,) bool): filtered retrieval — only True rows are
    eligible, enforced in BOTH the block scan and the grouped rescore
    (a masked row can neither lift its group's max nor re-enter via the
    rescore). Cost: one byte/row of extra scan traffic.
    """
    num_items = items.shape[0]
    block = min(block_size, pad_to_multiple(num_items, 128))
    if group and block % group:
        block = pad_to_multiple(block, group)
    padded_rows = pad_to_multiple(num_items, block)
    if padded_rows != num_items:
        # Pad so dynamic_slice never clamps (which would mislabel indices).
        items = jnp.pad(items, ((0, padded_rows - num_items), (0, 0)))
        if item_mask is not None:
            item_mask = jnp.pad(item_mask, (0, padded_rows - num_items))

    def score_block(start):
        blk = jax.lax.dynamic_slice_in_dim(items, start, block, axis=0)
        s = jnp.dot(queries, blk.T, preferred_element_type=jnp.float32)
        if item_mask is not None:
            mblk = jax.lax.dynamic_slice_in_dim(item_mask, start, block)
            s = jnp.where(mblk[None, :], s, NEG_INF)
        return s

    if group:
        def score_items(cand):  # (B, n) indices
            rows = jnp.take(items, cand.reshape(-1), axis=0)
            rows = rows.reshape(cand.shape + (items.shape[-1],))
            # high-precision rescore (TPU default matmul precision is
            # single-pass bf16): the final ranking is exact w.r.t. these
            # scores; phase-1 selection is internally consistent at its own
            # precision, so only items within matmul rounding of the k-th
            # boundary can differ from a full high-precision sort
            s = jnp.einsum("bd,bnd->bn", queries, rows,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            if item_mask is not None:
                s = jnp.where(jnp.take(item_mask, cand, axis=0), s, NEG_INF)
            return s

        return chunked_grouped_topk(
            score_block, score_items, num_items, k, block, group=group,
            valid_bound=valid_count)
    return chunked_topk(score_block, num_items, k, block,
                        valid_bound=valid_count)


def approx_topk_over_matrix(
    queries: jax.Array,  # (B, D)
    items: jax.Array,    # (M, D)
    k: int,
    block_size: int = 262_144,
    recall_target: float = 0.95,
    per_block_k: Optional[int] = None,
    valid_count: Optional[jax.Array] = None,
    item_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate streaming top-k via the TPU's hardware-accelerated
    ``jax.lax.approx_max_k`` (PartialReduce), with an exact high-precision
    rescore of the selected candidates.

    Measured on v5e at 2.26M items, B=256, k=500 (BENCHMARKS.md): 3.7x the
    exact grouped path (11.7k vs 3.1k queries/s) at ~0.956 recall@500 vs the
    exact result — the speed/recall knob the exact path cannot offer
    (pushing ``recall_target`` toward 0.99 makes approx_max_k SLOWER than
    exact selection at this k; ~0.95 is the sweet spot).

    ``per_block_k`` (default ``min(k, 256)``) candidates are kept per
    streamed block. The default assumes top-k items spread across blocks
    (random/hashed item order); for corpora where more than ``per_block_k``
    of the true top k can land in ONE block (e.g. catalog sorted by
    popularity), pass ``per_block_k=k``.

    Serving uses this behind ``RetrievalService(approx=True)``; evals keep
    the exact path so quality metrics stay exact (PARITY_RUNS.md).
    """
    num_items = items.shape[0]
    block = min(block_size, pad_to_multiple(num_items, 128))
    padded_rows = pad_to_multiple(num_items, block)
    if padded_rows != num_items:
        items = jnp.pad(items, ((0, padded_rows - num_items), (0, 0)))
        if item_mask is not None:
            item_mask = jnp.pad(item_mask, (0, padded_rows - num_items))
    nblk = padded_rows // block
    # per-block candidates: never fewer than ceil(k/nblk), or small catalogs
    # (k > nblk*default) would silently pad real results away
    kb = per_block_k or max(-(-k // nblk), min(k, 256))
    kb = min(kb, block)
    qb = queries.astype(jnp.bfloat16)

    def score_block(b):
        blk = jax.lax.dynamic_slice_in_dim(items, b * block, block, axis=0)
        s = jnp.einsum("bd,md->bm", qb, blk.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        if item_mask is not None:
            mblk = jax.lax.dynamic_slice_in_dim(item_mask, b * block, block)
            s = jnp.where(mblk[None, :], s, NEG_INF)
        return s

    return _streamed_candidate_topk(
        score_block, queries, items, num_items, k, block, nblk, kb,
        select="approx", recall_target=recall_target,
        valid_bound=valid_count, item_mask=item_mask)


def _streamed_candidate_topk(
    score_block_fn: Callable[[jax.Array], jax.Array],
    queries: jax.Array,        # (B, D)
    rescore_items: jax.Array,  # (>=num_items, D) full-precision OR int8 rows
    num_items: int,
    k: int,
    block: int,
    nblk: int,
    kb: int,
    select: str,
    recall_target: float,
    rescore_scales: Optional[jax.Array] = None,  # (>=num_items,) f32
    valid_bound: Optional[jax.Array] = None,     # scalar (may be traced)
    item_mask: Optional[jax.Array] = None,       # (>=num_items,) bool
) -> Tuple[jax.Array, jax.Array]:
    """Shared two-phase skeleton for the approx and quantized scans.

    Phase 1 streams blocks under ``lax.scan``: ``score_block_fn(b)`` returns
    the (B, block) scores of block ``b`` (tail rows masked to -inf here),
    and ``kb`` candidates are kept per block — hardware ``approx_max_k``
    when ``select="approx"``, true ``top_k`` otherwise. Phase 2 rescores
    all ``nblk*kb`` candidates from ``rescore_items`` at
    ``Precision.HIGHEST`` and returns the final top-k, so returned scores
    are exact for the returned indices whatever phase 1's precision.

    With ``rescore_scales``, ``rescore_items`` holds int8 rows
    (:func:`quantize_rows` output) and the gathered candidates are
    dequantized before the rescore — the rescore catalog then costs D
    bytes/item instead of 4·D, at the price of int8 rounding (≤ 0.4% of
    the row max) in the returned scores/ranking.

    Indices at -inf slots (k exceeds the real candidates) are sanitized to
    0 so callers can always use them to index id arrays.

    ``valid_bound`` (exclusive, may be a traced scalar) tightens the valid
    row range below ``num_items`` in BOTH phases — the sharded scan passes
    ``global_valid - shard_base`` so a catalog's zero-padding tail can
    neither win a phase-1 slot nor re-enter via its rescored dot (0 beats
    real negative scores). It must be applied before each top_k, not
    after: masking winners post-selection forfeits the slots they stole.

    ``item_mask`` (per-row eligibility — filtered retrieval) follows the
    same both-phases discipline: callers fold it into phase 1's
    ``score_block_fn``; here it guards the RESCORE, because a masked item
    selected as an -inf phase-1 slot would otherwise re-enter with its
    real dot.
    """
    bound = num_items if valid_bound is None else jnp.minimum(
        valid_bound, num_items)

    def body(_, b):
        s = score_block_fn(b)
        loc = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
        s = jnp.where(b * block + loc < bound, s, NEG_INF)
        if select == "approx":
            _, i = jax.lax.approx_max_k(s, kb, recall_target=recall_target)
        else:
            _, i = jax.lax.top_k(s, kb)
        return (), i + b * block

    _, cand = jax.lax.scan(body, (), jnp.arange(nblk))  # (nblk, B, kb)
    cand = jnp.moveaxis(cand, 0, -2).reshape(queries.shape[:-1] + (nblk * kb,))
    safe = jnp.minimum(cand, num_items - 1)
    rows = jnp.take(rescore_items, safe, axis=0)
    if rescore_scales is not None:
        rows = rows.astype(jnp.float32) * jnp.take(
            rescore_scales, safe, axis=0)[..., None]
    cs = jnp.einsum("bd,bnd->bn", queries.astype(jnp.float32), rows,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    ok = cand < bound
    if item_mask is not None:
        ok = ok & jnp.take(item_mask, safe, axis=0)
    cs = jnp.where(ok, cs, NEG_INF)
    k_eff = min(k, nblk * kb)
    vals, sel = jax.lax.top_k(cs, k_eff)
    idxs = jnp.take_along_axis(cand, sel, axis=-1)
    idxs = jnp.where(jnp.isfinite(vals), idxs, 0)
    if k_eff < k:
        pad = k - k_eff
        vals = jnp.pad(vals, [(0, 0)] * (vals.ndim - 1) + [(0, pad)],
                       constant_values=NEG_INF)
        idxs = jnp.pad(idxs, [(0, 0)] * (idxs.ndim - 1) + [(0, pad)])
    return vals, idxs


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: ``x ≈ q * scale[:, None]``.

    Returns ``(q int8 (..., D), scale f32 (...))`` with
    ``scale = max|row| / 127`` (clamped away from zero so all-zero rows
    quantize to zeros instead of NaN). Max per-row relative rounding error
    is 0.5/127 ≈ 0.4% of the row's largest component.
    """
    x = x.astype(jnp.float32)
    # explicit reciprocal multiply (not /127): XLA lowers division that way
    # anyway, and spelling it out keeps quantize_rows_np bit-identical
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), 1e-30) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_rows_np(x) -> Tuple["np.ndarray", "np.ndarray"]:
    """Host-side twin of :func:`quantize_rows` — bit-identical output
    (same scale clamp, same half-to-even rounding, same clip range),
    pinned equal by tests/test_quantized_mips.py. For paths that must
    quantize WITHOUT uploading the f32 matrix to the device first
    (serving's ``rescore_int8`` cold start with prebuilt aux caches)."""
    import numpy as np

    x = np.asarray(x, np.float32)
    scale = (np.maximum(np.max(np.abs(x), axis=-1), np.float32(1e-30))
             * np.float32(1.0 / 127.0))
    q = np.clip(np.rint(x / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale


def quantized_topk_over_matrix(
    queries: jax.Array,        # (B, D) float
    q_items: jax.Array,        # (M, D) int8 (quantize_rows output)
    item_scales: jax.Array,    # (M,) f32
    rescore_items: jax.Array,  # (M, D) float catalog — or int8, see below
    k: int,
    block_size: int = 262_144,
    per_block_k: Optional[int] = None,
    select: str = "exact",
    recall_target: float = 0.95,
    oversample: int = 4,
    rescore_scales: Optional[jax.Array] = None,  # (M,): rescore_items is int8
    valid_count: Optional[jax.Array] = None,
    item_mask: Optional[jax.Array] = None,       # (M,) bool: filtered scan
) -> Tuple[jax.Array, jax.Array]:
    """Streaming top-k scoring the catalog in int8, exact rescore on top.

    Brute-force MIPS over a big catalog is HBM-bandwidth-bound: the exact
    path streams the full f32 matrix per query batch (2.26M × 64 = 579 MB).
    Quantizing the *scan* to int8 cuts that traffic 4× and scores on the
    MXU's double-rate s8×s8→s32 path; the candidates are then rescored
    exactly from the full-precision catalog (``Precision.HIGHEST``), so the
    final ranking is exact over the selected candidate set — only candidate
    SELECTION sees quantization noise (per-row int8 rounding ≤ 0.4% of the
    row max; measured overlap@500 vs the exact path is ≥ 0.99 on Gaussian
    catalogs, tests/test_quantized_mips.py).

    Phase-1 ranking detail: per-query quantization scales are positive
    constants per row, so they cannot change that query's ranking and are
    never applied; per-item scales do reorder items and are.

    ``select="exact"`` keeps the true int8 top-``per_block_k`` per block;
    ``select="approx"`` uses hardware ``approx_max_k`` on the int8 scores
    (both levers compose: int8 cuts scan traffic, approx cuts selection
    cost — the serving knobs ``quantized`` and ``approx`` map here).

    With ``rescore_scales``, pass ``rescore_items=q_items`` and no f32
    catalog need be resident at all: the rescore dequantizes the gathered
    candidates and scores them against the UNQUANTIZED query, which still
    removes phase 1's query-side rounding (phase 1 quantizes both sides) —
    only item-side int8 rounding remains in the returned scores.

    No reference counterpart (the reference scores full f32 matrices —
    pinterest/make_recommendations.py:49-65); this is a serving-path
    optimization the TPU's int8 MXU rate makes natural.
    """
    if select not in ("exact", "approx"):
        raise ValueError(f"select must be 'exact' or 'approx', got {select!r}")
    num_items = q_items.shape[0]
    block = min(block_size, pad_to_multiple(num_items, 128))
    padded_rows = pad_to_multiple(num_items, block)
    if padded_rows != num_items:
        q_items = jnp.pad(q_items, ((0, padded_rows - num_items), (0, 0)))
        item_scales = jnp.pad(item_scales, (0, padded_rows - num_items))
        if item_mask is not None:
            item_mask = jnp.pad(item_mask, (0, padded_rows - num_items))
    nblk = padded_rows // block
    # keep ~oversample*k candidates TOTAL across blocks: int8 rounding can
    # reorder near the k-th boundary, so rescoring only k candidates caps
    # overlap; 4x headroom pushes it to ~0.99 at negligible rescore cost
    # (the rescore touches nblk*kb rows per query, not the catalog)
    kb = per_block_k or min(block, max(-(-oversample * k // nblk), 1))
    qq, _ = quantize_rows(queries)  # query scale dropped: rank-invariant

    def score_block(b):
        blk = jax.lax.dynamic_slice_in_dim(q_items, b * block, block, axis=0)
        sc = jax.lax.dynamic_slice_in_dim(item_scales, b * block, block)
        s_i32 = jax.lax.dot_general(
            qq, blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)  # (B, block)
        s = s_i32.astype(jnp.float32) * sc[None, :]
        if item_mask is not None:
            mblk = jax.lax.dynamic_slice_in_dim(item_mask, b * block, block)
            s = jnp.where(mblk[None, :], s, NEG_INF)
        return s

    return _streamed_candidate_topk(
        score_block, queries, rescore_items, num_items, k, block, nblk, kb,
        select=select, recall_target=recall_target,
        rescore_scales=rescore_scales, valid_bound=valid_count,
        item_mask=item_mask)


def sharded_topk_over_matrix(
    queries: jax.Array,  # (B, D) replicated
    items: jax.Array,    # (M, D), M divisible by model-axis size
    k: int,
    mesh: Mesh,
    block_size: int = 8192,
    valid_items: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Catalog-sharded MIPS: local top-k per shard + all-gather + re-top-k.

    ``valid_items``: true catalog size if ``items`` carries padding rows
    (padding rows score -inf and are never returned).
    """
    n_shards = mesh.shape[MODEL_AXIS]
    total_rows = items.shape[0]
    if total_rows % n_shards:
        raise ValueError(f"catalog rows {total_rows} not divisible by {n_shards} shards")
    rows_per_shard = total_rows // n_shards
    valid = total_rows if valid_items is None else valid_items

    def local_fn(q, local_items):
        shard = jax.lax.axis_index(MODEL_AXIS)
        base = shard * rows_per_shard
        block = min(block_size, rows_per_shard)
        padded = pad_to_multiple(rows_per_shard, block)
        li = (
            jnp.pad(local_items, ((0, padded - rows_per_shard), (0, 0)))
            if padded != rows_per_shard
            else local_items
        )

        def score_block(start):
            blk = jax.lax.dynamic_slice_in_dim(li, start, block, axis=0)
            s = jnp.dot(q, blk.T, preferred_element_type=jnp.float32)
            local = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
            return jnp.where(base + start + local < valid, s, NEG_INF)

        k_local = min(k, rows_per_shard)
        vals, idxs = chunked_topk(score_block, rows_per_shard, k_local, block)
        idxs = idxs + base
        # gather candidates from every shard: (n_shards*k_local,) per query
        vals_g = jax.lax.all_gather(vals, MODEL_AXIS, axis=-1, tiled=True)
        idxs_g = jax.lax.all_gather(idxs, MODEL_AXIS, axis=-1, tiled=True)
        final_vals, sel = jax.lax.top_k(vals_g, k)
        final_idxs = jnp.take_along_axis(idxs_g, sel, axis=-1)
        return final_vals, final_idxs

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, items)


def sharded_quantized_topk_over_matrix(
    queries: jax.Array,       # (B, D) replicated f32
    q_items: jax.Array,       # (M, D) int8, rows sharded P(model, None)
    item_scales: jax.Array,   # (M,) f32, sharded P(model)
    k: int,
    mesh: Mesh,
    rescore_items: Optional[jax.Array] = None,  # (M, D) f32 sharded; None →
                                                # dequantized-int8 rescore
    block_size: int = 262_144,
    per_block_k: Optional[int] = None,
    oversample: int = 4,
    valid_items: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Catalog-sharded MIPS with an int8 local scan — the two beyond-HBM
    levers composed: rows sharded over the ``model`` axis (catalog bigger
    than one chip) AND scanned in int8 (4× less local HBM traffic,
    double-rate MXU; with ``rescore_items=None`` the f32 catalog is not
    resident on ANY chip — D+4 bytes/item total across the mesh).

    Per shard: blocked int8 scan with per-block top-``kb`` candidate
    selection (same two-phase scheme as
    :func:`quantized_topk_over_matrix`), then an exact LOCAL rescore of
    the candidates — gathers never cross shards because candidates are
    local rows — followed by the exact sharded exchange of
    :func:`sharded_topk_over_matrix`: local top-k, all-gather of
    k × n_shards candidates over ICI, re-top-k. Returned scores are exact
    f32 dots when ``rescore_items`` is given, dequantized-int8 dots
    (≤ 0.4%-of-row-max rounding) when it is None.

    ``valid_items``: true catalog size when rows carry padding to divide
    by the shard count — padding can never be returned (masked in phase 1
    AND re-masked after the rescore, since an all-padding block's top-kb
    would otherwise re-enter with its rescored dot).

    No reference counterpart (serving composition); the exact sharded
    scan cites the corpus-axis design at SURVEY.md §5.
    """
    n_shards = mesh.shape[MODEL_AXIS]
    total_rows = q_items.shape[0]
    if total_rows % n_shards:
        raise ValueError(
            f"catalog rows {total_rows} not divisible by {n_shards} shards")
    rps = total_rows // n_shards
    valid = total_rows if valid_items is None else valid_items
    r8 = rescore_items is None
    res = q_items if r8 else rescore_items

    block = min(block_size, pad_to_multiple(rps, 128))
    padded = pad_to_multiple(rps, block)
    nblk = padded // block
    k_local = min(k, rps)
    kb = per_block_k or min(block, max(-(-oversample * k_local // nblk), 1))
    qq, _ = quantize_rows(queries)  # query scale dropped: rank-invariant

    def local_fn(qf, qi, lq, lsc, lres):
        shard = jax.lax.axis_index(MODEL_AXIS)
        base = shard * rps
        if padded != rps:
            lq = jnp.pad(lq, ((0, padded - rps), (0, 0)))
            lsc = jnp.pad(lsc, (0, padded - rps))

        def score_block(b):
            blk = jax.lax.dynamic_slice_in_dim(lq, b * block, block, axis=0)
            sc = jax.lax.dynamic_slice_in_dim(lsc, b * block, block)
            return jax.lax.dot_general(
                qi, blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * sc[None, :]

        # the same two-phase skeleton as the single-chip quantized scan,
        # run per shard: per-block top-kb candidates, LOCAL rescore
        # (gathers never cross shards), local top-k_local. The skeleton's
        # valid_bound (= global validity in this shard's frame) masks BOTH
        # the catalog's zero-padding tail (last shard; would rescore to
        # dot 0 and beat real negative scores) and intra-shard block
        # padding (non-last shards) before each top_k — post-selection
        # masking would forfeit the slots padding stole
        v, li = _streamed_candidate_topk(
            score_block, qf, lres, rps, k_local, block, nblk, kb,
            select="exact", recall_target=0.95,
            rescore_scales=lsc[:rps] if r8 else None,
            valid_bound=valid - base)
        gi = jnp.where(jnp.isfinite(v), base + li, 0)
        v_g = jax.lax.all_gather(v, MODEL_AXIS, axis=-1, tiled=True)
        i_g = jax.lax.all_gather(gi, MODEL_AXIS, axis=-1, tiled=True)
        fv, sel2 = jax.lax.top_k(v_g, k)
        return fv, jnp.take_along_axis(i_g, sel2, axis=-1)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(MODEL_AXIS, None), P(MODEL_AXIS),
                  P(MODEL_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, qq, q_items, item_scales, res)


def sharded_scored_topk(
    query_args: Tuple[jax.Array, ...],
    item_arrays: Tuple[jax.Array, ...],
    score_fn: Callable[..., jax.Array],
    k: int,
    mesh: Mesh,
    block_size: int = 8192,
    valid_items: Optional[int] = None,
    group: int = 0,
):
    """Catalog-sharded top-k with a CUSTOM block scorer.

    Generalizes :func:`sharded_topk_over_matrix` beyond dot products — e.g.
    the playlist affinity (max-dot over context slots + membership boosts,
    spotify/models.py:74-80). Each shard scans its local rows of every array
    in ``item_arrays`` (all sharded ``P(model, ...)`` with equal leading
    dims), scoring blocks via ``score_fn(*query_args, *item_blocks) →
    (B, S)``; local top-k candidates are all-gathered over ``model`` and
    re-topped. ICI traffic: O(B × k × n_shards), catalog-size independent.

    ``group > 0`` applies the exact group-max prefilter inside each shard
    (:func:`chunked_grouped_topk`); score_fn must then ALSO accept per-query
    candidate item arrays shaped (B, n, ...) in addition to shared blocks
    shaped (S, ...) — e.g. the playlist affinity does both
    (models.playlist.affinity_scores).

    Returns (values (B, k), global indices (B, k)).
    """
    n_shards = mesh.shape[MODEL_AXIS]
    total_rows = item_arrays[0].shape[0]
    if total_rows % n_shards:
        raise ValueError(f"catalog rows {total_rows} not divisible by {n_shards} shards")
    rows_per_shard = total_rows // n_shards
    valid = total_rows if valid_items is None else valid_items
    block = min(block_size, rows_per_shard)
    if group:
        block = pad_to_multiple(block, group)
    n_q = len(query_args)

    def local_fn(*args):
        queries, local_items = args[:n_q], args[n_q:]
        shard = jax.lax.axis_index(MODEL_AXIS)
        base = shard * rows_per_shard
        padded = pad_to_multiple(rows_per_shard, block)
        if padded != rows_per_shard:
            local_items = tuple(
                jnp.pad(a, [(0, padded - rows_per_shard)] + [(0, 0)] * (a.ndim - 1))
                for a in local_items
            )

        def score_block(start):
            blocks = tuple(
                jax.lax.dynamic_slice_in_dim(a, start, block, axis=0)
                for a in local_items
            )
            s = score_fn(*queries, *blocks)
            local = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
            return jnp.where(base + start + local < valid, s, NEG_INF)

        k_local = min(k, rows_per_shard)
        if group:
            def score_items(cand):  # (B, n) local indices
                rows = tuple(
                    jnp.take(a, cand.reshape(-1), axis=0).reshape(
                        cand.shape + a.shape[1:])
                    for a in local_items
                )
                s = score_fn(*queries, *rows)
                return jnp.where(base + cand < valid, s, NEG_INF)

            vals, idxs = chunked_grouped_topk(
                score_block, score_items, rows_per_shard, k_local, block,
                group=group)
        else:
            vals, idxs = chunked_topk(score_block, rows_per_shard, k_local, block)
        idxs = idxs + base
        vals_g = jax.lax.all_gather(vals, MODEL_AXIS, axis=-1, tiled=True)
        idxs_g = jax.lax.all_gather(idxs, MODEL_AXIS, axis=-1, tiled=True)
        final_vals, sel = jax.lax.top_k(vals_g, k)
        return final_vals, jnp.take_along_axis(idxs_g, sel, axis=-1)

    item_specs = tuple(
        P(MODEL_AXIS, *([None] * (a.ndim - 1))) for a in item_arrays
    )
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple([P()] * n_q) + item_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(*query_args, *item_arrays)
