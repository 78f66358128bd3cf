"""Fused Pallas scan+select kernel (retrieval/fused.py).

Runs on the CPU test mesh via the Pallas interpreter (interpret auto-picks
when the backend is not TPU) — semantics are identical to compiled Mosaic;
the chip throughput half lives in BENCHMARKS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrecsys_tpu.retrieval.fused import (
    auto_bins,
    binned_candidates,
    binned_topk_over_matrix,
    pack_catalog,
    pack_catalog_int8,
    reference_binned_candidates,
)
from esrecsys_tpu.retrieval.mips import topk_over_matrix


def _data(seed=0, b=5, d=16, m=1000):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    return q, items


def test_kernel_matches_reference_oracle():
    q, items = _data()
    packed = pack_catalog(items, num_bins=128)
    kv, ki = binned_candidates(q, packed, items.shape[0], num_bins=128)
    rv, ri = reference_binned_candidates(q, items, num_bins=128)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(rv), rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(ki), np.asarray(ri))


def test_exact_when_catalog_fits_one_block():
    # M <= num_bins: one block, every item its own bin -> exact result
    q, items = _data(m=200)
    fv, fi = binned_topk_over_matrix(q, items, 10, num_bins=256)
    ev, ei = topk_over_matrix(q, items, 10, group=0)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ei))
    np.testing.assert_allclose(np.asarray(fv), np.asarray(ev), rtol=1e-6)


def test_recall_at_collision_pressure():
    # M/L = 8 items per bin; top-2 slots keep recall high
    q, items = _data(m=1000)
    k = 20
    fv, fi = binned_topk_over_matrix(q, items, k, num_bins=128)
    _, ei = topk_over_matrix(q, items, k, group=0)
    recalls = [
        len(set(np.asarray(fi[b]).tolist())
            & set(np.asarray(ei[b]).tolist())) / k
        for b in range(q.shape[0])
    ]
    assert np.mean(recalls) >= 0.9
    # returned values must be exact scores of the returned ids (rescore)
    rows = np.asarray(items)[np.asarray(fi[0])]
    expect = rows @ np.asarray(q[0])
    np.testing.assert_allclose(np.asarray(fv[0]), expect, rtol=1e-5)


def test_valid_count_and_item_mask():
    q, items = _data(m=1000)
    rng = np.random.default_rng(1)
    mask = jnp.asarray(rng.random(1000) > 0.5)
    bound = 700
    fv, fi = binned_topk_over_matrix(
        q, items, 20, num_bins=128,
        valid_count=jnp.int32(bound), item_mask=mask)
    fi_np, fv_np = np.asarray(fi), np.asarray(fv)
    mask_np = np.asarray(mask)
    finite = np.isfinite(fv_np)
    assert finite.any()
    assert (fi_np[finite] < bound).all()
    assert mask_np[fi_np[finite]].all()


def test_k_exceeds_catalog_pads_like_siblings():
    q, items = _data(m=50)
    fv, fi = binned_topk_over_matrix(q, items, 64, num_bins=128)
    assert fv.shape == (q.shape[0], 64)
    assert not np.isfinite(np.asarray(fv[:, 50:])).any()
    assert (np.asarray(fi[:, 50:]) == 0).all()


def test_traced_valid_count_no_recompile_growth_semantics():
    # the serving growth hook: same compiled fn, moving bound
    q, items = _data(m=512)
    packed = pack_catalog(items, num_bins=128)
    f = jax.jit(lambda q, p, n: binned_topk_over_matrix(
        q, items, 5, num_bins=128, valid_count=n, items_packed=p))
    _, i_small = f(q, packed, jnp.int32(100))
    _, i_full = f(q, packed, jnp.int32(512))
    assert np.asarray(i_small).max() < 100
    assert np.asarray(i_full).max() >= 100


def test_batch_padding_roundtrip():
    # B not a multiple of 8 pads internally and trims back
    q, items = _data(b=3, m=300)
    fv, fi = binned_topk_over_matrix(q, items, 7, num_bins=512)
    ev, ei = topk_over_matrix(q, items, 7, group=0)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ei))


def test_pack_catalog_shape_validation():
    q, items = _data()
    packed = pack_catalog(items, num_bins=128)  # pads M=1000 -> 1024
    with pytest.raises(ValueError):  # 1024 is not a multiple of 384
        binned_candidates(q, packed, items.shape[0], num_bins=384)


def test_auto_bins_respects_vmem_budget():
    assert auto_bins(64, 4096) == 4096
    big = auto_bins(1024, 8192)
    assert big < 8192 and big >= 128
    state = 1024 * big * 20
    assert state <= 12 * 1024 * 1024


def test_validate_fused_bins_floor():
    # the batch-independent footprint + the minimum 8-query state is a
    # floor query chunking cannot shrink; past it Mosaic lowering fails on
    # real TPU — the validator turns that into a construction-time error
    from esrecsys_tpu.retrieval.fused import validate_fused_bins

    validate_fused_bins(4096, 64)  # the flagship serving shape fits
    with pytest.raises(ValueError, match="VMEM"):
        validate_fused_bins(1 << 20, 64)
    # the kernel entry raises the same error instead of a Mosaic crash
    q, items = _data(m=256)
    with pytest.raises(ValueError, match="VMEM"):
        binned_candidates(q, pack_catalog(items, 1 << 20), items.shape[0],
                          num_bins=1 << 20)


def test_server_construction_rejects_oversized_bins():
    from esrecsys_tpu.retrieval.index import EmbeddingIndex
    from esrecsys_tpu.serving.server import RetrievalService

    rng = np.random.default_rng(0)
    idx = EmbeddingIndex([f"i{j}" for j in range(64)],
                         rng.normal(size=(64, 64)).astype(np.float32))
    with pytest.raises(ValueError, match="VMEM"):
        RetrievalService(idx, max_k=10, fused=True, fused_bins=1 << 20)


def test_int8_rescore_requires_scales():
    # int8 rescore rows without scales would silently score raw codes
    q, items = _data(m=200)
    codes, scales = pack_catalog_int8(items, num_bins=256)
    q8 = np.clip(np.asarray(items) * 10, -127, 127).astype(np.int8)
    with pytest.raises(ValueError, match="rescore_scales"):
        binned_topk_over_matrix(q, jnp.asarray(q8), 10, num_bins=256,
                                items_packed=codes, item_scales=scales)
    with pytest.raises(ValueError, match="int8"):
        binned_topk_over_matrix(
            q, items, 10, num_bins=256, items_packed=codes,
            item_scales=scales,
            rescore_scales=jnp.ones((items.shape[0],), jnp.float32))


# ---------------- int8 fused scan (pack_catalog_int8 / item_scales) --------


def test_int8_scan_exact_when_catalog_fits_one_block():
    # one block, one item per bin: selection survives quantization (order
    # can only change between near-ties) and the f32 rescore returns
    # exact HIGHEST-precision scores for the returned ids
    q, items = _data(m=200)
    codes, scales = pack_catalog_int8(items, num_bins=256)
    assert codes.dtype == jnp.int8 and scales.shape == (8, 256)
    fv, fi = binned_topk_over_matrix(
        q, items, 10, num_bins=256, items_packed=codes, item_scales=scales)
    ev, ei = topk_over_matrix(q, items, 10, group=0)
    for b in range(q.shape[0]):
        inter = set(np.asarray(fi[b]).tolist()) & set(
            np.asarray(ei[b]).tolist())
        assert len(inter) >= 9  # ±0.4%-of-row-max noise can swap near-ties
    got = np.einsum("bkd,bd->bk", np.asarray(items)[np.asarray(fi)],
                    np.asarray(q))
    np.testing.assert_allclose(np.asarray(fv), got, rtol=1e-5)


def test_int8_scan_recall_under_collision_pressure():
    q, items = _data(m=1000)
    k = 20
    codes, scales = pack_catalog_int8(items, num_bins=128)
    fv, fi = binned_topk_over_matrix(
        q, items, k, num_bins=128, items_packed=codes, item_scales=scales)
    _, ei = topk_over_matrix(q, items, k, group=0)
    recalls = [
        len(set(np.asarray(fi[b]).tolist())
            & set(np.asarray(ei[b]).tolist())) / k
        for b in range(q.shape[0])
    ]
    assert np.mean(recalls) >= 0.85  # bin collisions + quantization noise


def test_int8_rescore_scales_f32_free_contract():
    # rescore_scales: candidates rescored from dequantized int8 rows —
    # scores match the f32 rescore within the quantization tolerance
    from esrecsys_tpu.retrieval.mips import quantize_rows

    q, items = _data(m=500)
    codes, scales = pack_catalog_int8(items, num_bins=512)
    q8, s8 = quantize_rows(items)
    fv, fi = binned_topk_over_matrix(
        q, items, 10, num_bins=512, items_packed=codes, item_scales=scales)
    rv, ri = binned_topk_over_matrix(
        q, q8, 10, num_bins=512, items_packed=codes, item_scales=scales,
        rescore_scales=s8)
    # same candidates in, so ids agree up to rescore-noise reorderings
    row_max = np.abs(np.asarray(items)).max(axis=-1).max()
    tol = float(np.abs(np.asarray(q)).sum(axis=-1).max() * row_max / 127)
    for b in range(q.shape[0]):
        assert len(set(np.asarray(fi[b]).tolist())
                   & set(np.asarray(ri[b]).tolist())) >= 8
    np.testing.assert_allclose(np.asarray(rv), np.asarray(fv), atol=tol)


def test_int8_layout_validation():
    q, items = _data()
    codes, scales = pack_catalog_int8(items, num_bins=128)
    packed_f = pack_catalog(items, num_bins=128)
    with pytest.raises(ValueError):  # scales demand an int8 scan copy
        binned_candidates(q, packed_f, items.shape[0], num_bins=128,
                          item_scales=scales)
    with pytest.raises(ValueError):  # wrong scales shape for this L
        binned_candidates(q, codes, items.shape[0], num_bins=128,
                          item_scales=scales[:, :64])


def test_scales_are_flat_row_major():
    # pack_catalog_codes lays scales out so flat item index i lives at
    # (i // L, i % L) — the contract serving's add_items flat-update uses
    from esrecsys_tpu.retrieval.fused import pack_catalog_codes
    from esrecsys_tpu.retrieval.mips import quantize_rows

    _, items = _data(m=300)
    q8, s8 = quantize_rows(items)
    codes, binned = pack_catalog_codes(q8, s8, num_bins=128)
    m = items.shape[0]
    flat = np.asarray(binned).reshape(-1)[:m]
    np.testing.assert_array_equal(flat, np.asarray(s8))
    np.testing.assert_array_equal(np.asarray(codes)[:, :m],
                                  np.asarray(q8).T)


def test_query_chunking_is_invisible():
    # chunked and one-shot scans select the SAME candidates; values agree
    # to dot-reduction noise (the (Bc, D) x (D, L) tile shape changes)
    q, items = _data(b=13, m=600)
    packed = pack_catalog(items, num_bins=128)
    v1, i1 = binned_candidates(q, packed, items.shape[0], num_bins=128)
    v2, i2 = binned_candidates(q, packed, items.shape[0], num_bins=128,
                               query_chunk=8)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    codes, scales = pack_catalog_int8(items, num_bins=128)
    v3, i3 = binned_candidates(q, codes, items.shape[0], num_bins=128,
                               item_scales=scales)
    v4, i4 = binned_candidates(q, codes, items.shape[0], num_bins=128,
                               item_scales=scales, query_chunk=8)
    np.testing.assert_allclose(np.asarray(v3), np.asarray(v4), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i4))


def test_int8_composes_with_mask_and_valid_count():
    q, items = _data(m=500)
    codes, scales = pack_catalog_int8(items, num_bins=512)
    rng = np.random.default_rng(3)
    mask = jnp.asarray(rng.random(items.shape[0]) < 0.5)
    fv, fi = binned_topk_over_matrix(
        q, items, 10, num_bins=512, items_packed=codes, item_scales=scales,
        item_mask=mask, valid_count=jnp.int32(400))
    m = np.asarray(mask)
    for b in range(q.shape[0]):
        for v, i in zip(np.asarray(fv[b]), np.asarray(fi[b])):
            if np.isfinite(v):
                assert m[i] and i < 400


# ---------------- fused affinity eval kernel (binned_affinity_candidates) --


def _affinity_data(seed=0, b=5, c=4, d=16, m=1000, nalb=50, nart=30):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(b, c, d)), jnp.float32),      # ctx
        jnp.asarray(rng.normal(size=(m, d)), jnp.float32),         # items
        jnp.asarray(rng.integers(0, nalb, m), jnp.int32),          # alb
        jnp.asarray(rng.integers(0, nart, m), jnp.int32),          # art
        jnp.asarray(rng.integers(0, nalb, (b, c)), jnp.int32),     # actx
        jnp.asarray(rng.integers(0, nart, (b, c)), jnp.int32),     # artx
    )


def _affinity_oracle(ctx, items, alb, art, actx, artx, L, padded):
    """Per-bin top-2 of affinity_scores at the kernel's bf16 contract."""
    from esrecsys_tpu.models.playlist import affinity_scores

    B, M = ctx.shape[0], items.shape[0]
    aff = affinity_scores(ctx, items, alb, art, actx, artx,
                          compute_dtype=jnp.bfloat16)
    aff = jnp.pad(aff, ((0, 0), (0, padded - M)), constant_values=-np.inf)
    nblk = padded // L
    s = aff.reshape(B, nblk, L).transpose(0, 2, 1)
    tv, ti = jax.lax.top_k(s, 2)
    gid = jnp.arange(padded, dtype=jnp.int32).reshape(nblk, L).T
    tg = jnp.take_along_axis(
        jnp.broadcast_to(gid[None], (B, L, nblk)), ti, axis=-1)
    tg = jnp.where(jnp.isfinite(tv), tg, 0)
    return (jnp.concatenate([tv[..., 0], tv[..., 1]], -1),
            jnp.concatenate([tg[..., 0], tg[..., 1]], -1))


def test_affinity_kernel_matches_oracle():
    from esrecsys_tpu.retrieval.fused import binned_affinity_candidates

    ctx, items, alb, art, actx, artx = _affinity_data()
    L = 128
    packed = pack_catalog(items, L)
    kv, ki = binned_affinity_candidates(
        ctx, packed, alb, art, actx, artx, items.shape[0], num_bins=L)
    ov, oi = _affinity_oracle(ctx, items, alb, art, actx, artx, L,
                              packed.shape[1])
    np.testing.assert_allclose(np.asarray(kv), np.asarray(ov), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ki), np.asarray(oi))


def test_affinity_kernel_query_chunking_is_invisible():
    from esrecsys_tpu.retrieval.fused import binned_affinity_candidates

    ctx, items, alb, art, actx, artx = _affinity_data(b=21)
    packed = pack_catalog(items, 128)
    one = binned_affinity_candidates(
        ctx, packed, alb, art, actx, artx, items.shape[0], num_bins=128,
        query_chunk=1024)
    chk = binned_affinity_candidates(
        ctx, packed, alb, art, actx, artx, items.shape[0], num_bins=128,
        query_chunk=8)
    np.testing.assert_array_equal(np.asarray(one[0]), np.asarray(chk[0]))
    np.testing.assert_array_equal(np.asarray(one[1]), np.asarray(chk[1]))


def test_affinity_kernel_valid_count_bounds_candidates():
    from esrecsys_tpu.retrieval.fused import binned_affinity_candidates

    ctx, items, alb, art, actx, artx = _affinity_data()
    packed = pack_catalog(items, 128)
    kv, ki = binned_affinity_candidates(
        ctx, packed, alb, art, actx, artx, items.shape[0], num_bins=128,
        valid_count=jnp.int32(600))
    fin = np.isfinite(np.asarray(kv))
    assert fin.any()
    assert (np.asarray(ki)[fin] < 600).all()


def test_affinity_boosts_change_ranking():
    """The membership boosts must actually reach the kernel scores: an
    item whose album is in the query's context outranks an identical
    item whose album is not."""
    from esrecsys_tpu.retrieval.fused import binned_affinity_candidates

    d = 16
    # two identical embeddings; only the album id differs
    items = jnp.ones((2, d), jnp.float32) * 0.1
    alb = jnp.asarray([7, 8], jnp.int32)
    art = jnp.asarray([100, 100], jnp.int32)
    ctx = jnp.ones((1, 2, d), jnp.float32) * 0.1
    actx = jnp.asarray([[7, 7]], jnp.int32)     # context contains album 7
    artx = jnp.asarray([[999, 999]], jnp.int32)
    packed = pack_catalog(items, 128)
    kv, ki = binned_affinity_candidates(
        ctx, packed, alb, art, actx, artx, 2, num_bins=128)
    order = np.asarray(ki)[0][np.argsort(-np.asarray(kv)[0])[:2]]
    assert order[0] == 0  # boosted item first
    vals = np.sort(np.asarray(kv)[0])[::-1][:2]
    np.testing.assert_allclose(vals[0] - vals[1], 0.1, atol=1e-6)


# --------------------------- sharded fused scan (mesh candidate exchange) --


def test_sharded_fused_exact_when_shards_fit_one_block():
    from esrecsys_tpu.core.mesh import make_mesh
    from esrecsys_tpu.retrieval.fused import sharded_fused_topk_over_matrix

    mesh = make_mesh(n_data=2, n_model=4)
    rng = np.random.default_rng(0)
    M, D, L = 900, 16, 256  # padded to 1024 -> 256 rows/shard = one block
    items = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(6, D)), jnp.float32)
    packed = pack_catalog(items, L, shards=4)
    items_p = jnp.pad(items, ((0, packed.shape[1] - M), (0, 0)))
    fv, fi = sharded_fused_topk_over_matrix(
        q, items_p, packed, 10, mesh, num_bins=L, valid_items=M)
    ev, ei = topk_over_matrix(q, items, 10, group=0)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ei))
    np.testing.assert_allclose(np.asarray(fv), np.asarray(ev), rtol=1e-6)


def test_sharded_fused_recall_at_collision_pressure():
    from esrecsys_tpu.core.mesh import make_mesh
    from esrecsys_tpu.retrieval.fused import sharded_fused_topk_over_matrix

    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(1)
    M, D, L, k = 4000, 16, 128, 20  # ~16 items/bin/shard
    items = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(5, D)), jnp.float32)
    packed = pack_catalog(items, L, shards=2)
    items_p = jnp.pad(items, ((0, packed.shape[1] - M), (0, 0)))
    fv, fi = sharded_fused_topk_over_matrix(
        q, items_p, packed, k, mesh, num_bins=L, valid_items=M)
    _, ei = topk_over_matrix(q, items, k, group=0)
    recalls = [
        len(set(np.asarray(fi[b]).tolist())
            & set(np.asarray(ei[b]).tolist())) / k
        for b in range(5)
    ]
    assert np.mean(recalls) >= 0.9
    assert (np.asarray(fi) < M).all()  # padding rows never returned


def test_sharded_fused_validates_layout():
    from esrecsys_tpu.core.mesh import make_mesh
    from esrecsys_tpu.retrieval.fused import sharded_fused_topk_over_matrix

    mesh = make_mesh(n_data=2, n_model=4)
    items = jnp.zeros((512, 16), jnp.float32)
    q = jnp.zeros((2, 16), jnp.float32)
    packed = pack_catalog(items, 256, shards=1)  # 512 cols: 128/shard < 256
    with pytest.raises(ValueError, match="whole"):
        sharded_fused_topk_over_matrix(q, items, packed, 5, mesh,
                                       num_bins=256)
