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
