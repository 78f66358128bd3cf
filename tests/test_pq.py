"""Product quantization (retrieval/pq.py): codebook training, codes
layout, ADC search semantics, rescore composition, persistence."""

import jax.numpy as jnp
import numpy as np
import pytest

from esrecsys_tpu.retrieval import pq
from tests.test_ivf import _brute, _mixture


def test_build_shapes_and_distortion_on_clusterable_data():
    rng = np.random.default_rng(0)
    x, _ = _mixture(rng, n_comp=16, per=150, d=16)
    book = pq.PQCodebook.build(x, n_subspaces=4, n_codes=64, iters=10)
    assert book.centroids.shape == (4, 64, 4)
    assert book.codes.shape == (x.shape[0], 4)
    assert book.codes.dtype == np.uint8
    assert book.bytes_per_item == 4  # vs 64 bytes f32: 16x
    # reconstruction keeps most of the signal on clusterable data
    rel = (np.linalg.norm(book.decode() - x, axis=1)
           / np.maximum(np.linalg.norm(x, axis=1), 1e-9))
    assert np.mean(rel) < 0.25, np.mean(rel)


def test_pq_topk_full_candidates_equals_brute_force():
    """per_block_k = block keeps every item as a candidate, so the exact
    rescore must recover brute force EXACTLY — the selection/rescore
    factoring invariant, independent of PQ quality."""
    rng = np.random.default_rng(1)
    x, _ = _mixture(rng, n_comp=8, per=60, d=16)
    book = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    k = 10
    vals, idxs = pq.pq_topk(jnp.asarray(q), jnp.asarray(book.centroids),
                            jnp.asarray(book.codes), k,
                            rescore_items=jnp.asarray(x), block_size=128,
                            per_block_k=128)
    bvals, bidx = _brute(q, x, k)
    np.testing.assert_array_equal(np.asarray(idxs), bidx)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-5)


def test_pq_topk_with_rescore_quality_when_codes_can_distinguish():
    """Quality smoke in a PQ-friendly regime (spread comparable to what
    codebooks can resolve, items shuffled so the top-k spreads across
    blocks): high overlap with the exact top-k, exact returned scores.

    The complement — tightly-clustered items collapsing to tied codes and
    capping recall — is intrinsic to PQ, measured per catalog by
    tools/retrieval_quality_study.py --pq_subspaces."""
    rng = np.random.default_rng(1)
    x, _ = _mixture(rng, n_comp=16, per=150, d=16, spread=0.6)
    x = x[rng.permutation(x.shape[0])]
    book = pq.PQCodebook.build(x, n_subspaces=8, n_codes=128, iters=10)
    q = x[rng.integers(0, x.shape[0], 8)] + rng.normal(
        size=(8, 16)).astype(np.float32) * 0.05
    k = 10
    vals, idxs = pq.pq_topk(jnp.asarray(q), jnp.asarray(book.centroids),
                            jnp.asarray(book.codes), k,
                            rescore_items=jnp.asarray(x), block_size=512,
                            oversample=8)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    _, bidx = _brute(q, x, k)
    ov = np.mean([len(set(idxs[b]) & set(bidx[b])) / k for b in range(8)])
    assert ov >= 0.8, ov
    # rescored values are exact dots of the returned indices
    for b in range(8):
        np.testing.assert_allclose(vals[b], q[b] @ x[idxs[b]].T, rtol=1e-5)


def test_pq_topk_raw_adc_matches_decoded_brute_force():
    """Without a rescore catalog the ranking must equal brute force over
    the DECODED (reconstructed) catalog — the ADC identity."""
    rng = np.random.default_rng(2)
    x, _ = _mixture(rng, n_comp=8, per=80, d=8)
    book = pq.PQCodebook.build(x, n_subspaces=2, n_codes=32, iters=10)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    vals, idxs = pq.pq_topk(jnp.asarray(q), jnp.asarray(book.centroids),
                            jnp.asarray(book.codes), 5, block_size=256)
    dec = book.decode()
    bvals, _ = _brute(q, dec, 5)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-4)
    # indices may permute within score ties (items sharing codes); each
    # returned index's decoded dot must equal its returned value
    for b in range(4):
        np.testing.assert_allclose(
            np.asarray(vals)[b], q[b] @ dec[np.asarray(idxs)[b]].T,
            rtol=1e-4)


def test_pq_build_validation():
    x = np.ones((100, 10), np.float32)
    with pytest.raises(ValueError, match="divisible"):
        pq.PQCodebook.build(x, n_subspaces=3)
    with pytest.raises(ValueError, match="n_codes"):
        pq.PQCodebook.build(x, n_subspaces=2, n_codes=300)
    with pytest.raises(ValueError, match="> items"):
        pq.PQCodebook.build(x, n_subspaces=2, n_codes=256)
    with pytest.raises(ValueError, match="query dim"):
        pq.pq_topk(jnp.ones((2, 8)), jnp.ones((2, 4, 2)),
                   jnp.zeros((10, 2), jnp.uint8), 3)


def test_pq_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    x, _ = _mixture(rng, n_comp=4, per=70, d=8)
    book = pq.PQCodebook.build(x, n_subspaces=2, n_codes=16, iters=5)
    p = str(tmp_path / "pq.npz")
    book.save(p)
    back = pq.PQCodebook.load(p)
    np.testing.assert_array_equal(back.codes, book.codes)
    np.testing.assert_allclose(back.centroids, book.centroids)
    assert back.n_items == book.n_items


def test_pq_topk_k_exceeds_items_pads_and_sanitizes():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(40, 8)).astype(np.float32)
    book = pq.PQCodebook.build(x, n_subspaces=2, n_codes=8, iters=5)
    k = 60
    vals, idxs = pq.pq_topk(jnp.ones((2, 8)), jnp.asarray(book.centroids),
                            jnp.asarray(book.codes), k,
                            rescore_items=jnp.asarray(x), block_size=128)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    assert vals.shape == (2, k)
    assert np.isneginf(vals[:, 40:]).all()
    assert (idxs >= 0).all() and (idxs < 40).all()  # sanitized

def test_rotation_invariants():
    """Rotated codebooks: R is orthonormal, decode returns ORIGINAL-space
    approximations, full-candidate selection still recovers brute force
    exactly (rotation preserves dots), and save/load keeps R."""
    rng = np.random.default_rng(5)
    x, _ = _mixture(rng, n_comp=8, per=60, d=16)
    book = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8,
                               rotate=True)
    r = book.rotation
    assert r is not None and r.shape == (16, 16)
    np.testing.assert_allclose(r @ r.T, np.eye(16), atol=1e-5)
    # decode lives in the original space: mean relative error comparable
    # to the unrotated codebook's (not the rotated-space artifact)
    rel = (np.linalg.norm(book.decode() - x, axis=1)
           / np.maximum(np.linalg.norm(x, axis=1), 1e-9))
    assert np.mean(rel) < 0.5, np.mean(rel)

    q = rng.normal(size=(4, 16)).astype(np.float32)
    vals, idxs = pq.pq_topk(jnp.asarray(q), jnp.asarray(book.centroids),
                            jnp.asarray(book.codes), 10,
                            rescore_items=jnp.asarray(x), block_size=128,
                            per_block_k=128, rotation=jnp.asarray(r))
    from tests.test_ivf import _brute as brute
    bvals, bidx = brute(q, x, 10)
    np.testing.assert_array_equal(np.asarray(idxs), bidx)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-5)


def test_rotation_save_load_and_serving_reachable(tmp_path):
    rng = np.random.default_rng(6)
    x, _ = _mixture(rng, n_comp=4, per=70, d=8)
    book = pq.PQCodebook.build(x, n_subspaces=2, n_codes=16, iters=5,
                               rotate=True)
    p = str(tmp_path / "pq_rot.npz")
    book.save(p)
    back = pq.PQCodebook.load(p)
    np.testing.assert_allclose(back.rotation, book.rotation)
    # unrotated codebooks round-trip rotation=None
    book2 = pq.PQCodebook.build(x, n_subspaces=2, n_codes=16, iters=5)
    p2 = str(tmp_path / "pq_plain.npz")
    book2.save(p2)
    assert pq.PQCodebook.load(p2).rotation is None

    # serving: pq_rotate trains a rotated codebook; queries still exact
    from esrecsys_tpu.retrieval.index import EmbeddingIndex
    from esrecsys_tpu.serving.server import RetrievalService

    idx = EmbeddingIndex([f"r{i}" for i in range(x.shape[0])], x)
    svc = RetrievalService(idx, max_k=5, max_batch=2, pq_subspaces=2,
                           pq_codes=16, pq_rotate=True)
    assert svc.pq.rotation is not None
    ids, scores = svc.topk(x[7][None], k=5)
    # the small catalog makes every item a rescore candidate, so the
    # result must BE brute force (MIPS self-retrieval top-1 is not
    # guaranteed — a same-cluster item with a larger norm can out-dot
    # the query's own vector)
    want = np.argsort(-(x @ x[7]))[:5]
    assert list(ids[0]) == [f"r{i}" for i in want]
    np.testing.assert_allclose(scores[0], (x @ x[7])[want], rtol=1e-4)


def test_pq_topk_int8_rescore_matches_dequantized_brute_force():
    """rescore_scales: full-candidate selection + int8 rescore must equal
    brute force over the DEQUANTIZED catalog (the int8-rescore identity),
    and stay close to the true f32 ranking (int8 rounding only)."""
    import jax

    from esrecsys_tpu.retrieval.mips import quantize_rows

    rng = np.random.default_rng(7)
    x, _ = _mixture(rng, n_comp=8, per=60, d=16)
    book = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    q8, sc = jax.jit(quantize_rows)(jnp.asarray(x))
    k = 10
    vals, idxs = pq.pq_topk(jnp.asarray(q), jnp.asarray(book.centroids),
                            jnp.asarray(book.codes), k,
                            rescore_items=q8, rescore_scales=sc,
                            block_size=128, per_block_k=128)
    deq = np.asarray(q8, np.float32) * np.asarray(sc)[:, None]
    bvals, bidx = _brute(q, deq, k)
    np.testing.assert_array_equal(np.asarray(idxs), bidx)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-4)
    # int8 rounding barely moves the ranking vs the true f32 top-k
    _, fidx = _brute(q, x, k)
    ov = np.mean([len(set(np.asarray(idxs)[b]) & set(fidx[b])) / k
                  for b in range(4)])
    assert ov >= 0.9, ov


def test_pq_build_train_sample_quality_matches_full_training():
    """Codebooks trained on a row subsample must encode the catalog
    about as well as full training: near-equal top-k overlap vs the
    exact scan at the default rescore budget."""
    rng = np.random.default_rng(50)
    x, _ = _mixture(rng, n_comp=8, per=150, d=16)
    q = rng.normal(size=(6, 16)).astype(np.float32)
    k = 10
    _, bidx = _brute(q, x, k)

    def overlap(book):
        _, idxs = pq.pq_topk(jnp.asarray(q), jnp.asarray(book.centroids),
                             jnp.asarray(book.codes), k,
                             rescore_items=jnp.asarray(x),
                             block_size=256, oversample=16)
        return np.mean([len(set(np.asarray(idxs)[b]) & set(bidx[b])) / k
                        for b in range(len(q))])

    full = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8, seed=3)
    samp = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8, seed=3,
                               train_sample=300)
    assert samp.codes.shape == full.codes.shape
    assert overlap(samp) >= overlap(full) - 0.05


def test_encode_same_catalog_is_identity():
    """encode() with the catalog the codebooks were trained on reproduces
    the exact codes (and carries the rotation unchanged)."""
    rng = np.random.default_rng(11)
    x, _ = _mixture(rng)
    book = pq.PQCodebook.build(x, n_subspaces=4, iters=5, rotate=True)
    enc = book.encode(x)
    np.testing.assert_array_equal(book.codes, enc.codes)
    np.testing.assert_array_equal(book.centroids, enc.centroids)
    np.testing.assert_array_equal(book.rotation, enc.rotation)


def test_encode_drifted_catalog_distortion_stays_close():
    """Warm-start codes for a lightly-drifted catalog: distortion within
    a few percent of fully retrained codebooks (the deploy-cycle case)."""
    rng = np.random.default_rng(12)
    x, _ = _mixture(rng)
    book = pq.PQCodebook.build(x, n_subspaces=4, iters=8)
    x2 = x + rng.normal(size=x.shape).astype(np.float32) * 0.03
    warm = book.encode(x2)
    fresh = pq.PQCodebook.build(x2, n_subspaces=4, iters=8)
    d_warm = float(np.linalg.norm(warm.decode() - x2))
    d_fresh = float(np.linalg.norm(fresh.decode() - x2))
    assert warm.n_items == len(x2)
    assert d_warm <= 1.25 * d_fresh, (d_warm, d_fresh)


def test_encode_dim_mismatch_raises():
    rng = np.random.default_rng(13)
    x, _ = _mixture(rng)
    book = pq.PQCodebook.build(x, n_subspaces=4, iters=3)
    with pytest.raises(ValueError, match="dim"):
        book.encode(x[:, :8])


def _correlated(rng, n=2000, d=16, rank=4, noise=0.1):
    """Decaying-spectrum catalog (the geometry where code-budget placement
    matters; same regime where --pq_rotate was decisive)."""
    base = rng.standard_normal((n, rank)).astype(np.float32)
    mix = rng.standard_normal((rank, d)).astype(np.float32)
    return base @ mix + noise * rng.standard_normal((n, d)).astype(np.float32)


def test_anisotropic_eta_validation():
    # eta at the documented formula
    assert pq.anisotropic_eta(0.5, 16) == pytest.approx(15 * 0.25 / 0.75)
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        pq.anisotropic_eta(0.0, 16)
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        pq.anisotropic_eta(1.0, 16)
    with pytest.raises(ValueError, match="1/sqrt"):
        pq.anisotropic_eta(0.1, 16)  # eta < 1 at d=16


def test_anisotropic_build_reduces_score_aware_loss():
    """The coordinate-descent refinement must beat the reconstruction-
    trained init under the loss it optimizes (both steps are exact
    per-block minimizers, so this is a convergence invariant, not a
    tuning accident)."""
    rng = np.random.default_rng(30)
    x = _correlated(rng)
    t = 0.5
    vanilla = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8)
    aniso = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8,
                                anisotropic_threshold=t)
    assert aniso.anisotropic_threshold == t
    l_v = pq.anisotropic_loss(x, vanilla, t)
    l_a = pq.anisotropic_loss(x, aniso, t)
    assert l_a < l_v, (l_a, l_v)


def test_anisotropic_improves_raw_adc_recall_on_correlated_geometry():
    rng = np.random.default_rng(31)
    x = _correlated(rng)
    q = rng.standard_normal((64, x.shape[1])).astype(np.float32)
    exact = np.argsort(-(q @ x.T), axis=1)[:, :10]

    def overlap(book):
        _, idxs = pq.pq_topk(jnp.asarray(q), jnp.asarray(book.centroids),
                             jnp.asarray(book.codes), 10)
        got = np.asarray(idxs)
        return np.mean([len(set(got[i]) & set(exact[i])) / 10
                        for i in range(len(q))])

    vanilla = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8)
    aniso = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8,
                                anisotropic_threshold=0.5)
    assert overlap(aniso) >= overlap(vanilla), \
        (overlap(aniso), overlap(vanilla))


def test_anisotropic_save_load_encode_roundtrip(tmp_path):
    """Threshold persists; encode() of the SAME catalog under the same
    loss stays near the build's loss (assignment-only sweeps from a
    nearest-centroid init reach the same basin); a new catalog encodes
    with the trained loss without retraining."""
    rng = np.random.default_rng(32)
    x = _correlated(rng)
    t = 0.5
    book = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8,
                               anisotropic_threshold=t)
    p = str(tmp_path / "aniso.npz")
    book.save(p)
    loaded = pq.PQCodebook.load(p)
    assert loaded.anisotropic_threshold == pytest.approx(t)
    np.testing.assert_array_equal(loaded.codes, book.codes)
    re = loaded.encode(x)
    assert re.anisotropic_threshold == pytest.approx(t)
    l_build = pq.anisotropic_loss(x, book, t)
    l_re = pq.anisotropic_loss(x, re, t)
    assert l_re <= 1.1 * l_build, (l_re, l_build)


def test_anisotropic_sampled_build_close_to_full():
    rng = np.random.default_rng(33)
    x = _correlated(rng, n=3000)
    t = 0.5
    full = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8,
                               anisotropic_threshold=t)
    sampled = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8,
                                  anisotropic_threshold=t, train_sample=1024)
    l_full = pq.anisotropic_loss(x, full, t)
    l_sampled = pq.anisotropic_loss(x, sampled, t)
    assert l_sampled <= 1.3 * l_full, (l_sampled, l_full)


def test_anisotropic_composes_with_rotation():
    """Rotation + anisotropic: loss is measured in the ORIGINAL space
    (decode undoes the rotation) and still beats the rotated vanilla
    build under the score-aware loss."""
    rng = np.random.default_rng(34)
    x = _correlated(rng)
    t = 0.5
    vanilla = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8,
                                  rotate=True)
    aniso = pq.PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8,
                                rotate=True, anisotropic_threshold=t)
    assert aniso.rotation is not None
    assert pq.anisotropic_loss(x, aniso, t) < pq.anisotropic_loss(
        x, vanilla, t)
