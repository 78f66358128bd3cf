"""IVF sublinear retrieval (retrieval/ivf.py): k-means, cell layout, probe
search semantics, int8 composition, and the service/CLI integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrecsys_tpu.retrieval import ivf, mips
from esrecsys_tpu.retrieval.index import EmbeddingIndex


def _mixture(rng, n_comp=16, per=200, d=16, spread=0.15):
    """Clusterable embeddings: n_comp well-separated component means."""
    means = rng.normal(size=(n_comp, d)).astype(np.float32) * 3.0
    comp = np.repeat(np.arange(n_comp), per)
    x = means[comp] + rng.normal(size=(n_comp * per, d)).astype(
        np.float32) * spread
    return x.astype(np.float32), comp


def _brute(queries, items, k):
    scores = np.asarray(queries, np.float64) @ np.asarray(items, np.float64).T
    idx = np.argsort(-scores, axis=-1)[:, :k]
    return np.take_along_axis(scores, idx, axis=-1), idx


def test_kmeans_recovers_separated_components():
    rng = np.random.default_rng(0)
    x, comp = _mixture(rng)
    cent, assign = jax.jit(ivf.kmeans, static_argnums=(1, 2, 3))(
        jnp.asarray(x), 16, 15, 0)
    assign = np.asarray(assign)
    assert assign.shape == (x.shape[0],)
    # each true component should map mostly to one cell. Random init finds
    # local optima where a couple of components share a cell (vanilla
    # k-means, same as FAISS's default IVF training) — so the bar is a
    # sensible partition (mean purity, every cell used), not perfection;
    # end recall quality is asserted by the probe-search tests below.
    purity = []
    for c in range(16):
        labels = assign[comp == c]
        purity.append(np.bincount(labels).max() / labels.size)
    assert np.mean(purity) >= 0.8, np.mean(purity)
    assert len(np.unique(assign)) == 16  # no empty cells on clusterable data


def test_kmeans_more_clusters_than_distinct_points_keeps_centroids_finite():
    x = np.repeat(np.eye(4, dtype=np.float32), 3, axis=0)  # 12 rows, 4 distinct
    cent, assign = ivf.kmeans(jnp.asarray(x), 8, 5, 0)
    assert np.isfinite(np.asarray(cent)).all()
    assert np.asarray(assign).max() < 8


def test_build_layout_covers_every_item_exactly_once():
    rng = np.random.default_rng(1)
    x, _ = _mixture(rng, n_comp=8, per=50)
    idx = ivf.IVFIndex.build(x, n_clusters=8, iters=10)
    got = idx.bucket_ids[idx.bucket_ids >= 0]
    assert sorted(got.tolist()) == list(range(x.shape[0]))
    assert idx.imbalance >= 1.0
    assert idx.n_items == x.shape[0]


def test_ivf_full_probe_matches_brute_force():
    """nprobe == n_clusters touches every cell → exact result."""
    rng = np.random.default_rng(2)
    x, _ = _mixture(rng, n_comp=8, per=60)
    index = ivf.IVFIndex.build(x, n_clusters=8, iters=10)
    q = rng.normal(size=(4, x.shape[1])).astype(np.float32)
    k = 20
    vals, idxs = jax.jit(
        lambda q, c, b, it: ivf.ivf_topk(q, c, b, it, k=k, nprobe=8)
    )(jnp.asarray(q), jnp.asarray(index.centroids),
      jnp.asarray(index.bucket_ids), jnp.asarray(x))
    bvals, bidx = _brute(q, x, k)
    np.testing.assert_array_equal(np.asarray(idxs), bidx)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-5)


def test_ivf_recall_monotone_in_nprobe_and_high_on_clusterable_data():
    rng = np.random.default_rng(3)
    x, comp = _mixture(rng, n_comp=32, per=100)
    index = ivf.IVFIndex.build(x, n_clusters=32, iters=15)
    # queries near the data manifold (the serving case: query embeddings
    # live where item embeddings live)
    q = x[rng.integers(0, x.shape[0], 8)] + rng.normal(
        size=(8, x.shape[1])).astype(np.float32) * 0.05
    k = 10
    _, bidx = _brute(q, x, k)
    recalls = {}
    for nprobe in (1, 4, 32):
        _, idxs = ivf.ivf_topk(
            jnp.asarray(q), jnp.asarray(index.centroids),
            jnp.asarray(index.bucket_ids), jnp.asarray(x), k=k, nprobe=nprobe)
        idxs = np.asarray(idxs)
        recalls[nprobe] = np.mean(
            [len(set(idxs[b]) & set(bidx[b])) / k for b in range(8)])
    assert recalls[1] <= recalls[4] + 1e-9 <= recalls[32] + 2e-9
    assert recalls[4] >= 0.9, recalls
    assert recalls[32] == 1.0


def test_ivf_int8_composition_overlaps_f32_path():
    rng = np.random.default_rng(4)
    x, _ = _mixture(rng, n_comp=16, per=100)
    index = ivf.IVFIndex.build(x, n_clusters=16, iters=10)
    qi, sc = mips.quantize_rows(jnp.asarray(x))
    q = rng.normal(size=(4, x.shape[1])).astype(np.float32)
    k = 20
    vals_f, idx_f = ivf.ivf_topk(
        jnp.asarray(q), jnp.asarray(index.centroids),
        jnp.asarray(index.bucket_ids), jnp.asarray(x), k=k, nprobe=4)
    vals_q, idx_q = ivf.ivf_topk(
        jnp.asarray(q), jnp.asarray(index.centroids),
        jnp.asarray(index.bucket_ids), jnp.asarray(x), k=k, nprobe=4,
        q_items=qi, item_scales=sc)
    idx_f, idx_q = np.asarray(idx_f), np.asarray(idx_q)
    for b in range(4):
        assert len(set(idx_f[b]) & set(idx_q[b])) / k >= 0.9
        # int8-path scores are full-precision dots of the returned rows
        np.testing.assert_allclose(
            np.asarray(vals_q)[b], q[b] @ x[idx_q[b]].T, rtol=1e-5)


def test_ivf_k_exceeds_candidates_pads_neg_inf():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(40, 8)).astype(np.float32)
    index = ivf.IVFIndex.build(x, n_clusters=8, iters=5)
    l = index.bucket_ids.shape[1]
    k = 2 * l + 5  # more than one cell can hold
    vals, idxs = ivf.ivf_topk(
        jnp.ones((2, 8)), jnp.asarray(index.centroids),
        jnp.asarray(index.bucket_ids), jnp.asarray(x), k=k, nprobe=1)
    vals = np.asarray(vals)
    assert vals.shape == (2, k)
    assert np.all(np.isneginf(vals[:, l:]))  # one cell has <= l real items


def test_ivf_index_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    x, _ = _mixture(rng, n_comp=4, per=30)
    index = ivf.IVFIndex.build(x, n_clusters=4, iters=5)
    p = str(tmp_path / "ivf.npz")
    index.save(p)
    back = ivf.IVFIndex.load(p)
    np.testing.assert_array_equal(back.bucket_ids, index.bucket_ids)
    np.testing.assert_allclose(back.centroids, index.centroids)
    assert back.n_items == index.n_items


def test_service_ivf_mode_and_http_flagpath(tmp_path):
    import json
    import threading
    import urllib.request

    from esrecsys_tpu.serving.server import RetrievalService, serve

    rng = np.random.default_rng(7)
    x, _ = _mixture(rng, n_comp=16, per=60)
    eidx = EmbeddingIndex([f"i{n}" for n in range(x.shape[0])], x)
    path = str(tmp_path / "cat.npz")
    eidx.save(path)

    exact = RetrievalService(eidx, max_k=10, max_batch=4)
    svc = RetrievalService(eidx, max_k=10, max_batch=4,
                           ivf_clusters=16, nprobe=4)
    assert svc.ivf is not None and svc.ivf.n_clusters == 16
    q = x[rng.integers(0, x.shape[0], 6)] + rng.normal(
        size=(6, x.shape[1])).astype(np.float32) * 0.05
    eids, _ = exact.topk(q, k=10)
    iids, _ = svc.topk(q, k=10)
    overlaps = [len(set(eids[b]) & set(iids[b])) / 10 for b in range(6)]
    assert np.mean(overlaps) >= 0.9, overlaps

    httpd = serve(path, port=0, max_k=10, max_batch=4, coalesce=False,
                  ivf_clusters=16, nprobe=4)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"vector": q[0].tolist(), "k": 5}).encode())
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.loads(r.read())
        assert len(out["ids"]) == 5
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_service_ivf_index_path_skips_rebuild(tmp_path, monkeypatch):
    """Second service start with the same ivf_index_path must LOAD the
    prebuilt inverted file, not re-run k-means (the dominant startup cost
    at flagship scale)."""
    from esrecsys_tpu.serving.server import RetrievalService

    rng = np.random.default_rng(9)
    x, _ = _mixture(rng, n_comp=8, per=40)
    eidx = EmbeddingIndex([f"i{n}" for n in range(x.shape[0])], x)
    p = str(tmp_path / "ivf.npz")
    first = RetrievalService(eidx, max_k=5, ivf_clusters=8, ivf_iters=5,
                             ivf_index_path=p)
    import os

    assert os.path.exists(p)

    def boom(*a, **k):
        raise AssertionError("build must not run when the index exists")

    monkeypatch.setattr(ivf.IVFIndex, "build", boom)
    second = RetrievalService(eidx, max_k=5, ivf_clusters=8,
                              ivf_index_path=p)
    np.testing.assert_array_equal(second.ivf.bucket_ids, first.ivf.bucket_ids)
    # stale-index guard: a different catalog must be rejected
    other = EmbeddingIndex(["a", "b"], np.ones((2, x.shape[1]), np.float32))
    with pytest.raises(ValueError, match="built for"):
        RetrievalService(other, ivf_index_path=p)
    # a missing path with no cluster count cannot build anything
    with pytest.raises(ValueError, match="does not exist"):
        RetrievalService(eidx, ivf_index_path=str(tmp_path / "nope.npz"))


def test_service_rejects_ivf_with_scan_modes(tmp_path):
    from esrecsys_tpu.serving.server import RetrievalService

    rng = np.random.default_rng(8)
    x, _ = _mixture(rng, n_comp=4, per=40)
    eidx = EmbeddingIndex([f"i{n}" for n in range(x.shape[0])], x)
    with pytest.raises(ValueError, match="ivf"):
        RetrievalService(eidx, ivf_clusters=4, approx=True)


def _zipf_mixture(rng, n_comp=32, n=4000, d=16):
    """Heavy-tailed component sizes → an imbalanced base IVF build."""
    w = 1.0 / np.arange(1, n_comp + 1) ** 1.1
    w /= w.sum()
    means = rng.normal(size=(n_comp, d)).astype(np.float32) * 3.0
    comp = rng.choice(n_comp, size=n, p=w)
    return (means[comp] + rng.normal(size=(n, d)).astype(np.float32) * 0.2)


def test_build_max_cell_caps_lmax_keeps_coverage_and_exactness():
    rng = np.random.default_rng(10)
    x = _zipf_mixture(rng)
    base = ivf.IVFIndex.build(x, n_clusters=16, iters=10)
    cap = 2 * x.shape[0] // 16
    assert base.bucket_ids.shape[1] > cap  # premise: base IS imbalanced
    idx = ivf.IVFIndex.build(x, n_clusters=16, iters=10, max_cell=cap)
    assert idx.bucket_ids.shape[1] <= cap
    assert idx.n_clusters > 16  # split cells became new cells
    # per-query probe cost is nprobe*Lmax — the cap shrinks the table width
    # (imbalance = Lmax/mean can still rise, since the mean shrinks with C)
    assert idx.bucket_ids.shape[1] < base.bucket_ids.shape[1]
    got = idx.bucket_ids[idx.bucket_ids >= 0]
    assert sorted(got.tolist()) == list(range(x.shape[0]))  # exactly once
    # full probe of the capped index is still the exact result
    q = rng.normal(size=(4, x.shape[1])).astype(np.float32)
    _, idxs = ivf.ivf_topk(
        jnp.asarray(q), jnp.asarray(idx.centroids),
        jnp.asarray(idx.bucket_ids), jnp.asarray(x), k=10,
        nprobe=idx.n_clusters)
    _, bidx = _brute(q, x, 10)
    np.testing.assert_array_equal(np.asarray(idxs), bidx)


def test_build_max_cell_recall_at_equal_scanned_fraction():
    """The point of the cap: per-query work is nprobe*Lmax, so the capped
    index reaches >= the base recall while scanning no more rows."""
    rng = np.random.default_rng(11)
    x = _zipf_mixture(rng, n_comp=32, n=6000)
    base = ivf.IVFIndex.build(x, n_clusters=32, iters=10)
    cap = 2 * x.shape[0] // 32
    capped = ivf.IVFIndex.build(x, n_clusters=32, iters=10, max_cell=cap)
    q = x[rng.integers(0, x.shape[0], 16)] + rng.normal(
        size=(16, x.shape[1])).astype(np.float32) * 0.05
    _, bidx = _brute(q, x, 10)

    def recall_and_cost(index, nprobe):
        _, idxs = ivf.ivf_topk(
            jnp.asarray(q), jnp.asarray(index.centroids),
            jnp.asarray(index.bucket_ids), jnp.asarray(x), k=10,
            nprobe=nprobe)
        idxs = np.asarray(idxs)
        r = np.mean([len(set(idxs[b]) & set(bidx[b])) / 10
                     for b in range(len(q))])
        return r, nprobe * index.bucket_ids.shape[1]

    r_base, cost_base = recall_and_cost(base, 4)
    # capped cells are narrower: pick the largest nprobe within base's cost
    np_capped = max(1, cost_base // capped.bucket_ids.shape[1])
    r_capped, cost_capped = recall_and_cost(capped, np_capped)
    assert cost_capped <= cost_base
    assert r_capped >= r_base - 1e-9, (r_capped, r_base)


def test_build_max_cell_validates_and_handles_degenerate_cells():
    with pytest.raises(ValueError, match="max_cell"):
        ivf.IVFIndex.build(np.ones((20, 4), np.float32), 2, iters=2,
                           max_cell=0)
    # all-identical rows: zero-variance split path must still terminate
    x = np.ones((40, 4), np.float32)
    idx = ivf.IVFIndex.build(x, n_clusters=2, iters=2, max_cell=5)
    assert idx.bucket_ids.shape[1] <= 5
    got = idx.bucket_ids[idx.bucket_ids >= 0]
    assert sorted(got.tolist()) == list(range(40))


def test_service_warns_when_prebuilt_index_ignores_max_cell(tmp_path, caplog):
    import logging

    from esrecsys_tpu.serving.server import RetrievalService

    rng = np.random.default_rng(12)
    x = _zipf_mixture(rng, n_comp=8, n=1200, d=8)
    eidx = EmbeddingIndex([f"i{n}" for n in range(x.shape[0])], x)
    p = str(tmp_path / "ivf.npz")
    RetrievalService(eidx, max_k=5, ivf_clusters=8, ivf_iters=5,
                     ivf_index_path=p)  # built WITHOUT a cap
    with caplog.at_level(logging.WARNING):
        svc = RetrievalService(eidx, max_k=5, ivf_index_path=p,
                               ivf_max_cell=10)
    assert any("ivf_max_cell" in r.message for r in caplog.records)
    assert svc.ivf.bucket_ids.shape[1] > 10  # loaded, uncapped


def test_ivf_pq_full_probe_full_oversample_equals_brute_force():
    """nprobe=C with an oversample covering every probed slot keeps ALL
    candidates through the exact rescore — brute force must come back
    exactly (the selection/rescore factoring invariant for IVF-PQ)."""
    from esrecsys_tpu.retrieval.pq import PQCodebook

    rng = np.random.default_rng(21)
    x, _ = _mixture(rng, n_comp=8, per=60, d=16)
    index = ivf.IVFIndex.build(x, n_clusters=8, iters=8)
    book = PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    k = 10
    pl = index.n_clusters * index.bucket_ids.shape[1]
    vals, idxs = ivf.ivf_pq_topk(
        jnp.asarray(q), jnp.asarray(index.centroids),
        jnp.asarray(index.bucket_ids), jnp.asarray(x), k,
        nprobe=index.n_clusters,
        pq_centroids=jnp.asarray(book.centroids),
        pq_codes=jnp.asarray(book.codes),
        oversample=-(-pl // k))  # oversample*k >= nprobe*L
    bvals, bidx = _brute(q, x, k)
    np.testing.assert_array_equal(np.asarray(idxs), bidx)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-5)


def test_ivf_pq_recall_monotone_in_nprobe_and_scores_exact():
    from esrecsys_tpu.retrieval.pq import PQCodebook

    rng = np.random.default_rng(22)
    x, _ = _mixture(rng, n_comp=16, per=120, d=16, spread=0.6)
    x = x[rng.permutation(x.shape[0])]
    index = ivf.IVFIndex.build(x, n_clusters=16, iters=10)
    book = PQCodebook.build(x, n_subspaces=8, n_codes=64, iters=8)
    q = x[rng.integers(0, x.shape[0], 16)] + rng.normal(
        size=(16, 16)).astype(np.float32) * 0.05
    k = 10
    _, bidx = _brute(q, x, k)
    recalls = []
    for nprobe in (1, 4, 16):
        vals, idxs = ivf.ivf_pq_topk(
            jnp.asarray(q), jnp.asarray(index.centroids),
            jnp.asarray(index.bucket_ids), jnp.asarray(x), k, nprobe,
            pq_centroids=jnp.asarray(book.centroids),
            pq_codes=jnp.asarray(book.codes), oversample=8)
        vals, idxs = np.asarray(vals), np.asarray(idxs)
        recalls.append(np.mean(
            [len(set(idxs[b]) & set(bidx[b])) / k for b in range(16)]))
        # returned scores are exact dots of the returned indices
        for b in range(16):
            got = vals[b][np.isfinite(vals[b])]
            np.testing.assert_allclose(
                got, (q[b] @ x[idxs[b][: got.size]].T), rtol=1e-4)
    assert recalls[0] <= recalls[1] + 0.05 <= recalls[2] + 0.1, recalls
    assert recalls[-1] >= 0.9, recalls


def test_ivf_pq_with_rotation_matches_unrotated_quality_shape():
    """A rotated codebook must plug in transparently (rotation applied to
    the LUT query only; rescore exact either way)."""
    from esrecsys_tpu.retrieval.pq import PQCodebook

    rng = np.random.default_rng(23)
    x, _ = _mixture(rng, n_comp=8, per=80, d=16)
    index = ivf.IVFIndex.build(x, n_clusters=8, iters=8)
    book = PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8,
                            rotate=True)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    pl = index.n_clusters * index.bucket_ids.shape[1]
    vals, idxs = ivf.ivf_pq_topk(
        jnp.asarray(q), jnp.asarray(index.centroids),
        jnp.asarray(index.bucket_ids), jnp.asarray(x), 5,
        nprobe=index.n_clusters,
        pq_centroids=jnp.asarray(book.centroids),
        pq_codes=jnp.asarray(book.codes),
        oversample=-(-pl // 5),
        rotation=jnp.asarray(book.rotation))
    bvals, bidx = _brute(q, x, 5)
    np.testing.assert_array_equal(np.asarray(idxs), bidx)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-5)


def test_ivf_pq_int8_rescore_matches_dequantized_brute_force():
    """item_scales: full probe + covering oversample with an int8 rescore
    catalog must equal brute force over the DEQUANTIZED catalog — the
    f32-free residency variant of the factoring invariant."""
    import jax

    from esrecsys_tpu.retrieval.mips import quantize_rows
    from esrecsys_tpu.retrieval.pq import PQCodebook

    rng = np.random.default_rng(31)
    x, _ = _mixture(rng, n_comp=8, per=60, d=16)
    index = ivf.IVFIndex.build(x, n_clusters=8, iters=8)
    book = PQCodebook.build(x, n_subspaces=4, n_codes=32, iters=8)
    q8, sc = jax.jit(quantize_rows)(jnp.asarray(x))
    q = rng.normal(size=(4, 16)).astype(np.float32)
    k = 10
    pl = index.n_clusters * index.bucket_ids.shape[1]
    vals, idxs = ivf.ivf_pq_topk(
        jnp.asarray(q), jnp.asarray(index.centroids),
        jnp.asarray(index.bucket_ids), q8, k,
        nprobe=index.n_clusters,
        pq_centroids=jnp.asarray(book.centroids),
        pq_codes=jnp.asarray(book.codes),
        oversample=-(-pl // k),
        item_scales=sc)
    deq = np.asarray(q8, np.float32) * np.asarray(sc)[:, None]
    bvals, bidx = _brute(q, deq, k)
    np.testing.assert_array_equal(np.asarray(idxs), bidx)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-4)


def test_ivf_topk_int8_rescore_without_f32_catalog():
    """q_items + rescore_scales with items=q_items: plain-IVF residency
    drops to int8. Selection is phase-1's (both sides int8), so the test
    asserts the rescore identity — each returned score is the exact f32
    dot of the query with the DEQUANTIZED row — plus high overlap with
    dequantized brute force (only the k-th boundary can wobble)."""
    import jax

    from esrecsys_tpu.retrieval.mips import quantize_rows

    rng = np.random.default_rng(32)
    x, _ = _mixture(rng, n_comp=8, per=50, d=16)
    index = ivf.IVFIndex.build(x, n_clusters=8, iters=8)
    q8, sc = jax.jit(quantize_rows)(jnp.asarray(x))
    q = rng.normal(size=(3, 16)).astype(np.float32)
    k = 10
    vals, idxs = ivf.ivf_topk(
        jnp.asarray(q), jnp.asarray(index.centroids),
        jnp.asarray(index.bucket_ids), q8, k,
        nprobe=index.n_clusters, q_items=q8, item_scales=sc,
        rescore_scales=sc)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    deq = np.asarray(q8, np.float32) * np.asarray(sc)[:, None]
    for b in range(3):
        np.testing.assert_allclose(vals[b], q[b] @ deq[idxs[b]].T, rtol=1e-4)
        assert np.all(np.diff(vals[b]) <= 1e-6)  # descending after re-sort
    _, bidx = _brute(q, deq, k)
    ov = np.mean([len(set(idxs[b]) & set(bidx[b])) / k for b in range(3)])
    assert ov >= 0.9, ov


def test_kmeans_train_sample_matches_full_training_quality():
    """Sample-trained centroids must cluster a separable mixture as well
    as full training: same downstream IVF recall at full probe coverage,
    and near-identical assignment purity at modest nprobe."""
    rng = np.random.default_rng(40)
    x, _ = _mixture(rng, n_comp=8, per=200, d=16)
    q = rng.normal(size=(8, 16)).astype(np.float32)
    k = 10

    def recall(index, nprobe):
        _, idxs = ivf.ivf_topk(
            jnp.asarray(q), jnp.asarray(index.centroids),
            jnp.asarray(index.bucket_ids), jnp.asarray(x), k, nprobe=nprobe)
        _, bidx = _brute(q, x, k)
        return np.mean([len(set(np.asarray(idxs)[b]) & set(bidx[b])) / k
                        for b in range(len(q))])

    full = ivf.IVFIndex.build(x, n_clusters=8, iters=10, seed=1)
    samp = ivf.IVFIndex.build(x, n_clusters=8, iters=10, seed=1,
                              train_sample=256)
    assert samp.centroids.shape == full.centroids.shape
    assert samp.n_items == full.n_items
    # on 8 well-separated components, a 256-row sample finds the same
    # structure: both reach full recall when every cell is probed, and
    # sampling costs at most a point or two at nprobe=4
    assert recall(samp, nprobe=8) == 1.0
    assert recall(samp, nprobe=4) >= recall(full, nprobe=4) - 0.1


def test_kmeans_train_sample_validation_and_noop():
    rng = np.random.default_rng(41)
    x = rng.normal(size=(100, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="train_sample"):
        ivf.kmeans(jnp.asarray(x), 16, iters=2, train_sample=8)
    # sample >= M degenerates to full training (identical trajectories)
    c1, a1 = ivf.kmeans(jnp.asarray(x), 4, iters=3, seed=2)
    c2, a2 = ivf.kmeans(jnp.asarray(x), 4, iters=3, seed=2,
                        train_sample=100)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-6)


def test_reassign_same_catalog_is_identity():
    """reassign() with the catalog it was built on reproduces the exact
    cell table: same centroids -> same nearest-centroid assignment."""
    rng = np.random.default_rng(3)
    x, _ = _mixture(rng)
    idx = ivf.IVFIndex.build(x, 16, iters=5)
    re = idx.reassign(x)
    np.testing.assert_array_equal(idx.centroids, re.centroids)
    np.testing.assert_array_equal(idx.bucket_ids, re.bucket_ids)
    assert re.n_items == idx.n_items


def test_reassign_drifted_catalog_keeps_probe_recall():
    """Warm-start layout for a lightly-drifted catalog (the deploy-cycle
    case): no k-means, yet probe recall stays at the rebuilt index's
    level because the old centroids still partition the new geometry."""
    rng = np.random.default_rng(4)
    x, _ = _mixture(rng)
    idx = ivf.IVFIndex.build(x, 16, iters=8)
    x2 = x + rng.normal(size=x.shape).astype(np.float32) * 0.03
    warm = idx.reassign(x2)
    assert warm.n_clusters == idx.n_clusters  # no splitting without cap
    q = x2[rng.integers(0, len(x2), 32)] + rng.normal(
        size=(32, x.shape[1])).astype(np.float32) * 0.01
    _, exact = _brute(q, x2, 10)
    _, got = ivf.ivf_topk(jnp.asarray(q), jnp.asarray(warm.centroids),
                          jnp.asarray(warm.bucket_ids), jnp.asarray(x2),
                          k=10, nprobe=4)
    got = np.asarray(got)
    overlap = np.mean([len(set(got[i]) & set(exact[i])) / 10
                       for i in range(len(q))])
    assert overlap >= 0.9, overlap


def test_reassign_reapplies_cell_cap():
    """max_cell carries over: a cell the new catalog overfills is split
    again, growing C — the documented reuse-cycle ratchet."""
    rng = np.random.default_rng(5)
    x, _ = _mixture(rng, n_comp=4, per=100)
    cap = 60
    idx = ivf.IVFIndex.build(x, 4, iters=8, max_cell=cap)
    assert idx.bucket_ids.shape[1] <= cap
    # pile most new rows into one component to overfill its cell
    x2 = np.concatenate([x, x[:50] + 0.01]).astype(np.float32)
    warm = idx.reassign(x2, max_cell=cap)
    assert warm.bucket_ids.shape[1] <= cap
    assert warm.n_items == len(x2)
    got = np.sort(warm.bucket_ids[warm.bucket_ids >= 0])
    np.testing.assert_array_equal(got, np.arange(len(x2)))  # a partition


def test_reassign_dim_mismatch_raises():
    rng = np.random.default_rng(6)
    x, _ = _mixture(rng)
    idx = ivf.IVFIndex.build(x, 8, iters=3)
    with pytest.raises(ValueError, match="dim"):
        idx.reassign(x[:, :8])
