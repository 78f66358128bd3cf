import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrecsys_tpu.retrieval import mips


def _brute(queries, items, k):
    scores = np.asarray(queries) @ np.asarray(items).T
    idx = np.argsort(-scores, axis=-1)[:, :k]
    vals = np.take_along_axis(scores, idx, axis=-1)
    return vals, idx


@pytest.mark.parametrize("m,block", [(1000, 128), (1000, 8192), (127, 64), (256, 256)])
def test_topk_over_matrix_matches_brute_force(m, block):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (4, 16))
    items = jax.random.normal(jax.random.fold_in(key, 1), (m, 16))
    k = 10
    vals, idx = jax.jit(
        lambda q, i: mips.topk_over_matrix(q, i, k=k, block_size=block)
    )(q, items)
    bvals, bidx = _brute(q, items, k)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), bidx)


def test_topk_k_larger_than_catalog():
    q = jnp.ones((2, 4))
    items = jnp.eye(4)
    vals, idx = mips.topk_over_matrix(q, items, k=8)
    assert vals.shape == (2, 8)
    assert np.all(np.isneginf(np.asarray(vals)[:, 4:]))


def test_chunked_topk_custom_score_fn():
    # virtual catalog: score of item j for query b is -(j - 10*b)^2
    num_items, block = 500, 128

    def score_block(start):
        j = start + jax.lax.broadcasted_iota(jnp.int32, (3, block), 1)
        b = jax.lax.broadcasted_iota(jnp.int32, (3, block), 0)
        return -jnp.square(j - 10.0 * b)

    vals, idx = jax.jit(
        lambda: mips.chunked_topk(score_block, num_items, k=1, block_size=block)
    )()
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], [0, 10, 20])
    np.testing.assert_allclose(np.asarray(vals)[:, 0], 0.0)


def test_sharded_topk_matches_brute_force(mesh_model8):
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (4, 8))
    m = 512
    items = jax.random.normal(jax.random.fold_in(key, 1), (m, 8))
    items_sharded = jax.device_put(
        items, jax.NamedSharding(mesh_model8, jax.P("model", None))
    )
    vals, idx = jax.jit(
        lambda q, i: mips.sharded_topk_over_matrix(q, i, k=20, mesh=mesh_model8, block_size=64)
    )(q, items_sharded)
    bvals, bidx = _brute(q, items, 20)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), bidx)


def test_sharded_topk_with_padding_rows(mesh_model8):
    # catalog of 500 valid rows padded to 512; padding never returned
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (2, 8))
    valid = 500
    items = jax.random.normal(jax.random.fold_in(key, 1), (512, 8))
    vals, idx = mips.sharded_topk_over_matrix(
        q, items, k=50, mesh=mesh_model8, block_size=64, valid_items=valid
    )
    assert int(np.asarray(idx).max()) < valid
    bvals, bidx = _brute(q, np.asarray(items)[:valid], 50)
    np.testing.assert_array_equal(np.asarray(idx), bidx)


def test_sharded_topk_rejects_bad_shapes(mesh_model8):
    with pytest.raises(ValueError, match="not divisible"):
        mips.sharded_topk_over_matrix(
            jnp.ones((1, 4)), jnp.ones((9, 4)), k=2, mesh=mesh_model8
        )


def test_sharded_scored_topk_custom_affinity(mesh_model8):
    """Custom scorer (max-dot + membership boost) matches a dense computation."""
    key = jax.random.PRNGKey(5)
    B, C, D, M = 3, 4, 8, 256
    ctx = jax.random.normal(key, (B, C, D))
    ctx_ids = jax.random.randint(jax.random.fold_in(key, 1), (B, C), 0, 50)
    items = jax.random.normal(jax.random.fold_in(key, 2), (M, D))
    item_ids = jax.random.randint(jax.random.fold_in(key, 3), (M,), 0, 50)

    def score_fn(ctx, ctx_ids, blk, blk_ids):
        dots = jnp.einsum("sd,bcd->bsc", blk, ctx)
        aff = jnp.max(dots, axis=-1)
        member = jnp.any(blk_ids[None, :, None] == ctx_ids[:, None, :], axis=-1)
        return aff + 0.1 * member

    vals, idx = jax.jit(
        lambda *a: mips.sharded_scored_topk(
            a[:2], a[2:], score_fn, k=17, mesh=mesh_model8, block_size=32
        )
    )(ctx, ctx_ids, items, item_ids)

    dense = np.asarray(score_fn(ctx, ctx_ids, items, item_ids))
    exp_idx = np.argsort(-dense, axis=-1)[:, :17]
    exp_vals = np.take_along_axis(dense, exp_idx, axis=-1)
    np.testing.assert_allclose(np.asarray(vals), exp_vals, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)


def test_chunked_grouped_topk_exact():
    """Group-max prefilter + rescore must match brute-force top-k exactly."""
    from esrecsys_tpu.retrieval.mips import chunked_grouped_topk

    rng = np.random.default_rng(3)
    B, N, K, BLK, G = 4, 1000, 37, 128, 8
    scores = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    padded = jnp.pad(scores, ((0, 0), (0, BLK - N % BLK)))

    def score_block(start):
        return jax.lax.dynamic_slice_in_dim(padded, start, BLK, axis=1)

    def score_items(cand):  # (B, n)
        return jnp.take_along_axis(scores, cand, axis=-1)

    vals, idxs = jax.jit(
        lambda: chunked_grouped_topk(score_block, score_items, N, K, BLK, group=G)
    )()
    ref_vals, ref_idxs = jax.lax.top_k(scores, K)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ref_idxs))


def test_chunked_grouped_topk_k_exceeds_items():
    from esrecsys_tpu.retrieval.mips import chunked_grouped_topk

    rng = np.random.default_rng(4)
    B, N, K, BLK = 2, 50, 64, 32
    scores = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    padded = jnp.pad(scores, ((0, 0), (0, 14)))

    def score_block(start):
        return jax.lax.dynamic_slice_in_dim(padded, start, BLK, axis=1)

    def score_items(cand):
        return jnp.take_along_axis(scores, jnp.minimum(cand, N - 1), axis=-1)

    vals, idxs = chunked_grouped_topk(score_block, score_items, N, K, BLK, group=4)
    assert vals.shape == (B, K) and idxs.shape == (B, K)
    ref_vals, ref_idxs = jax.lax.top_k(scores, N)
    np.testing.assert_allclose(np.asarray(vals[:, :N]), np.asarray(ref_vals), rtol=1e-6)
    assert np.all(np.isneginf(np.asarray(vals[:, N:])))


def test_approx_topk_high_recall_on_cpu():
    """approx_topk_over_matrix: candidate selection + exact rescore reaches
    high recall vs the exact path (CPU approx_max_k falls back to exact
    selection, so this checks plumbing, masking, and padding edges)."""
    import numpy as np

    from esrecsys_tpu.retrieval.mips import approx_topk_over_matrix, topk_over_matrix

    rng = np.random.default_rng(0)
    M, D, B, K = 5000, 16, 4, 50
    items = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    ev, ei = topk_over_matrix(q, items, K, block_size=1024, group=8)
    av, ai = approx_topk_over_matrix(q, items, K, block_size=1024,
                                     per_block_k=K)
    recalls = [len(set(np.asarray(ei)[b]) & set(np.asarray(ai)[b])) / K
               for b in range(B)]
    assert min(recalls) >= 0.9, recalls
    # values sorted descending, within range
    a = np.asarray(av)
    assert (np.diff(a, axis=-1) <= 1e-5).all()


def test_approx_topk_k_exceeds_candidates_pads():
    import numpy as np

    from esrecsys_tpu.retrieval.mips import approx_topk_over_matrix

    rng = np.random.default_rng(1)
    items = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    v, i = approx_topk_over_matrix(q, items, 50, block_size=64, per_block_k=16)
    assert v.shape == (2, 50) and i.shape == (2, 50)
    assert bool(jnp.isneginf(v[:, -1]).all())  # padded tail


def test_approx_topk_small_catalog_returns_real_items():
    """k larger than the default per-block candidates on a single-block
    catalog must still return k REAL items (regression: results were
    silently padded with id 0 / -inf)."""
    import numpy as np

    from esrecsys_tpu.retrieval.mips import approx_topk_over_matrix

    rng = np.random.default_rng(2)
    M, K = 2000, 500
    items = jnp.asarray(rng.normal(size=(M, 8)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    v, i = approx_topk_over_matrix(q, items, K, block_size=262144)
    assert bool(jnp.isfinite(v).all())
    assert len(set(np.asarray(i)[0].tolist())) == K  # k distinct real items


class TestValidCount:
    """valid_count (traced growth bound): capacity-padded scans must
    EQUAL the same scan over the truncated catalog — a poisoned tail
    (high-norm rows that would win every query) can neither take a
    phase-1 slot nor re-enter via a rescore."""

    cap, valid, d, k = 1000, 731, 16, 12

    @pytest.fixture(scope="class")
    def data(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((self.cap, self.d)).astype(np.float32)
        x[self.valid:] = 7.7  # poison: beats every real row if unmasked
        q = rng.standard_normal((5, self.d)).astype(np.float32)
        return jnp.asarray(x), jnp.asarray(x[:self.valid]), jnp.asarray(q)

    def _check(self, got, want):
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))

    def test_plain_and_grouped(self, data):
        xd, xe, qd = data
        vb = jnp.int32(self.valid)
        for group in (0, 8):
            self._check(
                mips.topk_over_matrix(qd, xd, self.k, group=group,
                                      valid_count=vb),
                mips.topk_over_matrix(qd, xe, self.k, group=group))

    def test_quantized_and_approx(self, data):
        xd, xe, qd = data
        vb = jnp.int32(self.valid)
        q8, sc = mips.quantize_rows(xd)
        q8e, sce = mips.quantize_rows(xe)
        self._check(
            mips.quantized_topk_over_matrix(qd, q8, sc, xd, self.k,
                                            valid_count=vb),
            mips.quantized_topk_over_matrix(qd, q8e, sce, xe, self.k))
        self._check(
            mips.approx_topk_over_matrix(qd, xd, self.k, valid_count=vb),
            mips.approx_topk_over_matrix(qd, xe, self.k))

    def test_pq_both_phases(self, data):
        from esrecsys_tpu.retrieval import pq

        xd, xe, qd = data
        vb = jnp.int32(self.valid)
        book = pq.PQCodebook.build(np.asarray(xe), n_subspaces=4,
                                   n_codes=32, iters=5)
        codes_cap = np.zeros((self.cap, 4), np.uint8)
        codes_cap[:self.valid] = book.codes
        cents = jnp.asarray(book.centroids)
        self._check(
            pq.pq_topk(qd, cents, jnp.asarray(codes_cap), self.k,
                       rescore_items=xd, valid_count=vb),
            pq.pq_topk(qd, cents, jnp.asarray(book.codes), self.k,
                       rescore_items=xe))
        self._check(
            pq.pq_topk(qd, cents, jnp.asarray(codes_cap), self.k,
                       valid_count=vb),
            pq.pq_topk(qd, cents, jnp.asarray(book.codes), self.k))

    def test_bound_moves_without_recompile(self, data):
        xd, xe, qd = data
        f = jax.jit(mips.topk_over_matrix, static_argnames=("k", "group"))
        f(qd, xd, k=self.k, group=8, valid_count=jnp.int32(self.valid))
        n_compiles = f._cache_size()
        got = f(qd, xd, k=self.k, group=8,
                valid_count=jnp.int32(self.valid - 100))
        assert f._cache_size() == n_compiles  # traced bound: same program
        self._check(got, mips.topk_over_matrix(
            qd, xe[:self.valid - 100], self.k, group=8))

    def test_valid_below_k_sanitizes_inf_slot_indices(self, data):
        """Review-caught: the grouped path's -inf slots leaked the init's
        out-of-range group ids (>= CAPACITY) when valid_count < k —
        indexing an id array with them crashes. All paths must sanitize
        to 0 like chunked_topk does."""
        xd, _, qd = data
        for fn in (
            lambda: mips.topk_over_matrix(qd, xd, 10, group=8,
                                          valid_count=jnp.int32(5)),
            lambda: mips.topk_over_matrix(qd, xd, 10, group=0,
                                          valid_count=jnp.int32(5)),
            lambda: mips.quantized_topk_over_matrix(
                qd, *mips.quantize_rows(xd), xd, 10,
                valid_count=jnp.int32(5)),
        ):
            vals, idxs = fn()
            idxs = np.asarray(idxs)
            assert idxs.max() < self.cap and idxs.min() >= 0
            finite = np.isfinite(np.asarray(vals))
            assert (idxs[finite] < 5).all()  # real hits within the bound


class TestItemMask:
    """item_mask (filtered retrieval): scans over a catalog whose
    DISALLOWED rows are the global winners must equal brute force over
    the allowed subset — phase-1 selection and phase-2 rescores both
    enforce eligibility (a masked row selected as an -inf slot must not
    re-enter with its real dot)."""

    @pytest.fixture(scope="class")
    def data(self):
        rng = np.random.default_rng(7)
        m, d = 1200, 16
        x = rng.standard_normal((m, d)).astype(np.float32)
        mask = rng.random(m) < 0.3
        x[~mask] *= 3.0  # disallowed rows would win every query unmasked
        q = rng.standard_normal((4, d)).astype(np.float32)
        allowed = np.where(mask)[0]
        truth = allowed[np.argsort(-(q @ x[allowed].T), axis=1)[:, :15]]
        return jnp.asarray(x), jnp.asarray(q), jnp.asarray(mask), truth

    def _assert_exact(self, got, truth):
        vals, idxs = got
        assert np.isfinite(np.asarray(vals)).all()
        np.testing.assert_array_equal(np.asarray(idxs), truth)

    def test_full_scans(self, data):
        xd, qd, md_, truth = data
        k = truth.shape[1]
        for group in (0, 8):
            self._assert_exact(
                mips.topk_over_matrix(qd, xd, k, group=group,
                                      item_mask=md_), truth)
        q8, sc = mips.quantize_rows(xd)
        self._assert_exact(mips.quantized_topk_over_matrix(
            qd, q8, sc, xd, k, item_mask=md_), truth)
        self._assert_exact(mips.approx_topk_over_matrix(
            qd, xd, k, item_mask=md_), truth)

    def test_pq_and_ivf(self, data):
        from esrecsys_tpu.retrieval import ivf, pq

        xd, qd, md_, truth = data
        k = truth.shape[1]
        book = pq.PQCodebook.build(np.asarray(xd), n_subspaces=4,
                                   n_codes=32, iters=6)
        cents = jnp.asarray(book.centroids)
        codes = jnp.asarray(book.codes)
        self._assert_exact(pq.pq_topk(qd, cents, codes, k,
                                      rescore_items=xd, oversample=256,
                                      item_mask=md_), truth)
        index = ivf.IVFIndex.build(xd, 8, iters=5)
        cent = jnp.asarray(index.centroids)
        buckets = jnp.asarray(index.bucket_ids)
        # full probe: only the filter constrains results
        self._assert_exact(ivf.ivf_topk(qd, cent, buckets, xd, k,
                                        nprobe=8, item_mask=md_), truth)
        self._assert_exact(ivf.ivf_pq_topk(
            qd, cent, buckets, xd, k, nprobe=8, pq_centroids=cents,
            pq_codes=codes, oversample=256, item_mask=md_), truth)

    def test_mask_composes_with_valid_count_and_empty_mask(self, data):
        xd, qd, md_, truth = data
        m, d = xd.shape
        k = truth.shape[1]
        cap = m + 300
        xc = jnp.pad(xd, ((0, cap - m), (0, 0)), constant_values=9.9)
        mc = jnp.pad(md_, (0, cap - m), constant_values=True)
        self._assert_exact(mips.topk_over_matrix(
            qd, xc, k, group=8, valid_count=jnp.int32(m), item_mask=mc),
            truth)
        vals, idxs = mips.topk_over_matrix(qd, xd, k, group=8,
                                           item_mask=jnp.zeros(m, bool))
        assert not np.isfinite(np.asarray(vals)).any()
        assert (np.asarray(idxs) == 0).all()  # sanitized
