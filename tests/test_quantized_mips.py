"""Int8-quantized catalog scan (retrieval/mips.quantized_topk_over_matrix).

The quantized path's contract: candidate SELECTION may see int8 rounding
noise, but returned scores are exact full-precision dot products of the
returned indices, and overlap with the exact top-k stays high on
realistically-distributed embeddings.
"""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrecsys_tpu.retrieval import mips
from esrecsys_tpu.retrieval.index import EmbeddingIndex
from esrecsys_tpu.serving.server import RetrievalService, serve


def _brute(queries, items, k):
    scores = np.asarray(queries, np.float64) @ np.asarray(items, np.float64).T
    idx = np.argsort(-scores, axis=-1)[:, :k]
    vals = np.take_along_axis(scores, idx, axis=-1)
    return vals, idx


def test_quantize_rows_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 32)).astype(np.float32) * rng.gamma(
        2.0, 1.0, size=(64, 1)).astype(np.float32)
    x[7] = 0.0  # all-zero row must not NaN
    q, s = jax.jit(mips.quantize_rows)(jnp.asarray(x))
    q, s = np.asarray(q), np.asarray(s)
    assert q.dtype == np.int8 and s.dtype == np.float32
    recon = q.astype(np.float32) * s[:, None]
    # symmetric rounding: |x - q*scale| <= scale/2 elementwise
    assert np.all(np.abs(recon - x) <= s[:, None] * 0.5 + 1e-7)
    assert np.all(recon[7] == 0.0) and np.isfinite(recon).all()


@pytest.mark.parametrize("select", ["exact", "approx"])
def test_quantized_topk_high_overlap_and_exact_rescore(select):
    rng = np.random.default_rng(1)
    items = rng.normal(size=(5000, 32)).astype(np.float32)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    k = 50
    qi, sc = jax.jit(mips.quantize_rows)(jnp.asarray(items))
    vals, idx = jax.jit(
        lambda q, qi, sc, it: mips.quantized_topk_over_matrix(
            q, qi, sc, it, k=k, block_size=1024, select=select)
    )(jnp.asarray(q), qi, sc, jnp.asarray(items))
    vals, idx = np.asarray(vals), np.asarray(idx)
    bvals, bidx = _brute(q, items, k)
    for b in range(q.shape[0]):
        overlap = len(set(idx[b]) & set(bidx[b])) / k
        assert overlap >= 0.95, (select, b, overlap)
        # returned scores are the full-precision dots of the returned rows
        np.testing.assert_allclose(
            vals[b], (q[b] @ items[idx[b]].T), rtol=1e-5)
        # descending order
        assert np.all(np.diff(vals[b]) <= 1e-6)


def test_quantized_topk_k_exceeds_catalog():
    rng = np.random.default_rng(2)
    items = rng.normal(size=(6, 8)).astype(np.float32)
    qi, sc = mips.quantize_rows(jnp.asarray(items))
    vals, idx = mips.quantized_topk_over_matrix(
        jnp.ones((2, 8)), qi, sc, jnp.asarray(items), k=10)
    assert vals.shape == (2, 10)
    assert np.all(np.isneginf(np.asarray(vals)[:, 6:]))
    # the real entries cover the whole catalog exactly once
    assert sorted(np.asarray(idx)[0, :6]) == list(range(6))
    # -inf slots carry SANITIZED indices: callers do ids_array[idx]
    # unconditionally (RetrievalService.topk), so every index must be in
    # range even past the real catalog
    assert np.asarray(idx).max() < 6 and np.asarray(idx).min() >= 0


def test_quantized_topk_rejects_bad_select():
    items = jnp.ones((4, 8))
    qi, sc = mips.quantize_rows(items)
    with pytest.raises(ValueError, match="select"):
        mips.quantized_topk_over_matrix(
            jnp.ones((1, 8)), qi, sc, items, k=2, select="fuzzy")


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    idx = EmbeddingIndex([f"item{i}" for i in range(300)], vecs)
    path = tmp_path_factory.mktemp("qidx") / "catalog.npz"
    idx.save(str(path))
    return idx, str(path)


@pytest.mark.parametrize("approx", [False, True])
def test_service_quantized_overlaps_exact(index, approx):
    idx, _ = index
    exact = RetrievalService(idx, max_k=20, max_batch=4)
    quant = RetrievalService(idx, max_k=20, max_batch=4, quantized=True,
                             approx=approx)
    rng = np.random.default_rng(4)
    q = rng.normal(size=(8, 16)).astype(np.float32)
    eids, _ = exact.topk(q, k=20)
    qids, qvals = quant.topk(q, k=20)
    overlaps = [len(set(eids[b]) & set(qids[b])) / 20 for b in range(8)]
    assert np.mean(overlaps) >= 0.95, overlaps
    # quantized scores are full-precision rescored dots, not int8 scores
    for b in range(8):
        rows = np.array([idx.vector(i) for i in qids[b]])
        np.testing.assert_allclose(qvals[b], q[b] @ rows.T, rtol=1e-5)


def test_serve_quantized_flag_end_to_end(index):
    """serve(quantized=True) (the --quantized CLI flag) must route queries
    through the int8-scan path and answer correctly over HTTP."""
    idx, path = index
    httpd = serve(path, port=0, max_k=10, max_batch=4, coalesce=False,
                  quantized=True)
    assert httpd.service.quantized is True
    assert httpd.service._q_items.dtype == jnp.int8
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        exact = RetrievalService(idx, max_k=10, max_batch=4)
        rng = np.random.default_rng(5)
        q = rng.normal(size=16).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"vector": q.tolist(), "k": 10}).encode())
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        ex_ids, _ = exact.topk(q[None], k=10)
        assert len(set(out["ids"]) & set(ex_ids[0])) / 10 >= 0.9
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_quantized_topk_int8_rescore_without_f32_catalog():
    """rescore_items=q_items + rescore_scales: end-to-end int8 residency.
    Full-candidate selection must equal brute force over the dequantized
    catalog — and the scores must be SHARPER than phase 1 (f32 query side),
    i.e. exact dots of query x dequantized rows."""
    rng = np.random.default_rng(11)
    items = rng.normal(size=(300, 16)).astype(np.float32)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    q8, sc = jax.jit(mips.quantize_rows)(jnp.asarray(items))
    k = 8
    vals, idxs = mips.quantized_topk_over_matrix(
        jnp.asarray(q), q8, sc, q8, k, block_size=128, per_block_k=128,
        rescore_scales=sc)
    deq = np.asarray(q8, np.float32) * np.asarray(sc)[:, None]
    bvals, bidx = _brute(q, deq, k)
    np.testing.assert_array_equal(np.asarray(idxs), bidx)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-4)


def test_quantize_rows_np_bit_identical_to_jax():
    """The host-side twin must be bit-identical to the device quantizer —
    the same catalog must serve the same scores whether or not the f32
    matrix was ever uploaded (serving's rescore_int8 cold start)."""
    rng = np.random.default_rng(5)
    x = np.concatenate([
        rng.normal(size=(50, 16)).astype(np.float32),
        np.zeros((2, 16), np.float32),                    # all-zero rows
        (rng.normal(size=(8, 16)) * 1e-20).astype(np.float32),  # tiny rows
        np.full((1, 16), 63.5, np.float32),               # exact .5 ties
    ])
    qj, sj = jax.jit(mips.quantize_rows)(jnp.asarray(x))
    qn, sn = mips.quantize_rows_np(x)
    np.testing.assert_array_equal(np.asarray(qj), qn)
    np.testing.assert_array_equal(np.asarray(sj), sn)


def _sharded_fixture(valid=1003, shards=4, d=32, seed=0):
    from esrecsys_tpu.core.mesh import make_mesh, pad_to_multiple, table_sharding

    mesh = make_mesh(n_model=shards)
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(valid, d)).astype(np.float32)
    m = pad_to_multiple(valid, shards)
    xp = np.pad(x, ((0, m - valid), (0, 0)))
    q8, sc = mips.quantize_rows_np(xp)
    return (mesh, x,
            jax.device_put(jnp.asarray(q8), table_sharding(mesh, 2)),
            jax.device_put(jnp.asarray(sc), table_sharding(mesh, 1)),
            jax.device_put(jnp.asarray(xp), table_sharding(mesh, 2)),
            rng)


def test_sharded_quantized_full_coverage_matches_bruteforce():
    """Covering per_block_k + exact f32 rescore: the sharded int8 scan
    must equal brute force over the f32 catalog exactly (padding rows —
    row count not divisible by the shard count — never returned)."""
    mesh, x, d_q8, d_sc, d_f32, rng = _sharded_fixture()
    q = rng.normal(size=(5, 32)).astype(np.float32)
    k = 10
    vals, idxs = mips.sharded_quantized_topk_over_matrix(
        jnp.asarray(q), d_q8, d_sc, k, mesh, rescore_items=d_f32,
        block_size=128, per_block_k=128, valid_items=x.shape[0])
    bs = q.astype(np.float64) @ x.T
    bidx = np.argsort(-bs, axis=-1)[:, :k]
    np.testing.assert_array_equal(np.asarray(idxs), bidx)
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(bs, bidx, -1), rtol=1e-5)
    assert np.all(np.asarray(idxs) < x.shape[0])


def test_sharded_quantized_r8_matches_dequantized_bruteforce():
    """rescore_items=None: no f32 rows on any shard — results equal brute
    force over the DEQUANTIZED catalog (the int8-rescore identity)."""
    mesh, x, d_q8, d_sc, _, rng = _sharded_fixture(seed=1)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    k = 10
    vals, idxs = mips.sharded_quantized_topk_over_matrix(
        jnp.asarray(q), d_q8, d_sc, k, mesh, rescore_items=None,
        block_size=128, per_block_k=128, valid_items=x.shape[0])
    q8h = np.asarray(jax.device_get(d_q8), np.float32)
    sch = np.asarray(jax.device_get(d_sc))
    deq = (q8h * sch[:, None])[: x.shape[0]]
    bs = q.astype(np.float64) @ deq.T
    bidx = np.argsort(-bs, axis=-1)[:, :k]
    np.testing.assert_array_equal(np.asarray(idxs), bidx)
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(bs, bidx, -1), rtol=1e-4)


def test_sharded_quantized_padding_never_wins_on_negative_scores():
    """All-negative true scores: zero-valued padding rows (dot = 0) would
    beat every real row if the rescore re-admitted them — they must stay
    masked after the rescore, not just in phase 1."""
    from esrecsys_tpu.core.mesh import make_mesh, pad_to_multiple, table_sharding

    mesh = make_mesh(n_model=4)
    rng = np.random.default_rng(2)
    valid = 99  # pads to 100: the last shard holds a padding tail
    x = np.abs(rng.normal(size=(valid, 16))).astype(np.float32)
    m = pad_to_multiple(valid, 4)
    xp = np.pad(x, ((0, m - valid), (0, 0)))
    q8, sc = mips.quantize_rows_np(xp)
    q = -np.abs(rng.normal(size=(3, 16))).astype(np.float32)
    vals, idxs = mips.sharded_quantized_topk_over_matrix(
        jnp.asarray(q),
        jax.device_put(jnp.asarray(q8), table_sharding(mesh, 2)),
        jax.device_put(jnp.asarray(sc), table_sharding(mesh, 1)),
        8, mesh, rescore_items=None, block_size=128, per_block_k=64,
        valid_items=valid)
    assert np.all(np.asarray(idxs) < valid), np.asarray(idxs).max()
    assert np.all(np.asarray(vals) < 0)
    # and the answer must BE the brute-force top-k over the dequantized
    # catalog — on this fixture (25 rows/shard padded to a 128 block,
    # kb=64) intra-shard padding once consumed every candidate slot of
    # the non-last shards, making their rows unreachable: idx<valid and
    # vals<0 both still held, so only this equality catches it
    deq = (q8.astype(np.float32) * sc[:, None])[:valid]
    bs = q.astype(np.float64) @ deq.T
    bidx = np.argsort(-bs, axis=-1)[:, :8]
    np.testing.assert_array_equal(np.asarray(idxs), bidx)
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(bs, bidx, -1), rtol=1e-4)


def test_sharded_quantized_last_shard_padding_cannot_starve_slots():
    """True top-k concentrated in the LAST shard (the one holding the
    catalog's zero-padding tail): the padding row's rescored dot (0, above
    every real negative score) must not consume a local candidate slot —
    masking winners AFTER top_k would return k-1 true results plus a
    stowaway from another shard (found by review of commit 88df7ba)."""
    from esrecsys_tpu.core.mesh import make_mesh, pad_to_multiple, table_sharding

    mesh = make_mesh(n_model=4)
    rng = np.random.default_rng(5)
    valid = 99  # rps=25: last shard = rows 75..98 + one zero padding row
    x = np.abs(rng.normal(size=(valid, 16))).astype(np.float32) + 1.0
    x[75:] *= 0.01  # last-shard dots closest to 0 => the ENTIRE true top-8
    m = pad_to_multiple(valid, 4)
    xp = np.pad(x, ((0, m - valid), (0, 0)))
    q8, sc = mips.quantize_rows_np(xp)
    q = -np.abs(rng.normal(size=(3, 16))).astype(np.float32) - 0.5
    vals, idxs = mips.sharded_quantized_topk_over_matrix(
        jnp.asarray(q),
        jax.device_put(jnp.asarray(q8), table_sharding(mesh, 2)),
        jax.device_put(jnp.asarray(sc), table_sharding(mesh, 1)),
        8, mesh, rescore_items=None, block_size=128, per_block_k=64,
        valid_items=valid)
    deq = (q8.astype(np.float32) * sc[:, None])[:valid]
    bs = q.astype(np.float64) @ deq.T
    bidx = np.argsort(-bs, axis=-1)[:, :8]
    assert np.all(bidx >= 75), "fixture broken: top-8 not in last shard"
    np.testing.assert_array_equal(np.asarray(idxs), bidx)
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(bs, bidx, -1), rtol=1e-4)
