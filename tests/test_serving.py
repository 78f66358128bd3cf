import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from esrecsys_tpu.retrieval.index import EmbeddingIndex
from esrecsys_tpu.serving.server import RetrievalService, serve


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    idx = EmbeddingIndex([f"item{i}" for i in range(200)], vecs)
    path = tmp_path_factory.mktemp("idx") / "catalog.npz"
    idx.save(str(path))
    return idx, str(path)


def test_service_topk_matches_bruteforce(index):
    idx, _ = index
    svc = RetrievalService(idx, max_k=10, max_batch=4)
    rng = np.random.default_rng(1)
    q = rng.normal(size=(6, 16)).astype(np.float32)  # exercises >1 chunk
    ids, scores = svc.topk(q, k=5)
    assert ids.shape == (6, 5) and scores.shape == (6, 5)
    ref = q @ idx.vectors.T
    for b in range(6):
        want = np.argsort(-ref[b])[:5]
        got = [idx.ids.index(i) for i in ids[b]]
        assert got == list(want)
        np.testing.assert_allclose(scores[b], ref[b][want], rtol=1e-5)


def test_service_item_to_item(index):
    idx, _ = index
    svc = RetrievalService(idx, max_k=3, max_batch=2)
    ids, scores = svc.topk_by_id("item7")
    # an item's nearest dot-product neighbor set includes itself (top score)
    assert "item7" in list(ids)


def test_http_server_end_to_end(index):
    _, path = index
    httpd = serve(path, port=0, max_k=10, max_batch=2)  # port 0 = ephemeral
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["items"] == 200

        q = httpd.service.index.vector("item3").tolist()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"vector": q, "k": 4}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert len(out["ids"]) == 4 and "item3" in out["ids"]

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "item3", "k": 4}).encode(),
        )
        with urllib.request.urlopen(req) as r:
            out2 = json.loads(r.read())
        assert out2["ids"] == out["ids"]

        # error paths
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk", data=b'{"k": 3}')
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_approx_mode_reachable_from_serve_and_overlaps_exact(index):
    """serve(approx=True) (and the --approx CLI flag behind it) must route
    queries through the approx_max_k path and return ≥0.95 overlap with the
    exact top-k over the catalog (VERDICT r2 weak item 4)."""
    idx, path = index
    httpd = serve(path, port=0, max_k=10, max_batch=4, coalesce=False,
                  approx=True, recall_target=0.95)
    port = httpd.server_address[1]
    assert httpd.service.approx is True
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(5)
        exact = RetrievalService(idx, max_k=10, max_batch=4)
        overlaps = []
        for _ in range(8):
            q = rng.normal(size=16).astype(np.float32)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/topk",
                data=json.dumps({"vector": q.tolist(), "k": 10}).encode(),
            )
            with urllib.request.urlopen(req) as r:
                out = json.loads(r.read())
            ex_ids, _ = exact.topk(q[None], k=10)
            overlaps.append(
                len(set(out["ids"]) & set(ex_ids[0])) / 10.0)
        assert np.mean(overlaps) >= 0.95, overlaps
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_query_batcher_coalesces_concurrent_requests(index):
    from esrecsys_tpu.serving.server import QueryBatcher

    idx, _ = index
    svc = RetrievalService(idx, max_k=10, max_batch=8)
    batcher = QueryBatcher(svc, max_wait_ms=50.0)
    rng = np.random.default_rng(2)
    queries = rng.normal(size=(8, 16)).astype(np.float32)
    before = svc.device_calls
    results = [None] * 8

    def worker(i):
        results[i] = batcher.submit(queries[i], k=3)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    batcher.close()
    # correctness: every request got ITS OWN top-k
    ref = queries @ idx.vectors.T
    for i, (ids, scores) in enumerate(results):
        want = np.argsort(-ref[i])[:3]
        assert [idx.ids.index(x) for x in ids] == list(want)
    # coalescing: 8 concurrent requests -> far fewer compiled dispatches
    calls = svc.device_calls - before
    assert calls < 8, calls


def test_text_query_matches_manual_embed(tmp_path):
    """POST /v1/topk with raw text == encoder(text) + manual topk: the
    query-side inference path end-to-end (trained txt2url artifact)."""
    import urllib.error

    from esrecsys_tpu.data.vocab import VocabEntry, Vocabulary, simple_tokenize
    from esrecsys_tpu.models.txt2url import Txt2UrlModel
    from esrecsys_tpu.serving.encoders import txt2url_text_encoder
    from esrecsys_tpu.train import export_model

    import jax
    import jax.numpy as jnp

    # tiny trained-ish txt2url model exported as an artifact
    vocab = Vocabulary([VocabEntry(token=t, frequency=10)
                        for t in ["deep", "learning", "music", "cats"]])
    vocab.save(str(tmp_path / "tok.json"))
    L, D = 6, 8
    model = Txt2UrlModel(word_vocab_size=vocab.num_embeddings,
                         url_vocab_size=32, word_dim=D, rnn_size=D,
                         url_dim=D, encoder_type="mean")
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros(2, jnp.int32), jnp.zeros((2, L), jnp.int32),
        jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32))["params"]
    art = export_model(
        str(tmp_path), "txt2url", params, step=1,
        metadata={"word_dim": D, "url_dim": D, "rnn_size": D,
                  "encoder_type": "mean", "sentence_length": L})

    # catalog = the model's url embeddings (text scores against url space)
    url_vecs = np.asarray(params["url_embedding"]["embedding"], np.float32)
    cat = EmbeddingIndex([f"url{i}" for i in range(url_vecs.shape[0])], url_vecs)
    cat_path = str(tmp_path / "urls.npz")
    cat.save(cat_path)

    encoder = txt2url_text_encoder(art, str(tmp_path / "tok.json"))
    httpd = serve(cat_path, port=0, max_k=5, max_batch=2,
                  encoders={"text": encoder})
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"text": "deep learning music", "k": 5}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            got = json.loads(r.read())
        # manual: embed the same text, brute-force top-5
        vec = encoder("deep learning music")
        want = np.argsort(-(url_vecs @ vec))[:5]
        assert got["ids"] == [f"url{i}" for i in want]

        # unknown query type -> 400 with a helpful message
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"image_key": "nope"}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()

def test_pq_mode_reachable_from_serve_and_finds_self(index, tmp_path):
    """serve(pq_subspaces=S) (and the --pq_subspaces CLI flag behind it)
    must route queries through the PQ ADC scan + exact rescore; an item's
    own vector must retrieve itself (self dot ~||q||^2 dominates even under
    code distortion), with exact returned scores. Also: the codebook saved
    at pq_index_path is reloaded on restart."""
    idx, path = index
    book_path = str(tmp_path / "pq.npz")
    httpd = serve(path, port=0, max_k=10, max_batch=4, coalesce=False,
                  pq_subspaces=4, pq_codes=64, pq_index_path=book_path)
    port = httpd.server_address[1]
    assert httpd.service.pq is not None
    assert httpd.service.pq.bytes_per_item == 4
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        for item in ("item3", "item42"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/topk",
                data=json.dumps({"id": item, "k": 5}).encode(),
            )
            with urllib.request.urlopen(req) as r:
                out = json.loads(r.read())
            assert item in out["ids"], out["ids"]
            # rescored scores are exact dots of the returned ids
            q = idx.vector(item)
            for rid, score in zip(out["ids"], out["scores"]):
                np.testing.assert_allclose(
                    score, float(q @ idx.vector(rid)), rtol=1e-4)
    finally:
        httpd.shutdown()
        httpd.server_close()
    # restart from the saved codebook: identical codes, no retraining
    svc2 = RetrievalService(idx, max_k=10, max_batch=4,
                            pq_index_path=book_path)
    np.testing.assert_array_equal(svc2.pq.codes, httpd.service.pq.codes)


def test_pq_is_exclusive_with_other_scan_modes(index):
    idx, _ = index
    with pytest.raises(ValueError, match="does not compose"):
        RetrievalService(idx, pq_subspaces=4, quantized=True)
    with pytest.raises(ValueError, match="does not compose"):
        RetrievalService(idx, pq_subspaces=4, approx=True)
    with pytest.raises(ValueError, match="does not exist"):
        RetrievalService(idx, pq_index_path="/nonexistent/pq.npz")
    # pq + ivf COMPOSES (IVF-PQ) — see test_ivf_pq_composition_reachable

def test_hot_reload_swaps_catalog_under_live_traffic(index, tmp_path):
    """POST /admin/reload swaps in a new artifact with zero downtime: the
    health/query surface reflects the new catalog, queries issued
    concurrently with the reload all succeed (on old or new service), and
    a configured pq cache is rebuilt for the NEW catalog."""
    idx, path = index
    rng = np.random.default_rng(7)
    new_vecs = rng.normal(size=(120, 16)).astype(np.float32)
    new_idx = EmbeddingIndex([f"new{i}" for i in range(120)], new_vecs)
    new_path = str(tmp_path / "new_catalog.npz")
    new_idx.save(new_path)

    pq_cache = str(tmp_path / "pq_cache.npz")
    httpd = serve(path, port=0, max_k=10, max_batch=4,
                  pq_subspaces=4, pq_codes=32, pq_index_path=pq_cache)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        stop = threading.Event()
        errors = []

        def hammer():
            q = np.asarray(idx.vector("item3"), np.float32).tolist()
            while not stop.is_set():
                try:
                    req = urllib.request.Request(
                        f"http://127.0.0.1:{port}/v1/topk",
                        data=json.dumps({"vector": q, "k": 3}).encode())
                    urllib.request.urlopen(req, timeout=30).read()
                except Exception as e:  # any failed query breaks the test
                    errors.append(e)
        hthread = threading.Thread(target=hammer)
        hthread.start()

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload",
            data=json.dumps({"index": new_path}).encode())
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["status"] == "ok" and out["items"] == 120

        stop.set()
        hthread.join(timeout=30)
        assert not errors, errors

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["items"] == 120 and health["index"] == new_path

        # queries now answer from the new catalog (new ids, exact scores)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "new5", "k": 3}).encode())
        with urllib.request.urlopen(req, timeout=30) as r:
            got = json.loads(r.read())
        assert got["ids"][0].startswith("new") and "new5" in got["ids"]

        # the pq cache was rebuilt for the NEW catalog
        from esrecsys_tpu.retrieval.pq import PQCodebook
        assert PQCodebook.load(pq_cache).n_items == 120

        # reload of a missing file is a clean 400, service keeps running
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload",
            data=json.dumps({"index": "/nonexistent.npz"}).encode())
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert json.loads(r.read())["items"] == 120
    finally:
        httpd.shutdown()
        httpd.server_close()

def test_sharded_service_matches_bruteforce_including_padding(index):
    """n_model_shards=4: catalog rows sharded over the mesh's model axis
    (serving past one chip's HBM); exact results vs brute force, including
    a catalog whose row count does not divide the shard count (padded
    rows must never be returned)."""
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(203, 16)).astype(np.float32)  # 203 % 4 != 0
    idx = EmbeddingIndex([f"s{i}" for i in range(203)], vecs)
    svc = RetrievalService(idx, max_k=10, max_batch=4, n_model_shards=4)
    q = rng.normal(size=(6, 16)).astype(np.float32)
    ids, scores = svc.topk(q, k=10)
    ref = q @ vecs.T
    for b in range(6):
        want = np.argsort(-ref[b])[:10]
        assert [idx.ids.index(i) for i in ids[b]] == list(want)
        np.testing.assert_allclose(scores[b], ref[b][want], rtol=1e-5)


def test_sharded_service_reachable_from_serve_and_exclusive(index, tmp_path):
    idx, path = index
    with pytest.raises(ValueError, match="does not\n? ?compose"):
        RetrievalService(idx, n_model_shards=2, approx=True)
    with pytest.raises(ValueError, match="does not\n? ?compose"):
        RetrievalService(idx, n_model_shards=2, pq_subspaces=4)
    httpd = serve(path, port=0, max_k=5, max_batch=2, coalesce=False,
                  n_model_shards=4)
    port = httpd.server_address[1]
    assert httpd.service.n_model_shards == 4
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "item3", "k": 5}).encode())
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.loads(r.read())
        assert out["ids"][0] == "item3"
        # hot reload preserves the sharded configuration
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload", data=b"{}")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert json.loads(r.read())["status"] == "ok"
        assert httpd.service.n_model_shards == 4
    finally:
        httpd.shutdown()
        httpd.server_close()

def test_statsz_reports_mode_and_coalescing(index):
    idx, path = index
    httpd = serve(path, port=0, max_k=10, max_batch=8, quantized=True)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        for _ in range(3):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/topk",
                data=json.dumps({"id": "item3", "k": 3}).encode())
            urllib.request.urlopen(req, timeout=30).read()
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/statsz", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["mode"] == "int8"
        assert stats["queries"] >= 3 and stats["device_calls"] >= 1
        assert stats["queries_per_dispatch"] >= 1.0
        assert stats["reloads"] == 0 and stats["uptime_s"] >= 0
    finally:
        httpd.shutdown()
        httpd.server_close()
    # mode strings for the other scan configurations
    assert RetrievalService(idx, max_batch=2).mode == "exact"
    assert RetrievalService(idx, max_batch=2,
                            n_model_shards=4).mode == "sharded:4"
    assert RetrievalService(
        idx, max_batch=2, pq_subspaces=4, pq_codes=32,
        pq_rotate=True).mode == "pq:S=4+rotated:oversample=64"

def test_ivf_pq_composition_reachable_from_serve(index):
    """--ivf_clusters + --pq_subspaces together = IVF-PQ: sublinear probe
    with compressed candidate scoring and exact returned scores."""
    idx, path = index
    httpd = serve(path, port=0, max_k=10, max_batch=4, coalesce=False,
                  ivf_clusters=8, nprobe=8, pq_subspaces=4, pq_codes=32)
    port = httpd.server_address[1]
    svc = httpd.service
    assert svc.ivf is not None and svc.pq is not None
    assert svc.mode.startswith("ivf:") and "+pq:S=4" in svc.mode
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # full probe (nprobe=8=C): only ADC-vs-oversample error remains,
        # and the default oversample covers this tiny catalog entirely,
        # so results must equal brute force with exact scores
        q = idx.vector("item3")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "item3", "k": 10}).encode())
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        want = np.argsort(-(idx.vectors @ q))[:10]
        assert out["ids"] == [f"item{i}" for i in want]
        np.testing.assert_allclose(
            out["scores"], (idx.vectors @ q)[want], rtol=1e-4)
    finally:
        httpd.shutdown()
        httpd.server_close()

def test_hot_reload_rebuilds_ivf_cache_with_carried_params(index, tmp_path):
    """Reload with a prebuilt-only IVF config: the rebuild recovers
    n_clusters from the RUNNING service and overwrites the cache for the
    new catalog (RetrievalHTTPServer.reload_index carry-over logic)."""
    from esrecsys_tpu.retrieval.ivf import IVFIndex

    idx, path = index
    rng = np.random.default_rng(13)
    new_vecs = rng.normal(size=(160, 16)).astype(np.float32)
    new_path = str(tmp_path / "new_cat.npz")
    EmbeddingIndex([f"n{i}" for i in range(160)], new_vecs).save(new_path)

    cache = str(tmp_path / "ivf_cache.npz")
    httpd = serve(path, port=0, max_k=10, max_batch=4, coalesce=False,
                  ivf_clusters=8, nprobe=8, ivf_index_path=cache)
    assert IVFIndex.load(cache).n_items == 200
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload",
            data=json.dumps({"index": new_path}).encode())
        with urllib.request.urlopen(req, timeout=120) as r:
            assert json.loads(r.read())["items"] == 160
        # cache rebuilt for the NEW catalog, same cluster count
        back = IVFIndex.load(cache)
        assert back.n_items == 160 and back.n_clusters >= 8
        # and the live service answers from it
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "n3", "k": 3}).encode())
        with urllib.request.urlopen(req, timeout=60) as r:
            assert "n3" in json.loads(r.read())["ids"]
    finally:
        httpd.shutdown()
        httpd.server_close()

def test_batch_vectors_query(index):
    """POST /v1/topk with "vectors" answers a whole batch in one request,
    row-for-row equal to brute force."""
    idx, path = index
    httpd = serve(path, port=0, max_k=10, max_batch=4)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(17)
        q = rng.normal(size=(5, 16)).astype(np.float32)  # > max_batch
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"vectors": q.tolist(), "k": 4}).encode())
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert len(out["ids"]) == 5 and len(out["scores"]) == 5
        ref = q @ idx.vectors.T
        for b in range(5):
            want = np.argsort(-ref[b])[:4]
            assert out["ids"][b] == [f"item{i}" for i in want]
            np.testing.assert_allclose(out["scores"][b], ref[b][want],
                                       rtol=1e-5)
        # malformed batch: ragged/1-d input is a clean 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"vectors": [1.0] * 16}).encode())
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()

def test_admin_token_gates_reload(index, tmp_path):
    _, path = index
    httpd = serve(path, port=0, max_k=5, max_batch=2, coalesce=False,
                  admin_token="sekrit")
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload", data=b"{}")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 403
        # /v1/topk stays open
        ok = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "item3", "k": 2}).encode())
        urllib.request.urlopen(ok, timeout=30).read()
        # correct header passes
        good = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload", data=b"{}",
            headers={"X-Admin-Token": "sekrit"})
        with urllib.request.urlopen(good, timeout=120) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_pq_cache_path_without_npz_suffix_still_caches(index, tmp_path):
    """np.savez appends .npz; the restart exists()-check must look for what
    save() actually wrote (review finding: suffixless --pq_index retrained
    every restart)."""
    idx, _ = index
    raw = str(tmp_path / "book")  # no .npz
    svc = RetrievalService(idx, max_k=5, max_batch=2, pq_subspaces=4,
                           pq_codes=16, pq_index_path=raw)
    assert os.path.exists(raw + ".npz")
    svc2 = RetrievalService(idx, max_k=5, max_batch=2, pq_index_path=raw)
    np.testing.assert_array_equal(svc2.pq.codes, svc.pq.codes)


def test_batcher_close_fails_stragglers_instead_of_hanging(index):
    """submit() racing a close() must raise QueryBatcher.Closed (or finish
    normally) — never block forever on an undrained queue."""
    from esrecsys_tpu.serving.server import QueryBatcher

    idx, _ = index
    svc = RetrievalService(idx, max_k=5, max_batch=4)
    batcher = QueryBatcher(svc, max_wait_ms=1.0)
    results = []

    def worker():
        try:
            results.append(("ok", batcher.submit(idx.vector("item1"), 3)))
        except QueryBatcher.Closed as e:
            results.append(("closed", e))

    threads = [threading.Thread(target=worker) for _ in range(6)]
    for t in threads:
        t.start()
    batcher.close()
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive(), "submit hung across close()"
    assert len(results) == 6
    assert batcher.idle()
    # post-close submits raise immediately
    with pytest.raises(QueryBatcher.Closed):
        batcher.submit(idx.vector("item1"), 3)


def test_exclude_filters_results_and_ignores_offcatalog_ids(index):
    """exclude=[ids] drops those ids and returns the top-k of what remains
    — equal to a brute-force top-k computed over the catalog minus the
    excluded rows. Off-catalog ids in the list no-op (seen-lists may hold
    items that never made the catalog)."""
    idx, _ = index
    svc = RetrievalService(idx, max_k=20, max_batch=4)
    rng = np.random.default_rng(7)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    # exclude each query's own top-2 so the filter provably bites
    ref = q @ idx.vectors.T
    top2 = {idx.ids[j] for b in range(3) for j in np.argsort(-ref[b])[:2]}
    exclude = sorted(top2) + ["never-in-catalog"]
    ids, scores = svc.topk(q, k=5, exclude=exclude)
    assert ids.shape == (3, 5)
    excl = set(exclude)
    for b in range(3):
        assert not (set(ids[b]) & excl)
        want_rows = [j for j in np.argsort(-ref[b])
                     if idx.ids[j] not in excl][:5]
        assert [idx.ids.index(x) for x in ids[b]] == want_rows
        np.testing.assert_allclose(scores[b], ref[b][want_rows], rtol=1e-5)


def test_exclude_budget_enforced(index):
    """k + len(exclude) beyond the compiled top-k width must fail loudly
    (k results can no longer be guaranteed), not silently under-fill."""
    idx, _ = index
    svc = RetrievalService(idx, max_k=6, max_batch=2)
    with pytest.raises(ValueError, match="max_k"):
        svc.topk(idx.vector("item0")[None], k=5,
                 exclude=["item1", "item2"])  # 5 + 2 > 6
    # duplicate ids count once
    ids, _ = svc.topk(idx.vector("item0")[None], k=5,
                      exclude=["item0", "item0"])
    assert "item0" not in set(ids[0])


def test_exclude_self_on_id_query_http(index):
    """HTTP id-query excluding itself: the query item (always rank 1 by
    construction) is dropped; the coalesced-batcher path applies the
    per-request filter."""
    _, path = index
    httpd = serve(path, port=0, max_k=10, max_batch=4)  # coalesce on
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = {"id": "item3", "k": 4, "exclude": ["item3"]}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps(body).encode())
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert len(out["ids"]) == 4 and "item3" not in out["ids"]
        # same query unexcluded ranks item3 first; the rest line up
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "item3", "k": 5}).encode())
        with urllib.request.urlopen(req) as r:
            raw = json.loads(r.read())
        assert raw["ids"][0] == "item3" and raw["ids"][1:5] == out["ids"]

        # batch form: one exclude list applies to every row
        vecs = [httpd.service.index.vector(f"item{i}").tolist()
                for i in (1, 2)]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"vectors": vecs, "k": 3,
                             "exclude": ["item1", "item2"]}).encode())
        with urllib.request.urlopen(req) as r:
            out_b = json.loads(r.read())
        for row in out_b["ids"]:
            assert len(row) == 3
            assert not ({"item1", "item2"} & set(row))

        # malformed exclude -> 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "item3", "exclude": [1, 2]}).encode())
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # over-budget exclude -> 400 (k=max_k leaves no filter headroom)
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "item3", "k": 10,
                             "exclude": ["item3"]}).encode())
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_batcher_mixed_exclusions_in_one_batch(index):
    """Different per-request exclusion lists coalesced into ONE dispatch
    each get their own correctly filtered top-k."""
    from esrecsys_tpu.serving.server import QueryBatcher

    idx, _ = index
    svc = RetrievalService(idx, max_k=12, max_batch=8)
    batcher = QueryBatcher(svc, max_wait_ms=50.0)
    rng = np.random.default_rng(11)
    queries = rng.normal(size=(4, 16)).astype(np.float32)
    ref = queries @ idx.vectors.T
    # request i excludes its own top-i items (i=0 excludes nothing)
    excludes = [[idx.ids[j] for j in np.argsort(-ref[i])[:i]]
                for i in range(4)]
    results = [None] * 4

    def worker(i):
        results[i] = batcher.submit(queries[i], k=4, exclude=excludes[i])

    before = svc.device_calls
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    batcher.close()
    assert svc.device_calls - before < 4  # they did coalesce
    for i, (ids, scores) in enumerate(results):
        excl = set(excludes[i])
        want = [j for j in np.argsort(-ref[i]) if idx.ids[j] not in excl][:4]
        assert [idx.ids.index(x) for x in ids] == want
        np.testing.assert_allclose(scores, ref[i][want], rtol=1e-5)


def test_rescore_int8_pq_mode_drops_f32_and_overlaps_exact(index):
    idx, _ = index
    svc = RetrievalService(idx, max_k=10, max_batch=4, pq_subspaces=4,
                           pq_codes=64, rescore_int8=True)
    assert svc._items is None          # f32 catalog freed after the build
    assert svc.mode.endswith("+r8")
    exact = RetrievalService(idx, max_k=10, max_batch=4)
    rng = np.random.default_rng(2)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    ids8, scores8 = svc.topk(q, k=10)
    idse, _ = exact.topk(q, k=10)
    ov = np.mean([len(set(ids8[b]) & set(idse[b])) / 10 for b in range(4)])
    assert ov >= 0.8, ov
    # by-id queries still work (the id vector comes from the host index)
    ids, _ = svc.topk_by_id("item7")
    assert len(ids) == 10


def test_rescore_int8_requires_int8_or_pq_scan(index):
    idx, _ = index
    with pytest.raises(ValueError, match="rescore_int8"):
        RetrievalService(idx, rescore_int8=True)
    with pytest.raises(ValueError, match="rescore_int8"):
        RetrievalService(idx, approx=True, rescore_int8=True)


def test_rescore_int8_quantized_mode_full_int8_residency(index):
    idx, _ = index
    svc = RetrievalService(idx, max_k=10, max_batch=4, quantized=True,
                           rescore_int8=True)
    assert svc._items is None
    assert svc.mode == "int8+r8"
    exact = RetrievalService(idx, max_k=10, max_batch=4)
    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    ids8, scores8 = svc.topk(q, k=10)
    idse, scorese = exact.topk(q, k=10)
    ov = np.mean([len(set(ids8[b]) & set(idse[b])) / 10 for b in range(2)])
    assert ov >= 0.9, ov  # int8 is near-lossless on Gaussian catalogs
    # scores differ from exact only by item-side int8 rounding
    np.testing.assert_allclose(scores8[0], scorese[0], rtol=0.05, atol=0.05)


def test_rescore_int8_prebuilt_cold_start_never_uploads_f32(
        index, tmp_path, monkeypatch):
    """With the pq codebook prebuilt on disk, a rescore_int8 start must
    ship ONLY int8 to the device — the true beyond-HBM cold-start path."""
    import esrecsys_tpu.serving.server as server_mod

    idx, _ = index
    pq_path = str(tmp_path / "book.npz")
    # first start builds + saves the codebook (uploads f32, then drops it)
    RetrievalService(idx, max_k=5, pq_subspaces=4, pq_codes=64,
                     pq_index_path=pq_path, rescore_int8=True)
    uploads = []
    real = server_mod._chunked_device_put

    def spy(arr, *a, **kw):
        uploads.append(np.asarray(arr).dtype)
        return real(arr, *a, **kw)

    monkeypatch.setattr(server_mod, "_chunked_device_put", spy)
    svc = RetrievalService(idx, max_k=5, pq_subspaces=4, pq_codes=64,
                           pq_index_path=pq_path, rescore_int8=True)
    assert uploads and all(d == np.int8 for d in uploads), uploads
    assert svc._items is None and svc.pq is not None
    ids, _ = svc.topk(idx.vectors[3][None], k=5)
    assert ids.shape == (1, 5)


def test_rescore_int8_survives_hot_reload(index, tmp_path):
    import urllib.request

    _, path = index
    httpd = serve(path, port=0, max_k=10, max_batch=2, quantized=True,
                  rescore_int8=True)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        assert httpd.service.mode == "int8+r8"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload", data=b"{}",
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert json.loads(r.read())["status"] == "ok"
        assert httpd.service.mode == "int8+r8"     # flag carried
        assert httpd.service._items is None        # still f32-free
    finally:
        httpd.shutdown()


def test_serving_build_train_sample_builds_and_answers(index):
    idx, _ = index
    svc = RetrievalService(idx, max_k=10, max_batch=4, ivf_clusters=4,
                           nprobe=4, ivf_iters=4, build_train_sample=64)
    rng = np.random.default_rng(9)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    ids, scores = svc.topk(q, k=10)
    exact = RetrievalService(idx, max_k=10, max_batch=4)
    idse, _ = exact.topk(q, k=10)
    ov = np.mean([len(set(ids[b]) & set(idse[b])) / 10 for b in range(2)])
    assert ov == 1.0, ov  # nprobe == n_clusters: full coverage, exact


def test_statsz_reports_dispatch_latency_percentiles(index):
    import urllib.request

    _, path = index
    httpd = serve(path, port=0, max_k=10, max_batch=2)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(6)
        for _ in range(5):
            body = json.dumps(
                {"vector": rng.normal(size=16).tolist(), "k": 5}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/topk", data=body,
                headers={"Content-Type": "application/json"})
            urllib.request.urlopen(req).read()
        s = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/statsz").read())
        lat = s["latency_ms"]
        assert lat["n"] >= 5
        assert 0 < lat["p50"] <= lat["p90"] <= lat["p99"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_sharded_quantized_service_matches_bruteforce_with_padding():
    """n_model_shards + quantized: per-shard int8 scan, local exact
    rescore, ICI candidate exchange — exact results (int8 is lossless on
    this catalog at k=10), padded rows never returned."""
    rng = np.random.default_rng(12)
    vecs = rng.normal(size=(203, 16)).astype(np.float32)  # 203 % 4 != 0
    idx = EmbeddingIndex([f"s{i}" for i in range(203)], vecs)
    svc = RetrievalService(idx, max_k=10, max_batch=4, n_model_shards=4,
                           quantized=True)
    assert svc.mode == "sharded:4+int8"
    q = rng.normal(size=(6, 16)).astype(np.float32)
    ids, scores = svc.topk(q, k=10)
    ref = q @ vecs.T
    for b in range(6):
        want = np.argsort(-ref[b])[:10]
        assert [idx.ids.index(i) for i in ids[b]] == list(want)
        np.testing.assert_allclose(scores[b], ref[b][want], rtol=1e-5)


def test_sharded_quantized_r8_no_f32_on_any_shard():
    """n_model_shards + quantized + rescore_int8: no f32 rows resident on
    ANY chip (D+4 bytes/item across the mesh); results match brute force
    over the dequantized catalog."""
    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(160, 16)).astype(np.float32)
    idx = EmbeddingIndex([f"s{i}" for i in range(160)], vecs)
    svc = RetrievalService(idx, max_k=10, max_batch=4, n_model_shards=4,
                           quantized=True, rescore_int8=True)
    assert svc._items is None
    assert svc.mode == "sharded:4+int8+r8"
    assert svc.resident_bytes_per_item == 16 + 4  # int8 rows + scales only
    q = rng.normal(size=(4, 16)).astype(np.float32)
    ids, scores = svc.topk(q, k=10)
    from esrecsys_tpu.retrieval.mips import quantize_rows_np
    q8, sc = quantize_rows_np(vecs)
    deq = q8.astype(np.float32) * sc[:, None]
    ref = q @ deq.T
    for b in range(4):
        want = np.argsort(-ref[b])[:10]
        assert [idx.ids.index(i) for i in ids[b]] == list(want)
        np.testing.assert_allclose(scores[b], ref[b][want], rtol=1e-4)


def test_hot_reload_aux_reuse_keeps_trained_structures(index, tmp_path):
    """/admin/reload with aux="reuse": the new catalog goes live with the
    RUNNING service's IVF centroids and PQ codebooks carried verbatim
    (assign/encode-only — no k-means), and queries answer from it. A bad
    aux value is a clean 400."""
    idx, path = index
    rng = np.random.default_rng(8)
    # lightly-drifted new generation of the same catalog (deploy cycle)
    new_vecs = (np.stack([idx.vector(f"item{i}") for i in range(200)])
                + rng.normal(size=(200, 16)).astype(np.float32) * 0.02)
    new_idx = EmbeddingIndex([f"g2_{i}" for i in range(200)], new_vecs)
    new_path = str(tmp_path / "gen2.npz")
    new_idx.save(new_path)

    httpd = serve(path, port=0, max_k=10, max_batch=4, coalesce=False,
                  ivf_clusters=8, nprobe=8, ivf_iters=5,
                  pq_subspaces=4, pq_codes=32, pq_oversample=200)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        old_svc = httpd.service
        old_cents = old_svc.ivf.centroids.copy()
        old_books = old_svc.pq.centroids.copy()

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload",
            data=json.dumps({"index": new_path, "aux": "reuse"}).encode())
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["status"] == "ok" and out["aux"] == "reuse"
        assert out["items"] == 200

        svc = httpd.service
        assert svc is not old_svc
        # trained structures carried verbatim; layout follows the NEW rows
        np.testing.assert_array_equal(svc.ivf.centroids, old_cents)
        np.testing.assert_array_equal(svc.pq.centroids, old_books)
        assert svc.ivf.n_items == 200 and svc.pq.n_items == 200
        got = np.sort(svc.ivf.bucket_ids[svc.ivf.bucket_ids >= 0])
        np.testing.assert_array_equal(got, np.arange(200))

        # nprobe=C probes every cell, so self-retrieval must succeed
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "g2_5", "k": 5}).encode())
        with urllib.request.urlopen(req, timeout=60) as r:
            assert "g2_5" in json.loads(r.read())["ids"]

        # unknown aux is rejected without touching the service
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload",
            data=json.dumps({"index": new_path, "aux": "wat"}).encode())
        try:
            urllib.request.urlopen(bad, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert httpd.service is svc
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_warm_start_with_prebuilt_cache_and_int8_residency(index, tmp_path):
    """ivf_warm_from must win over an existing prebuilt cache AND force
    the f32 upload it needs even under rescore_int8 (whose prebuilt-cache
    fast path otherwise skips the catalog upload entirely)."""
    idx, _ = index
    cache = str(tmp_path / "ivf_cache.npz")
    base = RetrievalService(idx, max_k=10, max_batch=4, quantized=True,
                            rescore_int8=True, ivf_clusters=8, nprobe=8,
                            ivf_iters=5, ivf_index_path=cache)
    assert os.path.exists(cache)
    warmed = RetrievalService(idx, max_k=10, max_batch=4, quantized=True,
                              rescore_int8=True, ivf_clusters=8, nprobe=8,
                              ivf_iters=5, ivf_index_path=cache,
                              ivf_warm_from=base.ivf)
    np.testing.assert_array_equal(warmed.ivf.centroids, base.ivf.centroids)
    assert warmed.ivf.n_items == len(idx)
    # warm derivation re-saved the cache and the f32 matrix was dropped
    # again after the build (int8-only residency)
    assert warmed._items is None
    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    ids, scores = warmed.topk(q, k=5)
    assert ids.shape == (2, 5) and np.isfinite(np.asarray(scores)).all()


def test_pq_anisotropic_reachable_and_reload_carries_threshold(
        index, tmp_path):
    """--pq_anisotropic trains a score-aware codebook (retrieval/pq.py
    anisotropic_eta); results stay exact on a fully-rescored catalog; a
    reload whose config only had a prebuilt pq path recovers the
    threshold from the RUNNING service (reload_index carry-over)."""
    idx, path = index
    # d=16 => threshold must be >= 1/sqrt(16) = 0.25
    svc = RetrievalService(idx, max_k=10, max_batch=4, pq_subspaces=4,
                           pq_codes=32, pq_anisotropic=0.3)
    assert svc.pq.anisotropic_threshold == pytest.approx(0.3)
    assert svc.mode == "pq:S=4+aniso=0.3:oversample=64"
    q = idx.vector("item5")
    ids, scores = svc.topk(q[None], k=10)
    want = np.argsort(-(idx.vectors @ q))[:10]
    assert list(ids[0]) == [f"item{i}" for i in want]
    np.testing.assert_allclose(scores[0], (idx.vectors @ q)[want], rtol=1e-4)

    # prebuilt-path-only config: reload must carry S/C/rotate/threshold
    # from the running service instead of failing or silently dropping it
    book_path = str(tmp_path / "pq_aniso.npz")
    svc.pq.save(book_path)
    httpd = serve(path, port=0, max_k=10, max_batch=4, coalesce=False,
                  pq_index_path=book_path)
    assert (httpd.service.pq.anisotropic_threshold
            == pytest.approx(0.3))  # loaded from the npz
    rng = np.random.default_rng(21)
    new_vecs = rng.normal(size=(150, 16)).astype(np.float32)
    new_path = str(tmp_path / "new_cat.npz")
    EmbeddingIndex([f"n{i}" for i in range(150)], new_vecs).save(new_path)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload",
            data=json.dumps({"index": new_path}).encode())
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["status"] == "ok"
        new_svc = httpd.service
        assert new_svc.pq.n_items == 150
        assert new_svc.pq.anisotropic_threshold == pytest.approx(0.3)
        assert "aniso=0.3" in new_svc.mode
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_add_items_live_growth_zero_recompile(index):
    """add_capacity preallocates rows; add_items appends and the SAME
    compiled query (one cache entry) serves the grown catalog exactly."""
    idx, _ = index
    rng = np.random.default_rng(30)
    svc = RetrievalService(
        EmbeddingIndex(list(idx.ids), idx.vectors.copy()),
        max_k=10, max_batch=4, add_capacity=32)
    assert svc.capacity == 232
    compiles = svc._query_fn._cache_size()
    new = rng.normal(size=(8, 16)).astype(np.float32) * 2.0  # big norms:
    # these rows WIN queries, so serving them proves the bound moved
    assert svc.add_items([f"new{i}" for i in range(8)], new) == 208
    allv = np.concatenate([idx.vectors, new])
    q = new[2][None]
    ids, scores = svc.topk(q, k=10)
    names = [f"item{i}" for i in range(200)] + [f"new{i}" for i in range(8)]
    want = np.argsort(-(allv @ q[0]))[:10]
    assert list(ids[0]) == [names[i] for i in want]
    np.testing.assert_allclose(scores[0], (allv @ q[0])[want], rtol=1e-4)
    assert svc._query_fn._cache_size() == compiles  # zero new programs
    # guards: over-capacity and duplicate ids are rejected atomically
    with pytest.raises(ValueError, match="capacity"):
        svc.add_items([f"x{i}" for i in range(32)],
                      np.zeros((32, 16), np.float32))
    with pytest.raises(ValueError, match="duplicate"):
        svc.add_items(["new0"], np.zeros((1, 16), np.float32))
    assert len(svc.index) == 208  # nothing partially applied


def test_add_items_updates_derived_residencies(index):
    """int8 rows/scales and PQ codes stay consistent with the grown
    catalog: pq mode with rescore_int8 (no f32 resident) serves added
    items through codes+int8 only."""
    idx, _ = index
    rng = np.random.default_rng(31)
    svc = RetrievalService(
        EmbeddingIndex(list(idx.ids), idx.vectors.copy()),
        max_k=10, max_batch=4, add_capacity=16,
        pq_subspaces=4, pq_codes=32, rescore_int8=True)
    assert svc._items is None  # f32-free residency
    new = rng.normal(size=(4, 16)).astype(np.float32) * 2.0
    svc.add_items([f"n{i}" for i in range(4)], new)
    assert svc.pq.n_items == 204 and svc.pq.codes.shape == (204, 4)
    ids, scores = svc.topk(new[1][None], k=5)
    assert ids[0][0] == "n1"  # the added high-norm row wins its own query
    assert np.isfinite(np.asarray(scores)).all()


def test_add_items_http_and_mode_guards(index, tmp_path):
    """POST /admin/add_items over the wire: added items queryable at
    once, /statsz reports capacity; ivf+add_capacity refused at init;
    no-headroom services reject adds."""
    idx, path = index
    httpd = serve(path, port=0, max_k=10, max_batch=4, coalesce=False,
                  add_capacity=16)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(32)
        new = (rng.normal(size=(3, 16)) * 2.0).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/add_items",
            data=json.dumps({"ids": ["a1", "a2", "a3"],
                             "vectors": new.tolist()}).encode())
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out == {"status": "ok", "added": 3, "items": 203,
                       "capacity_left": 13}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "a2", "k": 5}).encode())
        with urllib.request.urlopen(req, timeout=60) as r:
            got = json.loads(r.read())
        assert got["ids"][0] == "a2"  # high-norm row tops its own query
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/statsz", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["items"] == 203 and stats["capacity"] == 216
        # duplicate id → 400, catalog unchanged
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/add_items",
            data=json.dumps({"ids": ["a1"],
                             "vectors": [[0.0] * 16]}).encode())
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()
    with pytest.raises(ValueError, match="add_capacity"):
        RetrievalService(idx, ivf_clusters=8, add_capacity=8)
    with pytest.raises(ValueError, match="headroom"):
        RetrievalService(idx, max_k=5).add_items(
            ["z"], np.zeros((1, 16), np.float32))


def test_add_items_review_regressions(index):
    """Review-caught cluster: (a) numeric ids must collide with their
    string forms in the duplicate guard; (b) max_k clamps to CAPACITY
    for growable services, not the seed size, while k never exceeds the
    LIVE item count; (c) a rejected batch leaves no trace anywhere."""
    idx, _ = index
    seed = EmbeddingIndex([f"i{j}" for j in range(20)],
                          idx.vectors[:20].copy())
    svc = RetrievalService(seed, max_k=50, max_batch=4, add_capacity=100)
    # (b) capacity clamp: seed had 20 items but the service can grow
    assert svc.max_k == 50
    ids, scores = svc.topk(idx.vectors[3][None], k=50)
    assert ids.shape == (1, 20)  # live size bounds the result, no -inf pad
    assert np.isfinite(np.asarray(scores)).all()
    svc.add_items([f"g{j}" for j in range(40)],
                  idx.vectors[20:60].copy())
    ids, _ = svc.topk(idx.vectors[3][None], k=50)
    assert ids.shape == (1, 50)  # growth unlocked the larger k
    # (a) numeric id duplicate of an existing string id
    with pytest.raises(ValueError, match="duplicate"):
        svc.add_items(["g1"], np.zeros((1, 16), np.float32))
    before = len(svc.index)
    with pytest.raises(ValueError, match="duplicate"):
        svc.add_items([7, "7"], np.zeros((2, 16), np.float32))
    # (c) nothing partially applied by the rejected batches
    assert len(svc.index) == before and svc._n_valid == before


def test_filtered_retrieval_all_modes_and_both_phases(index):
    """filters={name: ids}: results restricted to the allowed set in
    every scan mode, exactly (a disallowed global winner must not leak
    through phase-2 rescores — the masked-candidate re-entry hazard)."""
    idx, _ = index
    rng = np.random.default_rng(40)
    allowed_ids = [f"item{i}" for i in range(0, 200, 3)]
    rows = np.asarray([int(s[4:]) for s in allowed_ids])
    for kw in ({}, {"quantized": True}, {"approx": True},
               {"pq_subspaces": 4, "pq_codes": 32},
               {"ivf_clusters": 8, "nprobe": 8},
               {"ivf_clusters": 8, "nprobe": 8,
                "pq_subspaces": 4, "pq_codes": 32}):
        svc = RetrievalService(EmbeddingIndex(list(idx.ids),
                                              idx.vectors.copy()),
                               max_k=10, max_batch=4,
                               filters={"f": allowed_ids}, **kw)
        q = rng.normal(size=(1, 16)).astype(np.float32)
        ids, scores = svc.topk(q, k=10, filter="f")
        want = [f"item{rows[j]}"
                for j in np.argsort(-(idx.vectors[rows] @ q[0]))[:10]]
        assert list(ids[0]) == want, (kw, list(ids[0]), want)
        np.testing.assert_allclose(
            scores[0], np.sort(idx.vectors[rows] @ q[0])[::-1][:10],
            rtol=1e-4)
        # the same service still answers unfiltered queries exactly
        ids2, _ = svc.topk(q, k=10)
        want2 = np.argsort(-(idx.vectors @ q[0]))[:10]
        assert list(ids2[0]) == [f"item{i}" for i in want2], kw


def test_filter_runtime_registration_growth_and_errors(index):
    idx, _ = index
    rng = np.random.default_rng(41)
    svc = RetrievalService(EmbeddingIndex(list(idx.ids),
                                          idx.vectors.copy()),
                           max_k=10, max_batch=4, filters={},
                           add_capacity=8)
    with pytest.raises(ValueError, match="unknown filter"):
        svc.topk(np.zeros((1, 16), np.float32), k=3, filter="nope")
    # off-catalog ids no-op but are reported via the matched count
    assert svc.set_filter("evens",
                          [f"item{i}" for i in range(0, 200, 2)]
                          + ["ghost"]) == 100
    got, _ = svc.topk(rng.normal(size=(1, 16)).astype(np.float32),
                      k=10, filter="evens")
    assert all(int(g[4:]) % 2 == 0 for g in got[0])
    # added rows are ineligible until the filter is re-registered
    svc.add_items(["fresh"], (rng.normal(size=(1, 16)) * 3
                              ).astype(np.float32))
    got, _ = svc.topk(svc.index.vector("fresh")[None], k=10,
                      filter="evens")
    assert "fresh" not in got[0]
    svc.set_filter("evens", ["fresh"])
    got, scores = svc.topk(svc.index.vector("fresh")[None], k=10,
                           filter="evens")
    # only ONE eligible item: exactly one finite row comes back
    assert got[0][0] == "fresh" and np.isfinite(scores[0][0])
    assert not np.isfinite(scores[0][1:]).any()
    # filters need opt-in, and don't compose with sharding
    with pytest.raises(ValueError, match="not enabled"):
        RetrievalService(idx, max_k=5).topk(
            np.zeros((1, 16), np.float32), filter="x")
    with pytest.raises(ValueError, match="filter"):
        RetrievalService(idx, n_model_shards=2, filters={})


def test_filtered_http_end_to_end(index, tmp_path):
    """--filters_json + "filter" queries + /admin/set_filter over the
    wire; -inf tails trimmed from JSON; /statsz lists filter names."""
    idx, path = index
    fj = tmp_path / "filters.json"
    fj.write_text(json.dumps({"third": [f"item{i}"
                                        for i in range(0, 200, 3)]}))
    httpd = serve(path, port=0, max_k=10, max_batch=4, coalesce=False,
                  filters=json.loads(fj.read_text()))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "item9", "k": 5,
                             "filter": "third"}).encode())
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["ids"] and all(int(x[4:]) % 3 == 0 for x in out["ids"])
        # register a nearly-empty filter; response trims the -inf tail
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/set_filter",
            data=json.dumps({"name": "solo", "ids": ["item5"]}).encode())
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.loads(r.read())["matched"] == 1
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "item9", "k": 5,
                             "filter": "solo"}).encode())
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["ids"] == ["item5"] and len(out["scores"]) == 1
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/statsz", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["filters"] == ["solo", "third"]
        # unknown filter -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"id": "item9", "filter": "zzz"}).encode())
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_fused_mode_matches_bruteforce(index):
    # 200 items fit one 4096-bin block -> the fused path is EXACT here
    idx, _ = index
    svc = RetrievalService(idx, max_k=10, max_batch=4, fused=True)
    assert svc.mode.startswith("fused:bins=")
    # residency: f32 rows + bf16 transposed scan copy
    assert svc.resident_bytes_per_item == 4 * 16 + 2 * 16
    rng = np.random.default_rng(3)
    q = rng.normal(size=(6, 16)).astype(np.float32)
    ids, scores = svc.topk(q, k=5)
    ref = q @ idx.vectors.T
    for b in range(6):
        want = np.argsort(-ref[b])[:5]
        got = [idx.ids.index(i) for i in ids[b]]
        assert got == list(want)
        np.testing.assert_allclose(scores[b], ref[b][want], rtol=1e-5)


def test_fused_is_exclusive_with_other_scan_modes(index):
    idx, _ = index
    for bad in (dict(approx=True), dict(ivf_clusters=8),
                dict(pq_subspaces=4),
                # int8 scan copies are single-shard (fused.py layout)
                dict(quantized=True, n_model_shards=2)):
        with pytest.raises(ValueError, match="fused|sharded"):
            RetrievalService(idx, max_k=5, max_batch=2, fused=True, **bad)


def test_fused_q8_mode_matches_bruteforce(index):
    # 200 items, one 4096-bin block: EVERY item is a candidate, so the
    # exact f32 rescore makes the int8 scan's results exactly brute force
    idx, _ = index
    svc = RetrievalService(idx, max_k=10, max_batch=4,
                           fused=True, quantized=True)
    assert svc.mode.startswith("fused:bins=") and "+int8" in svc.mode
    # residency: f32 rows + int8 scan copy (codes + binned scales) +
    # the quantized path's int8 rows + flat scales
    assert svc.resident_bytes_per_item == 4 * 16 + (16 + 4) + (16 + 4)
    rng = np.random.default_rng(5)
    q = rng.normal(size=(6, 16)).astype(np.float32)
    ids, scores = svc.topk(q, k=5)
    ref = q @ idx.vectors.T
    for b in range(6):
        want = np.argsort(-ref[b])[:5]
        got = [idx.ids.index(i) for i in ids[b]]
        assert got == list(want)
        np.testing.assert_allclose(scores[b], ref[b][want], rtol=1e-5)


def test_fused_q8_r8_serves_without_f32_catalog(index):
    # fused + quantized + rescore_int8: no f32 rows anywhere on device;
    # returned scores carry only the int8 dequantization tolerance
    idx, _ = index
    svc = RetrievalService(idx, max_k=10, max_batch=4,
                           fused=True, quantized=True, rescore_int8=True)
    assert svc.mode.endswith("+int8+r8")
    assert svc._items is None
    assert svc.resident_bytes_per_item == (16 + 4) + (16 + 4)
    rng = np.random.default_rng(7)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    ids, scores = svc.topk(q, k=5)
    ref = q @ idx.vectors.T
    tol = float(np.abs(q).sum(axis=-1).max()
                * np.abs(idx.vectors).max() / 127)
    for b in range(4):
        want = set(np.argsort(-ref[b])[:5].tolist())
        got = {idx.ids.index(i) for i in ids[b]}
        assert len(want & got) >= 4  # dequantized rescore can swap ties
        np.testing.assert_allclose(
            scores[b], np.sort(ref[b][sorted(got)])[::-1], atol=tol)


def test_fused_q8_add_items_updates_codes_and_scales(index):
    idx, path = index
    fresh = EmbeddingIndex.load(path)
    svc = RetrievalService(fresh, max_k=10, max_batch=4, fused=True,
                           quantized=True, add_capacity=16)
    probe = np.zeros((1, 16), np.float32)
    probe[0, 0] = 100.0
    svc.add_items(["shiny"], probe)
    ids, scores = svc.topk(probe, k=3)
    assert ids[0][0] == "shiny"
    # the scale row really carries the new item's scale (100/127)
    flat = np.asarray(svc._fused_scales).reshape(-1)
    assert abs(flat[len(fresh) - 1] - 100.0 / 127.0) < 1e-6


def test_sharded_fused_serving_matches_bruteforce(index):
    # 200 items over 2 shards, 128 bins: each shard's slice fits one bin
    # block -> exact results through the per-shard kernel + ICI exchange
    idx, _ = index
    svc = RetrievalService(idx, max_k=10, max_batch=4, fused=True,
                           fused_bins=128, n_model_shards=2)
    assert svc.mode == "sharded:2+fused:bins=128"
    assert svc.resident_bytes_per_item == 4 * 16 + 2 * 16
    rng = np.random.default_rng(11)
    q = rng.normal(size=(6, 16)).astype(np.float32)
    ids, scores = svc.topk(q, k=5)
    ref = q @ idx.vectors.T
    for b in range(6):
        want = np.argsort(-ref[b])[:5]
        got = [idx.ids.index(i) for i in ids[b]]
        assert got == list(want)
        np.testing.assert_allclose(scores[b], ref[b][want], rtol=1e-5)


def test_fused_add_items_updates_packed_scan_copy(index):
    idx, path = index
    fresh = EmbeddingIndex.load(path)
    svc = RetrievalService(fresh, max_k=10, max_batch=4,
                           fused=True, add_capacity=16)
    # a distinctive new vector must be findable via the PACKED scan copy
    probe = np.zeros((1, 16), np.float32)
    probe[0, 0] = 100.0
    svc.add_items(["shiny"], probe)
    ids, scores = svc.topk(probe, k=3)
    assert ids[0][0] == "shiny"


def test_fused_composes_with_filters(index):
    idx, _ = index
    svc = RetrievalService(idx, max_k=10, max_batch=4, fused=True,
                           filters={})
    svc.set_filter("evens", [idx.ids[i] for i in range(0, 200, 2)])
    rng = np.random.default_rng(5)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    ids, scores = svc.topk(q, k=5, filter="evens")
    for row in ids:
        for i in row:
            assert int(i.replace("item", "")) % 2 == 0
