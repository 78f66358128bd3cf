import json
import threading
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
