"""Smoke test for the quality-parity runner (tiny shapes, CPU)."""

import json
import os

import numpy as np

from esrecsys_tpu.tools import parity_runs as pr


def test_playlist_parity_smoke(tmp_path):
    res = pr.run_playlist([0], str(tmp_path), examples=2048, eval_playlists=64)
    assert set(res) == {"reference_shape", "fast"}
    for rows in res.values():
        assert np.isfinite(rows[0]["track_recall@500"])
    data = json.load(open(tmp_path / "parity_playlist.json"))
    assert "protocol" in data["meta"]


def test_glove_parity_smoke(tmp_path):
    res = pr.run_glove([0], str(tmp_path), steps=64, vocab=512)
    for rows in res.values():
        assert np.isfinite(rows[0]["eval_loss"])
        assert 0.0 <= rows[0]["probe_nn_overlap@10"] <= 1.0
    # equal-chip-time: the fast config ran more steps
    assert res["fast"][0]["steps"] > res["reference_shape"][0]["steps"]


def test_stl_parity_smoke(tmp_path):
    res = pr.run_stl([0], str(tmp_path), steps=4, size=16)
    for rows in res.values():
        assert np.isfinite(rows[0]["eval_triplet_loss"])
    assert os.path.exists(tmp_path / "parity_stl.json")


def test_txt2url_parity_smoke(tmp_path):
    res = pr.run_txt2url([0], str(tmp_path), steps=12, n_urls=100, n_words=300)
    for rows in res.values():
        assert 0.0 <= rows[0]["text_url_recall@10"] <= 1.0
    assert os.path.exists(tmp_path / "parity_txt2url.json")
