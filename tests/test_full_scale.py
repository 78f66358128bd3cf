"""Composed-run integration: tools/full_scale_run at smoke scale.

The script is the reference's operating loop in one process
(spotify/train_spotify.py:255-299: train + eval cadence + checkpoints +
export, then deploy). At tiny scale both feed modes must produce a complete
result file and a working serving handoff.
"""

import json
import os

import numpy as np


def _args(tmp_path, feed, extra=()):
    return [
        "--steps", "128", "--batch_size", "32", "--max_next", "8",
        "--eval_every", "64", "--eval_playlists", "32", "--ckpt_every", "64",
        "--corpus_size", "3000", "--num_albums_raw", "1000",
        "--album_buckets", "400", "--num_artists", "200",
        "--out_dir", str(tmp_path / feed), "--feed", feed, *extra,
    ]


def test_mix_mod_numpy_jnp_agree():
    """The in-jit batch synthesis computes album/artist ids with the same
    mix_mod map synth_corpus builds the corpus arrays from — the two
    implementations must agree bit-for-bit or the device feed's
    track-consistency invariant silently breaks."""
    import jax
    import jax.numpy as jnp

    from esrecsys_tpu.tools import full_scale_run as fsr

    ids = np.arange(10_000, dtype=np.int32)
    for salt, mod in ((7, 700_000), (13, 295_861), (3, 97)):
        want = fsr.mix_mod(ids, salt, mod, np)
        got = np.asarray(jax.jit(
            lambda x, s=salt, m=mod: fsr.mix_mod(x, s, m, jnp))(ids))
        assert want.dtype == np.int32 and (0 <= want).all() and (want < mod).all()
        np.testing.assert_array_equal(want, got)
        # the map actually spreads (not constant / not identity-mod)
        assert len(np.unique(want[:1000])) > 0.6 * min(mod, 1000)


def test_device_feed_composition_and_serving_handoff(tmp_path):
    from esrecsys_tpu.tools import full_scale_run as fsr

    fsr.main(_args(tmp_path, "device"))
    out = json.load(open(tmp_path / "device" / "full_scale_run.json"))
    assert out["steps"] == 128 and out["examples"] == 128 * 32
    assert out["eval_rounds"] == 2 and out["ckpt_saves"] == 2
    assert np.isfinite(out["last_eval"]["eval_track_recall"])
    assert out["sustained_examples_per_s"] > 0
    # stage accounting (train/loop.py FitResult): every cadence event was
    # individually timed and the steady rate excludes them
    assert len(out["eval_round_s"]) == 2 and len(out["ckpt_save_s"]) >= 2
    assert out["first_dispatch_s"] > 0
    assert out["steady_examples_per_s"] >= out["sustained_examples_per_s"]
    # the deploy handoff answered a real query
    assert out["time_to_first_query_s"] > 0
    assert out["serving_qps"] > 0
    # checkpoints + artifact actually on disk
    assert os.path.isdir(tmp_path / "device" / "checkpoints")
    arts = os.listdir(tmp_path / "device" / "artifacts")
    assert any(f.startswith("playlist-") for f in arts), arts


def test_host_feed_runs_real_pipeline(tmp_path):
    from esrecsys_tpu.tools import full_scale_run as fsr

    fsr.main(_args(tmp_path, "host", ["--skip_serving", "--n_shards", "2",
                                      "--shard_examples", "2048"]))
    out = json.load(open(tmp_path / "host" / "full_scale_run.json"))
    assert out["feed"] == "host" and out["steps"] == 128
    # packed shards were written and consumed
    shards = os.listdir(tmp_path / "host" / "shards")
    assert any(s.startswith("packed-") for s in shards)

def test_deploy_cycles_hot_reload_live_server(tmp_path):
    """--deploy_cycles: retrain segments export artifacts that go LIVE via
    /admin/reload on a running server, with per-cycle latencies reported."""
    from esrecsys_tpu.tools import full_scale_run as fsr

    fsr.main(_args(tmp_path, "device",
                   ["--skip_serving", "--deploy_cycles", "2",
                    "--cycle_steps", "32"]))
    out = json.load(open(tmp_path / "device" / "full_scale_run.json"))
    cycles = out["deploy_cycles"]
    assert len(cycles) == 2
    for i, c in enumerate(cycles):
        assert c["cycle"] == i + 1 and c["steps"] == 32
        assert c["retrain_s"] >= 0 and c["artifact_to_live_s"] > 0
    # each cycle exported a new artifact and saved a new index generation
    arts = os.listdir(tmp_path / "device" / "artifacts")
    assert sum(f.startswith("playlist-") for f in arts) >= 3, arts
    for tag in ("v0", "v1", "v2"):
        assert os.path.exists(tmp_path / "device" / f"index_{tag}.npz")


def test_deploy_cycles_serve_mode_ivf_pq(tmp_path):
    """--deploy_serve_mode ivf_pq: the live deploy-cycle server runs IVF-PQ,
    every hot reload rebuilds the inverted file + codebooks for the NEW
    catalog (sample-trained via --build_train_sample), and the probe-query
    outcome is recorded per cycle."""
    from esrecsys_tpu.tools import full_scale_run as fsr

    fsr.main(_args(tmp_path, "device",
                   ["--skip_serving", "--deploy_cycles", "1",
                    "--cycle_steps", "16",
                    "--deploy_serve_mode", "ivf_pq",
                    "--ivf_clusters", "8", "--nprobe", "4",
                    "--pq_subspaces", "4", "--pq_oversample", "64",
                    "--build_train_sample", "1024",
                    "--deploy_quality_queries", "8",
                    "--deploy_quality_k", "10"]))
    out = json.load(open(tmp_path / "device" / "full_scale_run.json"))
    assert out["deploy_serve_mode"] == "ivf_pq"
    assert out["deploy_server_startup_s"] >= 0
    (cycle,) = out["deploy_cycles"]
    assert cycle["artifact_to_live_s"] > 0
    assert isinstance(cycle["probe_hit"], bool)
    # the post-reload quality probe: live-server top-k overlap vs
    # host-exact MIPS on the same new catalog
    assert 0.0 <= cycle["overlap_at_k"] <= 1.0
