"""Composed MPD-scale run: train + eval cadence + checkpoints + export + serve.

VERDICT r2 missing item 2: training throughput, full-corpus eval,
checkpointing, export and serving were each benched in ISOLATION; this
script exercises the reference's actual operating loop
(spotify/train_spotify.py:255-299: train steps with periodic full-corpus
recall@500 eval and checkpoint saves, then the saved model is deployed) in
ONE composition at real MPD scale — 2,262,292-track corpus, 100k album
buckets, 295,861 artists — and reports:

  * sustained examples/sec WITH the eval + checkpoint cadences enabled
    (the isolated bench number has neither), and the overhead split;
  * time-to-first-query: artifact on disk → catalog embedded → device
    catalog resident → first top-k answered by the serving service.

Feed modes (``--feed``):
  * ``device`` (default): batches are synthesized in-jit from the step
    counter (uniform ids over the real table ranges). On this tunneled
    single-chip setup the host→device link is ~30 MB/s (CLAUDE.md) — a
    fresh-data host feed binds at ~50k ex/s regardless of what the chip or
    the composition can do, so the composition numbers are measured with
    the feed off the tunnel. A real TPU host feeds over PCIe (GB/s); the
    host-side packed-npz pipeline itself measures ~1M playlists/s
    (BENCHMARKS.md).
  * ``host``: the real file path — synthetic packed .npz shards written to
    disk, streamed by data/pipelines.packed_playlist_batches through
    fit()'s prefetch, workloads/playlist.train() wiring. Reports the
    tunnel-bound number for the record.

Run: python -m esrecsys_tpu.tools.full_scale_run --steps 30000 \
         --out_dir /tmp/full_scale [--feed device|host]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from esrecsys_tpu.tools import serving_bench

log = logging.getLogger(__name__)

NUM_TRACKS = 2_262_292          # MPD catalog (BASELINE.md)
NUM_ALBUMS_RAW = 700_000        # raw album ids, mod-hashed to buckets
ALBUM_BUCKETS = 100_000
NUM_ARTISTS = 295_861


def flagship_cfg(args):
    from esrecsys_tpu.workloads import playlist as pl

    return pl.PlaylistConfig(
        work_dir=args.out_dir,
        feature_size=32, album_hash_buckets=ALBUM_BUCKETS,
        num_artists=NUM_ARTISTS, num_negatives=512, shared_negatives=True,
        # the measured-best quality config (PARITY_RUNS.md fast r3: recall
        # @500 0.632 beats the reference's 0.602): SGD-momentum 0.98,
        # lr 0.004 — step/carrier selectable so the composed run measures
        # the fastest layout that holds the same trajectory
        # (BENCHMARKS.md r5 quality-config table)
        sparse_updates=not args.dense_step, momentum=args.momentum,
        learning_rate=args.lr, momentum_carrier=args.momentum_carrier,
        compute_dtype="bfloat16", batch_size=args.batch_size,
        context_size=5, max_next=args.max_next, max_steps=args.steps,
        log_every_steps=2000, eval_every_steps=args.eval_every,
        eval_steps=args.eval_playlists, eval_k=500, eval_group=8,
        eval_fused_bins=args.eval_fused_bins,
        checkpoint_every_steps=args.ckpt_every, corpus_block=131_072,
        steps_per_call=64, seed=0)


_MIX1, _MIX2 = 2654435761, 2246822519  # Knuth/xxhash-style avalanche consts


def mix_mod(ids, salt: int, mod: int, xp):
    """Deterministic track-id → album/artist-id map, identical under numpy
    (corpus construction) and jnp (in-jit batch synthesis).

    Keeping the corpus functional lets the device feed compute a context
    row's album/artist ids arithmetically instead of `jnp.take`-ing them
    from the 2.26M-element corpus arrays — the gather version issued
    ~846k scalar row reads per step (6 takes × (B·C + B·M) ids), which on
    this row-issue-bound step dominated the measurement and is not part
    of the modeled workload (a real feed arrives over PCIe, measured
    separately: host pipeline ≥1M playlists/s, BENCHMARKS.md)."""
    u32 = xp.uint32
    h = ids.astype(u32) * u32(_MIX1) + u32(salt)
    h = h ^ (h >> u32(15))
    h = h * u32(_MIX2)
    h = h ^ (h >> u32(13))
    return (h % u32(mod)).astype(xp.int32)


def synth_corpus(rng) -> dict:
    ids = np.arange(NUM_TRACKS, dtype=np.int32)
    return {
        "tracks": ids,
        "albums": mix_mod(ids, 7, NUM_ALBUMS_RAW, np),
        "artists": mix_mod(ids, 13, NUM_ARTISTS, np),
        "num_tracks": NUM_TRACKS, "num_albums": NUM_ALBUMS_RAW,
        "num_artists": NUM_ARTISTS,
    }


def host_batch(rng, b, c, m):
    # album/artist ids derived from the track rows through the same
    # mix_mod map as synth_corpus: host-fed batches carry the same
    # track-consistency invariant as the device feed
    ctx = rng.integers(0, NUM_TRACKS, (b, c)).astype(np.int32)
    nxt = rng.integers(0, NUM_TRACKS, (b, m)).astype(np.int32)
    return {
        "track_context": ctx,
        "album_context": mix_mod(ctx, 7, NUM_ALBUMS_RAW, np),
        "artist_context": mix_mod(ctx, 13, NUM_ARTISTS, np),
        "next_track": nxt,
        "next_album": mix_mod(nxt, 7, NUM_ALBUMS_RAW, np),
        "next_artist": mix_mod(nxt, 13, NUM_ARTISTS, np),
        "next_mask": np.ones((b, m), np.float32),
    }


def write_packed_shards(out_dir: str, n_shards: int, per_shard: int, c: int,
                        m: int, seed: int = 7) -> str:
    """Synthetic ETL output: the packed-npz shard format
    (data/pipelines.pack_playlists) at MPD id ranges."""
    os.makedirs(out_dir, exist_ok=True)
    for s in range(n_shards):
        path = f"{out_dir}/packed-{s:05d}.npz"
        if not os.path.exists(path):
            # per-shard rng: shard contents must not depend on which files
            # already exist (a rerun after a partial write would otherwise
            # duplicate shard data)
            np.savez(path, **host_batch(np.random.default_rng(seed + s),
                                        per_shard, c, m))
    return f"{out_dir}/packed-*.npz"


def run_train(args) -> dict:
    from esrecsys_tpu.core import prng
    from esrecsys_tpu.train import Checkpointer, fit
    from esrecsys_tpu.workloads import playlist as pl

    cfg = flagship_cfg(args)
    rng = np.random.default_rng(0)
    corpus_np = synth_corpus(rng)

    if args.feed == "host":
        # the REAL train() wiring end to end: file shards → packed pipeline
        # → fit (prefetch, multi-host slicing) → eval/ckpt/export
        pattern = write_packed_shards(
            os.path.join(args.out_dir, "shards"), n_shards=args.n_shards,
            per_shard=args.shard_examples, c=cfg.context_size, m=cfg.max_next)
        # eval shard must hold >= the eval_playlists examples train() will
        # pull (playlist.py eval_steps = cfg.eval_steps // batch_size) or
        # the repeat=True pipeline silently loops duplicates; eval seed
        # lives far outside the train-shard seed space (seed + s) so no
        # --n_shards value can collide train shard contents with eval data
        eval_pattern = write_packed_shards(
            os.path.join(args.out_dir, "eval_shards"), n_shards=1,
            per_shard=max(args.batch_size * 4, 1024, args.eval_playlists),
            c=cfg.context_size, m=cfg.max_next, seed=1_000_000_099)
        import dataclasses

        cfg = dataclasses.replace(cfg, train_pattern=pattern,
                                  test_pattern=eval_pattern)
        t0 = time.time()
        result = pl.train(cfg, corpus_np=corpus_np)
        wall = time.time() - t0
        return {"cfg": cfg, "result": result, "train_wall_s": wall,
                "examples": int(jax.device_get(result.state.step)) * cfg.batch_size}

    # device feed: same fit() composition train() builds, with the batch
    # synthesized in-jit so the tunnel's 30 MB/s host link isn't what gets
    # measured (see module docstring)
    corpus = {k: jnp.asarray(v) for k, v in corpus_np.items()
              if isinstance(v, np.ndarray)}
    model, state = pl.init_state(cfg, mesh=None)
    base_step = pl.select_train_step(model, cfg, corpus, prng.base_key(0))
    b, c, m = cfg.batch_size, cfg.context_size, cfg.max_next

    def train_step(st, seed_batch):
        key = jax.random.fold_in(jax.random.PRNGKey(17), seed_batch["seed"])
        ks = jax.random.split(key, 2)
        # contexts/nexts drawn as corpus rows; album/artist ids are
        # CONSISTENT with their track (the real pipeline's invariant)
        # because synth_corpus is the same mix_mod map — computed here
        # arithmetically, no corpus-array gathers (see mix_mod docstring)
        ctx_rows = jax.random.randint(ks[0], (b, c), 0, NUM_TRACKS)
        nxt_rows = jax.random.randint(ks[1], (b, m), 0, NUM_TRACKS)
        batch = {
            "track_context": ctx_rows,
            "album_context": mix_mod(ctx_rows, 7, NUM_ALBUMS_RAW, jnp),
            "artist_context": mix_mod(ctx_rows, 13, NUM_ARTISTS, jnp),
            "next_track": nxt_rows,
            "next_album": mix_mod(nxt_rows, 7, NUM_ALBUMS_RAW, jnp),
            "next_artist": mix_mod(nxt_rows, 13, NUM_ARTISTS, jnp),
            "next_mask": jnp.ones((b, m), jnp.float32),
        }
        return base_step(st, batch)

    def seeds():
        i = 0
        while True:
            yield {"seed": np.int32(i)}
            i += 1

    eval_batch = host_batch(np.random.default_rng(999), args.eval_playlists,
                            c, m)

    def eval_iter():
        while True:
            yield eval_batch

    # async saves overlap the ~8 s/save device→host checkpoint wall with
    # training (Orbax async; fit waits for the final save before returning)
    ckpt = Checkpointer(f"{cfg.work_dir}/checkpoints",
                        async_save=args.ckpt_async)
    tracker_dir = cfg.work_dir
    from esrecsys_tpu.core import config as config_lib
    from esrecsys_tpu.core.tracking import make_tracker

    tracker = make_tracker(run_dir=tracker_dir, config=config_lib.to_dict(cfg))
    # pack-once layout hooks, exactly as pl.train() wires them: without
    # these the composed run trains in the logical layout, which measures
    # 67k-153k ex/s vs the packed 665k at these shapes (BENCHMARKS.md r5
    # pack-boundary study; the r5b chip run caught this at 152.7k steady)
    state_pack, state_unpack = pl.packed_state_transforms(cfg)
    t0 = time.time()
    result = fit(
        state, train_step, seeds(), num_steps=cfg.max_steps,
        eval_step=pl.select_eval_step(model, cfg, corpus, mesh=None),
        eval_setup_fn=pl.make_corpus_embed_setup(model, cfg, corpus),
        eval_iter_fn=eval_iter, eval_every=cfg.eval_every_steps,
        eval_steps=1, log_every=cfg.log_every_steps, tracker=tracker,
        checkpointer=ckpt, checkpoint_every=cfg.checkpoint_every_steps,
        examples_per_step=cfg.batch_size, steps_per_call=cfg.steps_per_call,
        state_pack=state_pack, state_unpack=state_unpack,
    )
    wall = time.time() - t0
    from esrecsys_tpu.train import export_model

    def do_export(state):
        export_model(
            cfg.work_dir, "playlist", pl.settled_params(state, cfg),
            step=int(jax.device_get(state.step)), tracker=tracker,
            metadata={"feature_size": cfg.feature_size,
                      "album_hash_buckets": cfg.album_hash_buckets,
                      "num_artists": cfg.num_artists,
                      "valid_rows": {"album_embed": cfg.album_hash_buckets,
                                     "artist_embed": cfg.num_artists}})

    def continue_fn(state, to_step):
        """Resume the SAME fit wiring to an absolute step, then export —
        one retrain segment of the continuous-deployment loop (no eval/
        ckpt cadence inside a segment: cycles measure train+deploy)."""
        res = fit(state, train_step, seeds(), num_steps=to_step,
                  log_every=cfg.log_every_steps, tracker=tracker,
                  examples_per_step=cfg.batch_size,
                  steps_per_call=cfg.steps_per_call,
                  state_pack=state_pack, state_unpack=state_unpack)
        do_export(res.state)
        return res.state

    t_exp = time.time()
    do_export(result.state)
    export_s = time.time() - t_exp
    return {"cfg": cfg, "result": result, "train_wall_s": wall,
            "export_s": export_s, "continue_fn": continue_fn,
            "examples": int(jax.device_get(result.state.step)) * cfg.batch_size}


def embed_catalog_from_artifact(cfg, corpus_np) -> np.ndarray:
    """Latest exported artifact → (NUM_TRACKS, D) catalog matrix, embedded
    on device in fixed-shape blocks (one compile)."""
    from esrecsys_tpu.models.playlist import PlaylistModel
    from esrecsys_tpu.train import latest_artifact, load_model
    from esrecsys_tpu.workloads import playlist as pl

    artifact = latest_artifact(cfg.work_dir, "playlist")
    assert artifact, f"no artifact under {cfg.work_dir}"
    params, _, meta = load_model(artifact)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    model, _ = pl.init_state(cfg, mesh=None)

    albums = jnp.asarray(corpus_np["albums"])
    artists = jnp.asarray(corpus_np["artists"])
    block = min(262_144, max(256, 1 << (NUM_TRACKS - 1).bit_length()))
    pad = (-NUM_TRACKS) % block
    albums_p = jnp.pad(albums, (0, pad))
    artists_p = jnp.pad(artists, (0, pad))
    embed = jax.jit(lambda p, a, r: model.apply(
        {"params": p}, a, r, method=PlaylistModel.get_embeddings))
    parts = []
    for s in range(0, NUM_TRACKS + pad, block):
        parts.append(np.asarray(jax.device_get(
            embed(params, jax.lax.dynamic_slice_in_dim(albums_p, s, block),
                  jax.lax.dynamic_slice_in_dim(artists_p, s, block)))))
    return np.concatenate(parts, axis=0)[:NUM_TRACKS]


def serve_from_artifact(args, cfg, corpus_np) -> dict:
    """Artifact → embedded catalog → device-resident serving → first query.

    This is the deploy handoff the reference describes but never builds
    (SURVEY.md §1: offline HTML generation only): load the exported params,
    embed all 2.26M catalog items on-chip, hand the matrix to
    RetrievalService, answer a top-500 query.
    """
    from esrecsys_tpu.retrieval.index import EmbeddingIndex
    from esrecsys_tpu.serving.server import RetrievalService

    t0 = time.time()
    vectors = embed_catalog_from_artifact(cfg, corpus_np)
    t_embed = time.time() - t0

    index = EmbeddingIndex([str(i) for i in range(NUM_TRACKS)], vectors)
    svc = RetrievalService(index, max_k=500, max_batch=8,
                           approx=args.approx_serving,
                           quantized=args.quantized_serving)
    ids, scores = svc.topk(vectors[:1], k=500)  # the first real query
    t_first_query = time.time() - t0
    assert ids.shape == (1, 500) and np.isfinite(scores).all()

    qn = 64
    tq = time.time()
    svc.topk(vectors[:qn], k=500)
    qps = qn / (time.time() - tq)
    return {"embed_catalog_s": round(t_embed, 1),
            "time_to_first_query_s": round(t_first_query, 1),
            "serving_qps": round(qps, 1)}


def deploy_loop(args, cfg, corpus_np, state, continue_fn) -> dict:
    """Continuous deployment: live HTTP server + N retrain→export→hot-reload
    cycles with zero downtime (serving/server.py POST /admin/reload).

    Per cycle: train ``--cycle_steps`` more, export the artifact, re-embed
    the catalog, save the index, reload it into the RUNNING server, verify
    a query answers from the new index. Reported per cycle: retrain wall,
    embed+save wall, reload wall (upload + aux rebuilds + recompile), and
    the total artifact-to-live latency.

    ``--deploy_serve_mode`` runs the live server in any retrieval mode
    from tools/serving_bench.MODES; for IVF/PQ modes ``reload_s`` then
    includes the per-reload aux rebuild (k-means / codebooks), which
    ``--build_train_sample`` shrinks — the knob this loop exists to
    measure against a production-shaped deployment.
    """
    import threading
    import urllib.request

    from esrecsys_tpu.retrieval.index import EmbeddingIndex
    from esrecsys_tpu.serving.server import serve

    def build_index(tag):
        t0 = time.time()
        vectors = embed_catalog_from_artifact(cfg, corpus_np)
        path = os.path.join(args.out_dir, f"index_{tag}.npz")
        EmbeddingIndex([str(i) for i in range(NUM_TRACKS)],
                       vectors).save(path)
        return path, time.time() - t0, vectors

    def serving_overlap(port, vectors, nq, k, rng):
        """Post-reload quality probe: top-k overlap of the LIVE server's
        answers vs host-side exact MIPS over the same new catalog — the
        number that shows whether aux=reuse (stale centroids/codebooks)
        or any approximate mode degraded results for THIS generation."""
        q = (vectors[rng.integers(0, NUM_TRACKS, nq)]
             + rng.normal(size=(nq, vectors.shape[1])).astype(np.float32)
             * 0.05 * np.abs(vectors).mean())
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/topk",
            data=json.dumps({"vectors": q.tolist(), "k": k}).encode())
        with urllib.request.urlopen(req, timeout=600) as r:
            got = json.loads(r.read())["ids"]
        scores = q.astype(np.float32) @ vectors.T  # (nq, M) host exact
        exact = np.argpartition(-scores, k, axis=-1)[:, :k]
        return float(np.mean([
            len(set(int(i) for i in got[r_]) & set(exact[r_].tolist())) / k
            for r_ in range(nq)]))

    mode = args.deploy_serve_mode
    mode_kw = serving_bench.mode_kwargs(mode, args)
    path0, _, _ = build_index("v0")
    t_up = time.time()
    httpd = serve(path0, port=0, max_k=500, max_batch=8, coalesce=False,
                  **mode_kw)
    startup_s = time.time() - t_up
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    cycles = []
    try:
        step = int(jax.device_get(state.step))
        for i in range(args.deploy_cycles):
            t_cycle = time.time()
            step += args.cycle_steps
            state = continue_fn(state, step)
            t_train = time.time() - t_cycle
            pathi, embed_s, vecs_i = build_index(f"v{i + 1}")
            t_reload = time.time()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/admin/reload",
                data=json.dumps({"index": pathi,
                                 "aux": args.deploy_reload_aux}).encode())
            with urllib.request.urlopen(req, timeout=600) as r:
                rep = json.loads(r.read())
            assert rep["status"] == "ok" and rep["index"] == pathi, rep
            reload_s = time.time() - t_reload
            # the new index answers queries (self-retrieval on item 17);
            # guaranteed only for full-scan modes — IVF probing / PQ codes
            # may legitimately miss, so there it is recorded, not asserted
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/topk",
                data=json.dumps({"id": "17", "k": 10}).encode())
            with urllib.request.urlopen(req, timeout=600) as r:
                probe_hit = "17" in json.loads(r.read())["ids"]
            if mode in ("exact", "quantized", "quantized_r8"):
                assert probe_hit, f"self-retrieval missed in {mode} mode"
            cyc = {
                "cycle": i + 1, "steps": args.cycle_steps,
                "retrain_s": round(t_train, 1),
                "embed_and_save_s": round(embed_s, 1),
                "reload_s": round(reload_s, 1),
                "artifact_to_live_s": round(embed_s + reload_s, 1),
                "probe_hit": probe_hit}
            if args.deploy_quality_queries:
                cyc["overlap_at_k"] = round(serving_overlap(
                    port, vecs_i, args.deploy_quality_queries,
                    args.deploy_quality_k,
                    np.random.default_rng(1000 + i)), 4)
            cycles.append(cyc)
            log.info("deploy cycle %d: retrain %.1fs embed %.1fs reload "
                     "%.1fs", i + 1, t_train, embed_s, reload_s)
    finally:
        httpd.shutdown()
        httpd.server_close()
    return {"deploy_cycles": cycles, "deploy_serve_mode": mode,
            "deploy_reload_aux": args.deploy_reload_aux,
            "deploy_server_startup_s": round(startup_s, 1)}


def main(argv=None):
    global NUM_TRACKS, NUM_ALBUMS_RAW, ALBUM_BUCKETS, NUM_ARTISTS
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    warn_cpu_fallback(log)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=30_000)
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--max_next", type=int, default=64)
    p.add_argument("--eval_every", type=int, default=10_000)
    p.add_argument("--eval_playlists", type=int, default=2048)
    p.add_argument("--eval_fused_bins", type=int, default=0,
                   help=">0: eval rounds select candidates via the Pallas "
                        "fused affinity kernel with this bin count "
                        "(retrieval/fused.py; approx — expected lost items "
                        "C(k,3)/L^2) instead of the exact grouped scan")
    p.add_argument("--ckpt_every", type=int, default=10_000)
    p.add_argument("--ckpt_async", action="store_true",
                   help="Orbax async checkpointing: saves overlap training "
                        "instead of blocking the step loop (~8 s/save on "
                        "the tunneled chip); the final save is awaited")
    p.add_argument("--momentum", type=float, default=0.98)
    p.add_argument("--lr", type=float, default=0.004)
    p.add_argument("--momentum_carrier", default="auto",
                   choices=["auto", "dense", "lazy"])
    p.add_argument("--dense_step", action="store_true",
                   help="sparse_updates=False: the full dense train step "
                        "(optax SGD-momentum, the reference's optimizer "
                        "shape — fastest momentum config on chip, "
                        "BENCHMARKS.md r5)")
    p.add_argument("--feed", default="device", choices=["device", "host"])
    p.add_argument("--n_shards", type=int, default=4)
    p.add_argument("--shard_examples", type=int, default=262_144)
    p.add_argument("--approx_serving", action="store_true")
    p.add_argument("--quantized_serving", action="store_true")
    p.add_argument("--skip_serving", action="store_true")
    p.add_argument("--deploy_cycles", type=int, default=0,
                   help="after training, run N retrain->export->hot-reload "
                        "cycles against a LIVE server (device feed only)")
    p.add_argument("--cycle_steps", type=int, default=500)
    p.add_argument("--deploy_serve_mode", default="exact",
                   choices=serving_bench.MODES,
                   help="retrieval mode the deploy-cycle server runs in; "
                        "non-exact modes measure artifact-to-live latency "
                        "INCLUDING the aux rebuild (IVF k-means, PQ "
                        "codebooks) each hot reload performs")
    p.add_argument("--recall_target", type=float, default=0.95)
    p.add_argument("--ivf_clusters", type=int, default=4096)
    p.add_argument("--nprobe", type=int, default=64)
    p.add_argument("--ivf_iters", type=int, default=10)
    p.add_argument("--ivf_max_cell", type=int, default=0)
    p.add_argument("--pq_subspaces", type=int, default=8)
    p.add_argument("--pq_oversample", type=int, default=64)
    p.add_argument("--pq_rotate", action="store_true")
    p.add_argument("--pq_anisotropic", type=float, default=0.0,
                   help="score-aware PQ training threshold T for the "
                        "deploy serve mode (0 = off; "
                        "retrieval/pq.anisotropic_eta)")
    p.add_argument("--build_train_sample", type=int, default=0,
                   help="train deploy-mode IVF/PQ k-means on a row sample "
                        "(cuts the aux-rebuild share of reload_s)")
    p.add_argument("--deploy_quality_queries", type=int, default=0,
                   help="after each reload, measure the live server's "
                        "top-k overlap vs host-exact MIPS on this many "
                        "near-catalog queries (0 = off)")
    p.add_argument("--deploy_quality_k", type=int, default=100)
    p.add_argument("--deploy_reload_aux", default="rebuild",
                   choices=["rebuild", "reuse"],
                   help="per-reload aux policy: rebuild retrains IVF/PQ "
                        "each cycle; reuse keeps the live centroids/"
                        "codebooks and pays only assign/encode")
    p.add_argument("--out_dir", default="/tmp/full_scale")
    # scale overrides (tests / CPU smoke; defaults are the real MPD scale)
    p.add_argument("--corpus_size", type=int, default=NUM_TRACKS)
    p.add_argument("--num_albums_raw", type=int, default=NUM_ALBUMS_RAW)
    p.add_argument("--album_buckets", type=int, default=ALBUM_BUCKETS)
    p.add_argument("--num_artists", type=int, default=NUM_ARTISTS)
    args = p.parse_args(argv)
    NUM_TRACKS = args.corpus_size
    NUM_ALBUMS_RAW = args.num_albums_raw
    ALBUM_BUCKETS = args.album_buckets
    NUM_ARTISTS = args.num_artists
    os.makedirs(args.out_dir, exist_ok=True)

    tr = run_train(args)
    sustained = tr["examples"] / tr["train_wall_s"]
    res = tr["result"]
    # cost split (train/loop.py FitResult stage accounting): sustained is
    # the honest with-cadences number; steady subtracts the one-off jit
    # compile (first dispatch; minutes through the tunnel) and the
    # measured eval/ckpt stage walls to show the pure train-step rate the
    # composition runs between cadence events
    overhead = (res.first_dispatch_s + sum(res.eval_round_s)
                + sum(res.ckpt_save_s))
    steady_wall = max(tr["train_wall_s"] - overhead, 1e-9)
    out = {
        "feed": args.feed,
        "steps": int(jax.device_get(res.state.step)),
        "examples": tr["examples"],
        "train_wall_s": round(tr["train_wall_s"], 1),
        "sustained_examples_per_s": round(sustained, 1),
        "first_dispatch_s": res.first_dispatch_s,
        "eval_round_s": list(res.eval_round_s),
        "ckpt_save_s": list(res.ckpt_save_s),
        "steady_examples_per_s": round(tr["examples"] / steady_wall, 1),
        "eval_rounds": max(args.steps // args.eval_every, 0),
        "ckpt_saves": max(args.steps // args.ckpt_every, 0),
        "last_eval": res.last_eval_metrics,
        "export_s": round(tr.get("export_s", 0.0), 1),
    }
    if not args.skip_serving:
        out.update(serve_from_artifact(args, tr["cfg"],
                                       synth_corpus(np.random.default_rng(0))))
    if args.deploy_cycles:
        assert "continue_fn" in tr, "--deploy_cycles needs --feed device"
        out.update(deploy_loop(args, tr["cfg"],
                               synth_corpus(np.random.default_rng(0)),
                               tr["result"].state, tr["continue_fn"]))
    path = os.path.join(args.out_dir, "full_scale_run.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
