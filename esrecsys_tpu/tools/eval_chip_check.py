"""Exact chunked full-corpus eval at B=2048 on chip, vs fused, same batch.

VERDICT r4 next #4 done-criterion: the exact grouped eval at B=2048 over the
2.26M-item corpus used to build ~5 GB (B, block, C) f32 dot tiles and killed
the axon remote-compile worker twice (BENCHMARKS.md fused-eval caveat). The
round-5 query chunking (workloads/playlist.make_eval_step: ``lax.map`` over
query chunks bounded by ``eval_score_tile_bytes``) bounds the compiled
program's tiles regardless of eval batch; this tool proves the bound holds
where it used to break — ON the chip at the exact shape that crashed — and
records the same-batch exact-vs-fused comparison that r4 could not measure.

Reference behavior being reproduced: spotify/train_spotify.py:113-131
(eval_step scores one playlist against the full corpus, top_k 500) — here
batched to 2048 playlists per call on either path.

Run: python -m esrecsys_tpu.tools.eval_chip_check
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import time

log = logging.getLogger(__name__)


def _time_eval(eval_step, state, batches, aux):
    """Compile on batches[0]; time one pass over DISTINCT batches.

    Repeated identical pure jitted calls can be served memoized on the
    axon tunnel (CLAUDE.md "repeated identical pure calls measure lies"),
    so each timed call gets its own batch — same shapes, one compile."""
    import jax

    f = jax.jit(eval_step)
    t_c0 = time.perf_counter()
    m = f(state, batches[0], aux)
    m = jax.device_get(m)
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for b in batches:
        last = f(state, b, aux)
    last = {k: float(v) for k, v in jax.device_get(last).items()}
    wall = (time.perf_counter() - t0) / len(batches)
    return last, wall, compile_s


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    note = warn_cpu_fallback(log)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--corpus", type=int, default=2_262_292)
    p.add_argument("--album_buckets", type=int, default=100_000)
    p.add_argument("--num_artists", type=int, default=295_861)
    p.add_argument("--k", type=int, default=500)
    p.add_argument("--bins", type=int, default=4096,
                   help="fused-path bin count for the same-batch comparison"
                        " (0 skips the fused pass)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--out", default="parity_runs/r5_exact_eval_chip.json")
    args = p.parse_args(argv)
    if note and args.out.startswith("parity_runs/"):
        # CPU fallback must not clobber the committed chip record
        args.out += ".cpu.json"
        log.warning("CPU fallback: redirecting output to %s", args.out)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from esrecsys_tpu.workloads import playlist as pl

    base = pl.PlaylistConfig(
        work_dir="/tmp/eval_chip_check", feature_size=32,
        album_hash_buckets=args.album_buckets, num_artists=args.num_artists,
        compute_dtype="bfloat16", batch_size=args.batch, context_size=5,
        max_next=64, eval_k=args.k, eval_group=8, corpus_block=131_072,
        momentum=0.0, sparse_updates=True)

    rng = np.random.default_rng(0)
    corpus = {
        "tracks": jnp.arange(args.corpus, dtype=jnp.int32),
        "albums": jnp.asarray(
            rng.integers(0, args.album_buckets * 7, args.corpus), jnp.int32),
        "artists": jnp.asarray(
            rng.integers(0, args.num_artists, args.corpus), jnp.int32),
    }
    b, c, m = args.batch, base.context_size, base.max_next
    ri = lambda hi, *s: jnp.asarray(rng.integers(0, hi, s), jnp.int32)

    def make_batch():
        return {
            "track_context": ri(args.corpus, b, c),
            "album_context": ri(args.album_buckets * 7, b, c),
            "artist_context": ri(args.num_artists, b, c),
            "next_track": ri(args.corpus, b, m),
            "next_album": ri(args.album_buckets * 7, b, m),
            "next_artist": ri(args.num_artists, b, m),
            "next_mask": jnp.ones((b, m), jnp.float32),
        }

    # one distinct batch per timed call (see _time_eval)
    batches = [make_batch() for _ in range(args.iters)]

    out = {"backend": jax.default_backend(), "cpu_fallback": bool(note),
           "batch": b, "corpus": args.corpus, "k": args.k,
           "eval_score_tile_bytes": base.eval_score_tile_bytes}

    model, state = pl.init_state(base, mesh=None)

    # --- exact chunked path (the one that used to kill the compile worker)
    setup = jax.jit(pl.make_corpus_embed_setup(model, base, corpus))
    t0 = time.perf_counter()
    ce = setup(state)
    ce.block_until_ready()
    out["embed_corpus_s"] = round(time.perf_counter() - t0, 2)
    es = pl.make_eval_step(model, base, corpus)
    metrics, wall, compile_s = _time_eval(es, state, batches, ce)
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    out["exact"] = {"metrics": metrics, "s_per_eval_batch": round(wall, 3),
                    "playlists_per_s": round(b / wall, 1),
                    "compile_s": round(compile_s, 1)}
    del ce

    # --- fused path, SAME batch/corpus/state
    if args.bins:
        cfg_f = dataclasses.replace(base, eval_fused_bins=args.bins)
        setup_f = jax.jit(pl.make_corpus_embed_setup(model, cfg_f, corpus))
        aux = setup_f(state)
        jax.block_until_ready(aux)
        es_f = pl.make_eval_step(model, cfg_f, corpus)
        metrics_f, wall_f, compile_f = _time_eval(es_f, state, batches, aux)
        out["fused"] = {
            "metrics": metrics_f, "s_per_eval_batch": round(wall_f, 3),
            "playlists_per_s": round(b / wall_f, 1),
            "compile_s": round(compile_f, 1), "bins": args.bins,
            "speedup_vs_exact": round(wall / wall_f, 2)}
        # random-data recalls are near 0 on both paths; the metric-level
        # agreement bound is covered by tests/test_playlist.py — here we
        # record the delta for the report
        out["metric_delta"] = {
            k: round(abs(metrics[k] - metrics_f[k]), 5) for k in metrics
            if k in metrics_f}

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
