"""Chip throughput of the QUALITY-winning flagship config, across layouts.

VERDICT r4 missing #2: the perf headline (bench.py, momentum 0) and the
quality headline (PARITY_RUNS.md fast r3: B=2048, 512 shared negatives,
row-sparse exact lazy SGD-momentum 0.98, bf16, lr 0.004 — recall@500
0.632 beats the reference's 0.602) lived on different configs. This tool
measures the momentum-0.98 config's examples/sec/chip bench-style (device-
resident batch, ``lax.scan`` multi-step, ``device_get`` barrier — CLAUDE.md
tunnel methodology), sweeping the table/carrier layout:

  * ``packed``  — 128-lane physical tables + packed lazy-momentum carriers
    (``ops/optim.lazy_momentum_packed_update``), the ``packed_tables=auto``
    default for this config;
  * ``logical`` — logical-layout tables + logical lazy carriers
    (``packed_tables=off``) — closes ADVICE r3 low #3 at flagship scale
    (packed momentum was in-step-measured only at 100M rows);
  * ``dense``   — ``sparse_updates=False`` optax SGD-momentum (the
    reference's optimizer shape, train_spotify.py:238-243) for scale.

Also measures the momentum-0 perf config in-process for a same-run delta.
Writes parity_runs/r5_quality_throughput.json and prints one JSON line.

Run: python -m esrecsys_tpu.tools.flagship_quality_bench [--spc 64]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import time

log = logging.getLogger(__name__)


def measure(cfg, corpus, spc: int, n_calls: int, rng) -> float:
    """examples/sec of cfg's train step, bench.py methodology."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from esrecsys_tpu.core import prng
    from esrecsys_tpu.workloads import playlist as pl

    model, state = pl.init_state(cfg, mesh=None)
    train_step = pl.select_train_step(model, cfg, corpus, prng.base_key(0))
    # pack ONCE for the whole run, like fit() (per-dispatch transforms
    # measured 36.9k vs 661k ex/s on the momentum flagship — BENCHMARKS.md
    # r5 pack-boundary study)
    state_pack, _ = pl.packed_state_transforms(cfg)
    if state_pack is not None:
        state = jax.jit(state_pack, donate_argnums=0)(state)

    def multi_step(state, stacked):
        new_state, metrics = jax.lax.scan(
            lambda s, b: train_step(s, b), state, stacked)
        return new_state, metrics["loss"][-1]

    step = jax.jit(multi_step, donate_argnums=0)
    b, c, m = cfg.batch_size, cfg.context_size, cfg.max_next
    ri = lambda hi, *s: rng.integers(0, hi, s).astype(np.int32)
    one = {
        "track_context": ri(2_262_292, b, c),
        "album_context": ri(cfg.album_hash_buckets * 7, b, c),
        "artist_context": ri(cfg.num_artists, b, c),
        "next_track": ri(2_262_292, b, m),
        "next_album": ri(cfg.album_hash_buckets * 7, b, m),
        "next_artist": ri(cfg.num_artists, b, m),
        "next_mask": np.ones((b, m), np.float32),
    }
    stacked = {k: jnp.asarray(np.stack([v] * spc)) for k, v in one.items()}
    state, m0 = step(state, stacked)  # compile
    _ = jax.device_get(m0)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, last = step(state, stacked)
    _ = jax.device_get(last)
    return n_calls * spc * b / (time.perf_counter() - t0)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    note = warn_cpu_fallback(log)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--spc", type=int, default=64)
    p.add_argument("--n_calls", type=int, default=6)
    p.add_argument("--skip_dense", action="store_true",
                   help="dense momentum makes two full table passes per "
                        "step; skip when time-boxed")
    p.add_argument("--out", default="parity_runs/r5_quality_throughput.json")
    args = p.parse_args(argv)
    if note and args.out.startswith("parity_runs/"):
        # CPU fallback must not clobber the committed chip record
        args.out += ".cpu.json"
        log.warning("CPU fallback: redirecting output to %s", args.out)

    import jax.numpy as jnp
    import numpy as np

    from esrecsys_tpu.workloads import playlist as pl

    NUM_ALBUMS, NUM_ARTISTS = 100_000, 295_861
    CORPUS = 262_144
    rng = np.random.default_rng(0)
    corpus = {
        "tracks": jnp.asarray(rng.integers(0, 2_262_292, CORPUS), jnp.int32),
        "albums": jnp.asarray(rng.integers(0, NUM_ALBUMS * 7, CORPUS), jnp.int32),
        "artists": jnp.asarray(rng.integers(0, NUM_ARTISTS, CORPUS), jnp.int32),
    }
    # PARITY_RUNS.md fast-r3 quality winner, reference-scale tables
    quality = pl.PlaylistConfig(
        feature_size=32, album_hash_buckets=NUM_ALBUMS,
        num_artists=NUM_ARTISTS, num_negatives=512, batch_size=2048,
        context_size=5, max_next=32, shared_negatives=True,
        sparse_updates=True, momentum=0.98, learning_rate=0.004,
        compute_dtype="bfloat16", steps_per_call=args.spc)
    configs = {
        # momentum_carrier auto resolves to the r5 DENSE carrier here:
        # sparse row grads + full-buffer momentum decay (no sort/catch-up)
        "m98_sparse_densecarrier_packed": quality,
        "m98_sparse_densecarrier_logical": dataclasses.replace(
            quality, packed_tables="off"),
        "m98_lazy_packed": dataclasses.replace(
            quality, momentum_carrier="lazy"),
        "m0_packed": dataclasses.replace(
            quality, momentum=0.0, learning_rate=0.3),
    }
    if not args.skip_dense:
        configs["m98_dense_step"] = dataclasses.replace(
            quality, sparse_updates=False, packed_tables="off")

    out = {}
    for name, cfg in configs.items():
        ex_s = measure(cfg, corpus, args.spc, args.n_calls,
                       np.random.default_rng(7))
        out[name] = round(ex_s, 1)
        log.info("%s: %.1fk ex/s", name, ex_s / 1e3)
    if note:
        out["platform_note"] = note
    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
