"""The gather study: what moves embedding-ROW-READ cost and what doesn't.

VERDICT r2 weak item 5 / next-round item 4: the flagship step's gathers
(~0.56 ms of the 3.1 ms B=2048 step; ~3.6 ms of 21.9 at B=8192 —
BENCHMARKS.md) had no packed/lane-packed treatment, unlike the scatter half.
This measures every candidate at flagship shapes, with the scatter study's
methodology (ids ride as scan xs so nothing constant-folds; one device_get
barrier; best-of-R repeats):

  * XLA ``jnp.take`` (the incumbent);
  * the Pallas per-row-DMA kernel (ops/lookup.gather_rows), lane-packed for
    D=32 — one DMA per logical row either way (random rows never share a
    physical row);
  * XLA gather through the 128-lane packed VIEW (take(phys, id // pack) →
    slot select): 128/D× the bytes for 1/pack the target rows;
  * the pooled-context case (B, K) → (B, D): XLA gather+pool vs the fused
    kernel (ops/lookup.fused_lookup_pool);
  * IN-STEP: the full flagship sparse train step with
    ``PlaylistConfig.gather_kernel`` off/on — isolated wins that lose
    in-step are the scatter study's core lesson.

Run on the chip:  python -m esrecsys_tpu.tools.gather_study [--out ...]
"""

from __future__ import annotations

import argparse
import functools
import json
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

D = 32
N_IDS = 76_288          # flagship touched-row count (B=2048 shared-neg step)
SCAN_ITERS = 32
REPEATS = 3


def _time_scan(fn, table, ids_stack) -> float:
    """ms per iteration of fn(table, ids) with ids as scan xs."""

    @jax.jit
    def run(table, xs):
        def body(carry, ids):
            out = fn(table, ids)
            # fold the result into a live scalar so nothing is DCE'd
            return carry + out[0, 0], None

        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    _ = jax.device_get(run(table, ids_stack))  # compile + warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = jax.device_get(run(table, ids_stack))
        best = min(best, time.perf_counter() - t0)
    return (best - 0.028) * 1000 / ids_stack.shape[0]  # - tunnel round-trip


def isolated(rows_list=(100_000, 295_861, 2_262_292)) -> dict:
    from esrecsys_tpu.ops.lookup import gather_rows

    rng = np.random.default_rng(0)
    out = {}
    for rows in rows_list:
        rows_pad = rows + ((-rows * D) % 128 != 0) * (
            ((128 - (rows * D) % 128) % 128) // D)  # make R*D % 128 == 0
        key = jax.random.PRNGKey(1)
        table = jax.random.normal(key, (rows_pad, D), jnp.float32)
        ids_stack = jnp.asarray(
            rng.integers(0, rows, (SCAN_ITERS, N_IDS)), jnp.int32)
        pack = 128 // D
        phys = rows_pad * D // 128

        def xla_take(t, ids):
            return jnp.take(t, ids, axis=0)

        def pallas(t, ids):
            return gather_rows(t, ids)

        def packed_view(t, ids):
            ph = t.reshape(phys, 128)
            wide = jnp.take(ph, ids // pack, axis=0)        # (n, 128)
            grouped = wide.reshape(-1, pack, D)
            slot = (ids % pack)[:, None]
            sel = (slot == jnp.arange(pack)[None, :]).astype(t.dtype)
            # exact masked sum, not einsum: TPU f32 dot_general defaults to
            # a bf16 MXU pass (see ops/optim.packed_gather_rows)
            return jnp.sum(grouped * sel[:, :, None], axis=1)

        res = {}
        for name, fn in [("xla_take", xla_take), ("pallas_dma", pallas),
                         ("packed_view_xla", packed_view)]:
            ms = _time_scan(fn, table, ids_stack)
            res[name] = round(ms, 4)
            log.info("rows=%d %s: %.4f ms (%.2f ns/row)", rows, name, ms,
                     ms * 1e6 / N_IDS)
        out[str(rows)] = res
    return out


def pooled(rows=100_000, b=2048, k=5) -> dict:
    from esrecsys_tpu.ops.lookup import fused_lookup_pool
    from esrecsys_tpu.parallel.table import lookup_pooled

    rng = np.random.default_rng(1)
    table = jax.random.normal(jax.random.PRNGKey(2), (rows, D), jnp.float32)
    ids_stack = jnp.asarray(rng.integers(1, rows, (SCAN_ITERS, b, k)), jnp.int32)
    res = {}
    for name, fn in [
        ("xla_gather_pool", lambda t, ids: lookup_pooled(t, ids, pool="mean")),
        ("pallas_fused", lambda t, ids: fused_lookup_pool(t, ids, pool="mean")),
    ]:
        ms = _time_scan(fn, table, ids_stack)
        res[name] = round(ms, 4)
        log.info("pooled (B=%d K=%d rows=%d) %s: %.4f ms", b, k, rows, name, ms)
    return res


def in_step(steps=64) -> dict:
    """Full flagship sparse step, gather_kernel off vs on."""
    from esrecsys_tpu.core import prng
    from esrecsys_tpu.workloads import playlist as pl

    # artist table padded 295,861 → 295,864 (R·D % 128 == 0) so gather_rows
    # takes the kernel path for BOTH tables — at the raw reference row count
    # it would silently fall back to jnp.take for the artist table and the
    # off/on comparison would measure a half-Pallas step; ids stay < 295,861
    NUM_ALBUMS, NUM_ARTISTS = 100_000, 295_864
    B, C, M = 2048, 5, 32
    rng = np.random.default_rng(3)
    corpus = {
        "tracks": jnp.asarray(rng.integers(0, 2_262_292, 262_144), jnp.int32),
        "albums": jnp.asarray(rng.integers(0, NUM_ALBUMS * 7, 262_144), jnp.int32),
        "artists": jnp.asarray(rng.integers(0, 295_861, 262_144), jnp.int32),
    }
    one = {
        "track_context": rng.integers(0, 2_262_292, (B, C)).astype(np.int32),
        "album_context": rng.integers(0, NUM_ALBUMS * 7, (B, C)).astype(np.int32),
        "artist_context": rng.integers(0, 295_861, (B, C)).astype(np.int32),
        "next_track": rng.integers(0, 2_262_292, (B, M)).astype(np.int32),
        "next_album": rng.integers(0, NUM_ALBUMS * 7, (B, M)).astype(np.int32),
        "next_artist": rng.integers(0, 295_861, (B, M)).astype(np.int32),
        "next_mask": np.ones((B, M), np.float32),
    }
    stacked = {k: jnp.asarray(np.stack([v] * steps)) for k, v in one.items()}
    res = {}
    for name, gk, pt in [("xla_take", False, "off"), ("pallas_dma", True, "off"),
                         ("packed_stored", False, "on")]:
        cfg = pl.PlaylistConfig(
            feature_size=D, album_hash_buckets=NUM_ALBUMS,
            num_artists=NUM_ARTISTS, num_negatives=512, batch_size=B,
            context_size=C, max_next=M, shared_negatives=True,
            sparse_updates=True, momentum=0.0, compute_dtype="bfloat16",
            gather_kernel=gk, packed_tables=pt)
        model, state = pl.init_state(cfg, mesh=None)
        step = pl.select_train_step(model, cfg, corpus, prng.base_key(0))
        state_pack, state_unpack = pl.packed_state_transforms(cfg)

        @jax.jit
        def multi(state, xs):
            if state_pack is not None:
                state = state_pack(state)
            st, m = jax.lax.scan(lambda s, x: step(s, x), state, xs)
            if state_unpack is not None:
                st = state_unpack(st)
            return st, m["loss"][-1]

        state, l0 = multi(state, stacked)
        _ = jax.device_get(l0)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            state, l1 = multi(state, stacked)
            _ = jax.device_get(l1)
            best = min(best, time.perf_counter() - t0)
        ms = (best - 0.028) * 1000 / steps
        res[name] = round(ms, 4)
        log.info("in-step %s: %.4f ms/step (%.0f ex/s)", name, ms, B / ms * 1000)
    return res


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    warn_cpu_fallback(log)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/gather_study.json")
    p.add_argument("--skip_in_step", action="store_true")
    args = p.parse_args(argv)
    out = {"isolated_ms_per_gather_76288x32": isolated(),
           "pooled_ms": pooled()}
    if not args.skip_in_step:
        out["in_step_ms"] = in_step()
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
