"""Quality sweep for the playlist fast config (VERDICT r2 item 1).

Goal: close the last 3% to the reference-shape track recall@500
(PARITY_RUNS.md: fast 0.585 vs reference 0.602) using the tools the repo
already ships — the EXACT lazy SGD-momentum (ops/optim.py, built so the
sparse fast path can keep the reference's momentum-0.98 trajectory,
spotify/train_spotify.py:238-243), piecewise-constant lr schedules (settled
at boundaries via ops/optim.momentum_settle so the lazy trajectory stays
dense-exact), and the GP-EI bayes sweeper (tools/sweep.py) on a real target.

Protocol matches tools/parity_runs.py: same synthetic 50k-track corpus
(seed 1234), same 1024-playlist eval batch, equal-chip-time budget
expressed as a fixed 25.6M-example budget (what the measured fast config
processes in the reference shape's device time); per-run train_seconds are
recorded so the winner can be cross-checked against the reference budget.

Run (grid):   python -m esrecsys_tpu.tools.playlist_parity_sweep \
                  --mode grid --grid '[{"learning_rate":0.006,"momentum":0.98}]'
Run (bayes):  python -m esrecsys_tpu.tools.playlist_parity_sweep --mode bayes
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from esrecsys_tpu.core import prng
from esrecsys_tpu.tools.parity_runs import _playlist_batch, _playlist_corpus

log = logging.getLogger(__name__)

C, M = 5, 10
EVAL_PLAYLISTS = 1024

_DATA = {}


def _data():
    """Corpus + eval batch, built once per process (fixed seeds — identical
    to tools/parity_runs.py so numbers are comparable across rounds)."""
    if not _DATA:
        data_rng = np.random.default_rng(1234)
        corpus_np, pools, album_of, artist_of = _playlist_corpus(data_rng)
        eval_rng = np.random.default_rng(999)
        eval_batch = _playlist_batch(eval_rng, EVAL_PLAYLISTS, C, M,
                                     pools, album_of, artist_of)
        _DATA.update(
            corpus={k: jnp.asarray(v) for k, v in corpus_np.items()},
            pools=pools, album_of=album_of, artist_of=artist_of,
            eval_batch={k: jnp.asarray(v) for k, v in eval_batch.items()})
    return _DATA


def run_fast(overrides: Dict, seed: int, examples: int = 25_600_000,
             lr_phases: Optional[Sequence[Tuple[float, float]]] = None) -> Dict:
    """One fast-config run → recall metrics.

    ``lr_phases``: [(fraction_of_examples, lr), ...]; at each boundary the
    lazy momentum state is settled with the outgoing lr
    (workloads/playlist.settle_momentum_state) so the trajectory equals
    dense SGD-momentum under the same stepwise schedule.
    """
    from esrecsys_tpu.workloads import playlist as pl

    d = _data()
    base = dict(
        feature_size=32, album_hash_buckets=20_000, num_artists=5_000,
        context_size=C, max_next=M, eval_k=500, eval_group=8,
        corpus_block=65536, batch_size=2048, num_negatives=512,
        shared_negatives=True, sparse_updates=True, momentum=0.0,
        learning_rate=0.3, compute_dtype="bfloat16", steps_per_call=8,
        seed=seed)
    base.update(overrides)
    phases = list(lr_phases) if lr_phases else [(1.0, base["learning_rate"])]
    assert abs(sum(f for f, _ in phases) - 1.0) < 1e-6, phases

    cfg0 = pl.PlaylistConfig(**{**base, "learning_rate": phases[0][1]})
    model, state = pl.init_state(cfg0, mesh=None)
    b, spc = cfg0.batch_size, cfg0.steps_per_call
    batch_rng = np.random.default_rng(seed + 71)
    t0 = time.time()
    total_steps = 0
    for pi, (frac, lr) in enumerate(phases):
        cfg = pl.PlaylistConfig(**{**base, "learning_rate": lr})
        step = pl.select_train_step(model, cfg, d["corpus"], prng.base_key(seed))

        @jax.jit
        def multi(state, stacked):
            return jax.lax.scan(lambda s, x: step(s, x), state, stacked)

        n_calls = max(1, int(examples * frac) // (b * spc))
        for _ in range(n_calls):
            batches = [_playlist_batch(batch_rng, b, C, M, d["pools"],
                                       d["album_of"], d["artist_of"])
                       for _ in range(spc)]
            stacked = {k: jnp.asarray(np.stack([bb[k] for bb in batches]))
                       for k in batches[0]}
            state, _ = multi(state, stacked)
        total_steps += n_calls * spc
        if pi + 1 < len(phases):  # lr boundary: settle at the OUTGOING lr
            state = pl.settle_momentum_state(state, cfg, lr=lr)
    final_cfg = pl.PlaylistConfig(**{**base, "learning_rate": phases[-1][1]})
    # settle via the BARRIER (advances last_step) — the eval step settles
    # internally, so a flush that leaves last_step behind would be applied
    # twice and corrupt every momentum>0 metric
    state = pl.settle_momentum_state(state, final_cfg)
    eval_step = pl.select_eval_step(model, final_cfg, d["corpus"], mesh=None)
    em = jax.device_get(jax.jit(eval_step)(state, d["eval_batch"]))
    out = {
        "seed": seed,
        "track_recall@500": float(em["track_recall"]),
        "artist_recall@500": float(em["artist_recall"]),
        "train_seconds": round(time.time() - t0, 1),
        "steps": total_steps,
        "examples": total_steps * b,
        "overrides": overrides,
        "lr_phases": phases if lr_phases else None,
    }
    log.info("run: %s", out)
    return out


def bayes(out_dir: str, examples: int, max_runs: int, seed_base: int = 0):
    """GP-EI sweep (tools/sweep.py, method=bayes) over (lr, momentum, N, B) —
    the VERDICT-requested dogfood of the bayes sweeper on a real target."""
    from esrecsys_tpu.tools.sweep import SweepSpec, run_sweep

    spec = SweepSpec(
        method="bayes",
        metric_name="track_recall@500",
        metric_goal="maximize",
        parameters={
            "learning_rate": {"min": 1e-3, "max": 3e-2, "log": True},
            "momentum": {"values": [0.9, 0.95, 0.98]},
            "num_negatives": {"values": [256, 512, 1024]},
            "batch_size": {"values": [1024, 2048, 4096]},
        },
        max_runs=max_runs, n_init=5, early_stop_patience=8, seed=7)

    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class _SweptCfg:  # run_sweep merges overrides via dataclasses.replace
        learning_rate: float = 6e-3
        momentum: float = 0.98
        num_negatives: int = 512
        batch_size: int = 2048

    def train_fn(cfg):
        return run_fast(dataclasses.asdict(cfg), seed=seed_base,
                        examples=examples)

    return run_sweep(spec, _SweptCfg(), train_fn, out_dir,
                     metric_from_result=lambda r: r["track_recall@500"])


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    warn_cpu_fallback(log)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="grid", choices=["grid", "bayes"])
    p.add_argument("--grid", default="[]",
                   help="JSON list of override dicts; each may carry "
                        "'lr_phases': [[frac, lr], ...]")
    p.add_argument("--seeds", type=int, default=1)
    p.add_argument("--examples", type=int, default=25_600_000)
    p.add_argument("--max_runs", type=int, default=24)
    p.add_argument("--out", default="/tmp/playlist_sweep")
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    if args.mode == "bayes":
        res = bayes(args.out, args.examples, args.max_runs)
        print(json.dumps(res["best"]))
        return
    results: List[Dict] = []
    for ov in json.loads(args.grid):
        phases = ov.pop("lr_phases", None)
        if phases is not None:
            phases = [tuple(x) for x in phases]
        for seed in range(args.seeds):
            results.append(run_fast(ov, seed, args.examples, lr_phases=phases))
            with open(os.path.join(args.out, "grid.json"), "w") as f:
                json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
