"""Multi-host scaling evidence for the flagship playlist step.

BASELINE.md's north star is >=80% scaling efficiency at >=2 hosts. Real
multi-chip hardware is not reachable from this environment (one tunneled
chip), so this tool produces the two strongest available proxies
(VERDICT r3 weak #6):

1. **Analytic bound from the ACTUAL compiled program** (`--mode hlo`):
   compile the flagship train step over an (n_data, n_model) virtual mesh
   at reference table scale, parse every collective op out of the
   partitioned HLO, and sum the bytes each moves per step. Combined with
   the chip-measured step time (bench.py: 2.77 ms at B=2048) and public
   per-chip interconnect bandwidths, this bounds scaling efficiency as

       eff >= t_step / (t_step + collective_bytes / BW)       (no overlap)
       eff  = t_step / max(t_step, collective_bytes / BW)     (full overlap)

   The collective bytes come from the SPMD partitioner's output, not a
   hand model — if GSPMD inserts a table-sized all-gather, this tool
   reports it.

2. **2-process CPU weak-scaling measurement** (`--mode measure`): run the
   fixed-shape step under ``jax.distributed`` with 1 process and with 2
   processes (4 virtual devices each) and compare per-step wall time.
   CAVEAT: this host has ONE CPU core, so the 2-process row measures host
   core contention, not interconnect cost — it is a FUNCTIONAL proof that
   the multi-process step runs and a ceiling check that nothing in the
   program serializes per-process (documented in BENCHMARKS.md). The
   analytic bound is the efficiency argument.

Reference context: the reference has no distributed training at all
(train_spotify.py runs one device; SURVEY.md §2.5).

Run:
  python -m esrecsys_tpu.tools.scaling_study --mode hlo
  python -m esrecsys_tpu.tools.scaling_study --mode measure
"""

from __future__ import annotations

import argparse
import json
import logging
import re
from typing import Dict, Optional

log = logging.getLogger(__name__)

# Public per-chip interconnect numbers (TPU v5e): 1,600 Gbit/s ICI per chip
# aggregate across 4 links -> 200 GB/s; DCN via per-host NIC, ~25 GB/s
# (200 Gbit/s) shared by 8 chips -> ~3.1 GB/s/chip when crossing slices.
ICI_BYTES_PER_SEC = 200e9
DCN_BYTES_PER_SEC_PER_CHIP = 3.1e9

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                "collective-permute", "collective-broadcast")


def parse_collective_bytes(hlo_text: str) -> Dict[str, Dict[str, float]]:
    """Sum output bytes of every collective op in a compiled HLO dump.

    Returns {op_kind: {"count": n, "bytes": output_bytes}}. "bytes" is the
    op's OUTPUT size — a topology-independent upper bound on what one chip
    receives per step (ring all-gather/all-reduce move (n-1)/n of the full
    buffer per link; all-to-all moves (n-1)/n of the shard)."""
    out: Dict[str, Dict[str, float]] = {}
    # e.g.  %ag = f32[2048,32]{1,0} all-gather(f32[256,32]{1,0} %x), ...
    pat = re.compile(
        r"=\s+(?:\()?([a-z0-9]+)\[([\d,]*)\][^ ]*\s+(" +
        "|".join(_COLLECTIVES) + r")(?:-start|-done)?\(")
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if not m:
            continue
        dtype, dims_s, kind = m.groups()
        if kind.endswith("-done"):
            continue  # counted at -start
        dims = [int(x) for x in dims_s.split(",") if x]
        elems = 1
        for d in dims:
            elems *= d
        nbytes = elems * _DTYPE_BYTES.get(dtype, 4)
        slot = out.setdefault(kind, {"count": 0, "bytes": 0.0})
        slot["count"] += 1
        slot["bytes"] += nbytes
    return out


def flagship_collectives(n_data: int, n_model: int,
                         batch_size: int = 2048) -> Dict:
    """Compile the flagship (bench.py) step over an (n_data, n_model)
    virtual mesh at REFERENCE table scale and account its collectives."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from esrecsys_tpu.core import mesh as mesh_lib, prng
    from esrecsys_tpu.workloads import playlist as pl

    devices = jax.devices()[: n_data * n_model]
    mesh = mesh_lib.make_mesh(n_data=n_data, n_model=n_model, devices=devices)
    cfg = pl.PlaylistConfig(
        feature_size=32, album_hash_buckets=100_000, num_artists=295_861,
        num_negatives=512, batch_size=batch_size, context_size=5, max_next=32,
        shared_negatives=True, sparse_updates=True, momentum=0.0,
        compute_dtype="bfloat16", n_model_shards=n_model)
    model, state = pl.init_state(cfg, mesh)
    rng = np.random.default_rng(0)
    corpus_n = 262_144
    corpus = {
        "tracks": jnp.arange(corpus_n, dtype=jnp.int32),
        "albums": jnp.asarray(
            rng.integers(0, 700_000, corpus_n), jnp.int32),
        "artists": jnp.asarray(
            rng.integers(0, cfg.num_artists, corpus_n), jnp.int32),
    }
    step = pl.select_train_step(model, cfg, corpus, prng.base_key(0))
    ri = lambda hi, *s: jnp.asarray(rng.integers(0, hi, s), jnp.int32)
    b, c, m = cfg.batch_size, cfg.context_size, cfg.max_next
    batch = {
        "track_context": ri(corpus_n, b, c), "album_context": ri(700_000, b, c),
        "artist_context": ri(cfg.num_artists, b, c),
        "next_track": ri(corpus_n, b, m), "next_album": ri(700_000, b, m),
        "next_artist": ri(cfg.num_artists, b, m),
        "next_mask": jnp.ones((b, m), jnp.float32),
    }
    batch = {k: jax.device_put(v, mesh_lib.data_sharding(mesh, v.ndim))
             for k, v in batch.items()}
    txt = jax.jit(step, donate_argnums=0).lower(state, batch).compile().as_text()
    colls = parse_collective_bytes(txt)
    total = sum(v["bytes"] for v in colls.values())
    return {
        "mesh": {"data": n_data, "model": n_model},
        "batch_size": batch_size,
        "collectives": colls,
        "total_collective_bytes_per_step": total,
    }


def efficiency_bound(total_bytes: float, step_seconds: float,
                     bw_bytes_per_sec: float) -> Dict[str, float]:
    t_comm = total_bytes / bw_bytes_per_sec
    return {
        "comm_seconds": t_comm,
        "efficiency_no_overlap": step_seconds / (step_seconds + t_comm),
        "efficiency_full_overlap": step_seconds / max(step_seconds, t_comm),
    }


def run_hlo_mode(step_ms: float, out_path: Optional[str]) -> Dict:
    report = {"step_ms_measured_on_chip": step_ms,
              "ici_bytes_per_sec": ICI_BYTES_PER_SEC,
              "dcn_bytes_per_sec_per_chip": DCN_BYTES_PER_SEC_PER_CHIP,
              "topologies": []}
    for n_data, n_model in ((2, 1), (2, 2), (4, 2)):
        row = flagship_collectives(n_data, n_model)
        row["ici"] = efficiency_bound(
            row["total_collective_bytes_per_step"], step_ms / 1e3,
            ICI_BYTES_PER_SEC)
        row["dcn"] = efficiency_bound(
            row["total_collective_bytes_per_step"], step_ms / 1e3,
            DCN_BYTES_PER_SEC_PER_CHIP)
        report["topologies"].append(row)
        log.info("mesh=%s total=%.2f MB/step  ici_eff>=%.3f  dcn_eff>=%.3f",
                 row["mesh"], row["total_collective_bytes_per_step"] / 1e6,
                 row["ici"]["efficiency_no_overlap"],
                 row["dcn"]["efficiency_no_overlap"])
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        log.info("wrote %s", out_path)
    return report


# ------------------------------------------------- 2-process measurement

_WORKER = r"""
import json, os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[1])
import jax.numpy as jnp
import numpy as np
from esrecsys_tpu.core import mesh as mesh_lib, prng
from esrecsys_tpu.workloads import playlist as pl

mesh_lib.distributed_init_if_needed()
spec = json.loads(sys.argv[2])
mesh = mesh_lib.make_mesh(n_data=spec["n_data"], n_model=1)
cfg = pl.PlaylistConfig(
    feature_size=32, album_hash_buckets=20_000, num_artists=5_000,
    num_negatives=128, batch_size=spec["global_batch"], context_size=5,
    max_next=16, shared_negatives=True, sparse_updates=True, momentum=0.0)
model, state = pl.init_state(cfg, mesh)
rng = np.random.default_rng(0)
corpus = {
    "tracks": jnp.arange(4096, dtype=jnp.int32),
    "albums": jnp.asarray(rng.integers(0, 20_000, 4096), jnp.int32),
    "artists": jnp.asarray(rng.integers(0, 5_000, 4096), jnp.int32),
}
step = jax.jit(pl.select_train_step(model, cfg, corpus, prng.base_key(0)),
               donate_argnums=0)
lb = cfg.batch_size // jax.process_count()
ri = lambda hi, *s: rng.integers(0, hi, s).astype(np.int32)
local = {
    "track_context": ri(4096, lb, 5), "album_context": ri(20_000, lb, 5),
    "artist_context": ri(5_000, lb, 5), "next_track": ri(4096, lb, 16),
    "next_album": ri(20_000, lb, 16), "next_artist": ri(5_000, lb, 16),
    "next_mask": np.ones((lb, 16), np.float32),
}
sh = mesh_lib.data_sharding(mesh, 2)
batch = {k: jax.make_array_from_process_local_data(
             sh if v.ndim == 2 else mesh_lib.data_sharding(mesh, v.ndim), v)
         for k, v in local.items()}
state, m = step(state, batch)
_ = jax.device_get(m["loss"])  # compile + barrier
n = spec["steps"]
t0 = time.perf_counter()
for _ in range(n):
    state, m = step(state, batch)
_ = jax.device_get(m["loss"])
dt = time.perf_counter() - t0
print("RESULT", json.dumps({
    "process": jax.process_index(), "processes": jax.process_count(),
    "step_ms": dt / n * 1e3,
    "global_examples_per_s": spec["global_batch"] * n / dt}), flush=True)
"""


def run_measure_mode(steps: int, out_path: Optional[str]) -> Dict:
    import os
    import socket
    import subprocess
    import sys

    rows = []
    for n_procs in (1, 2):
        devs_per_proc = 8 // n_procs
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        spec = json.dumps({"n_data": 8, "global_batch": 1024, "steps": steps})
        procs = []
        for pid in range(n_procs):
            env = dict(os.environ)
            env["XLA_FLAGS"] = (
                f"--xla_force_host_platform_device_count={devs_per_proc}")
            if n_procs > 1:
                env.update({
                    "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                    "JAX_NUM_PROCESSES": str(n_procs),
                    "JAX_PROCESS_ID": str(pid),
                })
            procs.append(subprocess.Popen(
                [sys.executable, "-c", _WORKER, "/root/repo", spec],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True))
        outs = [p.communicate(timeout=1200)[0] for p in procs]
        for p, out in zip(procs, outs):
            if p.returncode != 0:
                raise RuntimeError(f"worker failed:\n{out[-3000:]}")
        res = [json.loads(line[len("RESULT "):])
               for out in outs for line in out.splitlines()
               if line.startswith("RESULT ")]
        rows.append({"processes": n_procs, "per_process": res})
        log.info("%d-process: %s", n_procs, res)
    t1 = rows[0]["per_process"][0]["step_ms"]
    t2 = max(r["step_ms"] for r in rows[1]["per_process"])
    report = {
        "rows": rows,
        "weak_scaling_step_ratio_1p_over_2p": t1 / t2,
        "caveat": ("single-core host: the 2-process row is dominated by CPU "
                   "core contention (two XLA host runtimes on one core), "
                   "NOT interconnect cost; functional proof + ceiling only. "
                   "See --mode hlo for the efficiency argument."),
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        log.info("wrote %s", out_path)
    return report


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["hlo", "measure"], default="hlo")
    p.add_argument("--step_ms", type=float, default=2.77,
                   help="chip-measured flagship step time (bench.py r4: "
                        "738k ex/s at B=2048 -> 2.77 ms)")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    if args.mode == "hlo":
        import jax

        jax.config.update("jax_platforms", "cpu")
        run_hlo_mode(args.step_ms, args.out or None)
    else:
        run_measure_mode(args.steps, args.out or None)


if __name__ == "__main__":
    main()
