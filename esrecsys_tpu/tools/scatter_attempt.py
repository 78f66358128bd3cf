"""Measure the round-5 VMEM-resident scatter attempt vs XLA's scatter.

VERDICT r4 next #3: one serious attempt to raise the ~70-110 M rows/s
per-row scatter issue ceiling — a Pallas kernel that keeps the whole packed
table resident in VMEM across the grid and applies streamed update rows
with dynamic (1, 128) VMEM read-modify-writes
(:func:`esrecsys_tpu.ops.scatter.vmem_scatter_add_phys`), so HBM traffic is
one table load + one writeback + one update pass instead of a per-row RMW.

Shapes: the flagship album table (100k x 32 -> 25k x 128 packed, 12.8 MB —
the largest flagship table that fits VMEM residency) at the flagship's
76,288 update rows/step, plus a half-size table for scaling shape.

Timing: chained donated state (t <- f(t, ...)) so repeated calls cannot
memoize, `jax.device_get` barrier (the only true round-trip on the axon
tunnel — CLAUDE.md), per-call time minus one measured round-trip.

Run: python -m esrecsys_tpu.tools.scatter_attempt
"""

from __future__ import annotations

import argparse
import json
import logging
import time

log = logging.getLogger(__name__)


def _time_chained(fn, t0_state, ids, upd, iters=20):
    import jax

    f = jax.jit(fn, donate_argnums=0)
    t = f(t0_state, ids, upd)  # compile
    _ = jax.device_get(t[0, 0])
    start = time.perf_counter()
    for _ in range(iters):
        t = f(t, ids, upd)
    _ = jax.device_get(t[0, 0])
    wall = time.perf_counter() - start
    return wall / iters


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    note = warn_cpu_fallback(log)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", default="parity_runs/r5_scatter_attempt.json")
    args = p.parse_args(argv)
    if note and args.out.startswith("parity_runs/"):
        # CPU fallback must not clobber the committed chip record
        args.out += ".cpu.json"
        log.warning("CPU fallback: redirecting output to %s", args.out)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from esrecsys_tpu.ops import optim, scatter

    D, N = 32, 76_288
    rng = np.random.default_rng(0)
    results = {}
    # measured tunnel round-trip to subtract from per-call times
    z = jnp.zeros((1,), jnp.float32)
    _ = jax.device_get(z)
    t0 = time.perf_counter()
    for _ in range(10):
        _ = jax.device_get(z)
    rt = (time.perf_counter() - t0) / 10
    results["roundtrip_ms"] = round(rt * 1e3, 2)

    for R in (100_000, 50_000):
        table = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, R, N), jnp.int32)
        upd = jnp.asarray((rng.normal(size=(N, D)) * 1e-4).astype(np.float32))

        xla_s = _time_chained(
            lambda t, i, u: scatter.packed_scatter_add_phys(t, i, u, D),
            optim.pack_rows(table), ids, upd, args.iters)
        row = {"xla_packed_ms": round(xla_s * 1e3, 3),
               "xla_rows_per_s": round(N / max(xla_s - rt / args.iters,
                                               1e-9))}
        for chunk in (256, 512, 1024):
            try:
                vm_s = _time_chained(
                    lambda t, i, u, c=chunk: scatter.vmem_scatter_add_phys(
                        t, i, u, D, chunk=c),
                    optim.pack_rows(table), ids, upd, args.iters)
                row[f"vmem_chunk{chunk}_ms"] = round(vm_s * 1e3, 3)
                row[f"vmem_chunk{chunk}_rows_per_s"] = round(
                    N / max(vm_s - rt / args.iters, 1e-9))
            except Exception as e:  # Mosaic lowering failures are data too
                row[f"vmem_chunk{chunk}_error"] = str(e)[:200]
        # correctness on chip (not just interpret): same inputs, one call,
        # chunk=1024 — the only configuration that survives Mosaic
        # lowering on real v5e (256/512 fail with compile-helper exit 1)
        want = np.asarray(jax.device_get(
            scatter.packed_scatter_add_phys(optim.pack_rows(table), ids,
                                            upd, D)))
        try:
            got = np.asarray(jax.device_get(
                scatter.vmem_scatter_add_phys(optim.pack_rows(table), ids,
                                              upd, D, chunk=1024)))
            row["max_abs_diff"] = float(np.abs(got - want).max())
        except Exception as e:
            row["chip_error"] = str(e)[:200]
        results[f"R{R}"] = row
        log.info("R=%d: %s", R, row)

    if note:
        results["platform_note"] = note
    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
