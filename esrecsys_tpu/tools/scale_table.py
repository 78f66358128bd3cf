"""Embedding-table scale demo/benchmark (the 100M-row stretch target).

The reference's largest table is 295,861 rows living whole on one device
(spotify/models.py:31). This tool stands up an arbitrarily large row-sharded
table (``--n_model`` shards over the ``model`` mesh axis, or single-chip) and
drives training-shaped traffic through it: on-device id sampling → row gather
→ loss → row-sparse update (scatter-add of −lr·grad, no dense table pass —
the same path as ``workloads/playlist.py`` ``make_sparse_train_step``).

Example (one TPU v5e chip, 100M bf16 rows = 6.4 GB of 16 GB HBM):
  python -m esrecsys_tpu.tools.scale_table --rows 100000000 --dtype bfloat16

Prints one JSON line with lookup+update rows/s.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.core import mesh as mesh_lib
from esrecsys_tpu.core import prng
from esrecsys_tpu.parallel.table import init_table, lookup


@dataclasses.dataclass(frozen=True)
class ScaleConfig:
    rows: int = 100_000_000
    dim: int = 32
    dtype: str = "bfloat16"
    ids_per_step: int = 262_144
    steps_per_call: int = 4
    calls: int = 4
    learning_rate: float = 0.01
    momentum: float = 0.0  # >0 uses the lazy-momentum path — the exact
    # dense-SGD-momentum trajectory without the dense per-step pass (at
    # 100M rows a dense momentum pass moves ~38 GB/step). Single-chip
    # packable shapes STORE the table/moments in the 128-lane packed
    # physical layout (ops/optim.lazy_momentum_packed_update): per-step
    # reshape-around-scatter would draw a lane-padded relayout copy
    # (128/D x table bytes — OOM at 100M rows) and loses in-step anyway
    # (BENCHMARKS.md scatter study)
    n_model: int = 1
    seed: int = 0


def run(cfg: ScaleConfig) -> dict:
    mesh = mesh_lib.make_mesh(n_model=cfg.n_model) if cfg.n_model > 1 else None
    dtype = jnp.dtype(cfg.dtype)
    key = prng.base_key(cfg.seed)
    # Packed-STORED carriers for the single-chip lazy-momentum path: the
    # per-step reshape view is both slower in-step and, at 100M rows, an
    # OOM (XLA materializes a lane-padded relayout copy of the table).
    packed = bool(cfg.momentum) and cfg.n_model == 1 and cfg.dim <= 128 \
        and 128 % cfg.dim == 0 and cfg.rows % 128 == 0
    if packed:
        from esrecsys_tpu.ops import optim

        phys_rows = cfg.rows * cfg.dim // 128
        table = jax.jit(
            lambda k: init_table(k, phys_rows, 128, mesh=None, dtype=dtype),
        )(prng.stream(key, prng.STREAM_INIT))
        carry0 = (table, {
            "momentum": jnp.zeros((phys_rows, 128), dtype),
            "last_step": jnp.zeros((cfg.rows // 128, 128), jnp.int32),
        })
    else:
        table = jax.jit(
            lambda k: init_table(k, cfg.rows, cfg.dim, mesh=mesh, dtype=dtype),
        )(prng.stream(key, prng.STREAM_INIT))
        if cfg.momentum:
            from esrecsys_tpu.ops import optim

            # moments in the table's dtype: HBM is the constraint here
            carry0 = (table, optim.momentum_init(table, dtype=dtype))
        else:
            carry0 = (table, None)
    w = jnp.ones((cfg.ids_per_step, cfg.dim), jnp.float32)

    def one_step(carry, step):
        table, mstate = carry
        k = prng.key_for_step(key, step, prng.STREAM_NEGATIVES)
        ids = jax.random.randint(k, (cfg.ids_per_step,), 0, cfg.rows)
        if cfg.momentum:
            from esrecsys_tpu.ops import optim
        if packed:
            rows = optim.packed_gather_rows(table, ids, cfg.dim).astype(
                jnp.float32)
            rows = rows + optim.momentum_catchup_rows_packed(
                mstate, ids, dim=cfg.dim,
                lr=cfg.learning_rate, mu=cfg.momentum, step=step)
        else:
            rows = lookup(table, ids, mesh=mesh).astype(jnp.float32)
            if cfg.momentum:
                rows = rows + optim.momentum_catchup_rows(
                    mstate, ids,
                    lr=cfg.learning_rate, mu=cfg.momentum, step=step)

        def loss_fn(rows):
            return jnp.vdot(jnp.tanh(rows), w)

        loss, g = jax.value_and_grad(loss_fn)(rows)
        if packed:
            table, mstate = optim.lazy_momentum_packed_update(
                table, mstate, ids, g, dim=cfg.dim,
                lr=cfg.learning_rate, mu=cfg.momentum, step=step)
            return (table, mstate), loss
        if cfg.momentum:
            table, mstate = optim.lazy_momentum_update(
                table, mstate, ids, g,
                lr=cfg.learning_rate, mu=cfg.momentum, step=step)
            return (table, mstate), loss
        upd = (-cfg.learning_rate * g).astype(table.dtype)
        return (table.at[ids].add(upd), mstate), loss

    def multi(carry, steps):
        return jax.lax.scan(one_step, carry, steps)

    f = jax.jit(multi, donate_argnums=0)
    spc = cfg.steps_per_call
    carry, losses = f(carry0, jnp.arange(spc))
    _ = jax.device_get(losses[-1])  # true barrier through the tunnel
    t0 = time.perf_counter()
    for c in range(cfg.calls):
        carry, losses = f(carry, jnp.arange((c + 1) * spc, (c + 2) * spc))
    _ = jax.device_get(losses[-1])
    dt = time.perf_counter() - t0
    n_steps = cfg.calls * spc
    result = {
        "metric": "table_lookup_update_rows_per_sec",
        "rows": cfg.rows,
        "dim": cfg.dim,
        "dtype": cfg.dtype,
        "table_gb": round(cfg.rows * cfg.dim * dtype.itemsize / 1e9, 2),
        "n_model": cfg.n_model,
        "layout": "packed" if packed else "logical",
        "ids_per_step": cfg.ids_per_step,
        "ms_per_step": round(dt / n_steps * 1e3, 3),
        "value": round(n_steps * cfg.ids_per_step / dt, 1),
        "platform": jax.devices()[0].platform,
    }
    return result


def main(argv=None):
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    warn_cpu_fallback()
    cfg = config_lib.from_cli(ScaleConfig, argv)
    print(json.dumps(run(cfg)))


if __name__ == "__main__":
    main()
