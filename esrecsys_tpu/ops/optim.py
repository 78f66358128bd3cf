"""Row-lazy optimizers for embedding tables.

Dense optimizers force a full-table pass per step (momentum/Adam moments
decay everywhere), which dominates step time for reference-scale tables
(BENCHMARKS.md). These helpers keep optimizer state row-sharded WITH the
table and touch only the rows a step gathered:

  * :func:`lazy_momentum_update` — **exactly** equivalent to dense SGD with
    momentum when untouched rows have zero gradient (always true for
    embedding lookups): a row idle for k steps would have accumulated
    ``p -= lr * m * (mu + mu² + … + mu^k)`` and decayed ``m *= mu^k`` — both
    closed forms, applied at the next touch ("catch-up"). A final
    :func:`momentum_flush` settles all rows' outstanding catch-up (e.g.
    before eval/checkpoint) so parameters equal the dense trajectory at any
    synchronization point.
  * :func:`lazy_adam_update` — TF-style LazyAdam: moments update only on
    touch, bias correction uses the global step. This is the standard
    approximation (NOT bit-equal to dense Adam, which moves idle rows while
    their momentum decays); documented divergence.

State lives in plain pytrees next to the table params, sharded by the same
partition rules (rows over ``model``).

Reference context: the reference runs dense optax SGD-momentum / Adam over
whole tables every step (spotify/train_spotify.py:238-243,
wikipedia/train_cooccurence.py:96-101).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from esrecsys_tpu.ops.scatter import auto_scatter_add


def _like_table_sharding(x: jax.Array, table: jax.Array) -> jax.Array:
    """Place optimizer state with the table's row sharding (rows over
    ``model``); 1-D state inherits the row axis of the table's spec."""
    sharding = getattr(table, "sharding", None)
    if sharding is None:
        return x
    try:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if isinstance(sharding, NamedSharding) and x.ndim != table.ndim:
            row_axis = sharding.spec[0] if len(sharding.spec) else None
            sharding = NamedSharding(sharding.mesh, P(row_axis))
        return jax.device_put(x, sharding)
    except (ValueError, TypeError):
        return x


def momentum_init(table: jax.Array, dtype=jnp.float32) -> Dict[str, jax.Array]:
    return {
        # moments default to f32 even for low-precision tables; pass
        # dtype=bfloat16 when HBM is the constraint (100M-row scale).
        # State is placed with the table's row sharding so the row-lazy
        # optimizer scales where it matters (row-sharded tables).
        "momentum": _like_table_sharding(jnp.zeros(table.shape, dtype), table),
        # step at which each row's momentum/params were last settled
        "last_step": _like_table_sharding(
            jnp.zeros((table.shape[0],), jnp.int32), table),
    }


def momentum_catchup_rows(
    state: Dict[str, jax.Array],
    ids: jax.Array,
    *,
    lr: float,
    mu: float,
    step: jax.Array,
) -> jax.Array:
    """Per-occurrence settlement deltas for the rows a step is about to use.

    The FORWARD pass must see settled row values (raw row + this delta) or
    its gradients are taken at stale parameters and the trajectory diverges
    from dense momentum. Duplicate ids get identical deltas (same row).
    """
    m_rows = jnp.take(state["momentum"], ids, axis=0).astype(jnp.float32)
    last = jnp.take(state["last_step"], ids, axis=0)
    k = jnp.maximum(step - last, 0).astype(jnp.float32)
    mu_k = jnp.power(jnp.float32(mu), k)
    geom = jnp.where(mu > 0, mu * (1.0 - mu_k) / max(1.0 - mu, 1e-12), 0.0)
    return -lr * m_rows * geom[:, None]


def lazy_momentum_update(
    table: jax.Array,
    state: Dict[str, jax.Array],
    ids: jax.Array,        # (n,) rows touched this step (dups allowed)
    row_grads: jax.Array,  # (n, D) gradients w.r.t. the gathered rows
    *,
    lr: float,
    mu: float,
    step: jax.Array,       # current global step (0-based)
    rows_sharded: bool = False,  # True when the table is row-sharded over
    # ``model`` — disables the packed-view scatter (reshape would cross the
    # sharded dimension; tracers hide sharding so callers must say)
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One exact sparse SGD-momentum step on the touched rows.

    Duplicate ids are handled by pre-aggregating ``row_grads`` with a
    segment-sum over the step's unique positions — the catch-up and momentum
    updates must apply once per row, not once per occurrence.
    """
    n = ids.shape[0]
    # Aggregate duplicate ids: sort ids, segment-sum grads onto the FIRST
    # occurrence, zero elsewhere, and mask so only one occurrence updates.
    order = jnp.argsort(ids)
    sids = ids[order]
    sgrads = row_grads[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
    seg = jnp.cumsum(first) - 1  # segment index per sorted row
    agg = jax.ops.segment_sum(sgrads, seg, num_segments=n)  # (n, D), tail zeros
    # scatter aggregated grad back to the first occurrence's slot
    g = jnp.where(first[:, None], agg[seg], 0.0)
    w = first.astype(jnp.float32)[:, None]  # 1 for the row's single active slot

    m_rows = jnp.take(state["momentum"], sids, axis=0).astype(jnp.float32)
    last = jnp.take(state["last_step"], sids, axis=0)
    # k idle steps since the row was settled (>= 0); f32 math regardless of
    # the table's (possibly low-precision) dtype
    k = jnp.maximum(step - last, 0).astype(jnp.float32)
    mu_k = jnp.power(jnp.float32(mu), k)
    # idle catch-up: p -= lr * m * (mu + ... + mu^k) ; m *= mu^k
    geom = jnp.where(mu > 0, mu * (1.0 - mu_k) / max(1.0 - mu, 1e-12), 0.0)
    catchup = -lr * m_rows * geom[:, None]
    m_caught = m_rows * mu_k[:, None]
    # touched step: m = mu*m + g ; p -= lr*m
    m_new = mu * m_caught + g
    # total Δp = catch-up for the idle steps + this step's -lr*m
    delta = (catchup - lr * m_new) * w

    # scatter strategy (plain vs packed physical view) picked by shape —
    # big narrow tables are in XLA's slow per-row regime (ops/scatter.py)
    ap = not rows_sharded
    new_table = auto_scatter_add(table, sids, delta, allow_packed=ap)
    new_mom = auto_scatter_add(state["momentum"], sids, (m_new - m_rows) * w,
                               allow_packed=ap)
    new_last = state["last_step"].at[sids].max(
        jnp.where(first, step + 1, 0).astype(jnp.int32))
    return new_table, {"momentum": new_mom, "last_step": new_last}


def momentum_flush(table: jax.Array, state: Dict[str, jax.Array], *,
                   lr: float, mu: float, step: jax.Array) -> jax.Array:
    """Settle every row's outstanding idle catch-up (no new gradients).

    After this, ``table`` equals the dense SGD-momentum trajectory at
    ``step``. Use before eval or checkpoint export. (State's last_step is
    NOT advanced — flush returns the settled VIEW; training continues from
    the same state.)
    """
    k = jnp.maximum(step - state["last_step"], 0).astype(jnp.float32)
    mu_k = jnp.power(jnp.float32(mu), k)
    geom = mu * (1.0 - mu_k) / max(1.0 - mu, 1e-12)
    settled = (table.astype(jnp.float32)
               - lr * state["momentum"].astype(jnp.float32) * geom[:, None])
    return settled.astype(table.dtype)


def momentum_settle(table: jax.Array, state: Dict[str, jax.Array], *,
                    lr: float, mu: float,
                    step: jax.Array) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Settle ALL rows and advance ``last_step`` — a synchronization barrier.

    Unlike :func:`momentum_flush` (settled VIEW, state untouched), this
    returns a new (table, state) pair where every row's idle catch-up has
    been applied, momentum decayed by ``mu^k``, and ``last_step`` set to
    ``step``. Use at a LEARNING-RATE boundary: the lazy catch-up closed form
    assumes a constant lr since the row's last touch, so piecewise-constant
    lr schedules must settle with the OLD lr before switching — after which
    the lazy trajectory remains exactly the dense SGD-momentum trajectory of
    the stepwise schedule.
    """
    settled = momentum_flush(table, state, lr=lr, mu=mu, step=step)
    k = jnp.maximum(step - state["last_step"], 0).astype(jnp.float32)
    mu_k = jnp.power(jnp.float32(mu), k)
    m = state["momentum"].astype(jnp.float32)
    new_state = {
        "momentum": (m * mu_k[:, None]).astype(state["momentum"].dtype),
        "last_step": jnp.full_like(state["last_step"], step),
    }
    return settled, new_state


def adam_init(table: jax.Array, dtype=jnp.float32) -> Dict[str, jax.Array]:
    return {
        # moments default to f32 even for low-precision tables; placed with
        # the table's row sharding (see momentum_init)
        "m": _like_table_sharding(jnp.zeros(table.shape, dtype), table),
        "v": _like_table_sharding(jnp.zeros(table.shape, dtype), table),
    }


def lazy_adam_update(
    table: jax.Array,
    state: Dict[str, jax.Array],
    ids: jax.Array,
    row_grads: jax.Array,
    *,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    step: jax.Array,  # 0-based global step
    rows_sharded: bool = False,  # see lazy_momentum_update
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """TF-LazyAdam: update moments and params only for touched rows.

    Duplicates pre-aggregated as in :func:`lazy_momentum_update`. Bias
    correction uses the global step (standard LazyAdam semantics).
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sids = ids[order]
    sgrads = row_grads[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
    seg = jnp.cumsum(first) - 1
    agg = jax.ops.segment_sum(sgrads, seg, num_segments=n)
    g = jnp.where(first[:, None], agg[seg], 0.0)
    w = first.astype(jnp.float32)[:, None]

    m_rows = jnp.take(state["m"], sids, axis=0)
    v_rows = jnp.take(state["v"], sids, axis=0)
    m_new = b1 * m_rows + (1.0 - b1) * g
    v_new = b2 * v_rows + (1.0 - b2) * jnp.square(g)
    t = (step + 1).astype(jnp.float32)
    m_hat = m_new / (1.0 - jnp.power(b1, t))
    v_hat = v_new / (1.0 - jnp.power(b2, t))
    delta = -lr * m_hat / (jnp.sqrt(v_hat) + eps) * w

    # scatter strategy (plain vs packed view) picked by shape; the casts to
    # the state dtype keep adam_init(dtype=bfloat16) (the documented
    # HBM-saving option) from scatter-adding f32 into bf16 (FutureWarning,
    # later an error)
    ap = not rows_sharded
    new_table = auto_scatter_add(table, sids, delta, allow_packed=ap)
    new_m = auto_scatter_add(state["m"], sids, (m_new - m_rows) * w,
                             allow_packed=ap)
    new_v = auto_scatter_add(state["v"], sids, (v_new - v_rows) * w,
                             allow_packed=ap)
    return new_table, {"m": new_m, "v": new_v}


def pack_rows(a: jax.Array) -> jax.Array:
    """(R, D) → its row-major (R·D/128, 128) physical view (free reshape).

    XLA's TPU scatter cost is per-update-row at a latency that grows with the
    table's ROW count (BENCHMARKS.md scatter study); updating through the
    packed view cuts target rows by 128/D. The packed array must be the
    stored layout (scan carry / params) — reshaping around a scatter inside a
    step re-materializes the table per step and loses more than it saves
    (measured). Requires R·D % 128 == 0: pad tables at creation.
    """
    rows, dim = a.shape
    assert (rows * dim) % 128 == 0, (rows, dim)
    return a.reshape(rows * dim // 128, 128)


def unpack_rows(a: jax.Array, dim: int) -> jax.Array:
    """Inverse of :func:`pack_rows`: (P, 128) → (P·128/dim, dim)."""
    return a.reshape(a.shape[0] * 128 // dim, dim)


def lane_gather_scalars(packed: jax.Array, ids: jax.Array) -> jax.Array:
    """Per-logical-row scalars from their (R/128, 128) packed layout.

    The packed layout for a per-row SCALAR array (last_step, counters) is
    ``a.reshape(R // 128, 128)`` — 128 logical rows per physical row. Reads
    fetch the physical row and select the ``id % 128`` lane; requires
    R % 128 == 0 (pad at creation).
    """
    wide = jnp.take(packed, ids // 128, axis=0)            # (n, 128)
    return jnp.take_along_axis(wide, (ids % 128)[:, None], axis=1)[:, 0]


def momentum_catchup_rows_packed(
    state_p: Dict[str, jax.Array],  # momentum: (R·D/128, 128); last_step: (R/128, 128)
    ids: jax.Array,
    *,
    dim: int,
    lr: float,
    mu: float,
    step: jax.Array,
) -> jax.Array:
    """:func:`momentum_catchup_rows` reading packed-layout state (see
    :func:`lazy_momentum_packed_update`). Same per-row math."""
    m_rows = packed_gather_rows(state_p["momentum"], ids, dim).astype(jnp.float32)
    last = lane_gather_scalars(state_p["last_step"], ids)
    k = jnp.maximum(step - last, 0).astype(jnp.float32)
    mu_k = jnp.power(jnp.float32(mu), k)
    geom = jnp.where(mu > 0, mu * (1.0 - mu_k) / max(1.0 - mu, 1e-12), 0.0)
    return -lr * m_rows * geom[:, None]


def lazy_momentum_packed_update(
    table_p: jax.Array,    # (R·D/128, 128) packed table (pack_rows layout)
    state_p: Dict[str, jax.Array],  # momentum packed like the table;
    # last_step (R/128, 128) int32 (lane_gather_scalars layout)
    ids: jax.Array,        # (n,) LOGICAL row ids (dups allowed)
    row_grads: jax.Array,  # (n, D) gradients w.r.t. the gathered rows
    *,
    dim: int,
    lr: float,
    mu: float,
    step: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """:func:`lazy_momentum_update` with every read/write through the
    128-lane packed physical layout.

    Identical per-logical-row math (sort + first-occurrence aggregation is
    unchanged); only the IO changes: row gathers fetch whole physical rows
    (:func:`packed_gather_rows`), scatters target physical rows
    (ops/scatter.packed_scatter_add_phys), and last_step updates scatter
    one-hot lane maxima into its (R/128, 128) layout — the momentum step
    pays 3 scatters + 3 gathers per table, so the per-target-row win
    (BENCHMARKS.md gather study) compounds here. Requires R % 128 == 0.
    """
    from esrecsys_tpu.ops.scatter import packed_scatter_add_phys

    n = ids.shape[0]
    order = jnp.argsort(ids)
    sids = ids[order]
    sgrads = row_grads[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
    seg = jnp.cumsum(first) - 1
    agg = jax.ops.segment_sum(sgrads, seg, num_segments=n)
    g = jnp.where(first[:, None], agg[seg], 0.0)
    w = first.astype(jnp.float32)[:, None]

    m_rows = packed_gather_rows(state_p["momentum"], sids, dim).astype(jnp.float32)
    last = lane_gather_scalars(state_p["last_step"], sids)
    k = jnp.maximum(step - last, 0).astype(jnp.float32)
    mu_k = jnp.power(jnp.float32(mu), k)
    geom = jnp.where(mu > 0, mu * (1.0 - mu_k) / max(1.0 - mu, 1e-12), 0.0)
    catchup = -lr * m_rows * geom[:, None]
    m_caught = m_rows * mu_k[:, None]
    m_new = mu * m_caught + g
    delta = (catchup - lr * m_new) * w

    new_table = packed_scatter_add_phys(table_p, sids, delta, dim)
    new_mom = packed_scatter_add_phys(
        state_p["momentum"], sids, (m_new - m_rows) * w, dim)
    placed = jnp.where(
        (sids % 128)[:, None] == jnp.arange(128)[None, :],
        jnp.where(first, step + 1, 0)[:, None], 0).astype(jnp.int32)
    new_last = state_p["last_step"].at[sids // 128].max(placed)
    return new_table, {"momentum": new_mom, "last_step": new_last}


def packed_gather_rows(table_p: jax.Array, ids: jax.Array,
                       dim: int) -> jax.Array:
    """``take(unpack_rows(table_p, dim), ids)`` through the PHYSICAL rows.

    Fetches each id's whole 128-lane physical row (``pack = 128/dim``
    logical rows) and selects the id's ``dim``-lane slot with a tiny
    one-hot contraction — 128/dim× the bytes for 1/pack the target rows.
    XLA's TPU gather, like its scatter, pays per TARGET row, so this is
    measured 2.1× faster than the logical take at 100k/296k rows and 3.8×
    at 2.26M (BENCHMARKS.md gather study; ``take(unpack_rows(...))`` — a
    logical-view take — gets none of this, which is why round 2's
    stored-packed playlist experiment came out neutral).

    The slot select is an EXACT masked sum, deliberately not an einsum:
    on TPU an f32 dot_general runs as a bf16 MXU pass by default, which
    would round every gathered f32 table/momentum row and silently break
    the documented exact dense-trajectory equivalence (ADVICE r3 high).
    Multiplying by a 0/1 mask and summing the single nonzero slot is
    exact in every dtype and stays on the VPU.
    """
    pack = 128 // dim
    wide = jnp.take(table_p, ids // pack, axis=0)          # (n, 128)
    grouped = wide.reshape(-1, pack, dim)
    sel = ((ids % pack)[:, None] == jnp.arange(pack)[None, :]).astype(
        table_p.dtype)
    return jnp.sum(grouped * sel[:, :, None], axis=1)


def lazy_adam_packed_update(
    table_p: jax.Array,    # (R·D/128, 128) packed table (pack_rows layout)
    state: Dict[str, jax.Array],   # m/v packed to the same shape
    ids: jax.Array,        # (n,) LOGICAL row ids (dups allowed)
    row_grads: jax.Array,  # (n, D) gradients w.r.t. the gathered logical rows
    *,
    dim: int,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    step: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """:func:`lazy_adam_update` on a packed-layout table.

    Bit-for-bit the same per-logical-row math: updates land in their row's
    D-lane slot of the physical row, aggregation of duplicate logical ids
    happens in the (exactly aligned) lane groups of the physical segment
    sum, and a lane mask confines moment decay/updates to lanes whose
    logical row was actually touched (neighbors sharing a physical row are
    untouched, preserving row-lazy semantics). The win is the scatter target
    shrinking by 128/D rows (see :func:`pack_rows`).
    """
    pack = 128 // dim
    n = ids.shape[0]
    pids = ids // pack
    slotmask = (ids % pack)[:, None] == jnp.arange(pack)[None, :]  # (n, pack)
    lanes = jnp.broadcast_to(slotmask[:, :, None], (n, pack, dim)).reshape(n, 128)
    placed = (slotmask[:, :, None] * row_grads[:, None, :]).reshape(n, 128)

    order = jnp.argsort(pids)
    spids = pids[order]
    sg = placed[order]
    sl = lanes[order]
    first = jnp.concatenate([jnp.ones((1,), bool), spids[1:] != spids[:-1]])
    seg = jnp.cumsum(first) - 1
    g = jax.ops.segment_sum(sg, seg, num_segments=n)[seg]
    touched = (jax.ops.segment_sum(sl.astype(jnp.float32), seg,
                                   num_segments=n)[seg] > 0) & first[:, None]

    m_rows = jnp.take(state["m"], spids, axis=0)
    v_rows = jnp.take(state["v"], spids, axis=0)
    # untouched lanes (and duplicate occurrences after the first) keep their
    # moments and get zero delta — `touched` is False there
    m_new = jnp.where(touched, b1 * m_rows + (1.0 - b1) * g, m_rows)
    v_new = jnp.where(touched, b2 * v_rows + (1.0 - b2) * jnp.square(g), v_rows)
    t = (step + 1).astype(jnp.float32)
    m_hat = m_new / (1.0 - jnp.power(b1, t))
    v_hat = v_new / (1.0 - jnp.power(b2, t))
    delta = jnp.where(touched, -lr * m_hat / (jnp.sqrt(v_hat) + eps), 0.0)

    new_table = table_p.at[spids].add(delta.astype(table_p.dtype))
    new_m = state["m"].at[spids].add((m_new - m_rows).astype(state["m"].dtype))
    new_v = state["v"].at[spids].add((v_new - v_rows).astype(state["v"].dtype))
    return new_table, {"m": new_m, "v": new_v}
