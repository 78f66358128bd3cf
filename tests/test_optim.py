import jax
import jax.numpy as jnp
import numpy as np
import optax

from esrecsys_tpu.ops import optim


def _dense_momentum_run(table, grads_per_step, lr, mu):
    """Dense reference: optax.sgd(momentum) with full-table (scattered) grads."""
    tx = optax.sgd(lr, momentum=mu)
    state = tx.init(table)
    for g in grads_per_step:
        updates, state = tx.update(g, state, table)
        table = optax.apply_updates(table, updates)
    return table


def test_lazy_momentum_matches_dense_with_flush():
    rng = np.random.default_rng(0)
    R, D, lr, mu, steps = 50, 4, 0.1, 0.9, 7
    table0 = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))

    ids_per_step = [jnp.asarray(rng.integers(0, R, 6), jnp.int32) for _ in range(steps)]
    grads_per_step = [jnp.asarray(rng.normal(size=(6, D)).astype(np.float32))
                      for _ in range(steps)]

    # dense reference: scatter row grads to table shape each step
    dense_grads = []
    for ids, g in zip(ids_per_step, grads_per_step):
        dense_grads.append(jnp.zeros((R, D)).at[ids].add(g))
    want = _dense_momentum_run(table0, dense_grads, lr, mu)

    table, state = table0, optim.momentum_init(table0)
    for s, (ids, g) in enumerate(zip(ids_per_step, grads_per_step)):
        table, state = optim.lazy_momentum_update(
            table, state, ids, g, lr=lr, mu=mu, step=jnp.int32(s))
    settled = optim.momentum_flush(table, state, lr=lr, mu=mu,
                                   step=jnp.int32(steps))
    np.testing.assert_allclose(np.asarray(settled), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_lazy_momentum_duplicate_ids_match_dense():
    rng = np.random.default_rng(1)
    R, D, lr, mu = 10, 3, 0.05, 0.8
    table0 = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    ids = jnp.asarray([3, 3, 7, 3, 7, 1], jnp.int32)  # heavy duplication
    g = jnp.asarray(rng.normal(size=(6, D)).astype(np.float32))
    want = _dense_momentum_run(table0, [jnp.zeros((R, D)).at[ids].add(g)], lr, mu)

    table, state = optim.lazy_momentum_update(
        table0, optim.momentum_init(table0), ids, g,
        lr=lr, mu=mu, step=jnp.int32(0))
    settled = optim.momentum_flush(table, state, lr=lr, mu=mu, step=jnp.int32(1))
    np.testing.assert_allclose(np.asarray(settled), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_lazy_momentum_mu_zero_is_plain_sgd():
    rng = np.random.default_rng(2)
    R, D = 8, 2
    table0 = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    ids = jnp.asarray([0, 2, 2], jnp.int32)
    g = jnp.asarray(rng.normal(size=(3, D)).astype(np.float32))
    table, _ = optim.lazy_momentum_update(
        table0, optim.momentum_init(table0), ids, g,
        lr=0.5, mu=0.0, step=jnp.int32(0))
    want = table0.at[ids].add(-0.5 * g)
    np.testing.assert_allclose(np.asarray(table), np.asarray(want), rtol=1e-6)


def test_lazy_adam_equals_dense_adam_when_all_rows_touched():
    rng = np.random.default_rng(3)
    R, D, lr, steps = 6, 4, 0.01, 5
    table0 = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    tx = optax.adam(lr)
    opt_state = tx.init(table0)
    dense = table0

    table, state = table0, optim.adam_init(table0)
    all_ids = jnp.arange(R, dtype=jnp.int32)
    for s in range(steps):
        g = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
        updates, opt_state = tx.update(g, opt_state, dense)
        dense = optax.apply_updates(dense, updates)
        table, state = optim.lazy_adam_update(
            table, state, all_ids, g, lr=lr, step=jnp.int32(s))
    np.testing.assert_allclose(np.asarray(table), np.asarray(dense),
                               rtol=1e-4, atol=1e-6)


def test_lazy_adam_untouched_rows_stay_put():
    rng = np.random.default_rng(4)
    R, D = 12, 4
    table0 = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    ids = jnp.asarray([1, 5], jnp.int32)
    g = jnp.asarray(rng.normal(size=(2, D)).astype(np.float32))
    table, _ = optim.lazy_adam_update(
        table0, optim.adam_init(table0), ids, g, lr=0.1, step=jnp.int32(0))
    untouched = np.setdiff1d(np.arange(R), np.asarray(ids))
    np.testing.assert_array_equal(
        np.asarray(table[untouched]), np.asarray(table0[untouched]))
    assert not np.allclose(np.asarray(table[np.asarray(ids)]),
                           np.asarray(table0[np.asarray(ids)]))


def test_lazy_adam_packed_matches_logical():
    """Packed-layout LazyAdam == logical LazyAdam, incl. duplicate ids and
    physical rows shared by several touched/untouched logical rows."""
    rng = np.random.default_rng(5)
    R, D, steps = 256, 32, 4  # pack = 4
    table0 = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    t_log, s_log = table0, optim.adam_init(table0)
    t_pk = optim.pack_rows(table0)
    s_pk = {k: optim.pack_rows(v) for k, v in optim.adam_init(table0).items()}
    for s in range(steps):
        # dups + neighbors sharing a physical row (ids 4,5,6 share row 1)
        ids = jnp.asarray(
            np.concatenate([[4, 5, 6, 4, 4], rng.integers(0, R, 40)]), jnp.int32)
        g = jnp.asarray(rng.normal(size=(ids.shape[0], D)).astype(np.float32))
        t_log, s_log = optim.lazy_adam_update(
            t_log, s_log, ids, g, lr=0.05, step=jnp.int32(s))
        t_pk, s_pk = optim.lazy_adam_packed_update(
            t_pk, s_pk, ids, g, dim=D, lr=0.05, step=jnp.int32(s))
    np.testing.assert_allclose(np.asarray(optim.unpack_rows(t_pk, D)),
                               np.asarray(t_log), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(optim.unpack_rows(s_pk["m"], D)),
                               np.asarray(s_log["m"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(optim.unpack_rows(s_pk["v"], D)),
                               np.asarray(s_log["v"]), rtol=1e-5, atol=1e-7)


def test_lazy_adam_packed_dim1_bias_table():
    """The D=1 bias table packs 128 logical rows per physical row."""
    rng = np.random.default_rng(6)
    R = 512
    table0 = jnp.asarray(rng.normal(size=(R, 1)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, R, 64), jnp.int32)
    g = jnp.asarray(rng.normal(size=(64, 1)).astype(np.float32))
    t_log, _ = optim.lazy_adam_update(
        table0, optim.adam_init(table0), ids, g, lr=0.1, step=jnp.int32(0))
    t_pk, _ = optim.lazy_adam_packed_update(
        optim.pack_rows(table0),
        {k: optim.pack_rows(v) for k, v in optim.adam_init(table0).items()},
        ids, g, dim=1, lr=0.1, step=jnp.int32(0))
    np.testing.assert_allclose(np.asarray(optim.unpack_rows(t_pk, 1)),
                               np.asarray(t_log), rtol=1e-5, atol=1e-6)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.normal(size=(256, 32)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(optim.unpack_rows(optim.pack_rows(a), 32)), np.asarray(a))


def test_auto_scatter_add_non_divisor_dim_falls_back():
    """D that doesn't divide 128 must use the plain scatter (regression:
    the packed path crashed reshaping (n, pack, 48))."""
    rng = np.random.default_rng(8)
    from esrecsys_tpu.ops import scatter as sc

    old = sc.PACKED_SCATTER_MIN_ROWS
    sc.PACKED_SCATTER_MIN_ROWS = 100
    try:
        table = jnp.asarray(rng.normal(size=(384, 48)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 384, 16), jnp.int32)
        upd = jnp.asarray(rng.normal(size=(16, 48)).astype(np.float32))
        got = sc.auto_scatter_add(table, ids, upd)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(table.at[ids].add(upd)), rtol=1e-6)
    finally:
        sc.PACKED_SCATTER_MIN_ROWS = old


def test_momentum_settle_is_flush_plus_advanced_state():
    """momentum_settle = flush view AND last_step advanced: a second
    flush/settle right after must be a no-op (regression: the parity
    runner settled params without advancing last_step, and the eval step's
    internal settle then applied the catch-up twice)."""
    rng = np.random.default_rng(5)
    R, D, lr, mu = 40, 4, 0.1, 0.9
    table = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    state = optim.momentum_init(table)
    for s in range(5):
        ids = jnp.asarray(rng.integers(0, R, 6), jnp.int32)
        g = jnp.asarray(rng.normal(size=(6, D)).astype(np.float32))
        table, state = optim.lazy_momentum_update(
            table, state, ids, g, lr=lr, mu=mu, step=jnp.int32(s))
    flushed = optim.momentum_flush(table, state, lr=lr, mu=mu, step=jnp.int32(5))
    settled, new_state = optim.momentum_settle(table, state, lr=lr, mu=mu,
                                               step=jnp.int32(5))
    np.testing.assert_array_equal(np.asarray(settled), np.asarray(flushed))
    again = optim.momentum_flush(settled, new_state, lr=lr, mu=mu,
                                 step=jnp.int32(5))
    np.testing.assert_array_equal(np.asarray(again), np.asarray(settled))
    # and training can continue exactly: one more lazy step from the settled
    # state equals the dense trajectory
    assert int(new_state["last_step"][0]) == 5


def test_settle_then_continue_matches_dense():
    """A settle barrier mid-run (the lr-phase boundary) must not disturb the
    trajectory: lazy with one settle == dense momentum end to end."""
    rng = np.random.default_rng(6)
    R, D, lr, mu, steps = 30, 4, 0.05, 0.9, 8
    table0 = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    ids_l = [jnp.asarray(rng.integers(0, R, 5), jnp.int32) for _ in range(steps)]
    gs = [jnp.asarray(rng.normal(size=(5, D)).astype(np.float32))
          for _ in range(steps)]
    dense_grads = [jnp.zeros((R, D)).at[i].add(g) for i, g in zip(ids_l, gs)]
    want = _dense_momentum_run(table0, dense_grads, lr, mu)

    table, state = table0, optim.momentum_init(table0)
    for s in range(steps):
        if s == steps // 2:  # mid-run barrier
            table, state = optim.momentum_settle(table, state, lr=lr, mu=mu,
                                                 step=jnp.int32(s))
        table, state = optim.lazy_momentum_update(
            table, state, ids_l[s], gs[s], lr=lr, mu=mu, step=jnp.int32(s))
    settled = optim.momentum_flush(table, state, lr=lr, mu=mu,
                                   step=jnp.int32(steps))
    np.testing.assert_allclose(np.asarray(settled), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_packed_gather_rows_matches_logical_take():
    """packed_gather_rows through the physical layout == take on logical,
    including duplicate ids and ids in every lane slot."""
    rng = np.random.default_rng(9)
    for dim in (1, 4, 32, 64):
        rows = 4 * (128 // dim)  # multiple of pack
        a = jnp.asarray(rng.normal(size=(rows, dim)).astype(np.float32))
        ids = jnp.asarray(
            np.concatenate([rng.integers(0, rows, 37), [0, 0, rows - 1]]),
            jnp.int32)
        got = optim.packed_gather_rows(optim.pack_rows(a), ids, dim)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(jnp.take(a, ids, axis=0)),
            err_msg=f"dim={dim}")


def test_packed_scatter_add_phys_matches_logical():
    rng = np.random.default_rng(10)
    from esrecsys_tpu.ops import scatter as sc

    dim = 32
    a = jnp.asarray(rng.normal(size=(96, dim)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 96, 41), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(41, dim)).astype(np.float32))
    got = optim.unpack_rows(
        sc.packed_scatter_add_phys(optim.pack_rows(a), ids, upd, dim), dim)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(a.at[ids].add(upd)), rtol=1e-6, atol=1e-7)


def test_lazy_momentum_packed_matches_logical():
    """Packed-layout lazy momentum == logical lazy momentum, with duplicate
    ids, idle rows (catch-up), and multi-step drift."""
    rng = np.random.default_rng(12)
    R, D = 256, 32  # R % 128 == 0
    table = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    st_l = optim.momentum_init(table)
    tab_l, tab_p = table, optim.pack_rows(table)
    st_p = {"momentum": optim.pack_rows(st_l["momentum"]),
            "last_step": st_l["last_step"].reshape(-1, 128)}
    for step in range(4):
        ids = jnp.asarray(
            np.concatenate([rng.integers(0, R, 21), [3, 3, 130]]), jnp.int32)
        g = jnp.asarray(rng.normal(size=(ids.shape[0], D)).astype(np.float32))
        # forward settlement deltas must agree too
        np.testing.assert_allclose(
            np.asarray(optim.momentum_catchup_rows(
                st_l, ids, lr=0.1, mu=0.9, step=jnp.int32(step))),
            np.asarray(optim.momentum_catchup_rows_packed(
                st_p, ids, dim=D, lr=0.1, mu=0.9, step=jnp.int32(step))),
            rtol=1e-6, atol=1e-8)
        tab_l, st_l = optim.lazy_momentum_update(
            tab_l, st_l, ids, g, lr=0.1, mu=0.9, step=jnp.int32(step))
        tab_p, st_p = optim.lazy_momentum_packed_update(
            tab_p, st_p, ids, g, dim=D, lr=0.1, mu=0.9, step=jnp.int32(step))
        np.testing.assert_allclose(
            np.asarray(tab_l), np.asarray(optim.unpack_rows(tab_p, D)),
            rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(st_l["momentum"]),
            np.asarray(optim.unpack_rows(st_p["momentum"], D)),
            rtol=1e-6, atol=1e-8)
        np.testing.assert_array_equal(
            np.asarray(st_l["last_step"]),
            np.asarray(st_p["last_step"].reshape(-1)))
