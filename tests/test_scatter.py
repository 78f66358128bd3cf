import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrecsys_tpu.ops.scatter import scatter_add_rows


@pytest.mark.parametrize("dim,blk", [(32, 16), (64, 32), (128, 64)])
def test_mxu_scatter_matches_xla(dim, blk):
    rng = np.random.default_rng(0)
    R, N = 700, 900
    table = jnp.asarray(rng.normal(size=(R, dim)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, R, N), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(N, dim)).astype(np.float32))
    want = table.at[ids].add(upd)
    got = scatter_add_rows(table, ids, upd, block_rows=blk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_mxu_scatter_duplicate_pileup():
    rng = np.random.default_rng(1)
    R, N, dim = 300, 450, 32
    table = jnp.asarray(rng.normal(size=(R, dim)).astype(np.float32))
    ids = jnp.asarray([5] * N, jnp.int32)
    upd = jnp.asarray(rng.normal(size=(N, dim)).astype(np.float32))
    got = scatter_add_rows(table, ids, upd, block_rows=16, interpret=True)
    want = table.at[ids].add(upd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_mxu_scatter_fallback_off_tpu():
    # without interpret/force, CPU backend silently uses XLA scatter
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(100, 48)).astype(np.float32))  # 48: unsupported dim
    ids = jnp.asarray(rng.integers(0, 100, 64), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    got = scatter_add_rows(table, ids, upd)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(table.at[ids].add(upd)), rtol=1e-6)


def test_auto_scatter_byte_cap_falls_back_to_plain(monkeypatch):
    """Tables above PACKED_SCATTER_MAX_BYTES must not take the reshape-view
    packed path: XLA can satisfy the packed reshape only via a lane-padded
    relayout copy of 128/D x the table bytes (observed 25.6 GB OOM on the
    100M-row chip run). The capped call must still be exact."""
    from esrecsys_tpu.ops import scatter as sc

    rng = np.random.default_rng(3)
    R, N, dim = 500_032, 64, 32  # above MIN_ROWS, packable shape
    table = jnp.asarray(rng.normal(size=(R, dim)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, R, N), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(N, dim)).astype(np.float32))

    calls = []
    real = sc.packed_scatter_add
    monkeypatch.setattr(sc, "packed_scatter_add",
                        lambda *a: calls.append(1) or real(*a))
    monkeypatch.setattr(sc, "PACKED_SCATTER_MAX_BYTES", R * dim * 4)
    sc.auto_scatter_add(table, ids, upd)
    assert calls, "at the cap the packed path should be taken"

    calls.clear()
    monkeypatch.setattr(sc, "PACKED_SCATTER_MAX_BYTES", R * dim * 4 - 1)
    got = sc.auto_scatter_add(table, ids, upd)
    assert not calls, "above the cap the plain scatter must be used"
    np.testing.assert_allclose(np.asarray(got)[np.asarray(ids)],
                               np.asarray(table.at[ids].add(upd))[np.asarray(ids)],
                               rtol=1e-6)


def test_vmem_scatter_matches_xla_interpret():
    # the round-5 bin-into-VMEM attempt (VERDICT r4 #3): exactness oracle
    from esrecsys_tpu.ops.scatter import vmem_scatter_add_phys

    rng = np.random.default_rng(3)
    R, N, dim = 512, 700, 32  # R*dim/128 = 128 physical rows
    pack = 128 // dim
    table = jnp.asarray(rng.normal(size=(R, dim)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, R, N), jnp.int32)
    upd = jnp.asarray(rng.normal(size=(N, dim)).astype(np.float32))
    want = table.at[ids].add(upd)
    got_p = vmem_scatter_add_phys(table.reshape(R // pack, 128), ids, upd,
                                  dim, chunk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p).reshape(R, dim),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_vmem_scatter_rejects_oversized_table():
    from esrecsys_tpu.ops.scatter import vmem_scatter_add_phys

    big = jnp.zeros((40_000, 128), jnp.float32)  # 19.5 MiB > budget
    with pytest.raises(ValueError, match="VMEM"):
        vmem_scatter_add_phys(big, jnp.zeros((8,), jnp.int32),
                              jnp.zeros((8, 32), jnp.float32), 32)
