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
