"""core/transfer.py: chunked host->device upload equals a direct transfer."""

import numpy as np

from esrecsys_tpu.core import transfer


def test_chunked_device_put_matches_direct(monkeypatch):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1000, 16)).astype(np.float32)
    # force multiple chunks: 1 row per chunk would be slow; use ~100 rows
    monkeypatch.setattr(transfer, "_UPLOAD_CHUNK_BYTES", 100 * x[0].nbytes)
    out = transfer.chunked_device_put(x)
    assert out.shape == x.shape and out.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(out), x)


def test_chunked_device_put_small_is_single_transfer():
    x = np.ones((4, 8), np.float32)
    np.testing.assert_array_equal(
        np.asarray(transfer.chunked_device_put(x)), x)


def test_chunked_device_put_sharded_matches_and_keeps_sharding(monkeypatch):
    import jax
    import jax.numpy as jnp

    from esrecsys_tpu.core import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(n_data=1, n_model=8)
    sharding = mesh_lib.table_sharding(mesh)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1024, 8)).astype(np.float32)
    monkeypatch.setattr(transfer, "_UPLOAD_CHUNK_BYTES", 100 * x[0].nbytes)
    out = transfer.chunked_device_put(x, sharding)
    np.testing.assert_array_equal(np.asarray(out), x)
    assert out.sharding.is_equivalent_to(sharding, x.ndim)
    # row count must divide the shard count
    import pytest
    with pytest.raises(ValueError, match="not divisible"):
        transfer.chunked_device_put(x[:1023], sharding)
