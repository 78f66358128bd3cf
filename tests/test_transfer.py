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
