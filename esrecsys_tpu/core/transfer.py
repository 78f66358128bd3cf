"""Host→device transfer helpers shared by serving/retrieval/tools.

Single large transfers degrade badly on tunneled PJRT backends (observed
on axon: ~30 MB/s with multi-minute stalls past a few hundred MB); sliced
uploads + one on-device concatenate stay predictable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_UPLOAD_CHUNK_BYTES = 64 << 20


def chunked_device_put(x: np.ndarray) -> jax.Array:
    """Host→device transfer in ~64 MB row slices (no-op size for small x)."""
    rows_per_chunk = max(1, _UPLOAD_CHUNK_BYTES // max(x[0:1].nbytes, 1))
    if x.shape[0] <= rows_per_chunk:
        return jnp.asarray(x)
    parts = [
        jnp.asarray(x[i : i + rows_per_chunk])
        for i in range(0, x.shape[0], rows_per_chunk)
    ]
    return jnp.concatenate(parts, axis=0)
