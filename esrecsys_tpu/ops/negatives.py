"""On-device negative sampling.

The reference samples negatives on the host every step with fancy indexing of
three corpus arrays *outside* jit (train_spotify.py:139-150,256-257) — a
host→device transfer and a pipeline bubble per step. Here sampling runs inside
the jitted step from a folded-in key; the corpus arrays stay device-resident.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def sample_negative_ids(key: jax.Array, num_negatives: int, corpus_size: int) -> jax.Array:
    """Uniform corpus indices. Parity note: the reference samples in
    [0, corpus_size-1) — excluding the last row (train_spotify.py:149, an
    off-by-one it inherits everywhere); we sample the full range [0, size)."""
    return jax.random.randint(key, (num_negatives,), 0, corpus_size)


def sample_negative_rows(
    key: jax.Array, num_negatives: int, corpora: Sequence[jax.Array]
) -> Tuple[jax.Array, ...]:
    """Sample one index set, gather the same rows from several parallel
    corpus arrays (tracks/albums/artists)."""
    idx = sample_negative_ids(key, num_negatives, corpora[0].shape[0])
    return tuple(c[idx] for c in corpora)
