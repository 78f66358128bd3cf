"""PRNG discipline.

One base key per run; everything else is derived by folding in structured
integers, so any step's randomness is reproducible without threading keys
through host loops. Replaces the reference's ad-hoc split-per-step host keys
(e.g. sample_negative at train_spotify.py:139-150, generate_triplets at
train_shop_the_look.py:72-91).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# Stable stream tags; fold_in with distinct tags gives independent streams.
STREAM_INIT = 0
STREAM_NEGATIVES = 1
STREAM_SHUFFLE = 2
STREAM_DROPOUT = 3


def base_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def stream(key: jax.Array, tag: int) -> jax.Array:
    return jax.random.fold_in(key, tag)


def key_for_step(key: jax.Array, step: jax.Array | int, tag: int = 0) -> jax.Array:
    """Derive the key for (stream tag, step). jit-safe: step may be traced."""
    return jax.random.fold_in(jax.random.fold_in(key, tag), step)


def split_like(key: jax.Array, names: Sequence[str]) -> dict:
    """Split a key into a dict of named keys (for flax init rngs etc.)."""
    keys = jax.random.split(key, len(names))
    return {name: k for name, k in zip(names, keys)}


def host_shuffle(key: jax.Array, n: int) -> jnp.ndarray:
    """A true permutation of range(n).

    The reference's ``shuffle_array`` (train_shop_the_look.py:124-128,
    train_spotify.py:133-137) samples indices *with replacement* — it drops
    ~1/e of the data and duplicates the rest. We keep the name semantics
    (deterministic reorder) but use a real permutation.
    """
    return jax.random.permutation(key, n)
