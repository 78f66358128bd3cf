"""Embedding-id range guards (SURVEY §5 sanitizers).

The realistic memory-safety hazard in this framework is an out-of-range
embedding id: XLA's gather silently CLAMPS out-of-bounds indices on TPU, so
a corrupt id doesn't crash — it trains the wrong row (the reference has the
same hazard un-guarded, spotify/train_spotify.py:152-156 passes raw corpus
ids straight into torch embedding lookups). Guard modes:

  * ``off``   (default) — zero-cost; XLA semantics (silent clamp).
  * ``clamp`` — explicit ``jnp.clip`` at every lookup boundary: same result
    as XLA's gather clamp but also applied before SCATTERS (whose
    out-of-bounds behavior is drop, i.e. silent update loss) and Pallas
    kernels (which would DMA garbage).
  * ``error`` — ``checkify.check`` at every boundary; the training loop
    functionalizes the step with ``checkify.checkify`` and throws on the
    host, so a bad id fails loudly with the offending table name
    (tests/test_guards.py).

Set via ``set_mode()`` or the ``ESRECSYS_ID_CHECKS`` env var. Checks sit at the central lookup
boundary (:class:`esrecsys_tpu.models.layers.TableEmbed`) and at the raw
``jnp.take``/scatter sites of the sparse train steps.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

_VALID = ("off", "clamp", "error")
_mode = os.environ.get("ESRECSYS_ID_CHECKS", "off")
if _mode not in _VALID:
    raise ValueError(f"ESRECSYS_ID_CHECKS must be one of {_VALID}, got {_mode!r}")


def set_mode(mode: str) -> None:
    global _mode
    if mode not in _VALID:
        raise ValueError(f"id-check mode must be one of {_VALID}, got {mode!r}")
    _mode = mode


def mode() -> str:
    return _mode


def check_ids(ids: jax.Array, num_rows: int, name: str = "table") -> jax.Array:
    """Apply the active guard to an id array bound for a ``num_rows`` table."""
    if _mode == "off":
        return ids
    if _mode == "clamp":
        return jnp.clip(ids, 0, num_rows - 1)
    from jax.experimental import checkify

    checkify.check(
        jnp.logical_and(jnp.all(ids >= 0), jnp.all(ids < num_rows)),
        f"id out of range for {name} ({num_rows} rows): min={{imin}} max={{imax}}",
        imin=jnp.min(ids), imax=jnp.max(ids),
    )
    return ids


def wrap_step_if_checking(train_step):
    """In ``error`` mode, functionalize a (state, batch) -> (state, metrics)
    step with ``checkify`` so in-jit checks surface as host exceptions.

    Returns (wrapped_step, throws: bool): when ``throws``, the wrapped step
    returns ``(err, (state, metrics))`` and the caller must ``err.throw()``
    after each call (train/loop.py does)."""
    if _mode != "error":
        return train_step, False
    from jax.experimental import checkify

    return checkify.checkify(train_step, errors=checkify.user_checks), True
