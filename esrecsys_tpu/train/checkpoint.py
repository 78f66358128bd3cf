"""Checkpoint / resume on Orbax.

One mechanism replacing the reference's three (flax.training.checkpoints,
raw flax.serialization byte files, Keras HDF5 — SURVEY.md §5). Orbax writes
sharded arrays natively, so row-sharded tables checkpoint without being
gathered to one host (required at the 100M-row scale; the reference's
to_bytes approach cannot do this). Also fixes the reference's silent no-op
resume (train_cooccurence.py:173-177 discards from_bytes' return value).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Step-indexed checkpoints with bounded retention (keep-last-k)."""

    def __init__(self, directory: str, max_to_keep: int = 3, async_save: bool = False):
        """``async_save=True`` overlaps checkpoint writes with training
        (Orbax async), at the cost of a device→host copy at save time."""
        self.directory = os.path.abspath(directory)
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, state: Any) -> None:
        # Checkpoint the pytree minus static fields (apply_fn/tx aren't arrays).
        payload = _arrays_only(state)
        self._mgr.save(int(step), args=ocp.args.StandardSave(payload))
        if not self.async_save:
            self._mgr.wait_until_finished()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None,
                adapt_rows: bool = True) -> Any:
        """Restore into the (possibly sharded) structure of ``state_template``.

        The template's shardings are respected: arrays come back with the
        same NamedShardings, so restore works on any mesh shape that matches.

        ``adapt_rows``: when the saved arrays' ROW counts (axis 0) differ
        from the template's — a checkpoint written under a different padding
        layout (``packed_tables`` off↔auto changes table rows from e.g.
        295,861 to 295,936) or a pre-r4 shard-dependent-padding checkpoint —
        fall back to a raw (host) restore and trim/zero-pad axis 0 per leaf
        to the template shape, then re-place with the template's shardings.
        Padded rows sit past the id guards and are never touched, so zeros
        are exact; trimming removes only pad rows. Mirrors the reference's
        restore-anywhere flag semantics (spotify/train_spotify.py:244-245)
        across this framework's layout knobs.
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        payload = _arrays_only(state_template)
        try:
            restored = self._mgr.restore(
                int(step), args=ocp.args.StandardRestore(payload))
        except Exception:
            if not adapt_rows:
                raise
            raw = self._mgr.restore(int(step))  # saved shapes, host numpy
            restored = _adapt_rows(payload, raw)
        return _merge_restored(state_template, restored)

    def close(self) -> None:
        self._mgr.close()


def _arrays_only(state: Any) -> dict:
    """Extract the array-valued fields of a TrainState-like object."""
    if hasattr(state, "params"):
        payload = {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
        }
        if getattr(state, "batch_stats", None) is not None:
            payload["batch_stats"] = state.batch_stats
        return payload
    return {"tree": state}


def _adapt_rows(template_payload: Any, raw_payload: Any) -> Any:
    """Per-leaf: fit a host-restored array to the template's shape+sharding.

    Only axis-0 (row-count) differences are absorbed — trim extra rows or
    zero-pad missing ones; any other shape mismatch is a real config error
    and raises. Leaves land with the template leaf's sharding."""
    import numpy as np

    def fit(t_leaf, r_leaf):
        want = getattr(t_leaf, "shape", ())
        raw = np.asarray(r_leaf)
        if raw.shape != tuple(want):
            if raw.ndim != len(want) or raw.shape[1:] != tuple(want)[1:] or not want:
                raise ValueError(
                    f"checkpoint leaf shape {raw.shape} cannot adapt to "
                    f"template {tuple(want)} (only axis-0 row padding is "
                    "adaptable)")
            if raw.shape[0] > want[0]:
                raw = raw[: want[0]]
            else:
                pad = np.zeros((want[0] - raw.shape[0],) + raw.shape[1:],
                               raw.dtype)
                raw = np.concatenate([raw, pad], axis=0)
        if hasattr(t_leaf, "dtype"):
            raw = raw.astype(t_leaf.dtype)
        sharding = getattr(t_leaf, "sharding", None)
        if sharding is not None and getattr(t_leaf, "committed", True):
            return jax.device_put(raw, sharding)
        import jax.numpy as jnp

        return jnp.asarray(raw)

    return jax.tree_util.tree_map(fit, template_payload, raw_payload)


def _match_commitment(template: Any, restored: Any) -> Any:
    """Leaves that were uncommitted in the template (plain scalars like step
    or optimizer counts) come back from Orbax committed to one device, which
    then clashes with mesh-sharded params inside jit. Re-create those leaves
    as uncommitted arrays; sharded leaves keep their restored placement."""
    import jax.numpy as jnp

    def fix(t_leaf, r_leaf):
        if getattr(t_leaf, "committed", True):
            return r_leaf
        return jnp.asarray(jax.device_get(r_leaf))

    return jax.tree_util.tree_map(fix, template, restored)


def _merge_restored(template: Any, payload: dict) -> Any:
    if hasattr(template, "params"):
        merged = template.replace(
            step=payload["step"],
            params=payload["params"],
            opt_state=payload["opt_state"],
            batch_stats=payload.get("batch_stats", getattr(template, "batch_stats", None)),
        )
        return _match_commitment(template, merged)
    return _match_commitment(template, payload["tree"])
