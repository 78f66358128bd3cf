"""Final-model artifact export.

Every reference trainer ships its trained model as a run artifact
(pinterest/train_shop_the_look.py:223-232, spotify/train_spotify.py:290-299,
wikipedia/train_cooccurence.py:188-192 — torch.save / keras save + wandb
artifact registration). Here the equivalent is one .npz per export: the
SETTLED parameters (callers pass e.g. ``playlist.settled_params`` output so
lazy-momentum catch-up is applied), optional BatchNorm stats, and a JSON
metadata blob — registered with the run's tracker via ``log_artifact`` so
``artifacts.jsonl`` records every model a run produced.

Checkpoints (train/checkpoint.py, Orbax) remain the RESUME mechanism:
sharded, includes optimizer state, overwritten on cadence. Artifacts are the
DEPLOY mechanism: host-readable, self-describing, versioned by step.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _host_value(leaf: Any) -> np.ndarray:
    """Leaf → full numpy value, assembling multi-host-sharded arrays.

    Model-sharded tables under multi-host span non-addressable devices;
    ``device_get`` alone would raise — gather them through the distributed
    client first."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
    return np.asarray(jax.device_get(leaf))


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[f"{prefix}/{key}"] = _host_value(leaf)
    return flat


def _unflatten(flat: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    pfx = f"{prefix}/"
    for key, value in flat.items():
        if not key.startswith(pfx):
            continue
        node = tree
        parts = key[len(pfx):].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def export_model(
    work_dir: str,
    name: str,
    params: Any,
    *,
    step: int,
    tracker: Optional[Any] = None,
    batch_stats: Optional[Any] = None,
    metadata: Optional[Dict[str, Any]] = None,
) -> Optional[str]:
    """Write ``<work_dir>/artifacts/<name>-<step>.npz`` and register it.

    Multi-host: only process 0 writes (params are replicated or fully
    addressable via device_get of the global array). Returns the path
    (None on non-zero processes).
    """
    # the flatten below may all-gather non-addressable shards, which is a
    # COLLECTIVE — every process must participate; only the file write is
    # process-0-only
    payload = _flatten(params, "params")
    if batch_stats is not None:
        payload.update(_flatten(batch_stats, "batch_stats"))
    if jax.process_count() > 1 and jax.process_index() != 0:
        return None
    out_dir = os.path.join(work_dir, "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}-{int(step):08d}.npz")
    payload["__meta__"] = np.frombuffer(
        json.dumps({"name": name, "step": int(step), **(metadata or {})}).encode(),
        dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)  # atomic publish
    if tracker is not None:
        tracker.log_artifact(path, name=f"{name}-{int(step)}", kind="model")
    return path


def load_model(path: str) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """(params, batch_stats, metadata) from an :func:`export_model` file."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop("__meta__").tobytes()).decode())
    return _unflatten(flat, "params"), _unflatten(flat, "batch_stats"), meta


def latest_artifact(work_dir: str, name: str) -> Optional[str]:
    """Path of the newest ``<name>-*.npz`` artifact in ``work_dir``, if any."""
    out_dir = os.path.join(work_dir, "artifacts")
    if not os.path.isdir(out_dir):
        return None
    cands = sorted(
        f for f in os.listdir(out_dir)
        if f.startswith(f"{name}-") and f.endswith(".npz"))
    return os.path.join(out_dir, cands[-1]) if cands else None
