"""Pluggable experiment tracking.

The reference hard-couples every trainer to wandb SaaS (wandb.init/log/Artifact
in all train_*.py; SURVEY.md §5 metrics). Here tracking is an interface with
local-first implementations; a wandb adapter is attached only if wandb is
importable and requested.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterable, Mapping, Optional


class Tracker:
    """Interface: scalar metrics per step + artifact registration."""

    def log(self, metrics: Mapping[str, Any], step: int) -> None:  # pragma: no cover
        raise NotImplementedError

    def log_artifact(self, path: str, name: str, kind: str = "model") -> None:
        pass

    def finish(self) -> None:
        pass


class NullTracker(Tracker):
    def log(self, metrics: Mapping[str, Any], step: int) -> None:
        pass


class JsonlTracker(Tracker):
    """Append-only metrics.jsonl + artifacts.jsonl in a run directory."""

    def __init__(self, run_dir: str, config: Optional[Mapping[str, Any]] = None):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._metrics = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        if config is not None:
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                json.dump(dict(config), f, indent=2, default=str)

    def log(self, metrics: Mapping[str, Any], step: int) -> None:
        rec: Dict[str, Any] = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        self._metrics.write(json.dumps(rec) + "\n")
        self._metrics.flush()

    def log_artifact(self, path: str, name: str, kind: str = "model") -> None:
        with open(os.path.join(self.run_dir, "artifacts.jsonl"), "a") as f:
            f.write(json.dumps({"path": path, "name": name, "kind": kind}) + "\n")

    def finish(self) -> None:
        self._metrics.close()


class MemoryTracker(Tracker):
    """In-memory tracker for tests."""

    def __init__(self) -> None:
        self.records: list = []
        self.artifacts: list = []

    def log(self, metrics: Mapping[str, Any], step: int) -> None:
        self.records.append((int(step), {k: v for k, v in metrics.items()}))

    def log_artifact(self, path: str, name: str, kind: str = "model") -> None:
        self.artifacts.append((path, name, kind))


class CompositeTracker(Tracker):
    def __init__(self, trackers: Iterable[Tracker]):
        self.trackers = list(trackers)

    def log(self, metrics: Mapping[str, Any], step: int) -> None:
        for t in self.trackers:
            t.log(metrics, step)

    def log_artifact(self, path: str, name: str, kind: str = "model") -> None:
        for t in self.trackers:
            t.log_artifact(path, name, kind)

    def finish(self) -> None:
        for t in self.trackers:
            t.finish()


def make_tracker(
    run_dir: Optional[str] = None,
    config: Optional[Mapping[str, Any]] = None,
    use_wandb: bool = False,
    wandb_project: Optional[str] = None,
) -> Tracker:
    # multi-host: only process 0 writes metrics/artifacts (metrics are
    # computed on global arrays, so every process would log identical rows)
    try:
        import jax

        if jax.process_index() != 0:
            return NullTracker()
    except Exception:
        pass
    trackers: list = []
    if run_dir:
        trackers.append(JsonlTracker(run_dir, config))
    if use_wandb:
        try:
            import wandb  # type: ignore

            class _Wandb(Tracker):
                def __init__(self) -> None:
                    self.run = wandb.init(project=wandb_project, config=dict(config or {}))

                def log(self, metrics, step):
                    wandb.log(dict(metrics), step=step)

                def log_artifact(self, path, name, kind="model"):
                    art = wandb.Artifact(name=name, type=kind)
                    art.add_file(path)
                    self.run.log_artifact(art)

                def finish(self):
                    self.run.finish()

            trackers.append(_Wandb())
        except ImportError:
            pass  # wandb not installed: local tracking only
    if not trackers:
        return NullTracker()
    if len(trackers) == 1:
        return trackers[0]
    return CompositeTracker(trackers)
