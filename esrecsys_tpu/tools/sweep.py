"""Local hyperparameter sweeps.

Capability parity with the reference's wandb bayes sweeps
(pinterest/sweep.yaml:1-14, pinterest/README.md:91-98) without the SaaS
coupling: a sweep spec (same shape as sweep.yaml — method, metric,
parameters with values/min/max) drives repeated runs of any workload's
``train(cfg)``; results land in the tracker and a sweep summary JSON.

Methods: grid, random. (The reference's bayes search optimizes 3 params over
tens of runs — random search is competitive at that budget and dependency-free.)
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import logging
import math
import os
from typing import Any, Callable, Dict, List, Mapping, Optional

import numpy as np

from esrecsys_tpu.core import config as config_lib

log = logging.getLogger(__name__)


@dataclasses.dataclass
class SweepSpec:
    method: str                    # grid | random
    metric_name: str               # e.g. "eval_loss"
    metric_goal: str               # minimize | maximize
    parameters: Dict[str, dict]    # name -> {values: [...]} | {min, max, [log]}
    max_runs: int = 20
    seed: int = 0

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "SweepSpec":
        metric = d.get("metric", {})
        return cls(
            method=d.get("method", "random"),
            metric_name=metric.get("name", "eval_loss"),
            metric_goal=metric.get("goal", "minimize"),
            parameters=dict(d.get("parameters", {})),
            max_runs=int(d.get("max_runs", 20)),
            seed=int(d.get("seed", 0)),
        )

    @classmethod
    def load(cls, path: str) -> "SweepSpec":
        with open(path) as f:
            if path.endswith((".yaml", ".yml")):
                try:
                    import yaml  # type: ignore

                    return cls.from_dict(yaml.safe_load(f))
                except ImportError as e:
                    raise SystemExit("pyyaml unavailable; use a JSON sweep spec") from e
            return cls.from_dict(json.load(f))


def _sample(spec: SweepSpec, rng: np.random.Generator) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for name, p in spec.parameters.items():
        if "values" in p:
            out[name] = p["values"][int(rng.integers(0, len(p["values"])))]
        elif "min" in p and "max" in p:
            lo, hi = float(p["min"]), float(p["max"])
            if p.get("log") or p.get("distribution") == "log_uniform_values":
                v = math.exp(rng.uniform(math.log(lo), math.log(hi)))
            else:
                v = rng.uniform(lo, hi)
            out[name] = int(v) if p.get("type") == "int" else v
        else:
            raise ValueError(f"parameter {name}: need 'values' or 'min'/'max'")
    return out


def _grid(spec: SweepSpec) -> List[Dict[str, Any]]:
    names, options = [], []
    for name, p in spec.parameters.items():
        if "values" not in p:
            raise ValueError(f"grid sweeps need 'values' for {name}")
        names.append(name)
        options.append(p["values"])
    return [dict(zip(names, combo)) for combo in itertools.product(*options)]


def run_sweep(
    spec: SweepSpec,
    base_cfg: Any,
    train_fn: Callable[[Any], Any],
    out_dir: str,
    metric_from_result: Optional[Callable[[Any], float]] = None,
) -> Dict[str, Any]:
    """Run the sweep; returns {best: {...}, runs: [...]} (also saved)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(spec.seed)
    if spec.method == "grid":
        candidates = _grid(spec)[: spec.max_runs]
    elif spec.method == "random":
        candidates = [_sample(spec, rng) for _ in range(spec.max_runs)]
    else:
        raise ValueError(f"unknown sweep method {spec.method!r}")

    def metric_of(result) -> float:
        if metric_from_result is not None:
            return float(metric_from_result(result))
        merged = {**result.last_train_metrics, **result.last_eval_metrics}
        return float(merged[spec.metric_name])

    sign = 1.0 if spec.metric_goal == "minimize" else -1.0
    runs = []
    best = None
    for i, overrides in enumerate(candidates):
        cfg = config_lib.with_overrides(base_cfg, overrides)
        cfg = config_lib.with_overrides(cfg, {"work_dir": os.path.join(out_dir, f"run{i:03d}")}) \
            if hasattr(cfg, "work_dir") else cfg
        log.info("sweep run %d/%d: %s", i + 1, len(candidates), overrides)
        result = train_fn(cfg)
        value = metric_of(result)
        runs.append({"overrides": overrides, spec.metric_name: value})
        if best is None or sign * value < sign * best[spec.metric_name]:
            best = runs[-1]
        with open(os.path.join(out_dir, "sweep.json"), "w") as f:
            json.dump({"best": best, "runs": runs}, f, indent=2)
    log.info("sweep best: %s", best)
    return {"best": best, "runs": runs}
