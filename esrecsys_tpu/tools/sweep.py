"""Local hyperparameter sweeps.

Capability parity with the reference's wandb bayes sweeps
(pinterest/sweep.yaml:1-14, pinterest/README.md:91-98) without the SaaS
coupling: a sweep spec (same shape as sweep.yaml — method, metric,
parameters with values/min/max) drives repeated runs of any workload's
``train(cfg)``; results land in the tracker and a sweep summary JSON.

Methods: grid, random, bayes. ``bayes`` runs the reference's
``method: bayes`` spec (pinterest/sweep.yaml:2) unmodified: a numpy-only
Gaussian-process surrogate (RBF kernel over [0,1]-normalized parameters,
log-space for log-distributed ones) with expected-improvement acquisition
over random candidates — n_init random warmup runs, then EI-maximizing
picks. ``early_stop_patience`` stops any sweep after that many runs without
improvement.
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
    n_init: int = 5                # bayes: random warmup runs before the GP
    early_stop_patience: int = 0   # stop after this many runs w/o improvement

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
            n_init=int(d.get("n_init", 5)),
            early_stop_patience=int(d.get("early_stop_patience", 0)),
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


class _BayesPicker:
    """GP-EI candidate picker over [0,1]^d-normalized parameters.

    RBF kernel on the unit cube (log-space for log params, index space for
    'values' lists), expected improvement maximized over random candidates.
    Numpy-only — the reference's bayes backend is wandb's hosted service
    (pinterest/sweep.yaml:2); this is the self-contained equivalent at the
    tens-of-runs scale that spec targets.
    """

    def __init__(self, spec: SweepSpec, rng: np.random.Generator,
                 n_candidates: int = 512, length_scale: float = 0.3):
        self.spec = spec
        self.rng = rng
        self.n_candidates = n_candidates
        self.ls = length_scale
        self.names = list(spec.parameters)

    # ---- encoding ----
    def _encode_one(self, name: str, value: Any) -> float:
        p = self.spec.parameters[name]
        if "values" in p:
            vals = p["values"]
            return vals.index(value) / max(len(vals) - 1, 1)
        lo, hi = float(p["min"]), float(p["max"])
        if p.get("log") or p.get("distribution") == "log_uniform_values":
            return (math.log(float(value)) - math.log(lo)) / (
                math.log(hi) - math.log(lo) or 1.0)
        return (float(value) - lo) / ((hi - lo) or 1.0)

    def _encode(self, overrides: Dict[str, Any]) -> np.ndarray:
        return np.asarray([self._encode_one(n, overrides[n]) for n in self.names])

    def next(self, tried: List[Dict[str, Any]], ys: List[float]) -> Dict[str, Any]:
        if len(ys) < self.spec.n_init:
            return _sample(self.spec, self.rng)
        cands = [_sample(self.spec, self.rng) for _ in range(self.n_candidates)]
        X = np.stack([self._encode(t) for t in tried])          # (n, d)
        y = np.asarray(ys, np.float64)
        finite = np.isfinite(y)
        if not finite.all():  # failed runs (nan/inf metric): worst observed + 1
            worst = y[finite].max() if finite.any() else 0.0
            y = np.where(finite, y, worst + 1.0)
        mu_y, sd_y = y.mean(), y.std() or 1.0
        yz = (y - mu_y) / sd_y
        C = np.stack([self._encode(c) for c in cands])          # (m, d)

        def rbf(a, b):
            d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
            return np.exp(-d2 / (2 * self.ls ** 2))

        K = rbf(X, X) + 1e-4 * np.eye(len(X))
        L = np.linalg.cholesky(K)
        alpha = np.linalg.solve(L.T, np.linalg.solve(L, yz))
        Ks = rbf(C, X)                                          # (m, n)
        mu = Ks @ alpha
        v = np.linalg.solve(L, Ks.T)                            # (n, m)
        var = np.clip(1.0 - (v ** 2).sum(0), 1e-9, None)
        sd = np.sqrt(var)
        best = yz.min()  # ys are sign-adjusted so lower is better
        z = (best - mu) / sd
        pdf = np.exp(-0.5 * z ** 2) / math.sqrt(2 * math.pi)
        cdf = 0.5 * (1 + np.vectorize(math.erf)(z / math.sqrt(2)))
        ei = sd * (z * cdf + pdf)
        return cands[int(np.argmax(ei))]


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
    picker: Optional[_BayesPicker] = None
    if spec.method == "grid":
        candidates = _grid(spec)[: spec.max_runs]
    elif spec.method == "random":
        candidates = [_sample(spec, rng) for _ in range(spec.max_runs)]
    elif spec.method == "bayes":
        candidates = None  # picked sequentially from observed results
        picker = _BayesPicker(spec, rng)
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
    tried: List[Dict[str, Any]] = []
    ys: List[float] = []
    since_best = 0
    for i in range(spec.max_runs if candidates is None else len(candidates)):
        overrides = picker.next(tried, ys) if picker else candidates[i]
        cfg = config_lib.with_overrides(base_cfg, overrides)
        cfg = config_lib.with_overrides(cfg, {"work_dir": os.path.join(out_dir, f"run{i:03d}")}) \
            if hasattr(cfg, "work_dir") else cfg
        log.info("sweep run %d/%d: %s", i + 1, spec.max_runs, overrides)
        result = train_fn(cfg)
        value = metric_of(result)
        runs.append({"overrides": overrides, spec.metric_name: value})
        tried.append(overrides)
        # sign-adjust so the picker always minimizes; nan counts as worst
        ys.append(sign * value if math.isfinite(value) else float("inf"))
        if best is None or sign * value < sign * best[spec.metric_name]:
            best = runs[-1]
            since_best = 0
        else:
            since_best += 1
        with open(os.path.join(out_dir, "sweep.json"), "w") as f:
            json.dump({"best": best, "runs": runs}, f, indent=2)
        if spec.early_stop_patience and since_best >= spec.early_stop_patience:
            log.info("early stop: no improvement in %d runs", since_best)
            break
    log.info("sweep best: %s", best)
    return {"best": best, "runs": runs}


_WORKLOADS = {
    "glove": ("esrecsys_tpu.workloads.glove", "GloveConfig"),
    "playlist": ("esrecsys_tpu.workloads.playlist", "PlaylistConfig"),
    "stl": ("esrecsys_tpu.workloads.stl", "STLConfig"),
    "txt2url": ("esrecsys_tpu.workloads.txt2url", "Txt2UrlConfig"),
}


def main(argv=None):
    """CLI: run a sweep spec against a workload.

    ::

        python -m esrecsys_tpu.tools.sweep --spec sweep.yaml --workload stl \\
            --out_dir /tmp/stl_sweep  [plus any workload flags as base config]

    Replaces the reference's ``wandb sweep sweep.yaml`` + ``wandb agent``
    pair (pinterest/README.md:91-98, pinterest/sweep.yaml:1-14): the spec
    file is read unmodified (yaml or json), runs execute locally in
    sequence, each run trains under ``out_dir/runNNN``, and the summary
    (best config + all runs) lands in ``out_dir/sweep.json``.
    """
    import argparse
    import importlib

    logging.basicConfig(level=logging.INFO, force=True)
    from esrecsys_tpu.axon_preflight import warn_cpu_fallback

    warn_cpu_fallback(log)
    p = argparse.ArgumentParser(description="local sweep runner")
    p.add_argument("--spec", required=True,
                   help="sweep spec path (.yaml/.yml/.json, wandb format)")
    p.add_argument("--workload", required=True, choices=sorted(_WORKLOADS))
    p.add_argument("--out_dir", default="",
                   help="sweep output dir (default: <base work_dir>/sweep)")
    ns, rest = p.parse_known_args(argv)

    mod_name, cfg_name = _WORKLOADS[ns.workload]
    mod = importlib.import_module(mod_name)
    base_cfg = config_lib.from_cli(getattr(mod, cfg_name), rest)
    spec = SweepSpec.load(ns.spec)
    out_dir = ns.out_dir or os.path.join(getattr(base_cfg, "work_dir", "/tmp"), "sweep")
    result = run_sweep(spec, base_cfg, mod.train, out_dir)
    print(json.dumps(result["best"]))
    return result


if __name__ == "__main__":
    main()
