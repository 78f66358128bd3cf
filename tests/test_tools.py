import json
import os

import numpy as np
import pytest

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.core.mesh import shard_files_for_process
from esrecsys_tpu.tools import sweep as sweep_lib


def test_shard_files_single_process():
    files = [f"f{i}" for i in range(5)]
    assert shard_files_for_process(files) == sorted(files)  # 1 process


def test_sweep_spec_from_wandb_style_dict():
    spec = sweep_lib.SweepSpec.from_dict({
        "method": "bayes",  # unknown methods surface at run time
        "metric": {"name": "eval_loss", "goal": "minimize"},
        "parameters": {
            "learning_rate": {"min": 1e-5, "max": 1e-2, "log": True},
            "output_size": {"values": [32, 64, 96]},
        },
    })
    assert spec.metric_name == "eval_loss"
    assert "output_size" in spec.parameters


@pytest.fixture
def quad_problem():
    """Sweep target: (lr - 0.3)^2 minimized at lr=0.3."""
    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class Cfg:
        lr: float = 0.0
        flag: int = 0

    class Result:
        def __init__(self, cfg):
            self.last_train_metrics = {}
            self.last_eval_metrics = {"eval_loss": (cfg.lr - 0.3) ** 2 + 0.01 * cfg.flag}

    return Cfg, lambda cfg: Result(cfg)


def test_random_sweep_finds_minimum(quad_problem, tmp_path):
    Cfg, train_fn = quad_problem
    spec = sweep_lib.SweepSpec(
        method="random",
        metric_name="eval_loss",
        metric_goal="minimize",
        parameters={"lr": {"min": 0.0, "max": 1.0}, "flag": {"values": [0, 1]}},
        max_runs=30,
        seed=0,
    )
    out = sweep_lib.run_sweep(spec, Cfg(), train_fn, str(tmp_path / "sweep"))
    assert abs(out["best"]["overrides"]["lr"] - 0.3) < 0.1
    assert os.path.exists(tmp_path / "sweep" / "sweep.json")
    saved = json.loads((tmp_path / "sweep" / "sweep.json").read_text())
    assert len(saved["runs"]) == 30


def test_grid_sweep_exhaustive(quad_problem, tmp_path):
    Cfg, train_fn = quad_problem
    spec = sweep_lib.SweepSpec(
        method="grid", metric_name="eval_loss", metric_goal="minimize",
        parameters={"lr": {"values": [0.0, 0.3, 0.9]}, "flag": {"values": [0, 1]}},
        max_runs=10,
    )
    out = sweep_lib.run_sweep(spec, Cfg(), train_fn, str(tmp_path / "sweep"))
    assert len(out["runs"]) == 6
    assert out["best"]["overrides"] == {"lr": 0.3, "flag": 0}


def test_grid_requires_values(quad_problem, tmp_path):
    Cfg, train_fn = quad_problem
    spec = sweep_lib.SweepSpec(
        method="grid", metric_name="eval_loss", metric_goal="minimize",
        parameters={"lr": {"min": 0, "max": 1}},
    )
    with pytest.raises(ValueError, match="grid sweeps need"):
        sweep_lib.run_sweep(spec, Cfg(), train_fn, str(tmp_path / "s"))


def test_fetch_images_resume_and_retry(tmp_path, monkeypatch):
    from esrecsys_tpu.etl import fetch_images as fi

    rows = [json.dumps({"scene": "aa" * 16, "product": "bb" * 16}),
            json.dumps({"scene": "aa" * 16, "product": "cc" * 16})]
    stl = tmp_path / "pairs.json"
    stl.write_text("\n".join(rows))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    # pre-existing image is skipped without any fetch
    (img_dir / ("aa" * 16 + ".jpg")).write_bytes(b"x")

    calls = {}

    class FakeResponse:
        def __init__(self, key):
            self.key = key

        def read(self):
            return b"JPEGDATA"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, timeout=0):
        calls[url] = calls.get(url, 0) + 1
        if "cc" in url and calls[url] < 3:
            raise OSError("transient")
        return FakeResponse(url)

    monkeypatch.setattr(fi.urllib.request, "urlopen", fake_urlopen)
    cfg = fi.FetchConfig(stl_json=str(stl), image_dir=str(img_dir),
                         backoff_seconds=0.0, sleep_seconds=0.0)
    stats = fi.fetch_all(cfg)
    assert stats == {"ok": 3, "failed": 0}
    # bb fetched once; cc needed 3 attempts (retry with backoff); aa never
    assert sum("bb" in u for u in calls) == 1
    assert not any("aaaa" in u for u in calls)
    assert (img_dir / ("cc" * 16 + ".jpg")).read_bytes() == b"JPEGDATA"


def test_fetch_gives_up_after_max_retries(tmp_path, monkeypatch):
    from esrecsys_tpu.etl import fetch_images as fi

    stl = tmp_path / "pairs.json"
    stl.write_text(json.dumps({"scene": "dd" * 16, "product": "ee" * 16}))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()

    def always_fail(url, timeout=0):
        raise OSError("down")

    monkeypatch.setattr(fi.urllib.request, "urlopen", always_fail)
    cfg = fi.FetchConfig(stl_json=str(stl), image_dir=str(img_dir),
                         max_retries=2, backoff_seconds=0.0, sleep_seconds=0.0)
    stats = fi.fetch_all(cfg)
    assert stats == {"ok": 0, "failed": 2}


def test_bayes_sweep_beats_random_at_equal_budget(quad_problem, tmp_path):
    """GP-EI converges faster than random on a known quadratic: at equal
    budget, bayes' best value must be at least as good and its best-found lr
    closer to the optimum (pinterest/sweep.yaml:2 capability)."""
    Cfg, train_fn = quad_problem
    params = {"lr": {"min": 0.0, "max": 1.0}, "flag": {"values": [0, 1]}}
    results = {}
    for method in ("random", "bayes"):
        spec = sweep_lib.SweepSpec(
            method=method, metric_name="eval_loss", metric_goal="minimize",
            parameters=params, max_runs=16, n_init=5, seed=7)
        results[method] = sweep_lib.run_sweep(
            spec, Cfg(), train_fn, str(tmp_path / method))
    b = results["bayes"]["best"]["eval_loss"]
    r = results["random"]["best"]["eval_loss"]
    assert b <= r + 1e-12, (b, r)
    assert abs(results["bayes"]["best"]["overrides"]["lr"] - 0.3) < 0.05


def test_bayes_runs_wandb_style_spec_unmodified(quad_problem, tmp_path):
    """The reference's sweep.yaml shape (method: bayes) runs as-is."""
    Cfg, train_fn = quad_problem
    spec = sweep_lib.SweepSpec.from_dict({
        "method": "bayes",
        "metric": {"name": "eval_loss", "goal": "minimize"},
        "parameters": {"lr": {"min": 0.001, "max": 1.0,
                              "distribution": "log_uniform_values"},
                       "flag": {"values": [0, 1]}},
        "max_runs": 8,
        "n_init": 3,
    })
    out = sweep_lib.run_sweep(spec, Cfg(), train_fn, str(tmp_path / "s"))
    assert len(out["runs"]) == 8
    assert out["best"]["eval_loss"] < 0.3


def test_sweep_early_stopping(quad_problem, tmp_path):
    Cfg, train_fn = quad_problem
    spec = sweep_lib.SweepSpec(
        method="grid", metric_name="eval_loss", metric_goal="minimize",
        parameters={"lr": {"values": [0.3, 0.9, 0.8, 0.7, 0.6, 0.5]},
                    "flag": {"values": [0]}},
        max_runs=6, early_stop_patience=2)
    out = sweep_lib.run_sweep(spec, Cfg(), train_fn, str(tmp_path / "es"))
    # best is the first run; patience 2 stops after runs 2 and 3
    assert len(out["runs"]) == 3
    assert out["best"]["overrides"]["lr"] == 0.3


def test_serving_bench_smoke(tmp_path):
    """serving_bench sweeps the mode lattice end-to-end and reports overlap
    vs the exact mode for every non-exact mode."""
    from esrecsys_tpu.tools import serving_bench as sb

    out = str(tmp_path / "sb.json")
    sb.main(["--items", "2000", "--dim", "16", "--queries", "32",
             "--batch", "16", "--k", "10", "--reps", "1", "--structured",
             "--ivf_clusters", "16", "--nprobe", "4",
             "--modes", "exact,quantized,ivf", "--out", out])
    with open(out) as f:
        d = json.load(f)
    modes = {r["mode"]: r for r in d["results"]}
    assert set(modes) == {"exact", "quantized", "ivf"}
    assert modes["exact"]["overlap_vs_exact"] is None
    for m in ("quantized", "ivf"):
        assert modes[m]["overlap_vs_exact"] >= 0.8, modes[m]
        assert modes[m]["queries_per_s"] > 0


def test_serving_bench_rejects_unknown_mode(tmp_path):
    from esrecsys_tpu.tools import serving_bench as sb

    with pytest.raises(SystemExit, match="unknown modes"):
        sb.main(["--items", "100", "--dim", "8", "--modes", "exact,bogus",
                 "--out", str(tmp_path / "x.json")])


def test_retrieval_quality_study_smoke(tmp_path):
    """The quality study runs end-to-end at tiny scale: int8 overlap is
    ~lossless and the IVF recall curve is monotone in nprobe, with
    nprobe == n_clusters recovering the exact result."""
    from esrecsys_tpu.tools import retrieval_quality_study as rqs

    out = str(tmp_path / "rq.json")
    rqs.main(["--n_items", "3000", "--dim", "8", "--n_queries", "16",
              "--n_clusters", "8", "--kmeans_iters", "3",
              "--nprobes", "1,4,8,16", "--regimes", "clustered",
              "--out", out])
    with open(out) as f:
        d = json.load(f)["clustered"]
    assert d["int8_fullscan"]["overlap@10"] >= 0.9
    curve = d["ivf"]["curve"]
    r10 = [row["recall@10"] for row in curve]
    assert r10 == sorted(r10)  # monotone in nprobe
    assert r10[-2] == 1.0  # nprobe == n_clusters is exact
    # nprobe > n_clusters is clamped: same cost, same recall as full probe
    assert curve[-1]["catalog_fraction_scored"] == \
        curve[-2]["catalog_fraction_scored"]
    assert r10[-1] == r10[-2]


def test_retrieval_quality_study_artifact_mode(tmp_path):
    """--artifact runs the same study on a real exported EmbeddingIndex."""
    from esrecsys_tpu.retrieval.index import EmbeddingIndex
    from esrecsys_tpu.tools import retrieval_quality_study as rqs

    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((600, 8)).astype(np.float32)
    art = str(tmp_path / "catalog.npz")
    EmbeddingIndex([f"id{i}" for i in range(600)], vecs).save(art)
    out = str(tmp_path / "rq_art.json")
    rqs.main(["--artifact", art, "--n_queries", "8", "--n_clusters", "4",
              "--kmeans_iters", "2", "--nprobes", "4", "--out", out])
    with open(out) as f:
        d = json.load(f)["artifact"]
    assert d["n_items"] == 600
    assert d["ivf"]["curve"][0]["recall@10"] == 1.0  # nprobe == n_clusters


def test_sweep_cli_end_to_end_glove(tmp_path):
    """python -m esrecsys_tpu.tools.sweep drives a real workload train():
    spec file + workload flags in, ranked sweep.json out."""
    from esrecsys_tpu.data import recordio
    from esrecsys_tpu.data.protos import CooccurrenceRow
    from esrecsys_tpu.data.vocab import Vocabulary, VocabEntry

    rng = np.random.default_rng(0)
    shards = tmp_path / "cooc"
    shards.mkdir()
    rows = [CooccurrenceRow(index=int(rng.integers(1, 20)),
                            other_index=[int(rng.integers(1, 20))],
                            count=[float(rng.random() + 0.1)])
            for _ in range(64)]
    recordio.write_protos(str(shards / "part-00000.bz2"), rows)
    Vocabulary([VocabEntry(token=f"t{i}", frequency=50 - i)
                for i in range(20)]).save(str(tmp_path / "dict.json"))

    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps({
        "method": "grid",
        "metric": {"name": "eval_loss", "goal": "minimize"},
        "parameters": {"learning_rate": {"values": [1e-3, 1e-2]}},
    }))
    out_dir = tmp_path / "sweep_out"
    result = sweep_lib.main([
        "--spec", str(spec_path), "--workload", "glove",
        "--out_dir", str(out_dir),
        "--train_pattern", str(shards / "part-*.bz2"),
        "--token_dictionary", str(tmp_path / "dict.json"),
        "--work_dir", str(tmp_path / "base"),
        "--feature_size", "4", "--batch_size", "8",
        "--steps_per_epoch", "3", "--num_epochs", "1",
        "--eval_steps", "1", "--shuffle_buffer_size", "0",
        "--terms", "",
    ])
    saved = json.loads((out_dir / "sweep.json").read_text())
    assert len(saved["runs"]) == 2
    assert saved["best"]["eval_loss"] == min(r["eval_loss"] for r in saved["runs"])
    assert result["best"]["overrides"]["learning_rate"] in (1e-3, 1e-2)
    # each run trained in its own work_dir under out_dir
    assert (out_dir / "run000" / "metrics.jsonl").exists()
