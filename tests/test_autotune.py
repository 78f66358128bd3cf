"""Retrieval auto-tuner (tools/retrieval_autotune.py): calibrated
(mode, knob) selection meets the recall target end-to-end."""

import numpy as np
import pytest

from esrecsys_tpu.tools.retrieval_autotune import autotune


@pytest.fixture(scope="module")
def catalog():
    rng = np.random.default_rng(0)
    n_comp, d = 32, 16
    means = rng.normal(size=(n_comp, d)).astype(np.float32) * 3.0
    comp = rng.integers(0, n_comp, 3000)
    vecs = (means[comp]
            + rng.normal(size=(3000, d)).astype(np.float32) * 0.3)
    queries = vecs[rng.choice(3000, 48, replace=False)] \
        + 0.1 * rng.normal(size=(48, d)).astype(np.float32)
    return vecs.astype(np.float32), queries.astype(np.float32)


@pytest.fixture(scope="module")
def tuned(catalog):
    vecs, queries = catalog
    return autotune(vecs, queries, target_recall=0.9, k=10,
                    nprobes=(1, 4, 16), oversamples=(4, 16, 64),
                    ivf_clusters=16, pq_subspaces=4, build_iters=5)


def test_recommended_meets_target_and_is_cheapest(tuned):
    rec = tuned["recommended"]
    assert rec is not None and rec["meets_target"]
    assert rec["recall"] >= 0.9
    costs = [c["scan_bytes_per_query"] for c in tuned["feasible"]]
    assert costs == sorted(costs)
    assert rec["scan_bytes_per_query"] == costs[0]
    # every feasible row really met the target; exact is always feasible
    assert all(c["recall"] >= 0.9 for c in tuned["feasible"])
    assert any(c["mode"] == "exact" for c in tuned["feasible"])


def test_knob_sweeps_stop_at_first_feasible(tuned):
    """Per mode, at most ONE config meets target (the sweep breaks on
    first success — no wasted calibration past the knee)."""
    for mode in ("fused", "ivf", "ivf_int8", "pq", "ivf_pq"):
        rows = [c for c in tuned["all_configs"] if c["mode"] == mode]
        assert sum(c["meets_target"] for c in rows) <= 1
        # infeasible prefixes are kept for the report
        if rows and rows[-1]["meets_target"]:
            assert all(not c["meets_target"] for c in rows[:-1])


def test_fused_mode_is_calibrated(tuned):
    rows = [c for c in tuned["all_configs"] if c["mode"] == "fused"]
    assert rows, "fused mode missing from calibration"
    # k=10 over <=3072 padded rows at L>=512: expected losses
    # C(10,3)/L^2 ~ 5e-4 -> the first sweep point should be feasible
    assert rows[-1]["meets_target"]
    assert rows[-1]["flags"].startswith("--fused --fused_bins ")
    assert rows[-1]["kwargs"] == {"fused": True,
                                  "fused_bins": rows[-1]["knob"]["bins"]}
    # no private fn objects may leak into the (JSON-dumped) report
    assert all("_fn" not in c for c in tuned["all_configs"])


def test_measure_throughput_ranks_by_measured_qps(catalog):
    vecs, queries = catalog
    out = autotune(vecs, queries, target_recall=0.9, k=10,
                   nprobes=(16,), oversamples=(64,),
                   ivf_clusters=16, pq_subspaces=4, build_iters=3,
                   fused_bins_sweep=(512,), measure_throughput=True)
    assert out["ranked_by"] == "measured_queries_per_s"
    qps = [c["queries_per_s"] for c in out["feasible"]]
    assert qps and all(q > 0 for q in qps)
    assert qps == sorted(qps, reverse=True)
    assert out["recommended"]["queries_per_s"] == qps[0]


def test_recommended_kwargs_drive_serving_to_target(catalog, tuned):
    """The emitted kwargs feed RetrievalService verbatim and the LIVE
    service hits the calibrated recall on fresh held-out queries."""
    from esrecsys_tpu.retrieval.index import EmbeddingIndex
    from esrecsys_tpu.serving.server import RetrievalService

    vecs, _ = catalog
    rec = next(c for c in tuned["feasible"] if c["mode"] != "exact")
    idx = EmbeddingIndex([f"i{j}" for j in range(len(vecs))], vecs)
    svc = RetrievalService(idx, max_k=10, max_batch=8, **rec["kwargs"])
    rng = np.random.default_rng(7)
    held = vecs[rng.choice(len(vecs), 32, replace=False)] \
        + 0.1 * rng.normal(size=(32, vecs.shape[1])).astype(np.float32)
    truth = np.argsort(-(held @ vecs.T), axis=1)[:, :10]
    hits = 0
    for b in range(0, 32, 8):
        ids, _ = svc.topk(held[b:b + 8].astype(np.float32), k=10)
        got = [[int(s[1:]) for s in row] for row in ids]
        hits += sum(len(set(g) & set(t)) for g, t in zip(got, truth[b:b + 8]))
    # calibration noise between query draws: allow a small slack
    assert hits / (32 * 10) >= 0.9 - 0.07, hits / 320


def test_unreachable_target_recommends_none(catalog):
    vecs, queries = catalog
    out = autotune(vecs, queries, target_recall=1.01, k=10,
                   nprobes=(1,), oversamples=(4,),
                   ivf_clusters=16, pq_subspaces=4, build_iters=3)
    assert out["recommended"] is None and out["feasible"] == []
