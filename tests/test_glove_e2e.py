"""End-to-end GloVe slice: synthetic co-occurrence shards → sharded table →
weighted-MSE training → KNN probes → checkpoint/resume."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrecsys_tpu.data import recordio
from esrecsys_tpu.data.pipelines import cooccurrence_triples, glove_batches
from esrecsys_tpu.data.protos import CooccurrenceRow
from esrecsys_tpu.data.vocab import Vocabulary
from esrecsys_tpu.models.glove import Glove
from esrecsys_tpu.train import Checkpointer, fit
from esrecsys_tpu.workloads import glove as glove_wl


@pytest.fixture(scope="module")
def synthetic_data(tmp_path_factory):
    """Two token clusters: tokens within a cluster co-occur heavily."""
    tmp = tmp_path_factory.mktemp("cooc")
    rng = np.random.default_rng(0)
    rows = []
    n = 20  # embedding ids 1..20 (0 is mask)
    for i in range(1, n + 1):
        others, counts = [], []
        for j in range(1, i):
            same = (i <= n // 2) == (j <= n // 2)
            count = float(rng.integers(80, 120)) if same else float(rng.integers(1, 3))
            others.append(j)
            counts.append(count)
        if others:
            rows.append(CooccurrenceRow(index=i, other_index=others, count=counts))
    recordio.write_protos(str(tmp / "part-00000.bz2"), rows[: len(rows) // 2])
    recordio.write_protos(str(tmp / "part-00001.bz2"), rows[len(rows) // 2 :])
    return str(tmp / "part-*.bz2"), n


def test_triples_and_batches(synthetic_data):
    pattern, n = synthetic_data
    triples = list(cooccurrence_triples(pattern, repeat=False, shuffle_files=False))
    assert len(triples) == sum(range(n))  # i-1 others per row i
    assert all(t1 > t2 for t1, t2, _ in triples)  # reference stores j < i only
    batches = glove_batches(pattern, batch_size=32, shuffle_buffer=64, repeat=True)
    (t1, t2), c = next(batches)
    assert t1.shape == (32,) and c.dtype == np.float32


def test_glove_model_shapes():
    model = Glove(num_embeddings=32, features=8)
    params = model.init(jax.random.PRNGKey(0), (jnp.zeros(4, jnp.int32),) * 2)
    out = model.apply(params, (jnp.array([1, 2]), jnp.array([3, 4])))
    assert out.shape == (2,)
    scores = model.apply(params, jnp.array([1, 5]), method=Glove.score_all)
    assert scores.shape == (2, 32)
    # score_all excludes bias: symmetric in query/key
    np.testing.assert_allclose(scores[0, 5], scores[1, 1], rtol=1e-5)


@pytest.mark.parametrize("n_model", [1, 2])
def test_glove_trains_and_clusters(synthetic_data, tmp_path, n_model):
    pattern, n = synthetic_data
    cfg = glove_wl.GloveConfig(
        train_pattern=pattern,
        work_dir=str(tmp_path / f"wd{n_model}"),
        feature_size=8,
        batch_size=64,
        learning_rate=0.05,
        steps_per_epoch=30,
        num_epochs=10,
        shuffle_buffer_size=128,
        terms="",
        n_model_shards=n_model,
    )
    from esrecsys_tpu.core import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(n_model=n_model)
    model, state = glove_wl.init_state(cfg, num_embeddings=n + 1, mesh=mesh)
    batches = glove_batches(pattern, cfg.batch_size, shuffle_buffer=128)

    first = glove_wl.make_eval_step(model)(state, next(batches))["loss"]
    result = fit(
        state,
        glove_wl.make_train_step(model),
        batches,
        num_steps=cfg.steps_per_epoch * cfg.num_epochs,
        log_every=50,
    )
    last = result.last_train_metrics["train_loss"]
    assert last < float(first) * 0.5, (float(first), last)

    # cluster structure: a token's nearest non-self neighbor is in-cluster
    scores, idx = glove_wl.knn(result.state, jnp.array([2, 15], jnp.int32), k=3)
    in_cluster_2 = set(range(1, n // 2 + 1))
    neighbors_2 = [i for i in idx[0].tolist() if i != 2][:2]
    assert any(i in in_cluster_2 for i in neighbors_2), idx[0]


def test_glove_checkpoint_roundtrip(synthetic_data, tmp_path):
    pattern, n = synthetic_data
    cfg = glove_wl.GloveConfig(train_pattern=pattern, feature_size=4, batch_size=16)
    from esrecsys_tpu.core import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(n_model=1)
    model, state = glove_wl.init_state(cfg, num_embeddings=n + 1, mesh=mesh)
    batches = glove_batches(pattern, 16, shuffle_buffer=0)
    result = fit(state, glove_wl.make_train_step(model), batches, num_steps=3)

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(3, result.state)
    assert ckpt.latest_step() == 3

    _, fresh = glove_wl.init_state(cfg, num_embeddings=n + 1, mesh=mesh)
    restored = ckpt.restore(fresh)
    assert int(restored.step) == 3
    np.testing.assert_allclose(
        np.asarray(restored.params["token_embedding"]["embedding"]),
        np.asarray(result.state.params["token_embedding"]["embedding"]),
        rtol=1e-6,
    )
    # restored state is usable for further training (real resume, unlike
    # the reference's silent no-op at train_cooccurence.py:173-177)
    result2 = fit(restored, glove_wl.make_train_step(model), batches, num_steps=5)
    assert int(result2.state.step) == 5 and result2.steps_run == 2


def test_async_checkpointer_through_fit(synthetic_data, tmp_path):
    """Checkpointer(async_save=True): mid-run saves overlap training and the
    final save is awaited by fit before it returns, so the directory is
    complete and restorable the moment fit hands back."""
    pattern, n = synthetic_data
    cfg = glove_wl.GloveConfig(train_pattern=pattern, feature_size=4,
                               batch_size=16)
    from esrecsys_tpu.core import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(n_model=1)
    model, state = glove_wl.init_state(cfg, num_embeddings=n + 1, mesh=mesh)
    ckpt = Checkpointer(str(tmp_path / "ackpt"), async_save=True)
    result = fit(state, glove_wl.make_train_step(model),
                 glove_batches(pattern, 16, shuffle_buffer=0), num_steps=6,
                 checkpointer=ckpt, checkpoint_every=2)
    # final save durable without any explicit wait by the caller
    assert ckpt.latest_step() == 6
    _, fresh = glove_wl.init_state(cfg, num_embeddings=n + 1, mesh=mesh)
    restored = ckpt.restore(fresh)
    assert int(restored.step) == 6
    np.testing.assert_allclose(
        np.asarray(restored.params["token_embedding"]["embedding"]),
        np.asarray(result.state.params["token_embedding"]["embedding"]),
        rtol=1e-6)


def test_knn_hook_logs(synthetic_data, caplog):
    pattern, n = synthetic_data
    vocab = Vocabulary.from_counts({f"tok{i}": 100 - i for i in range(n)})
    cfg = glove_wl.GloveConfig(train_pattern=pattern, feature_size=4)
    from esrecsys_tpu.core import mesh as mesh_lib

    model, state = glove_wl.init_state(
        cfg, num_embeddings=vocab.num_embeddings, mesh=mesh_lib.make_mesh(n_model=1)
    )
    hook = glove_wl.knn_hook(vocab, ["tok0", "unseen_token"], k=3)
    with caplog.at_level(logging.INFO, logger="esrecsys_tpu.workloads.glove"):
        hook(state, step=1)
    assert sum("tok0" in r.message for r in caplog.records) >= 1


def test_fit_steps_per_call(synthetic_data, tmp_path):
    """Multi-step device loop: same training effect, fewer dispatches."""
    from esrecsys_tpu.core import mesh as mesh_lib
    from esrecsys_tpu.core.tracking import MemoryTracker
    from esrecsys_tpu.train import Checkpointer

    pattern, n = synthetic_data
    cfg = glove_wl.GloveConfig(train_pattern=pattern, feature_size=8,
                               batch_size=32, learning_rate=0.05)
    mesh = mesh_lib.make_mesh(n_model=1)
    model, state = glove_wl.init_state(cfg, num_embeddings=n + 1, mesh=mesh)
    batches = glove_batches(pattern, 32, shuffle_buffer=64)
    tracker = MemoryTracker()
    ckpt = Checkpointer(str(tmp_path / "spc_ckpt"))
    first = glove_wl.make_eval_step(model)(state, next(batches))["loss"]
    result = fit(
        state, glove_wl.make_train_step(model), batches,
        num_steps=200, steps_per_call=8, log_every=40,
        tracker=tracker, checkpointer=ckpt, checkpoint_every=100,
    )
    assert result.steps_run == 200
    assert int(result.state.step) == 200
    assert result.last_train_metrics["train_loss"] < float(first)
    logged_steps = [s for s, _ in tracker.records]
    assert logged_steps[0] == 40 and 200 in logged_steps
    assert ckpt.latest_step() == 200


def test_fit_profile_dir(synthetic_data, tmp_path):
    from esrecsys_tpu.core import mesh as mesh_lib

    pattern, n = synthetic_data
    cfg = glove_wl.GloveConfig(train_pattern=pattern, feature_size=4, batch_size=16)
    model, state = glove_wl.init_state(cfg, n + 1, mesh_lib.make_mesh(n_model=1))
    batches = glove_batches(pattern, 16)
    prof = tmp_path / "trace"
    fit(state, glove_wl.make_train_step(model), batches, num_steps=30,
        profile_dir=str(prof), profile_steps=5)
    import os

    found = [f for _, _, fs in os.walk(prof) for f in fs]
    assert any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz") for f in found), found


def test_lazy_adam_matches_dense_when_all_rows_touched():
    """With every row touched each step, LazyAdam == dense Adam exactly."""
    import jax
    import jax.numpy as jnp

    from esrecsys_tpu.workloads import glove as gw

    cfg_d = gw.GloveConfig(feature_size=4, learning_rate=0.01, optimizer="adam")
    cfg_l = gw.GloveConfig(feature_size=4, learning_rate=0.01, optimizer="lazy_adam",
                           steps_per_call=2)  # packed path gated on spc>1
    model, state_d = gw.init_state(cfg_d, num_embeddings=4, mesh=None)
    _, state_l = gw.init_state(cfg_l, num_embeddings=4, mesh=None)
    dense = jax.jit(gw.select_train_step(model, cfg_d))
    # the packed lazy step expects physical-layout state: wrap with the same
    # pack/unpack transforms fit installs (state_pack/state_unpack hooks)
    raw_lazy = gw.select_train_step(model, cfg_l)
    pk, unpk = gw.packed_state_transforms(cfg_l)

    def lazy_step(s, b):
        s2, m = raw_lazy(pk(s), b)
        return unpk(s2), m

    lazy = jax.jit(lazy_step)
    rng = np.random.default_rng(0)
    for _ in range(5):
        # every token id appears: t1 covers 0..3, t2 a permutation of 0..3
        t1 = jnp.asarray([0, 1, 2, 3], jnp.int32)
        t2 = jnp.asarray(rng.permutation(4), jnp.int32)
        count = jnp.asarray(rng.integers(1, 50, 4).astype(np.float32))
        state_d, md = dense(state_d, ((t1, t2), count))
        state_l, ml = lazy(state_l, ((t1, t2), count))
        np.testing.assert_allclose(float(md["loss"]), float(ml["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state_d.params["token_embedding"]["embedding"]),
        np.asarray(state_l.params["token_embedding"]["embedding"]),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state_d.params["bias"]["embedding"]),
        np.asarray(state_l.params["bias"]["embedding"]),
        rtol=1e-4, atol=1e-6)
