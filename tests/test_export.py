"""Final-model artifact export (train/export.py)."""

import json
import os

import jax.numpy as jnp
import numpy as np

from esrecsys_tpu.core.tracking import MemoryTracker
from esrecsys_tpu.train import export_model, latest_artifact, load_model


def test_export_load_roundtrip(tmp_path):
    params = {"enc": {"kernel": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                      "bias": jnp.ones((3,))},
              "table": {"embedding": jnp.full((4, 2), 7.0)}}
    stats = {"bn": {"mean": jnp.zeros((3,)), "var": jnp.ones((3,))}}
    tracker = MemoryTracker()
    path = export_model(str(tmp_path), "m", params, step=42, tracker=tracker,
                        batch_stats=stats, metadata={"dim": 3})
    assert os.path.exists(path) and path.endswith("m-00000042.npz")
    assert tracker.artifacts == [(path, "m-42", "model")]

    p2, s2, meta = load_model(path)
    assert meta == {"name": "m", "step": 42, "dim": 3}
    np.testing.assert_array_equal(p2["enc"]["kernel"],
                                  np.asarray(params["enc"]["kernel"]))
    np.testing.assert_array_equal(p2["table"]["embedding"],
                                  np.asarray(params["table"]["embedding"]))
    np.testing.assert_array_equal(s2["bn"]["var"], np.ones((3,)))


def test_latest_artifact_picks_newest(tmp_path):
    params = {"w": jnp.zeros((2,))}
    assert latest_artifact(str(tmp_path), "m") is None
    export_model(str(tmp_path), "m", params, step=10)
    p2 = export_model(str(tmp_path), "m", params, step=200)
    export_model(str(tmp_path), "other", params, step=999)
    assert latest_artifact(str(tmp_path), "m") == p2


def test_glove_train_leaves_artifact(tmp_path):
    """Every workload's train() ends with a loadable model artifact +
    artifacts.jsonl entry (reference trainers all export their model)."""
    from esrecsys_tpu.data import recordio
    from esrecsys_tpu.data.protos import corpus_pb2
    from esrecsys_tpu.data.vocab import VocabEntry, Vocabulary
    from esrecsys_tpu.workloads import glove

    shards = tmp_path / "shards"
    shards.mkdir()
    rng = np.random.default_rng(0)
    with recordio.ShardedWriter(str(shards), records_per_shard=1000) as w:
        for _ in range(100):
            row = corpus_pb2.CooccurrenceRow()
            row.index = int(rng.integers(0, 20))
            row.other_index.append(int(rng.integers(0, 20)))
            row.count.append(float(rng.random() + 0.1))
            w.write(row.SerializeToString())
    vocab = Vocabulary([VocabEntry(token=f"t{i}", frequency=50 - i)
                        for i in range(20)])
    vocab.save(str(tmp_path / "dict.json"))

    cfg = glove.GloveConfig(
        train_pattern=str(shards / "part-*.bz2"),
        token_dictionary=str(tmp_path / "dict.json"),
        work_dir=str(tmp_path / "run"), feature_size=4, batch_size=8,
        steps_per_epoch=4, num_epochs=1, eval_steps=1, shuffle_buffer_size=0)
    glove.train(cfg)

    art = latest_artifact(str(tmp_path / "run"), "glove")
    assert art is not None
    params, _, meta = load_model(art)
    assert meta["step"] == 4 and meta["feature_size"] == 4
    assert params["token_embedding"]["embedding"].shape[1] == 4
    lines = open(tmp_path / "run" / "artifacts.jsonl").read().splitlines()
    assert any(json.loads(l)["kind"] == "model" for l in lines)
