"""Live multi-host path: 2-process CPU training == single-process training.

The reference logs ``jax.process_index/count`` but never uses them
(train_cooccurence.py:148-150); here the whole chain is exercised for real:
``distributed_init_if_needed`` (env-var path) → per-process input-file
sharding (``process_local_files``) → per-host local batches reassembled into
global arrays (``fit``'s ``make_array_from_process_local_data`` path) →
multi-process Orbax checkpointing → restore under a DIFFERENT process count.

Test data is constructed so the assembled global batch stream is identical
in both topologies (each shard holds one repeated triple; process p reads
shard p), so losses and final parameters must agree to float tolerance.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRIPLE_A = (3, 5, 9.0)    # shard 0: process 0's stream
TRIPLE_B = (7, 11, 17.0)  # shard 1: process 1's stream
ROWS_PER_SHARD = 400
GLOBAL_BATCH = 64
STEPS = 6


def _write_corpus(tmp_path):
    from esrecsys_tpu.data import recordio
    from esrecsys_tpu.data.protos import corpus_pb2
    from esrecsys_tpu.data.vocab import VocabEntry, Vocabulary

    shards = tmp_path / "shards"
    shards.mkdir()
    for si, (t1, t2, count) in enumerate([TRIPLE_A, TRIPLE_B]):
        scratch = tmp_path / f"scratch{si}"
        scratch.mkdir()
        with recordio.ShardedWriter(str(scratch), records_per_shard=10**9) as w:
            row = corpus_pb2.CooccurrenceRow()
            row.index = t1
            for _ in range(ROWS_PER_SHARD):
                row.other_index.append(t2)
                row.count.append(count)
            w.write(row.SerializeToString())
        os.rename(scratch / "part-00000.bz2", shards / f"part-0000{si}.bz2")
    vocab = Vocabulary([VocabEntry(token=f"t{i}", frequency=100 - i)
                        for i in range(16)])
    vocab.save(str(tmp_path / "dict.json"))
    return str(shards / "part-*.bz2"), str(tmp_path / "dict.json")


def _cfg(tmp_path, pattern, dict_path, work_dir):
    return dict(
        train_pattern=pattern,
        token_dictionary=dict_path,
        work_dir=str(tmp_path / work_dir),
        feature_size=8,
        batch_size=GLOBAL_BATCH,
        learning_rate=0.05,
        steps_per_epoch=STEPS,
        num_epochs=1,
        steps_per_call=2,
        eval_steps=2,
        shuffle_buffer_size=0,
        optimizer="adam",
        terms="",
        seed=3,
    )


def test_two_process_training_matches_single_process(tmp_path):
    pattern, dict_path, = _write_corpus(tmp_path)
    cfg = _cfg(tmp_path, pattern, dict_path, "mh")

    # ---- 2-process run (subprocesses; 4 virtual CPU devices each) ----
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             REPO, json.dumps(cfg)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    finals = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("FINAL ")][-1]
        finals.append(json.loads(line[len("FINAL "):]))
    assert finals[0]["steps"] == STEPS
    # both processes computed the same GLOBAL metrics
    assert finals[0]["train_loss"] == pytest.approx(finals[1]["train_loss"], rel=1e-6)
    assert np.isfinite(finals[0]["train_loss"])

    # ---- single-process reference on the same global batch stream ----
    # (pytest process: 8 virtual devices, process_count == 1)
    from esrecsys_tpu.core import mesh as mesh_lib
    from esrecsys_tpu.data.vocab import Vocabulary
    from esrecsys_tpu.train import Checkpointer, fit
    from esrecsys_tpu.workloads import glove as gw

    gcfg = gw.GloveConfig(**cfg)
    mesh = mesh_lib.make_mesh(n_model=1)
    num_emb = Vocabulary.load(dict_path).num_embeddings  # incl. minhash OOV
    model, state = gw.init_state(gcfg, num_embeddings=num_emb, mesh=mesh)

    def global_batches():
        half = GLOBAL_BATCH // 2
        t1 = np.asarray([TRIPLE_A[0]] * half + [TRIPLE_B[0]] * half, np.int32)
        t2 = np.asarray([TRIPLE_A[1]] * half + [TRIPLE_B[1]] * half, np.int32)
        ct = np.asarray([TRIPLE_A[2]] * half + [TRIPLE_B[2]] * half, np.float32)
        while True:
            yield (t1, t2), ct

    result = fit(
        state, gw.select_train_step(model, gcfg), global_batches(),
        num_steps=STEPS, log_every=STEPS, examples_per_step=GLOBAL_BATCH,
        steps_per_call=2, mesh=mesh,
    )
    assert result.last_train_metrics["train_loss"] == pytest.approx(
        finals[0]["train_loss"], rel=1e-5)

    # ---- restore the 2-process checkpoint under a DIFFERENT process count
    _, template = gw.init_state(gcfg, num_embeddings=num_emb, mesh=mesh)
    restored = Checkpointer(str(tmp_path / "mh" / "checkpoints")).restore(template)
    assert int(restored.step) == STEPS
    np.testing.assert_allclose(
        np.asarray(restored.params["token_embedding"]["embedding"]),
        np.asarray(result.state.params["token_embedding"]["embedding"]),
        rtol=1e-5, atol=1e-7)


def test_process_local_files_partition(monkeypatch):
    from esrecsys_tpu.core import mesh as mesh_lib

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    files = [f"f{i}" for i in range(8)]
    seen = []
    for p in range(3):
        monkeypatch.setattr(jax, "process_index", lambda p=p: p)
        seen.append(mesh_lib.process_local_files(files))
    # disjoint cover of the sorted list
    flat = sorted(f for part in seen for f in part)
    assert flat == sorted(files)
    # starvation guard: fewer files than processes -> fall back to all
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert mesh_lib.process_local_files(["only1", "only2"]) == ["only1", "only2"]


def test_two_process_model_sharded_export(tmp_path):
    """Model-sharded tables spanning BOTH processes: training runs, and the
    final artifact export process_allgathers the non-addressable shards
    (train/export.py _host_value) instead of crashing at device_get."""
    pattern, dict_path = _write_corpus(tmp_path)
    cfg = _cfg(tmp_path, pattern, dict_path, "mh2")
    cfg["n_model_shards"] = 2
    cfg["steps_per_epoch"] = 4

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             REPO, json.dumps(cfg)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    from esrecsys_tpu.train import latest_artifact, load_model

    art = latest_artifact(str(tmp_path / "mh2"), "glove")
    assert art is not None
    params, _, meta = load_model(art)
    table = params["token_embedding"]["embedding"]
    assert table.shape[0] % 128 == 0 and np.isfinite(table).all()
    assert meta["step"] == 4


def test_make_mesh_for_batch_refuses_to_drop_hosts(monkeypatch):
    from esrecsys_tpu.core import mesh as mesh_lib

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="divisible"):
        mesh_lib.make_mesh_for_batch(4)  # gcd(8,4)=4 < 8 devices


def test_partial_coordinates_raise(monkeypatch):
    from esrecsys_tpu.core import mesh as mesh_lib

    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    with pytest.raises(ValueError, match="partial multi-host coordinates"):
        mesh_lib.distributed_init_if_needed()
