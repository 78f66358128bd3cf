"""Graceful preemption (train/preemption.py): SIGTERM => coordinated stop
at a dispatch boundary + checkpoint + clean exit + resume.

The reference's failure story is restart-from-last-cadenced-save
(train_shop_the_look.py:178-179; SURVEY.md §5 "failure detection") — an
eviction loses up to checkpoint_every steps. Here the eviction signal
itself produces a checkpoint, including in multi-process runs where only
ONE host receives it (the flag is agreed via all-gather so every process
saves the SAME step).
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from tests.test_multihost import REPO, TRIPLE_A, _cfg, _write_corpus


def _glove_setup(tmp_path, batch=16):
    from esrecsys_tpu.core import mesh as mesh_lib
    from esrecsys_tpu.workloads import glove as gw

    cfg = gw.GloveConfig(train_pattern="unused", feature_size=4,
                         batch_size=batch)
    mesh = mesh_lib.make_mesh(n_model=1)
    model, state = gw.init_state(cfg, num_embeddings=32, mesh=mesh)
    return gw, cfg, model, state, mesh


def test_fit_preempts_at_dispatch_boundary_and_checkpoints(tmp_path):
    from esrecsys_tpu.train import Checkpointer, PreemptionGuard, fit

    gw, cfg, model, state, mesh = _glove_setup(tmp_path)
    guard = PreemptionGuard()
    pulls = {"n": 0}

    def batches():
        t1 = np.full((16,), TRIPLE_A[0], np.int32)
        t2 = np.full((16,), TRIPLE_A[1], np.int32)
        ct = np.full((16,), TRIPLE_A[2], np.float32)
        while True:
            pulls["n"] += 1
            if pulls["n"] == 3:  # mid-run, between dispatches
                guard.request_stop()
            yield (t1, t2), ct

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    result = fit(state, gw.select_train_step(model, cfg), batches(),
                 num_steps=400, steps_per_call=4, log_every=400,
                 checkpointer=ckpt, checkpoint_every=0,
                 preemption=guard)
    assert result.preempted
    assert 0 < result.steps_run < 400
    assert result.steps_run % 4 == 0  # stopped at a dispatch boundary
    assert int(result.state.step) == result.steps_run
    # the stop itself produced a checkpoint (checkpoint_every is 0!)
    assert ckpt.latest_step() == result.steps_run

    # the relaunch path: restore and run to completion
    _, fresh = gw.init_state(cfg, num_embeddings=32, mesh=mesh)
    restored = ckpt.restore(fresh)
    done = fit(restored, gw.select_train_step(model, cfg), batches(),
               num_steps=result.steps_run + 8, steps_per_call=4,
               log_every=400, preemption=True)
    assert not done.preempted
    assert int(done.state.step) == result.steps_run + 8


def test_preemption_guard_outside_main_thread_degrades(tmp_path):
    """Entered off the main thread, the guard must not blow up — it warns
    and stays usable via request_stop()."""
    import threading

    from esrecsys_tpu.train import PreemptionGuard

    out = {}

    def run():
        with PreemptionGuard() as g:
            out["requested_before"] = g.requested
            g.request_stop()
            out["requested_after"] = g.requested

    t = threading.Thread(target=run)
    t.start()
    t.join(timeout=30)
    assert out == {"requested_before": False, "requested_after": True}


def _wait_for_progress(path, timeout_s=240):
    """Block until the worker's metrics.jsonl shows logged train steps."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if os.path.exists(path) and os.path.getsize(path) > 0:
            return
        time.sleep(0.5)
    raise AssertionError(f"no training progress at {path}")


def test_sigterm_checkpoints_and_resumes_single_process(tmp_path):
    """Real-signal drill: SIGTERM a training subprocess mid-run; it must
    exit 0 with a checkpoint, and a resume run must complete from it."""
    pattern, dict_path = _write_corpus(tmp_path)
    cfg = _cfg(tmp_path, pattern, dict_path, "pre")
    cfg.update(steps_per_epoch=50, num_epochs=100_000,
               checkpoint_every_epochs=1, steps_per_call=2)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "preempt_worker.py"),
         REPO, json.dumps(cfg)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        _wait_for_progress(os.path.join(cfg["work_dir"], "metrics.jsonl"))
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out[-3000:]
    line = [l for l in out.splitlines() if l.startswith("PREEMPTED")]
    assert line, out[-3000:]
    step = int(line[-1].split()[1])
    assert step > 0

    from esrecsys_tpu.train import Checkpointer

    ck = Checkpointer(os.path.join(cfg["work_dir"], "checkpoints"))
    assert ck.latest_step() == step

    # resume to a target a little past the preempted step — must COMPLETE
    cfg2 = dict(cfg)
    cfg2.update(num_epochs=step // 50 + 1, resume=True)
    done = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "preempt_worker.py"),
         REPO, json.dumps(cfg2)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=300)
    assert done.returncode == 0, done.stdout[-3000:]
    assert any(l.startswith("COMPLETED") for l in done.stdout.splitlines()), (
        done.stdout[-3000:])


def test_sigterm_one_of_two_processes_stops_both(tmp_path):
    """Multi-host agreement: only process 1 is signalled, but BOTH must
    stop at the SAME step (all-gathered flag) and exit 0 — the sharded
    Orbax save needs every process writing one consistent step."""
    pattern, dict_path = _write_corpus(tmp_path)
    cfg = _cfg(tmp_path, pattern, dict_path, "mh_pre")
    cfg.update(steps_per_epoch=50, num_epochs=100_000,
               checkpoint_every_epochs=1, steps_per_call=2)
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
            [sys.executable, os.path.join(REPO, "tests", "preempt_worker.py"),
             REPO, json.dumps(cfg)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    try:
        _wait_for_progress(os.path.join(cfg["work_dir"], "metrics.jsonl"))
        procs[1].send_signal(signal.SIGTERM)  # ONLY process 1
        outs = [p.communicate(timeout=300)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    steps = []
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("PREEMPTED")]
        assert line, out[-3000:]
        steps.append(int(line[-1].split()[1]))
    assert steps[0] == steps[1] > 0, steps
