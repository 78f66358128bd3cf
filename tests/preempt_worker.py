"""Subprocess worker for the graceful-preemption tests (test_preemption.py).

Runs the REAL glove workload entry (`glove.train`) on CPU with a step
budget far larger than the test's patience; the parent waits for training
to demonstrably progress (metrics.jsonl growing), sends SIGTERM, and
asserts a clean exit with a resumable checkpoint. Optionally runs under
`jax.distributed` (2-process form) via the same env-var path as
tests/multihost_worker.py — then only ONE process is signalled and the
cross-process agreement in train/preemption.py must stop BOTH at the same
step.

Not a test module — invoked by tests/test_preemption.py.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

if __name__ == "__main__":
    repo = sys.argv[1]
    if repo not in sys.path:
        sys.path.insert(0, repo)
    cfg_json = json.loads(sys.argv[2])

    from esrecsys_tpu.workloads import glove

    cfg = glove.GloveConfig(**cfg_json)
    result = glove.train(cfg)
    print("PREEMPTED" if result.preempted else "COMPLETED",
          int(jax.device_get(result.state.step)), flush=True)
