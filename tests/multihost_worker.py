"""Subprocess worker for the 2-process multi-host test (test_multihost.py).

Runs the REAL glove workload entry (`glove.train`) under
`jax.distributed` with CPU devices: multi-process init comes from the
JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID env vars
(exercising `distributed_init_if_needed`'s env path), input files are
sharded per process by the pipelines, and `fit` assembles global batches
with `jax.make_array_from_process_local_data`.

Not a test module — invoked by tests/test_multihost.py.
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
    print("PROC", jax.process_index(), "of", jax.process_count(), flush=True)
    print("FINAL", json.dumps({
        "train_loss": result.last_train_metrics.get("train_loss"),
        "eval_loss": result.last_eval_metrics.get("eval_loss"),
        "steps": result.steps_run,
    }), flush=True)
