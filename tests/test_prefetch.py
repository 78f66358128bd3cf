"""Host-side batch prefetch (data/prefetch.py + fit wiring)."""

import threading
import time

import numpy as np
import pytest

from esrecsys_tpu.data.prefetch import prefetched


def test_order_preserved_and_exhaustion():
    out = list(prefetched(iter(range(100)), depth=4))
    assert out == list(range(100))


def test_exceptions_propagate():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetched(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_producer_runs_ahead():
    produced = []

    def slow_consumer_source():
        for i in range(10):
            produced.append(i)
            yield i

    it = prefetched(slow_consumer_source(), depth=4)
    first = next(it)
    time.sleep(0.2)  # give the producer time to fill the queue
    assert first == 0
    assert len(produced) >= 5  # ran ahead of the single consume


def test_depth_zero_is_identity():
    src = iter([1, 2, 3])
    assert prefetched(src, depth=0) is src


def test_fit_with_prefetch_trains(tmp_path):
    import jax.numpy as jnp

    from esrecsys_tpu.train import fit
    from esrecsys_tpu.workloads import glove as gw

    cfg = gw.GloveConfig(feature_size=4, batch_size=8, steps_per_call=4)
    model, state = gw.init_state(cfg, num_embeddings=16, mesh=None)

    def batches():
        t = np.asarray([1, 2, 3, 4, 5, 6, 7, 8], np.int32)
        while True:
            yield (t, t), np.ones(8, np.float32)

    res = fit(state, gw.make_train_step(model), batches(), num_steps=8,
              steps_per_call=4, prefetch=2)
    assert res.steps_run == 8 and int(res.state.step) == 8


def test_fit_spc_not_dividing_num_steps_lands_exactly(tmp_path):
    """steps_per_call that doesn't divide num_steps must not overshoot:
    fit runs full-size calls then one tail chunk (150 = 2x64 + 22), keeping
    the amortization instead of collapsing to a small divisor (regression
    for the spc=64 default overshooting short runs; r3 review finding)."""
    from esrecsys_tpu.train import fit
    from esrecsys_tpu.workloads import glove as gw

    cfg = gw.GloveConfig(feature_size=4, batch_size=8)
    model, state = gw.init_state(cfg, num_embeddings=16, mesh=None)

    def batches():
        t = np.asarray([1, 2, 3, 4, 5, 6, 7, 8], np.int32)
        while True:
            yield (t, t), np.ones(8, np.float32)

    res = fit(state, gw.make_train_step(model), batches(), num_steps=150,
              steps_per_call=64)  # 64 ∤ 150 → largest divisor 50
    assert res.steps_run == 150 and int(res.state.step) == 150
