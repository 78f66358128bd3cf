import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrecsys_tpu.core import config as config_lib
from esrecsys_tpu.core import mesh as mesh_lib
from esrecsys_tpu.core import prng
from esrecsys_tpu.core.tracking import JsonlTracker, MemoryTracker


def test_mesh_shapes(mesh8):
    assert mesh8.shape[mesh_lib.DATA_AXIS] == 4
    assert mesh8.shape[mesh_lib.MODEL_AXIS] == 2
    assert mesh_lib.local_batch(32, mesh8) == 8


def test_mesh_bad_factorization():
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(n_data=3, n_model=2)


class _FakeDev:
    """Stand-in for a TPU device on a multi-slice topology."""

    def __init__(self, i, slice_index=None):
        self.id = i
        if slice_index is not None:
            self.slice_index = slice_index


def test_model_axis_slice_guard_warns_on_dcn_hazard(caplog):
    # model axis crossing slice boundaries -> per-step collectives on DCN
    # (measured 0.47-0.57 efficiency, parity_runs/r4_scaling_hlo.json)
    bad = np.array([[_FakeDev(0, 0), _FakeDev(1, 1)],
                    [_FakeDev(2, 0), _FakeDev(3, 1)]])
    with caplog.at_level("WARNING", logger="esrecsys_tpu.core.mesh"):
        assert mesh_lib.warn_if_model_axis_spans_slices(bad)
    assert any("DCN" in r.message for r in caplog.records)


def test_model_axis_slice_guard_silent_when_intra_slice(caplog):
    good = np.array([[_FakeDev(0, 0), _FakeDev(1, 0)],
                     [_FakeDev(2, 1), _FakeDev(3, 1)]])
    no_attr = np.array([[_FakeDev(0), _FakeDev(1)]])  # CPU: no slice_index
    with caplog.at_level("WARNING", logger="esrecsys_tpu.core.mesh"):
        assert not mesh_lib.warn_if_model_axis_spans_slices(good)
        assert not mesh_lib.warn_if_model_axis_spans_slices(no_attr)
    assert not caplog.records


def test_data_sharding_places_batch(mesh8):
    x = jnp.arange(32.0).reshape(8, 4)
    xs = jax.device_put(x, mesh_lib.data_sharding(mesh8, ndim=2))
    assert xs.sharding.spec == jax.sharding.PartitionSpec(mesh_lib.DATA_AXIS, None)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_round_up_rows(mesh8):
    assert mesh_lib.round_up_rows(7, mesh8) == 8
    assert mesh_lib.round_up_rows(8, mesh8) == 8
    assert mesh_lib.pad_to_multiple(129, 128) == 256


def test_prng_streams_distinct_and_reproducible():
    k = prng.base_key(0)
    a = prng.key_for_step(k, 5, tag=prng.STREAM_NEGATIVES)
    b = prng.key_for_step(k, 5, tag=prng.STREAM_SHUFFLE)
    a2 = prng.key_for_step(k, 5, tag=prng.STREAM_NEGATIVES)
    assert not np.array_equal(jax.random.key_data(a), jax.random.key_data(b))
    assert np.array_equal(jax.random.key_data(a), jax.random.key_data(a2))


def test_host_shuffle_is_permutation():
    perm = prng.host_shuffle(prng.base_key(1), 100)
    assert sorted(np.asarray(perm).tolist()) == list(range(100))


@dataclasses.dataclass(frozen=True)
class _Cfg:
    learning_rate: float = 1e-3
    steps: int = 100
    name: str = "x"
    use_bf16: bool = False


def test_config_cli_and_overrides(tmp_path):
    cfg = config_lib.from_cli(_Cfg, argv=["--learning_rate", "0.5", "--use_bf16", "true"])
    assert cfg.learning_rate == 0.5 and cfg.use_bf16 is True and cfg.steps == 100
    cfg2 = config_lib.with_overrides(cfg, {"steps": 7})
    assert cfg2.steps == 7 and cfg2.learning_rate == 0.5
    with pytest.raises(ValueError):
        config_lib.with_overrides(cfg, {"nope": 1})
    p = tmp_path / "cfg.json"
    config_lib.save(cfg2, str(p))
    assert config_lib.load(_Cfg, str(p)) == cfg2


def test_trackers(tmp_path):
    mt = MemoryTracker()
    mt.log({"loss": jnp.float32(2.0)}, step=3)
    assert mt.records[0][0] == 3
    jt = JsonlTracker(str(tmp_path / "run"), config={"lr": 0.1})
    jt.log({"loss": 1.5}, step=1)
    jt.log_artifact("/tmp/x", "model")
    jt.finish()
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 1 and '"loss": 1.5' in lines[0]


def test_axon_preflight_probe_modes(monkeypatch):
    from esrecsys_tpu import axon_preflight as ap

    # non-axon platform: never falls back
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert ap.cpu_fallback_note() is None
    # probe disabled by env knob
    monkeypatch.setenv("ESRECSYS_AXON_PROBE_TIMEOUT", "0")
    assert ap.device_responsive() is True
    # port-alive but device wedged -> fallback note (probe mocked dead)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("ESRECSYS_AXON_PROBE_TIMEOUT", "5")
    monkeypatch.setattr(ap, "relay_alive", lambda: True)
    monkeypatch.setattr(ap, "device_responsive", lambda: False)
    note = ap.cpu_fallback_note()
    assert note and "unresponsive" in note
    # dead ports -> the original note
    monkeypatch.setattr(ap, "relay_alive", lambda: False)
    assert "unreachable" in ap.cpu_fallback_note()


def test_axon_probe_success_cache(monkeypatch, tmp_path):
    """A recent probe SUCCESS short-circuits the subprocess (back-to-back
    tools shouldn't each pay a device attach); TTL=0 disables the cache,
    and failures are never cached."""
    import subprocess

    from esrecsys_tpu import axon_preflight as ap

    cache = tmp_path / "probe_ok"
    monkeypatch.setenv("ESRECSYS_AXON_PROBE_CACHE", str(cache))
    monkeypatch.setenv("ESRECSYS_AXON_PROBE_TIMEOUT", "5")

    def boom(*a, **k):
        raise AssertionError("subprocess probe ran despite fresh cache")

    # fresh cache file → True without spawning anything
    cache.touch()
    monkeypatch.setattr(subprocess, "run", boom)
    assert ap.device_responsive() is True
    # TTL=0 → cache ignored, probe runs (mocked to time out → False)
    monkeypatch.setenv("ESRECSYS_AXON_PROBE_TTL", "0")

    def timeout_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="x", timeout=5)

    monkeypatch.setattr(subprocess, "run", timeout_run)
    assert ap.device_responsive() is False
    # failure did not (re)write the cache: with TTL back on but the file
    # removed, a failing probe stays a failure
    monkeypatch.setenv("ESRECSYS_AXON_PROBE_TTL", "300")
    cache.unlink()
    assert ap.device_responsive() is False
    assert not cache.exists()
