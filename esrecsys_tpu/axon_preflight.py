"""Axon tunnel relay preflight (shared by bench.py and __graft_entry__.py).

With the relay process dead, the axon jax client blocks forever in its
claim/retry loop — ``jax.devices()`` hangs rather than fails — so any
driver-facing entry point must probe the relay's localhost ports BEFORE
first device use and fall back to CPU loudly if none accept. This module
is import-light (stdlib only): callers probe first, then import/configure
jax based on the answer.

The port list mirrors the relay's bound ports (/root/.tpu_init.py). It is
defined ONCE here so a port-layout change cannot leave one entry point
preflighting dead ports while the other hangs.
"""

from __future__ import annotations

import os
import socket

RELAY_PORTS = (8082, 8083, 8087, 8092, 8093, 8097,
               8102, 8103, 8107, 8112, 8113, 8117)


def relay_alive(timeout: float = 0.5) -> bool:
    """True if any axon relay port accepts a TCP connection."""
    for port in RELAY_PORTS:
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=timeout)
            s.close()
            return True
        except OSError:
            continue
    return False


def warn_cpu_fallback(logger=None) -> str | None:
    """CLI-entry-point preflight: probe the relay, fall back to CPU loudly.

    Call at the top of any ``main()`` that will touch jax devices. With the
    relay dead the axon client hangs forever in its claim loop (no error),
    so a CLI invoked against a dead tunnel would freeze with no output —
    this probes first, switches jax to CPU, and logs a WARNING so the run's
    platform is never ambiguous. Returns the note (or None if on TPU).
    """
    note = cpu_fallback_note()
    if note is not None:
        import logging

        (logger or logging.getLogger(__name__)).warning(
            "%s — running on CPU (throughput numbers are NOT chip numbers)",
            note)
    return note


def device_responsive(timeout: float | None = None) -> bool:
    """True if a SUBPROCESS completes a tiny op on the axon device in time.

    The port probe alone is insufficient: the local relay can accept TCP
    while the remote orchestrator/device is wedged (observed round 5 after
    a client was SIGTERM'd mid-DMA — claims then hang for ~an hour). The
    axon client blocks uninterruptibly in C++, so the only safe probe is a
    killable subprocess. Costs one extra device attach (~15-60 s) when
    healthy; override the wait with ESRECSYS_AXON_PROBE_TIMEOUT (seconds,
    0 disables the probe and trusts the port check). The default must
    comfortably exceed the worst healthy attach (~2 min cold, CLAUDE.md) —
    180 s false-positived once on a slow attach right after heavy runs.
    """
    if timeout is None:
        timeout = float(os.environ.get("ESRECSYS_AXON_PROBE_TIMEOUT", 420))
    if timeout <= 0:
        return True
    # Short-TTL success cache: back-to-back tool invocations (sweeps,
    # composed runs, the bench) should not each pay a full extra device
    # attach. Only SUCCESS is cached — a wedged device is always re-probed.
    cache = os.environ.get("ESRECSYS_AXON_PROBE_CACHE",
                           "/tmp/esrecsys_axon_probe_ok")
    ttl = float(os.environ.get("ESRECSYS_AXON_PROBE_TTL", 300))
    try:
        import time as _time

        if ttl > 0 and _time.time() - os.path.getmtime(cache) < ttl:
            return True
    except OSError:
        pass
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; "
            "print(float(jnp.ones((2, 2)).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True)
        ok = r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False
    if ok:
        try:
            with open(cache, "w"):
                pass
        except OSError:
            pass
    return ok


def cpu_fallback_note() -> str | None:
    """If the configured platform is axon but the relay is dead OR the
    device is unresponsive, configure jax for CPU and return a note;
    otherwise return None.

    Imports jax only when the axon platform is requested (the probes are
    stdlib-only). ``jax.config.update`` is required — assigning
    ``os.environ['JAX_PLATFORMS']`` after the pin is ignored (CLAUDE.md).
    """
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return None
    if relay_alive():
        if device_responsive():
            return None
        note = "cpu_fallback: axon relay up but device unresponsive"
    else:
        note = "cpu_fallback: axon relay unreachable"
    import jax

    jax.config.update("jax_platforms", "cpu")
    return note
