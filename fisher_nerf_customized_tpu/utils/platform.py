"""Backend platform pinning that cannot hang on a dead TPU tunnel.

`FNC_PLATFORM=cpu|tpu` (+ optional `FNC_HOST_DEVICES=N` virtual CPU
devices) pins the JAX platform via `jax.config` BEFORE any backend
initializes.  The `JAX_PLATFORMS` env var is NOT equivalent in this
container: its sitecustomize force-registers the axon TPU plugin, and
with only the env var set the plugin is still probed during backend
discovery — which blocks indefinitely when the TPU tunnel is
unreachable.  The config route skips the probe (same recipe as
tests/conftest.py).

Call `pin_platform_from_env()` first thing in every CLI entry point.

`arm_startup_watchdog()` covers the other failure mode observed on the
tunnel: a per-process wedge AT startup (the plugin's first RPC never
completes — poll-blocked stream thread, futex-blocked main, zero CPU
forever).  A supervisor cannot tell that apart from a slow compile
except by CPU-stall heuristics; the watchdog turns it into a fast,
unambiguous exit code so restart loops recycle in seconds.  (Failure-
detection subsystem; analog of the reference's cluster_manager.py:7-65
preemption handling, which also converts hangs into requeue-able
exits.)
"""
from __future__ import annotations

import os
import sys
import threading

# exit code for "device init wedged" — distinct from OS/signal codes so
# babysitter loops can branch on it
WEDGE_EXIT_CODE = 86


def arm_startup_watchdog(timeout_s: float | None = None):
    """Exit the process with WEDGE_EXIT_CODE if the caller has not
    confirmed first device contact within `timeout_s`.

    Returns an Event; the caller `.set()`s it right after its first
    successful device operation.  Enabled only when `timeout_s` is
    given or `FNC_STARTUP_WATCHDOG_S` is set (opt-in: interactive runs
    should block, not die).  The watchdog thread touches no JAX state —
    a wedged backend would block it too.
    """
    if timeout_s is None:
        env = os.environ.get("FNC_STARTUP_WATCHDOG_S")
        if not env:
            return threading.Event()  # disarmed; .set() is a no-op
        timeout_s = float(env)
    done = threading.Event()

    def _watch():
        if not done.wait(timeout_s):
            sys.stderr.write(
                f"[startup-watchdog] no device contact in {timeout_s:.0f}s "
                f"— tunnel wedge, exiting {WEDGE_EXIT_CODE}\n")
            sys.stderr.flush()
            os._exit(WEDGE_EXIT_CODE)

    threading.Thread(target=_watch, daemon=True,
                     name="startup-watchdog").start()
    return done


def startup_probe() -> None:
    """First device contact under the startup watchdog.

    No-op unless `FNC_STARTUP_WATCHDOG_S` is set.  Forces backend init
    with a trivial device op on the calling (main) thread while the
    watchdog thread counts down; a wedged tunnel turns into
    exit(WEDGE_EXIT_CODE) instead of an indefinite futex wait.
    """
    if not os.environ.get("FNC_STARTUP_WATCHDOG_S"):
        return
    done = arm_startup_watchdog()
    import jax.numpy as jnp
    jnp.zeros(()).block_until_ready()
    done.set()


class ProgressWatchdog:
    """Heartbeat watchdog for long episodes: the step loop (and the eval
    chunk loop) call `beat()`; if no beat lands within the timeout the
    process exits WEDGE_EXIT_CODE.  Catches mid-run tunnel wedges at the
    exact blocked op in ~timeout seconds, where the supervisor's
    frozen-rchar heuristic needs several 40 s polls and cannot tell a
    wedge from a long remote compile.  Opt-in via FNC_STEP_WATCHDOG_S
    (disarmed: beat() is free).  Resumable runners (run_config4.sh /
    run_with_watchdog.sh) restart from the last checkpoint."""

    _armed = None

    def __init__(self, timeout_s: float):
        import time
        self.timeout_s = float(timeout_s)
        self._time = time.monotonic
        self._last = self._time()
        self._tag = "armed"
        t = threading.Thread(target=self._watch, daemon=True,
                             name="step-watchdog")
        t.start()

    def _watch(self):
        import time as _t
        while True:
            _t.sleep(min(10.0, self.timeout_s / 3))
            age = self._time() - self._last
            if age > self.timeout_s:
                sys.stderr.write(
                    f"[step-watchdog] no progress beat in {age:.0f}s "
                    f"(limit {self.timeout_s:.0f}s; last beat: "
                    f"{self._tag}) — tunnel wedge, "
                    f"exiting {WEDGE_EXIT_CODE}\n")
                sys.stderr.flush()
                os._exit(WEDGE_EXIT_CODE)

    def beat(self, tag: str = ""):
        self._last = self._time()
        if tag:
            self._tag = tag


def progress_beat(tag: str = ""):
    """Heartbeat hook: arms the singleton on first call when
    FNC_STEP_WATCHDOG_S is set; no-op otherwise.  `tag` names the call
    site so a watchdog exit reports the last phase that made progress."""
    wd = ProgressWatchdog._armed
    if wd is None:
        env = os.environ.get("FNC_STEP_WATCHDOG_S")
        if not env:
            ProgressWatchdog._armed = False
            return
        wd = ProgressWatchdog._armed = ProgressWatchdog(float(env))
    elif wd is False:
        return
    wd.beat(tag)


def pin_platform_from_env() -> str | None:
    """Apply FNC_PLATFORM/FNC_HOST_DEVICES if set; returns the platform
    pinned (or None).  Must run before any JAX backend initializes.
    Also performs the (opt-in) watchdog-guarded startup probe."""
    plat = os.environ.get("FNC_PLATFORM")
    if plat:
        n = os.environ.get("FNC_HOST_DEVICES")
        if n and "xla_force_host_platform_device_count" not in \
                os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={int(n)}").strip()
        import jax
        jax.config.update("jax_platforms", plat)
    startup_probe()
    return plat or None
