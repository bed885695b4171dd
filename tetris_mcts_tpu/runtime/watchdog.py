"""Stall watchdog for chip-bound runs (VERDICT r2 item 2).

The axon TPU tunnel WEDGES: a request's connection dies and the client
futex-waits forever inside a device call (CLAUDE.md "Environment gotchas";
round 2 lost an entire campaign attempt to one). A wedged process cannot
unblock itself — the blocked thread is inside the PJRT client, beyond any
Python-level timeout — so the recovery unit is the PROCESS: a monitor
thread watches a heartbeat the host loop touches on every move/log, and
when nothing advances for `stall_timeout` seconds it prints a diagnostic
(including a tunnel-socket snapshot, the `ss -tn` procedure from CLAUDE.md
automated) and hard-exits with a distinct code so the supervisor loop
(scripts/campaign2.sh) can relaunch from the last checkpoint. This is the
batched-driver analog of the per-cycle process boundary the reference gets
for free from cycle.sh (`/root/reference/cycle.sh:53-74` restarts play.py
every cycle, bounding any hang to one cycle).

Known long-but-legitimate silences are compiles (minutes through the
remote-compile tunnel): the heartbeat starts in a `grace` state that allows
`startup_timeout`, and every known compile point (first move, each new
training-bucket shape, the benchmark twin's first move) re-arms a one-shot
grace window via `grace()`.

`os._exit` (not sys.exit) because the wedged thread holds locks that would
deadlock interpreter teardown; the metrics JSONL is line-buffered and the
model is checkpointed after every training session, so a hard exit loses at
most the episodes since the last session.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time
from typing import Callable, Optional

EXIT_CODE = 86  # distinct from timeout(1)'s 124 and SIGTERM's 143

_active: Optional["StallWatchdog"] = None


def get_active() -> Optional["StallWatchdog"]:
    return _active


def install(wd: Optional["StallWatchdog"]):
    """Register the process-wide watchdog the self-play drivers beat."""
    global _active
    _active = wd
    return wd


# 0 (default) = count THIS process's established TCP connections — the
# axon tunnel is the only TCP socket the driver holds, and its local port
# CHANGES between rounds (8093 in rounds 2-4, 8092 in round 5), so a
# hard-coded port silently disarms the early-wedge check. A positive
# TMT_TUNNEL_PORT restores port-matching.
TUNNEL_PORT = int(os.environ.get("TMT_TUNNEL_PORT", "0"))


def _tunnel_conns() -> int:
    """Count of live tunnel connections — a wedged tunnel shows zero while
    a healthy run (including an in-flight remote compile) keeps a socket
    open (CLAUDE.md's `ss -tn` diagnosis, automated). -1 = unknown."""
    try:
        if TUNNEL_PORT > 0:
            out = subprocess.run(
                ["ss", "-tn"], capture_output=True, text=True, timeout=10
            ).stdout
            return sum(
                1 for ln in out.splitlines() if f":{TUNNEL_PORT}" in ln
            )
        out = subprocess.run(
            ["ss", "-tnp"], capture_output=True, text=True, timeout=10
        ).stdout
        tag = f"pid={os.getpid()},"
        return sum(
            1 for ln in out.splitlines()
            if tag in ln and "ESTAB" in ln
        )
    except Exception:  # noqa: BLE001 — diagnostics must never raise
        return -1


def _tunnel_snapshot() -> str:
    n = _tunnel_conns()
    if n < 0:
        return "(ss unavailable)"
    if TUNNEL_PORT > 0:
        return f"{n} connection(s) to :{TUNNEL_PORT}"
    return f"{n} established connection(s) held by this pid"


class StallWatchdog:
    """Monitor thread: hard-exit when the heartbeat stops advancing.

    beat()   — the host loop made progress (a move finished, a log line).
    grace(s) — a compile (or other known long silence) is starting: allow
               up to `s` seconds (default startup_timeout) until the NEXT
               beat, then fall back to stall_timeout.
    """

    def __init__(self, stall_timeout: float, startup_timeout: float = 0.0,
                 log: Callable[[str], None] = lambda s: print(
                     s, file=sys.stderr, flush=True),
                 on_stall: Optional[Callable[[], None]] = None,
                 poll_s: float = 5.0, tunnel_stall: float = 300.0):
        self.stall_timeout = float(stall_timeout)
        self.startup_timeout = float(startup_timeout or stall_timeout)
        self.log = log
        self.on_stall = on_stall
        self.poll_s = poll_s
        # Early wedge detection INSIDE grace windows: the long startup
        # allowance exists for healthy multi-minute compiles, but a healthy
        # compile keeps a tunnel socket open the whole time, while a wedge's
        # connection is gone (round 3 live capture: init wedged at 7 min in
        # with 0 sockets — the grace would have hidden it for an hour). The
        # check SELF-ARMS on first seeing tunnel traffic, so CPU-only runs
        # (no tunnel ever) are unaffected. 0 disables.
        self.tunnel_stall = float(tunnel_stall)
        self._tunnel_seen = False
        self._zero_since: Optional[float] = None  # start of an observed
        #                                           all-zero sampling streak
        self._lock = threading.Lock()
        self._last = time.monotonic()
        self._allow = self.startup_timeout  # first beat = end of startup
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.fired = False

    # ------------------------------------------------------------ heartbeat
    def beat(self):
        with self._lock:
            self._last = time.monotonic()
            self._allow = self.stall_timeout

    def grace(self, seconds: float = 0.0):
        with self._lock:
            self._last = time.monotonic()
            self._allow = max(seconds or self.startup_timeout,
                              self.stall_timeout)

    def wrap_log(self, log: Callable[[str], None]):
        """A log fn that beats: every episode/throughput/training-val line
        is proof the host loop is alive."""
        def beat_log(s):
            self.beat()
            log(s)
        return beat_log

    # -------------------------------------------------------------- monitor
    def start(self):
        self._thread = threading.Thread(
            target=self._run, name="stall-watchdog", daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()

    def _run(self):
        while not self._stop.wait(self.poll_s):
            now = time.monotonic()
            with self._lock:
                gap = now - self._last
                allow = self._allow
            reason = None
            if gap > allow:
                reason = f"no progress for {gap:.0f}s (limit {allow:.0f}s)"
            elif self.tunnel_stall and gap > self.tunnel_stall:
                # inside an allowance window but quiet: consult the tunnel.
                # Fire only after a SUSTAINED all-zero sampling streak (a
                # transient zero between reconnects must not kill a healthy
                # compile), and only once armed by ever seeing traffic (so
                # CPU-only runs, which never touch the tunnel, are immune).
                n = _tunnel_conns()
                if n > 0:
                    self._tunnel_seen = True
                    self._zero_since = None
                elif n == 0 and self._tunnel_seen:
                    if self._zero_since is None:
                        self._zero_since = now
                    elif now - self._zero_since > self.tunnel_stall:
                        reason = (
                            f"no progress for {gap:.0f}s AND no tunnel "
                            f"connection for {now - self._zero_since:.0f}s "
                            "of sampling (a healthy compile keeps a socket "
                            "open)"
                        )
            else:
                self._zero_since = None
            if reason is None:
                continue
            self.fired = True
            try:
                self.log(
                    f"STALL WATCHDOG: {reason} — assuming a wedged device "
                    f"call; tunnel sockets: {_tunnel_snapshot()}; "
                    f"exiting {EXIT_CODE} so the supervisor relaunches "
                    "from the last checkpoint"
                )
            except Exception:  # noqa: BLE001 — exit anyway
                pass
            if self.on_stall is not None:
                self.on_stall()
                return
            os._exit(EXIT_CODE)
