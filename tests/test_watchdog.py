"""Stall-watchdog tests (VERDICT r2 item 2): a hang must produce a distinct
exit (so a supervisor retries) within timeout+epsilon, while beats, grace
windows, and real driver moves keep it quiet."""

import subprocess
import sys
import threading
import time

from tetris_mcts_tpu.runtime import watchdog


def _make(stall, startup=None, **kw):
    fired = threading.Event()
    wd = watchdog.StallWatchdog(
        stall_timeout=stall, startup_timeout=startup or stall,
        on_stall=fired.set, poll_s=0.05, log=lambda s: None, **kw
    ).start()
    return wd, fired


def test_fires_on_stall():
    wd, fired = _make(0.2)
    assert fired.wait(2.0)
    assert wd.fired


def test_beats_keep_it_quiet_then_stall_fires():
    wd, fired = _make(0.4)
    for _ in range(8):
        wd.beat()
        time.sleep(0.1)
    assert not fired.is_set()  # 0.8s elapsed but never >0.4s between beats
    assert fired.wait(2.0)     # stop beating -> fires


def test_startup_allowance_exceeds_stall_timeout():
    wd, fired = _make(0.2, startup=1.0)
    time.sleep(0.5)            # would have fired under stall_timeout
    assert not fired.is_set()
    wd.beat()                  # startup over; stall_timeout now governs
    assert fired.wait(2.0)


def test_grace_rearms_a_long_window():
    wd, fired = _make(0.2, startup=1.0)
    wd.beat()
    time.sleep(0.1)
    wd.grace()                 # "compile starting" — allow startup_timeout
    time.sleep(0.5)
    assert not fired.is_set()
    assert fired.wait(2.0)     # grace is one-shot per window


def test_wrapped_log_beats():
    wd, fired = _make(0.3)
    log_lines = []
    log = wd.wrap_log(log_lines.append)
    for _ in range(6):
        log("progress")
        time.sleep(0.1)
    assert not fired.is_set()
    assert log_lines == ["progress"] * 6
    wd.stop()


def test_stop_disarms():
    wd, fired = _make(0.2)
    wd.stop()
    assert not fired.wait(0.6)


_HANG_SCRIPT = """
import sys, time
sys.path.insert(0, {repo!r})
from tetris_mcts_tpu.runtime import watchdog
watchdog.install(watchdog.StallWatchdog(
    stall_timeout=1.0, poll_s=0.1, log=lambda s: print(s, file=sys.stderr),
)).start()
print("armed", flush=True)
time.sleep(60)   # the injected hang (stands in for a wedged device call)
print("never reached", flush=True)
"""


def test_injected_hang_exits_process_with_code_86():
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", _HANG_SCRIPT.format(repo=repo)],
        capture_output=True, text=True, timeout=30,
    )
    assert proc.returncode == watchdog.EXIT_CODE == 86
    assert time.time() - t0 < 20  # timeout(1.0)+poll+interp startup, not 60
    assert "STALL WATCHDOG" in proc.stderr
    assert "never reached" not in proc.stdout


def test_driver_moves_beat_installed_watchdog():
    from tests.test_selfplay import tiny_cfg
    from tetris_mcts_tpu.runtime.selfplay import SelfPlayDriver

    wd = watchdog.StallWatchdog(
        stall_timeout=3600, on_stall=lambda: None, log=lambda s: None)
    watchdog.install(wd)  # never started: we only check the wiring
    try:
        d = SelfPlayDriver(tiny_cfg(), log=lambda s: None)
        assert d._watchdog is wd
        before = wd._last
        time.sleep(0.01)
        d.step()
        assert wd._last > before  # _after_move beat
    finally:
        watchdog.install(None)


def test_tunnel_silence_fires_inside_grace(monkeypatch):
    # An init/compile wedge hides under the long startup allowance, but the
    # tunnel socket is gone — once armed by seeing traffic, a sustained
    # zero-connection streak must fire early (round-3 live incident: a 7-min
    # init wedge would otherwise sit out the full 3600s grace).
    samples = iter([1, 1] + [0] * 1000)  # healthy briefly, then gone
    monkeypatch.setattr(watchdog, "_tunnel_conns", lambda: next(samples))
    fired = threading.Event()
    wd = watchdog.StallWatchdog(
        stall_timeout=60, startup_timeout=60, tunnel_stall=0.2,
        on_stall=fired.set, poll_s=0.05, log=lambda s: None,
    ).start()
    assert fired.wait(5.0)
    assert wd.fired


def test_tunnel_never_seen_stays_quiet(monkeypatch):
    # CPU-only runs never talk to the tunnel: zero connections must NOT arm
    # the early-fire path; only the ordinary allowance applies.
    monkeypatch.setattr(watchdog, "_tunnel_conns", lambda: 0)
    fired = threading.Event()
    wd = watchdog.StallWatchdog(
        stall_timeout=60, startup_timeout=60, tunnel_stall=0.1,
        on_stall=fired.set, poll_s=0.05, log=lambda s: None,
    ).start()
    assert not fired.wait(1.0)
    wd.stop()


def test_tunnel_beats_reset_zero_streak(monkeypatch):
    # beats resume -> the zero streak resets; no fire while progress flows
    monkeypatch.setattr(watchdog, "_tunnel_conns", lambda: 0)
    fired = threading.Event()
    wd = watchdog.StallWatchdog(
        stall_timeout=60, startup_timeout=60, tunnel_stall=0.15,
        on_stall=fired.set, poll_s=0.05, log=lambda s: None,
    ).start()
    wd._tunnel_seen = True  # pretend traffic was seen once
    for _ in range(10):
        wd.beat()
        time.sleep(0.05)
    assert not fired.is_set()  # gap never exceeded tunnel_stall
    assert fired.wait(5.0)     # stop beating -> zero streak accrues -> fire
