"""Structured metrics + realtime status publishing (L8).

The reference's observability protocol is stderr prints regex-parsed by
dashboards (`/root/reference/web/parseLog.py:58-163`) plus numpy memmaps for
the live board (`play.py:109-148` <-> `parseLog.py:31-38`). Here:

- `MetricsWriter`: append-only JSONL event stream (episodes, training
  sessions, node stats) — the machine-readable replacement for log-regex;
  `MetricsReader` replaces `web/parseLog.py`'s Parser.
- `StatusPublisher` / `StatusReader`: the same memmap handshake the reference
  uses, batched (board of game 0 plus per-game score/lines vectors) so
  existing-style dashboards can poll live state with zero coupling to the
  process.
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Optional

import numpy as np


def _next_run_id(path: str) -> int:
    """Monotone per-launch attempt id: one more than the max `run` already
    in the stream (1 for a fresh file). Makes relaunches of an appended-to
    stream unambiguous without report-side re-sequencing heuristics — the
    benchmark channel's `round` counter restarts per process, so raw
    consumers key on (run, round) instead (VERDICT r3 item 6)."""
    run = 0
    try:
        with open(path) as f:
            for line in f:
                i = line.find('"run": ')
                if i < 0:
                    continue
                tail = line[i + 7:]
                j = 0
                while j < len(tail) and tail[j].isdigit():
                    j += 1
                if j:
                    run = max(run, int(tail[:j]))
    except OSError:
        pass
    return run + 1


class MetricsWriter:
    """Append-only JSONL event log. Event kinds used by the framework:
    episode, train_session, train_eval, node_removal, benchmark. Every
    event carries `run`, a monotone per-launch attempt id (see
    `_next_run_id`)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.run = _next_run_id(path)
        self._f = open(path, "a", buffering=1)
        self.path = path

    def write(self, kind: str, **fields):
        rec = {"t": time.time(), "kind": kind, "run": self.run}
        # non-finite floats would serialize as bare NaN/Infinity tokens,
        # which are invalid JSON and break every downstream reader (the
        # dashboard's JSON response in particular) — store null instead
        for k, v in fields.items():
            if isinstance(v, float) and not math.isfinite(v):
                fields[k] = None
        rec.update(fields)
        self._f.write(json.dumps(rec, allow_nan=False) + "\n")

    def close(self):
        self._f.close()


class MetricsReader:
    """Incremental JSONL reader (the dashboards' Parser.check_update loop,
    `web/parseLog.py:48-57`, without the regexes)."""

    def __init__(self, path: str):
        self.path = path
        self._pos = 0
        self.events: list[dict] = []

    def poll(self) -> list[dict]:
        """Return newly appended events since the last poll."""
        if not os.path.exists(self.path):
            return []
        new = []
        with open(self.path) as f:
            f.seek(self._pos)
            for line in f:
                if not line.endswith("\n"):
                    break  # partial write; re-read next poll
                self._pos += len(line)
                try:
                    new.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
        self.events.extend(new)
        return new

    def of_kind(self, kind: str) -> list[dict]:
        return [e for e in self.events if e.get("kind") == kind]


_STATUS_FILES = {
    "board": ((20, 10), np.int8),
    "combo": (None, np.int32),   # (B,)
    "score": (None, np.int64),
    "lines": (None, np.int32),
    "line_stats": (None, np.int32),  # (B, 4)
}


class StatusPublisher:
    """Live-state memmaps (`play.py:109-114` protocol, batched)."""

    def __init__(self, tmp_dir: str = "./tmp", batch: int = 1):
        os.makedirs(tmp_dir, exist_ok=True)
        self.batch = batch
        self._m = {
            "board": np.memmap(os.path.join(tmp_dir, "board"), np.int8,
                               "w+", shape=(20, 10)),
            "combo": np.memmap(os.path.join(tmp_dir, "combo"), np.int32,
                               "w+", shape=(batch,)),
            "score": np.memmap(os.path.join(tmp_dir, "score"), np.int64,
                               "w+", shape=(batch,)),
            "lines": np.memmap(os.path.join(tmp_dir, "lines"), np.int32,
                               "w+", shape=(batch,)),
            "line_stats": np.memmap(os.path.join(tmp_dir, "line_stats"),
                                    np.int32, "w+", shape=(batch, 4)),
        }

    def publish(self, board0, combo, score, lines, line_stats):
        self._m["board"][:] = np.asarray(board0, np.int8)
        self._m["combo"][:] = np.asarray(combo, np.int32)
        self._m["score"][:] = np.asarray(score, np.int64)
        self._m["lines"][:] = np.asarray(lines, np.int32)
        self._m["line_stats"][:] = np.asarray(line_stats, np.int32)
        for m in self._m.values():
            m.flush()


class StatusReader:
    """Dashboard-side poller (`web/parseLog.py:31-38`)."""

    def __init__(self, tmp_dir: str = "./tmp", batch: int = 1):
        self.tmp_dir = tmp_dir
        self.batch = batch

    def read(self) -> Optional[dict]:
        try:
            return {
                "board": np.array(np.memmap(
                    os.path.join(self.tmp_dir, "board"), np.int8, "r",
                    shape=(20, 10))),
                "combo": np.array(np.memmap(
                    os.path.join(self.tmp_dir, "combo"), np.int32, "r",
                    shape=(self.batch,))),
                "score": np.array(np.memmap(
                    os.path.join(self.tmp_dir, "score"), np.int64, "r",
                    shape=(self.batch,))),
                "lines": np.array(np.memmap(
                    os.path.join(self.tmp_dir, "lines"), np.int32, "r",
                    shape=(self.batch,))),
                "line_stats": np.array(np.memmap(
                    os.path.join(self.tmp_dir, "line_stats"), np.int32, "r",
                    shape=(self.batch, 4))),
            }
        except (FileNotFoundError, ValueError):
            return None
