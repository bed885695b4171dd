"""Self-play data persistence — the L6 capability of the reference
(`/root/reference/util/Data.py`), rebuilt on h5py (PyTables is not in this
environment; the schema and the chunked-append / concat-all-columns semantics
are preserved).

Reference `State` row (`util/Data.py:14-27`): episode, board(20,10), policy(7),
action, combo, lines, line_stats(4), score, child_stats(3,7), cycle, value,
variance. Reference `Loss` row (`util/Data.py:29-39`): per-validation training
state. `DataSaver.add` takes an agent-stats view + game observables per move;
`DataLoader` concatenates columns across files (`util/Data.py:135-183`).
"""

from __future__ import annotations

import glob
import os
from typing import Iterable, Mapping

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - h5py is present in this image
    h5py = None

STATE_SCHEMA = {
    "episode": ((), np.int32),
    "board": ((20, 10), np.int8),
    "policy": ((7,), np.float32),
    "action": ((), np.int32),
    "combo": ((), np.int32),
    "lines": ((), np.int32),
    "line_stats": ((4,), np.int32),
    "score": ((), np.int64),
    "child_stats": ((3, 7), np.float32),
    "cycle": ((), np.int32),
    "value": ((), np.float32),
    "variance": ((), np.float32),
}

LOSS_SCHEMA = {
    "cycle": ((), np.int32),
    "iteration": ((), np.int64),
    "loss_train": ((), np.float32),
    "loss_val": ((), np.float32),
    "loss_val_std": ((), np.float32),
    "grad_norm": ((), np.float32),
}


class _H5Appender:
    """Chunked-append writer over resizable h5py datasets (the reference's
    PyTables EArray flow, `util/Data.py:42-132`)."""

    def __init__(self, path: str, schema: Mapping, chunk_rows: int = 256):
        assert h5py is not None, "h5py unavailable"
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = h5py.File(path, "w")
        self._n = 0
        self._schema = dict(schema)
        for name, (shape, dtype) in self._schema.items():
            self._f.create_dataset(
                name, shape=(0,) + shape, maxshape=(None,) + shape,
                dtype=dtype, chunks=(chunk_rows,) + shape,
            )

    def append(self, rows: Mapping[str, np.ndarray]):
        """rows: column name -> (B, ...) arrays, equal leading length."""
        lengths = {k: len(np.asarray(v)) for k, v in rows.items()}
        n = next(iter(lengths.values()))
        assert all(v == n for v in lengths.values()), lengths
        for name, (shape, dtype) in self._schema.items():
            col = np.asarray(rows[name], dtype=dtype).reshape((n,) + shape)
            ds = self._f[name]
            ds.resize(self._n + n, axis=0)
            ds[self._n:self._n + n] = col
        self._n += n
        self._f.flush()

    def close(self):
        self._f.close()

    def __len__(self):
        return self._n


class DataSaver:
    """Per-move self-play rows (`DataSaver.add`, `util/Data.py:60-101`)."""

    def __init__(self, save_dir: str, filename: str = "data", cycle: int = 0):
        os.makedirs(save_dir, exist_ok=True)
        path = os.path.join(save_dir, f"{filename}{cycle}.h5")
        self.cycle = cycle
        self._w = _H5Appender(path, STATE_SCHEMA)
        self.path = path

    def add_batch(self, episode, board, policy, action, combo, lines,
                  line_stats, score, child_stats, value, variance):
        """Append B rows (one per in-flight game) for one batched move."""
        b = np.asarray(board)
        n = b.shape[0]
        self._w.append(dict(
            episode=episode, board=b, policy=policy, action=action,
            combo=combo, lines=lines, line_stats=line_stats, score=score,
            child_stats=child_stats,
            cycle=np.full(n, self.cycle, np.int32),
            value=value, variance=variance,
        ))

    def add(self, episode, game, agent_stats, action, value=0.0, variance=0.0):
        """Scalar-game convenience with the reference's signature shape:
        `game` must expose getState/combo/line_clears/line_stats/score."""
        stats = np.asarray(agent_stats, np.float32).reshape(3, 7)
        visits = stats[0]
        total = visits.sum()
        policy = visits / total if total > 0 else np.full(7, 1 / 7, np.float32)
        self.add_batch(
            episode=[episode], board=game.getState()[None],
            policy=policy[None], action=[action], combo=[game.combo],
            lines=[game.line_clears], line_stats=game.line_stats[None],
            score=[game.score], child_stats=stats[None],
            value=[value], variance=[variance],
        )

    def close(self):
        self._w.close()

    def __len__(self):
        return len(self._w)


class DataLoader:
    """Concat-all-columns loader over globbed files (`util/Data.py:135-183`).
    Exposes columns as attributes: loader.board, loader.value, ..."""

    def __init__(self, paths: Iterable[str] | str):
        if isinstance(paths, str):
            paths = sorted(glob.glob(paths))
        paths = list(paths)
        assert paths, "no data files"
        cols = {k: [] for k in STATE_SCHEMA}
        for p in paths:
            with h5py.File(p, "r") as f:
                for k in STATE_SCHEMA:
                    cols[k].append(np.asarray(f[k]))
        # episode ids restart at 0 in every file; offset per file so ids are
        # globally unique — MC targets and episodic validation key on them
        # (two files' "episode 5" are different games)
        base = 0
        for chunk in cols["episode"]:
            chunk += base
            if len(chunk):
                base = int(chunk.max()) + 1
        for k, chunks in cols.items():
            setattr(self, k, np.concatenate(chunks, axis=0))
        self.n = len(self.episode)

    def __len__(self):
        return self.n


class LossSaver:
    """Training-loss history (`LossSaver`, `util/Data.py:186-244`)."""

    def __init__(self, save_dir: str, filename: str = "loss", cycle: int = 0):
        os.makedirs(save_dir, exist_ok=True)
        self.cycle = cycle
        self.path = os.path.join(save_dir, f"{filename}{cycle}.h5")
        self._w = _H5Appender(self.path, LOSS_SCHEMA)

    def add(self, iteration, loss_train, loss_val, loss_val_std, grad_norm=0.0):
        self._w.append(dict(
            cycle=[self.cycle], iteration=[iteration],
            loss_train=[loss_train], loss_val=[loss_val],
            loss_val_std=[loss_val_std], grad_norm=[grad_norm],
        ))

    def add_history(self, history):
        """Append a `train_data` history list of (iter, train_loss,
        val_loss, val_std[, grad_norm]) rows — the VV trainer also records
        the mean gradient norm per validation window (`Loss.grad_norm`,
        util/Data.py:29-39)."""
        for row in history:
            self.add(row[0], row[1], row[2], row[3],
                     grad_norm=row[4] if len(row) > 4 else 0.0)

    def close(self):
        self._w.close()


class LossLoader:
    def __init__(self, paths: Iterable[str] | str):
        if isinstance(paths, str):
            paths = sorted(glob.glob(paths))
        paths = list(paths)
        assert paths, "no loss files"
        cols = {k: [] for k in LOSS_SCHEMA}
        for p in paths:
            with h5py.File(p, "r") as f:
                for k in LOSS_SCHEMA:
                    cols[k].append(np.asarray(f[k]))
        for k, chunks in cols.items():
            setattr(self, k, np.concatenate(chunks, axis=0))
        self.n = len(self.cycle)
