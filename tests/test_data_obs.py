"""Data persistence (utils/data.py) + observability (obs/metrics.py) tests —
the reference's util/Data.py schema and play.py memmap protocol."""

import numpy as np
import pytest

from tetris_mcts_tpu.obs.metrics import (
    MetricsReader, MetricsWriter, StatusPublisher, StatusReader,
)
from tetris_mcts_tpu.utils.data import (
    DataLoader, DataSaver, LossLoader, LossSaver, STATE_SCHEMA,
)


def _rows(n, ep0=0):
    rng = np.random.RandomState(ep0)
    return dict(
        episode=np.arange(ep0, ep0 + n), board=rng.randint(-1, 2, (n, 20, 10)),
        policy=np.full((n, 7), 1 / 7), action=rng.randint(0, 7, n),
        combo=np.zeros(n), lines=np.arange(n),
        line_stats=np.zeros((n, 4)), score=np.arange(n) * 100,
        child_stats=rng.rand(n, 3, 7), value=rng.rand(n),
        variance=rng.rand(n) + 1,
    )


def test_saver_loader_roundtrip(tmp_path):
    s = DataSaver(str(tmp_path), "data", cycle=3)
    r1, r2 = _rows(5), _rows(4, ep0=5)
    s.add_batch(**r1)
    s.add_batch(**r2)
    assert len(s) == 9
    s.close()

    ld = DataLoader(str(tmp_path / "data3.h5"))
    assert len(ld) == 9
    np.testing.assert_array_equal(ld.episode, np.arange(9))
    np.testing.assert_array_equal(
        ld.board, np.concatenate([r1["board"], r2["board"]]).astype(np.int8)
    )
    assert (ld.cycle == 3).all()
    for k in STATE_SCHEMA:
        assert len(getattr(ld, k)) == 9


def test_loader_concatenates_files(tmp_path):
    for c in (0, 1):
        s = DataSaver(str(tmp_path), "data", cycle=c)
        s.add_batch(**_rows(3, ep0=3 * c))
        s.close()
    ld = DataLoader(str(tmp_path / "data*.h5"))
    assert len(ld) == 6
    assert set(ld.cycle.tolist()) == {0, 1}


def test_loss_saver(tmp_path):
    s = LossSaver(str(tmp_path), cycle=1)
    s.add_history([(100, 2.0, 2.1, 0.1), (200, 1.5, 1.6, 0.1)])
    s.close()
    ld = LossLoader(str(tmp_path / "loss1.h5"))
    assert ld.n == 2
    np.testing.assert_allclose(ld.loss_val, [2.1, 1.6], rtol=1e-6)


def test_metrics_roundtrip(tmp_path):
    path = str(tmp_path / "m.jsonl")
    w = MetricsWriter(path)
    w.write("episode", n=1, lines=5, score=300)
    w.write("train_session", n=1, rows=128)
    r = MetricsReader(path)
    new = r.poll()
    assert len(new) == 2
    w.write("episode", n=2, lines=7, score=500)
    assert len(r.poll()) == 1
    assert [e["n"] for e in r.of_kind("episode")] == [1, 2]
    w.close()


def test_status_memmaps(tmp_path):
    pub = StatusPublisher(str(tmp_path), batch=4)
    board = np.zeros((20, 10), np.int8)
    board[19, :3] = 1
    pub.publish(board, [0, 1, 0, 2], [10, 20, 30, 40], [0, 1, 2, 3],
                np.zeros((4, 4)))
    rd = StatusReader(str(tmp_path), batch=4).read()
    np.testing.assert_array_equal(rd["board"], board)
    np.testing.assert_array_equal(rd["score"], [10, 20, 30, 40])
    assert StatusReader(str(tmp_path / "nope"), batch=4).read() is None


def test_dashboard_state_snapshot(tmp_path):
    from tetris_mcts_tpu.obs.dashboard import DashboardState

    path = str(tmp_path / "m.jsonl")
    w = MetricsWriter(path)
    w.write("episode", n=1, lines=3, score=300)
    w.write("train_session", n=1, rows=64, loss_train=1.5, loss_val=1.2)
    w.write("episode", n=2, lines=5, score=700)
    w.write("throughput", moves=50, moves_per_s=5.0, sims_per_s=128000.0)
    w.close()

    state = DashboardState(path)
    snap = state.snapshot()
    assert [e["lines"] for e in snap["episodes"]] == [3, 5]
    assert snap["trains"][0]["loss_val"] == 1.2
    assert snap["board"] is None  # no status dir configured
    assert snap["tp"] == [128000.0]

    # incremental: events appended after the first poll show up in the next
    w = MetricsWriter(path)
    w.write("episode", n=3, lines=7, score=900)
    w.close()
    snap2 = state.snapshot()
    assert [e["lines"] for e in snap2["episodes"]] == [3, 5, 7]


def test_dashboard_weight_histograms(tmp_path):
    """The checkpoint-watching weight-histogram panel (reference
    web/parseLog.py ModelParser + web_dash.py histograms): one histogram per
    kernel leaf, re-parsed when the checkpoint mtime advances."""
    import os

    from tetris_mcts_tpu.obs.dashboard import DashboardState, weight_histograms
    from tetris_mcts_tpu.train.trainer import VVModel

    ckpt = str(tmp_path / "model.msgpack")
    model = VVModel(checkpoint_path=ckpt)
    model.save()

    hists = weight_histograms(ckpt)
    assert len(hists) >= 4  # 3 convs + FC + heads
    import jax

    n_kernel = sum(
        leaf.size for path, leaf in
        __import__("flax").traverse_util.flatten_dict(
            jax.tree.map(lambda x: x, model.params)).items()
        if path[-1] == "kernel"
    )
    assert sum(sum(h["counts"]) for h in hists) == n_kernel
    assert all(h["lo"] <= h["hi"] for h in hists)

    path = str(tmp_path / "m.jsonl")
    MetricsWriter(path).close()
    state = DashboardState(path, checkpoint=ckpt)
    snap = state.snapshot()
    assert len(snap["weights"]) == len(hists)
    # unchanged file → cached; touched file → re-parsed
    mtime = state._ckpt_mtime
    state.snapshot()
    assert state._ckpt_mtime == mtime
    os.utime(ckpt, (mtime + 10, mtime + 10))
    state.snapshot()
    assert state._ckpt_mtime > mtime


def test_dashboard_train_session_grad_norm(tmp_path):
    from tetris_mcts_tpu.obs.dashboard import DashboardState

    path = str(tmp_path / "m.jsonl")
    w = MetricsWriter(path)
    w.write("train_session", n=1, rows=64, loss_train=1.5, loss_val=1.2,
            grad_norm=0.7)
    w.close()
    snap = DashboardState(path).snapshot()
    assert snap["trains"][0]["grad_norm"] == 0.7


def test_loader_offsets_episode_ids_across_files(tmp_path):
    """Per-file episode ids restart at 0; the loader must offset them so MC
    targets and episodic validation never merge two files' distinct games."""
    for c in (0, 1):
        s = DataSaver(str(tmp_path), "data", cycle=c)
        s.add_batch(**_rows(3, ep0=0))  # both files use ids 0..2
        s.close()
    ld = DataLoader(str(tmp_path / "data*.h5"))
    assert len(np.unique(ld.episode)) == 6
    assert set(ld.episode[:3]).isdisjoint(set(ld.episode[3:]))


def test_metrics_writer_sanitizes_non_finite(tmp_path):
    """NaN/Inf would serialize to invalid-JSON bare tokens and blank every
    downstream reader (the dashboard in particular) — stored as null."""
    import json

    path = str(tmp_path / "m.jsonl")
    w = MetricsWriter(path)
    w.write("train_session", loss_train=float("nan"),
            loss_val=float("inf"), n=3)
    w.close()
    rec = json.loads(open(path).read())   # strict parse must succeed
    assert rec["loss_train"] is None and rec["loss_val"] is None
    assert rec["n"] == 3
