"""End-to-end online self-play driver tests (tiny configs, CPU mesh).

Covers the reference's main-loop capabilities (play.py:118-177 +
ValueSim online training, SURVEY.md §3.1-3.2): moves advance batched games,
episodes finish and are tracked, harvested tuples land in replay, the
growth-gated training trigger fires, and benchmark mode stores nothing.
"""

import numpy as np
import pytest

from tetris_mcts_tpu.runtime.selfplay import SelfPlayConfig, SelfPlayDriver
from tetris_mcts_tpu.train.trainer import VVModel


def tiny_cfg(**kw):
    base = dict(
        batch=4, sims=4, evaluator="lp",
        max_nodes=512, max_obs=512, table_size=1024, max_depth=32,
        min_visits_store=1, memory_size=2048, memory_growth=64,
        train_rows_trigger=64, train_batch=16,
        train_iters_per_val=5, train_max_iters=10,
        seed=3,
    )
    base.update(kw)
    return SelfPlayConfig(**base)


@pytest.fixture(scope="module")
def driver():
    d = SelfPlayDriver(tiny_cfg(), log=lambda s: None)
    d.run(30)
    return d


def test_moves_advance(driver):
    assert driver.moves == 30
    stats = driver.last_stats
    assert stats.action.shape == (4,)
    assert stats.probs.shape == (4, 7)
    assert stats.child_stats.shape == (4, 3, 7)
    acts = np.asarray(stats.action)
    assert ((acts >= 0) & (acts < 7)).all()


def test_replay_fills_and_training_fires(driver):
    # min_visits_store=1 + tiny trigger: after 30 moves with sims=4 some
    # trees must have been harvested (full or episode end) and a session run
    assert driver.total_rows > 0
    assert driver.n_trains >= 1
    assert len(driver.train_history) == driver.n_trains
    # training history rows: (iter, train_loss, val_loss, val_std, grad_norm)
    it, tr, va, vs, gn = driver.train_history[0][0]
    assert np.isfinite(tr) and np.isfinite(va)


def test_probs_are_distributions(driver):
    p = np.asarray(driver.last_stats.probs)
    assert (p >= 0).all()
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)


def test_same_seed_runs_are_bit_identical():
    """The repo invariant CLAUDE.md states as a manual procedure, automated:
    two drivers built from the same SelfPlayConfig must produce identical
    replay contents, episode counts, and training losses — this is what
    makes layout/optimization changes verifiable as numerically
    transparent."""
    runs = []
    for _ in range(2):
        d = SelfPlayDriver(tiny_cfg(), log=lambda s: None)
        d.run(18)
        runs.append(d)
    a, b = runs
    assert a.episodes == b.episodes and a.n_trains == b.n_trains
    assert int(a.replay.count) == int(b.replay.count)
    cnt = int(a.replay.count)
    np.testing.assert_array_equal(
        np.asarray(a.replay.boards)[:cnt], np.asarray(b.replay.boards)[:cnt]
    )
    np.testing.assert_array_equal(
        np.asarray(a.replay.value)[:cnt], np.asarray(b.replay.value)[:cnt]
    )
    for ha, hb in zip(a.train_history, b.train_history):
        np.testing.assert_array_equal(np.asarray(ha), np.asarray(hb))


def test_benchmark_mode_stores_nothing():
    d = SelfPlayDriver(tiny_cfg(benchmark=True), log=lambda s: None)
    d.run(12)
    assert int(d.replay.count) == 0
    assert d.n_trains == 0


def test_rollout_evaluator_runs():
    d = SelfPlayDriver(
        tiny_cfg(evaluator="rollout", benchmark=True), log=lambda s: None
    )
    d.run(3)
    assert d.moves == 3


def test_episodes_eventually_finish():
    # Random-ish early play on a 20x10 board dies within a few hundred moves;
    # use sims=2 to keep it fast and force weak play.
    d = SelfPlayDriver(
        tiny_cfg(sims=2, batch=8, benchmark=True), log=lambda s: None
    )
    d.run_episodes(1, max_moves=2000)
    assert d.episodes >= 1
    assert d.line_tracker.n == d.episodes


def test_throughput_reporting(monkeypatch):
    # SURVEY §5: the actor loop reports sims/s per chip. Shrink the window
    # so the event fires within a short benchmark run.
    monkeypatch.setattr(SelfPlayDriver, "_TP_REPORT_EVERY", 4)
    events = []
    logs = []

    class FakeMetrics:
        def write(self, kind, **kw):
            events.append((kind, kw))

    d = SelfPlayDriver(
        tiny_cfg(benchmark=True), log=logs.append, metrics=FakeMetrics()
    )
    d.run(9)
    tp = [kw for kind, kw in events if kind == "throughput"]
    assert len(tp) == 2  # windows of 4 moves at moves 4 and 8
    for kw in tp:
        assert kw["moves_per_s"] > 0
        # bench.py's definition: moves/s * batch * sims (both fields are
        # rounded independently — 1 decimal covers the tiny CPU rates here)
        np.testing.assert_allclose(
            kw["sims_per_s"], kw["moves_per_s"] * 4 * 4, atol=0.06
        )
    assert any(line.startswith("Throughput:") for line in logs)


def test_save_nodes(tmp_path, driver):
    import h5py

    path = str(tmp_path / "nodes.h5")
    driver.save_nodes(path, min_visits=1)
    with h5py.File(path) as f:
        n = len(f["value"])
        assert n > 0
        assert f["board"].shape == (n, 20, 10)
        assert (np.asarray(f["visit"]) >= 1).all()
        assert np.isfinite(np.asarray(f["value"])).all()


def test_select_kernel_off_plumbs_and_stores():
    # --select_kernel 0 (the fallback for pool shapes where the Pallas
    # selection kernel miscompiles on real TPUs) must reach TreeConfig and
    # still produce a working storing/training loop
    d = SelfPlayDriver(tiny_cfg(select_kernel=False), log=lambda s: None)
    assert d.search_cfg.tree.select_kernel is False
    d.run(30)
    assert int(d.replay.total) > 0


def test_zero_storage_warning_fires_within_one_generation():
    # A garbage-walk driver (min_visits unreachable) must warn within ONE
    # batch-generation of episodes, not 3x (VERDICT r2 item 5): at campaign
    # scale the old gate meant hours of silently broken search.
    logs = []
    d = SelfPlayDriver(
        tiny_cfg(min_visits_store=10_000, batch=2), log=logs.append
    )
    while d.episodes < d.cfg.batch and d.moves < 500:
        d.step()
    assert d.cfg.batch <= d.episodes <= 2 * d.cfg.batch
    assert int(d.replay.total) == 0
    assert any("ZERO rows" in line for line in logs)


def test_episode_reuse_keeps_tree_across_episodes():
    """--episode_reuse: finished lanes re-root into the same pool (reference
    update_root semantics, agent.py:296-301) — after several episodes the
    tree still holds far more nodes than one fresh episode could, and the
    root sits deep in the pool."""
    from tetris_mcts_tpu.runtime.selfplay import SelfPlayConfig, SelfPlayDriver

    cfg = SelfPlayConfig(
        batch=4, sims=8, max_nodes=2048, max_obs=2048, min_visits_store=2,
        memory_size=8192, acc_policy=3, train_batch=64, memory_growth=10**9,
        train_iters_per_val=2, train_max_iters=2, episode_reuse=True, seed=3,
    )
    d = SelfPlayDriver(cfg)
    for _ in range(400):
        d.step()
        if d.episodes >= 5:
            break
    assert d.episodes >= 5
    n_nodes = np.asarray(d.trees.n_nodes)
    roots = np.asarray(d.trees.root)
    # a per-episode-reset driver's pool restarts at ~1 + 7*sims each episode;
    # persistence accumulates hundreds of nodes and pushes roots deep
    assert (n_nodes > 300).all(), n_nodes
    assert (roots > 50).any(), roots
