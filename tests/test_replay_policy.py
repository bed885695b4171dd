"""Replay accumulation & trimming parity (reference C++ OnlineMCTSAgent,
agents/cppmodule/agent.cpp:635-775): golden tests of the trim compactions
against NumPy transcriptions of the reference loops, plus tiny end-to-end
driver runs of each accumulation policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_mcts_tpu.search import mcts
from tetris_mcts_tpu.runtime.selfplay import SelfPlayConfig, SelfPlayDriver


def _filled_replay(count, cap=64, seed=0):
    rng = np.random.RandomState(seed)
    rep = mcts.init_replay(cap)
    boards = rng.randint(0, 2**20, (count, 20)).astype(np.uint32)
    value = rng.randn(count).astype(np.float32)
    var = rng.rand(count).astype(np.float32)
    weight = rng.randint(1, 40, count).astype(np.float32)
    rep = mcts.replay_add(
        rep, jnp.asarray(boards), jnp.asarray(value), jnp.asarray(var),
        jnp.asarray(weight), jnp.ones(count, bool),
    )
    return rep, boards, value, var, weight


def _logical(rep):
    """Stored rows oldest->newest, as numpy."""
    R = rep.boards.shape[0]
    cnt = int(rep.count)
    order = (np.arange(R) + int(rep.idx) - cnt) % R
    order = order[:cnt]
    return tuple(np.asarray(x)[order]
                 for x in (rep.boards, rep.value, rep.var, rep.weight))


def _np_weighted_trimming(weight, percentile):
    """NumPy transcription of agent.cpp:710-749: threshold = sorted
    weights[int(n*pct)]; drop rows with weight <= threshold, keep order."""
    n = len(weight)
    thr = np.sort(weight)[int(n * percentile)]
    return np.nonzero(weight > thr)[0]


class TestWeightedTrim:
    def test_golden_vs_numpy(self):
        rep, boards, value, var, weight = _filled_replay(64)
        trimmed, dropped = mcts.replay_trim_weighted(rep, 0.1)
        keep = _np_weighted_trimming(weight, 0.1)
        assert int(dropped) == 64 - len(keep)
        b, v, va, w = _logical(trimmed)
        np.testing.assert_array_equal(b, boards[keep])
        np.testing.assert_array_equal(v, value[keep])
        np.testing.assert_array_equal(va, var[keep])
        np.testing.assert_array_equal(w, weight[keep])

    def test_ties_drop_together(self):
        # the reference drops EVERY row <= threshold, so ties at the
        # percentile boundary can exceed the nominal fraction
        rep, *_ = _filled_replay(64, seed=1)
        rep = rep._replace(weight=jnp.full(64, 5.0))
        trimmed, dropped = mcts.replay_trim_weighted(rep, 0.1)
        assert int(dropped) == 64  # all tied at the threshold
        assert int(trimmed.count) == 0

    def test_partial_ring(self):
        rep, boards, value, var, weight = _filled_replay(40, cap=64, seed=2)
        trimmed, dropped = mcts.replay_trim_weighted(rep, 0.25)
        keep = np.nonzero(weight > np.sort(weight)[int(40 * 0.25)])[0]
        assert int(trimmed.count) == len(keep)
        b, _, _, w = _logical(trimmed)
        np.testing.assert_array_equal(w, weight[keep])
        np.testing.assert_array_equal(b, boards[keep])


class TestRandomTrim:
    def test_exact_count_and_order(self):
        rep, boards, value, var, weight = _filled_replay(64, seed=3)
        trimmed, dropped = mcts.replay_trim_random(
            rep, 0.25, jax.random.PRNGKey(0))
        assert int(dropped) == 16  # floor(64 * 0.25), agent.cpp:752
        b, v, va, w = _logical(trimmed)
        assert len(w) == 48
        # survivors are an order-preserving subsequence of the original
        pos = -1
        orig = weight.tolist()
        for x in w.tolist():
            pos = orig.index(x, pos + 1)

    def test_wrapped_ring(self):
        # overfill so the ring wraps: logical order must survive trimming
        cap = 32
        rep = mcts.init_replay(cap)
        w_all = np.arange(1, 49, dtype=np.float32)  # 48 rows into cap 32
        for i in range(48):
            rep = mcts.replay_add(
                rep, jnp.zeros((1, 20), jnp.uint32),
                jnp.asarray([float(i)]), jnp.asarray([0.5]),
                jnp.asarray([w_all[i]]), jnp.ones(1, bool),
            )
        _, _, _, w = _logical(rep)
        np.testing.assert_array_equal(w, w_all[16:])  # newest 32
        trimmed, dropped = mcts.replay_trim_random(
            rep, 0.5, jax.random.PRNGKey(1))
        assert int(dropped) == 16
        _, _, _, w2 = _logical(trimmed)
        assert set(w2.tolist()) <= set(w_all[16:].tolist())
        assert sorted(w2.tolist()) == sorted(w2.tolist())  # order kept


def test_replay_clear():
    rep, *_ = _filled_replay(64)
    cleared = mcts.replay_clear(rep)
    assert int(cleared.count) == 0 and int(cleared.idx) == 0
    assert int(cleared.total) == int(rep.total)  # monotone counters survive


# ---------------------------------------------------------------------------
# accumulation policies end-to-end (tiny CPU driver runs)
# ---------------------------------------------------------------------------

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


@pytest.mark.parametrize("policy", [0, 1, 2, 3])
def test_acc_policy_trains_and_clears(policy):
    """Each C++ accumulation policy fires a session and clears the memory
    afterwards (agent.cpp:698-704: train -> memory_index = 0)."""
    d = SelfPlayDriver(
        tiny_cfg(acc_policy=policy, episodes_per_train=1, memory_growth=32),
        log=lambda s: None,
    )
    d.run_episodes(3, max_moves=400)
    assert d.n_trains >= 1, f"policy {policy} never trained"
    # after the last session the ring was cleared; only rows harvested since
    # then remain
    assert d._mem_rows == int(d.replay.total) - d._prev_total + d._mem_rows
    assert int(d.replay.count) <= d._mem_rows + d.cfg.batch * 512


def test_acc_policy0_stochastic_drop_plumbing():
    """Policy 0's drop probability reaches the device ring and thins stores
    (agent.cpp:802). Forced to 0.9 by hand: candidate count must keep
    growing while stored rows lag far behind."""
    d = SelfPlayDriver(
        tiny_cfg(acc_policy=0, episodes_per_train=1000),
        log=lambda s: None,
    )
    d.replay = d.replay._replace(drop_prob=jnp.float32(0.9))
    d._drop_prob_host = 0.9
    d.run(40)
    cand = int(d.replay.cand)
    stored = int(d.replay.total)
    assert cand > 0
    assert stored < cand  # drops happened
    assert stored < 0.6 * cand  # well below the no-drop line at p=0.9


def test_acc_policy1_overflow_trims():
    """Policy 1 weighted-trims on overflow instead of training early."""
    d = SelfPlayDriver(
        tiny_cfg(acc_policy=1, episodes_per_train=10**6, memory_size=64,
                 train_batch=8),
        log=lambda s: None,
    )
    d.run(200)
    # memory must have overflowed and been trimmed back (never past capacity)
    assert d.trims >= 1
    assert d._mem_rows <= 64
    assert d.n_trains == 0  # the huge episode gate never opened


def test_benchmark_channel_fires():
    """The benchmark-game channel (reference cycle.sh:72) plays rounds of
    no-store games on the lazily built twin and emits `benchmark` events."""
    logs = []
    cfg = tiny_cfg(
        train_rows_trigger=10**9,
        benchmark_every=2, benchmark_games=2, benchmark_sims=8,
        benchmark_batch=2, benchmark_max_moves=200, benchmark_max_nodes=512,
    )
    d = SelfPlayDriver(cfg, log=logs.append)
    d.run_episodes(4, max_moves=400)
    assert d._bench_round >= 1
    assert d._bench is not None and d._bench.cfg.benchmark
    assert int(d._bench.replay.total) == 0  # benchmark stores nothing
    assert any(l.startswith("Benchmark round") for l in logs)


def test_capacity_misconfig_raises():
    """Pools too small for one move raise by default (VERDICT r1 item 7);
    allow_clamp opts into the degraded behavior."""
    with pytest.raises(ValueError, match="cannot hold one"):
        SelfPlayDriver(tiny_cfg(sims=200, max_nodes=256, max_obs=256),
                       log=lambda s: None)
    d = SelfPlayDriver(
        tiny_cfg(sims=200, max_nodes=256, max_obs=256, allow_clamp=True),
        log=lambda s: None,
    )
    assert d.search_cfg.allow_clamp


def test_fresh_clear_session_pads_up_instead_of_truncating(monkeypatch):
    """acc_policy >= 0 sessions clear the memory afterwards, so the pow2
    shape-bucketing must round UP (duplicate-padding the front) rather than
    silently dropping up to half the fresh rows untrained (round-5 fix)."""
    cfg = SelfPlayConfig(
        batch=4, sims=5, max_nodes=512, max_obs=512, min_visits_store=1,
        memory_size=4096, acc_policy=3, train_batch=64, memory_growth=100,
        train_iters_per_val=2, train_max_iters=4,
    )
    d = SelfPlayDriver(cfg)
    n = 1000  # -> floor 960 -> bucket 512; pad target 1024
    rep = d.replay
    rep = mcts.replay_add(
        rep, jnp.zeros((n, 20), jnp.uint32), jnp.linspace(0, 1, n),
        jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
    )
    d.replay = rep

    seen = {}
    orig = d._training_columns

    def spy(order):
        seen["order"] = np.asarray(order)
        return orig(order)

    monkeypatch.setattr(d, "_training_columns", spy)
    assert d._run_training_session(int(d.replay.count))
    order = seen["order"]
    assert order.shape[0] == 1024          # rounded UP to the next bucket
    assert len(np.unique(order)) == 960    # every usable fresh row included
    # the pad is a duplicate of the oldest usable rows, at the FRONT
    assert (order[:64] == order[64:128]).all()

    # sliding-window mode (-1) keeps the round-down bucketing
    cfg2 = cfg._replace(acc_policy=-1)
    d2 = SelfPlayDriver(cfg2)
    d2.replay = rep
    seen.clear()
    orig2 = d2._training_columns
    monkeypatch.setattr(
        d2, "_training_columns",
        lambda order: seen.__setitem__("order", np.asarray(order))
        or orig2(order))
    assert d2._run_training_session(int(d2.replay.count))
    assert seen["order"].shape[0] == 512
