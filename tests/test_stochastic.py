"""ValueSim2 rebuild (`search/stochastic.py`) — stochastic-transition edge
statistics + `select_index_2` UCB (reference `agents/ValueSim2.py`,
`agents/core.py:94-219`).

Golden tests: the action-statistics math vs a NumPy transcription of
`_tmp_func`/`_tmp_select`; batched walks vs vmapped per-tree twins
(bit-exact); edge bookkeeping through real sims; driver + CLI smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_mcts_tpu.search import stochastic as S2
from tetris_mcts_tpu.search import tree as T
from tetris_mcts_tpu.search.mcts import SearchConfig
from tetris_mcts_tpu.search.tree import TreeConfig

CFG = TreeConfig(max_nodes=128, max_obs=128, table_size=256, max_depth=16)


def _np_tmp_select(edge_child, edge_count, edge_dscore, values, visits,
                   max_ret):
    """NumPy transcription of `_tmp_func` + `_tmp_select`
    (core.py:159-190), extended by the edge score delta (the rebuild's
    documented deviation; set edge_dscore=0 for the raw reference formula).
    Arrays are the (7, C) slices at one parent obs."""
    q = np.zeros(7)
    expl = np.zeros(7)
    n_a = np.zeros(7)
    distinct = np.zeros(7)
    vmax = 0.0
    for a in range(7):
        tot = 0.0
        for c in range(edge_child.shape[1]):
            o = edge_child[a, c]
            if o <= 0:
                continue
            cnt = edge_count[a, c]
            tot += cnt
            q[a] += cnt * (values[o] + edge_dscore[a, c])
            expl[a] += cnt * max_ret[o] / np.sqrt(max(visits[o], 1.0))
            distinct[a] += 1
            vmax = max(vmax, max_ret[o])
        n_a[a] = tot
        q[a] /= max(tot, 1.0)
        expl[a] /= max(tot, 1.0)
    p_new = (distinct + 0.5) / (n_a + 1.0)
    u = np.sqrt(np.log(max(n_a.sum(), 2.0))) * (
        p_new * vmax / np.sqrt(np.maximum(n_a, 1.0)) + (1 - p_new) * expl
    )
    return q, u, distinct == 0


def _hand_tree(seed=0):
    """A small S2Tree with hand-filled edge tables and obs stats."""
    from tetris_mcts_tpu.env import engine

    rng = np.random.RandomState(seed)
    envs = engine.reset(jnp.uint32(1), jnp.uint32(seed + 1))
    vt = S2.init_s2_tree(envs, CFG)
    M = CFG.max_obs
    values = rng.uniform(-5, 5, M).astype(np.float32)
    visits = rng.randint(0, 20, M).astype(np.float32)
    max_ret = rng.uniform(0, 10, M).astype(np.float32)
    ech = np.zeros((7, S2.EDGE_CAP, M), np.int32)
    ecn = np.zeros((7, S2.EDGE_CAP, M), np.float32)
    eds = np.zeros((7, S2.EDGE_CAP, M), np.float32)
    for o in range(1, 20):
        for a in range(7):
            k = rng.randint(0, 4)
            kids = rng.choice(np.arange(1, M), size=k, replace=False)
            ech[a, :k, o] = kids
            ecn[a, :k, o] = rng.randint(1, 9, k)
            eds[a, :k, o] = rng.uniform(0, 3, k)
    base = vt.base._replace(
        visits=jnp.asarray(visits), values=jnp.asarray(values)
    )
    return vt._replace(
        base=base, edge_child=jnp.asarray(ech), edge_count=jnp.asarray(ecn),
        edge_dscore=jnp.asarray(eds), max_ret=jnp.asarray(max_ret),
    ), (ech, ecn, eds, values, visits, max_ret)


def test_action_stats_match_reference_transcription():
    vt, (ech, ecn, eds, values, visits, max_ret) = _hand_tree()
    for o in (1, 5, 17):
        q, u, never = jax.jit(S2._action_stats)(vt, jnp.int32(o))
        qn, un, nn = _np_tmp_select(
            ech[:, :, o], ecn[:, :, o], eds[:, :, o], values, visits, max_ret
        )
        np.testing.assert_allclose(np.asarray(q), qn, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(u), un, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(never), nn)


def _sim_program(batch, sims, seed=0):
    from tetris_mcts_tpu.search import mcts as M

    cfg = SearchConfig(tree=CFG, sims=sims)
    vts, envs = S2.init_s2_batch(seed, batch, cfg)

    def apply_fn(params, ubound, imgs):
        n = imgs.shape[0]
        v = jnp.sum(imgs.reshape(n, -1), 1) * 0.01 + 1.0
        return v, jnp.ones(n)

    move = S2.make_s2_move_fn(apply_fn, cfg, store=False)
    replay = M.init_replay(64)
    return move, vts, envs, replay


def test_moves_accumulate_edge_statistics():
    move, vts, envs, replay = _sim_program(batch=3, sims=6)
    key = jax.random.PRNGKey(0)
    jmove = jax.jit(move)
    for _ in range(3):
        key, sub = jax.random.split(key)
        vts, envs, replay, stats = jmove(None, None, vts, envs, replay, sub)
    # sims deeper than one level record edges (the tree persists across
    # moves unless reset retired it)
    ecn = np.asarray(vts.edge_count)
    reset = np.asarray(stats.reset)
    for b in range(3):
        if reset[b]:  # tree was reinitialized after the move
            continue
        assert ecn[b].sum() > 0
    assert np.isfinite(np.asarray(stats.root_value)).all()
    # max_ret is monotone >= 0 and visits grew
    assert (np.asarray(vts.max_ret) >= 0).all()


def test_batched_walks_match_vmapped_per_tree():
    """select_batched / backup_batched vs vmapping the per-tree twins —
    bit-exact (the walks are deterministic)."""
    move, vts, envs, replay = _sim_program(batch=4, sims=5, seed=3)
    key = jax.random.PRNGKey(1)
    jmove = jax.jit(move)
    for _ in range(2):  # build real trees with edge stats
        key, sub = jax.random.split(key)
        vts, envs, replay, _ = jmove(None, None, vts, envs, replay, sub)

    tb, ab, lb = S2.select_batched(vts, CFG)
    tv, av, lv = jax.vmap(lambda t: S2.select(t, CFG))(vts)
    np.testing.assert_array_equal(np.asarray(lb), np.asarray(lv))
    D = CFG.max_depth
    lev = np.arange(D)[None, :] < np.asarray(lb)[:, None]
    np.testing.assert_array_equal(
        np.asarray(tb)[lev], np.asarray(tv)[lev]
    )
    np.testing.assert_array_equal(
        np.asarray(ab)[lev], np.asarray(av)[lev]
    )

    vals = jnp.asarray(np.random.RandomState(0).uniform(0, 9, 4), jnp.float32)
    outb = S2.backup_batched(vts, tb, ab, lb, vals, CFG)
    outv = jax.vmap(
        lambda t, tr, ac, ln, v: S2.backup(t, tr, ac, ln, v, CFG)
    )(vts, tb, ab, lb, vals)
    for name in ("edge_child", "edge_count", "edge_dscore", "max_ret"):
        np.testing.assert_array_equal(
            np.asarray(getattr(outb, name)), np.asarray(getattr(outv, name)),
            err_msg=name,
        )
    for name in ("visits", "values", "vars_"):
        np.testing.assert_allclose(
            np.asarray(getattr(outb.base, name)),
            np.asarray(getattr(outv.base, name)), rtol=0, atol=0,
            err_msg=name,
        )


def test_driver_and_cli():
    from tetris_mcts_tpu.cli import play as cli_play

    d = cli_play.main([
        "--agent_type", "ValueSim2", "--batch", "2", "--mcts_sims", "3",
        "--ngames", "1", "--max_moves", "5", "--max_nodes", "128",
        "--max_obs", "128", "--seed", "4",
    ])
    assert d.cfg.benchmark  # never trains (reference agent didn't)
    assert d.moves > 0
