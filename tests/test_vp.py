"""Policy-iteration (ApproxPolicyIter-equivalent) agent tests: VP search
semantics (reference agents/ApproxPolicyIter.py + core_projection.py:166-178)
and the VP online driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.search import vp as VP
from tetris_mcts_tpu.search.mcts import SearchConfig
from tetris_mcts_tpu.search.tree import TreeConfig


def cfg(sims=4):
    return SearchConfig(
        tree=TreeConfig(max_nodes=512, max_obs=512, table_size=1024,
                        max_depth=24),
        sims=sims,
    )


def const_apply(v=5.0):
    """Evaluator stub: constant value, uniform-ish logits."""

    def f(params, imgs):
        B = imgs.shape[0]
        return jnp.full((B, 1), v), jnp.zeros((B, 7))

    return f


def test_vp_move_runs_and_counts_policy():
    c = cfg()
    move = jax.jit(VP.make_vp_move_fn(const_apply(), c, min_visits_store=1))
    vtrees, envs = VP.init_vp_batch(0, 4, c)
    replay = VP.init_vp_replay(512)
    vtrees, envs, replay, stats = move(
        None, vtrees, envs, replay, jax.random.PRNGKey(0)
    )
    assert stats.action.shape == (4,)
    p = np.asarray(stats.probs)
    assert (p >= 0).all()
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)


def test_vp_backup_matches_reference_oracle():
    """NumPy transcription of backup_trace_value_policy_obs
    (core_projection.py:166-178) vs the jitted version on one trace."""
    c = cfg()
    envs = engine.reset_batch(1, 1, c.tree.env)
    env0 = jax.tree.map(lambda leaf: leaf[0], envs)
    vt = VP.init_vp_tree(env0, c.tree)

    from tetris_mcts_tpu.search import tree as T

    # expand root, then backup value 10 along trace [root]
    base, _ = T.expand(vt.base, env0, vt.base.root, jnp.asarray(True), c.tree)
    vt = vt._replace(base=base)
    trace = jnp.zeros(c.tree.max_depth, jnp.int32).at[0].set(vt.base.root)
    vt2 = VP.backup_value_policy(vt, trace, jnp.int32(1), 10.0, c.tree)

    base = vt2.base
    o_root = int(base.n_to_o[int(base.root)])
    # reference: visit++, value = mean of (v - score[idx]) = 10 - 0
    assert int(base.obs_visit[o_root]) == 1
    assert float(base.obs_value[o_root]) == pytest.approx(10.0)
    # one improvement count at the greedy child action
    counts = np.asarray(vt2.pol_new[:, o_root])
    assert counts.sum() == pytest.approx(1.0)

    # second backup with value 20: mean -> 15
    vt3 = VP.backup_value_policy(vt2, trace, jnp.int32(1), 20.0, c.tree)
    assert float(vt3.base.obs_value[o_root]) == pytest.approx(15.0)
    assert int(vt3.base.obs_visit[o_root]) == 2


def test_vp_driver_trains():
    from tetris_mcts_tpu.runtime.selfplay import (
        SelfPlayConfig, VPSelfPlayDriver,
    )

    d = VPSelfPlayDriver(
        SelfPlayConfig(
            batch=4, sims=4, max_nodes=512, max_obs=512, table_size=1024,
            max_depth=24, min_visits_store=1, memory_size=2048,
            memory_growth=64, train_rows_trigger=64, train_batch=16,
            train_iters_per_val=5, train_max_iters=10, seed=11,
        ),
        log=lambda s: None,
    )
    d.run(25)
    assert d.moves == 25
    assert d.total_rows > 0
    assert d.n_trains >= 1


class TestBatchedVPWalks:
    """The hand-batched VP walks (one while_loop for all B trees) must be
    bit-exact vs vmapping their per-tree twins — same RNG stream, traces,
    stats (the validation pattern of tree.select_batched/backup_batched)."""

    def _grown(self, B=5, sims=9, seed=3):
        c = cfg(sims=sims)
        move = jax.jit(
            VP.make_vp_move_fn(const_apply(), c, min_visits_store=1)
        )
        vtrees, envs = VP.init_vp_batch(seed, B, c)
        replay = VP.init_vp_replay(512)
        key = jax.random.PRNGKey(seed)
        for _ in range(2):
            key, k = jax.random.split(key)
            vtrees, envs, replay, _ = move(None, vtrees, envs, replay, k)
        return c, vtrees

    def test_select_matches_vmapped(self):
        c, vtrees = self._grown()
        B = int(vtrees.base.root.shape[0])
        keys = jax.random.split(jax.random.PRNGKey(7), B)
        t_b, a_b, l_b = VP.select_batched(vtrees, keys, c.tree)
        t_v, a_v, l_v = jax.vmap(VP.select, in_axes=(0, 0, None))(
            vtrees, keys, c.tree
        )
        np.testing.assert_array_equal(np.asarray(l_b), np.asarray(l_v))
        np.testing.assert_array_equal(np.asarray(t_b), np.asarray(t_v))
        np.testing.assert_array_equal(np.asarray(a_b), np.asarray(a_v))

    def test_replay_leaf_matches_vmapped(self):
        from tetris_mcts_tpu.search import tree as T

        c, vtrees = self._grown(seed=5)
        B = int(vtrees.base.root.shape[0])
        keys = jax.random.split(jax.random.PRNGKey(9), B)
        _, acts, lengths = VP.select_batched(vtrees, keys, c.tree)
        st_b = T.replay_leaf_batched(vtrees.base, acts, lengths, c.tree)
        st_v = jax.vmap(T.replay_leaf, in_axes=(0, 0, 0, None))(
            vtrees.base, acts, lengths, c.tree
        )
        for f in st_b._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(st_b, f)), np.asarray(getattr(st_v, f)),
                err_msg=f,
            )

    def test_backup_matches_vmapped(self):
        c, vtrees = self._grown(seed=8)
        B = int(vtrees.base.root.shape[0])
        keys = jax.random.split(jax.random.PRNGKey(11), B)
        traces, _, lengths = VP.select_batched(vtrees, keys, c.tree)
        values = jnp.linspace(3.0, 40.0, B)
        got = VP.backup_value_policy_batched(
            vtrees, traces, lengths, values, c.tree
        )
        want = jax.vmap(VP.backup_value_policy, in_axes=(0, 0, 0, 0, None))(
            vtrees, traces, lengths, values, c.tree
        )
        np.testing.assert_array_equal(
            np.asarray(got.base.visits), np.asarray(want.base.visits)
        )
        np.testing.assert_array_equal(
            np.asarray(got.base.values), np.asarray(want.base.values)
        )
        np.testing.assert_array_equal(
            np.asarray(got.pol_new), np.asarray(want.pol_new)
        )
