"""Search-core tests: golden comparisons against NumPy transcriptions of the
reference backup/selection math (`agents/core_projection.py:133-146`,
`agents/cppmodule/core.h:111-381`), transposition-projection behaviour, and
batched sim/move smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.env.engine import EnvConfig
from tetris_mcts_tpu.search import mcts as M
from tetris_mcts_tpu.search import tree as T
from tetris_mcts_tpu.search.quantiles import bayes_quantile, norm_quantile
from tetris_mcts_tpu.search.tree import TreeConfig

CFG = TreeConfig(max_nodes=256, max_obs=256, table_size=512, max_depth=32)


def small_tree(seed=(3, 7)):
    s = engine.reset(*seed, CFG.env)
    return T.init_tree(s, CFG), s


# ---------------------------------------------------------------------------
# NumPy transcriptions of the reference update rules (the oracles)
# ---------------------------------------------------------------------------

def np_backup_trace_obs(trace, visit, value, variance, n_to_o, score, v, var,
                        gamma):
    """Transcription of `backup_trace_obs` (core_projection.py:133-146)."""
    for idx in trace[::-1]:
        v -= score[idx]
        o = n_to_o[idx]
        if visit[o] == 0:
            value[o] = v
            variance[o] = var
        else:
            delta = v - value[o]
            value[o] += delta / (visit[o] + 1)
            delta2 = v - value[o]
            variance[o] += (delta * delta2 - variance[o]) / (visit[o] + 1)
        visit[o] += 1
        v = gamma * v + score[idx]


def np_unique_child_obs(child_row, score, n_to_o):
    """Transcription of `get_unique_child_obs` (core_projection.py:34-49)."""
    c_nodes, c_obs = [], []
    for c in child_row:
        if c == 0:
            continue
        o = n_to_o[c]
        if o not in c_obs:
            c_nodes.append(c)
            c_obs.append(o)
        else:
            i = c_obs.index(o)
            if score[c] > score[c_nodes[i]]:
                c_nodes[i] = c
    return c_nodes, c_obs


class TestAlloc:
    def test_init_tree_root(self):
        tree, s = small_tree()
        assert int(tree.root) == 1
        assert int(tree.n_nodes) == 2
        assert int(tree.n_obs) == 2
        assert int(tree.n_to_o[1]) == 1

    def test_same_state_projects_to_same_obs(self):
        tree, s = small_tree()
        tree, i1 = T.alloc_node(tree, s, jnp.asarray(True), CFG)
        tree, i2 = T.alloc_node(tree, s, jnp.asarray(True), CFG)
        assert int(i1) == 2 and int(i2) == 3
        assert int(tree.n_to_o[i1]) == int(tree.n_to_o[i2]) == 1  # root's obs
        assert int(tree.n_obs) == 2  # no new obs

    def test_different_state_new_obs(self):
        tree, s = small_tree()
        s2 = engine.step(s, jnp.int32(6), CFG.env)  # hard drop -> new board
        tree, i = T.alloc_node(tree, s2, jnp.asarray(True), CFG)
        assert int(tree.n_to_o[i]) == 2
        assert int(tree.n_obs) == 3

    def test_transposition_left_right_commutes(self):
        """L,R and R,L reach identical full states (gravity applies equally):
        their nodes must share one obs slot."""
        tree, s = small_tree()
        cfg = CFG
        lr = engine.step(engine.step(s, jnp.int32(1), cfg.env), jnp.int32(2), cfg.env)
        rl = engine.step(engine.step(s, jnp.int32(2), cfg.env), jnp.int32(1), cfg.env)
        tree, i1 = T.alloc_node(tree, lr, jnp.asarray(True), cfg)
        tree, i2 = T.alloc_node(tree, rl, jnp.asarray(True), cfg)
        assert int(tree.n_to_o[i1]) == int(tree.n_to_o[i2])


class TestExpand:
    def test_expand_creates_children(self):
        tree, s = small_tree()
        tree, _ = T.expand(tree, s, tree.root, jnp.asarray(True), CFG)
        kids = np.asarray(T.children_of(tree, 1))
        assert np.all(kids > 0)
        assert len(set(kids.tolist())) == 7  # distinct nodes
        # children scores/ends recorded
        assert np.all(np.asarray(tree.end[kids]) == False)  # noqa: E712

    def test_expand_respects_ok_mask(self):
        tree, s = small_tree()
        tree2, _ = T.expand(tree, s, tree.root, jnp.asarray(False), CFG)
        assert np.all(np.asarray(T.children_of(tree2, 1)) == 0)
        assert int(tree2.n_nodes) == int(tree.n_nodes)

    def test_unique_children_matches_numpy(self):
        tree, s = small_tree()
        tree, _ = T.expand(tree, s, tree.root, jnp.asarray(True), CFG)
        kids, obs, kept = T.unique_children(tree, tree.root)
        kids, obs, kept = map(np.asarray, (kids, obs, kept))
        child_row = np.asarray(T.children_of(tree, 1))
        score = np.asarray(tree.score)
        n_to_o = np.asarray(tree.n_to_o)
        want_nodes, want_obs = np_unique_child_obs(child_row, score, n_to_o)
        got_nodes = sorted(kids[kept].tolist())
        assert got_nodes == sorted(want_nodes)
        assert sorted(obs[kept].tolist()) == sorted(want_obs)


class TestBackup:
    def _hand_tree(self):
        """Tiny fixed topology: 1 -> 2 -> 3, obs = identity, given scores."""
        tree, _ = small_tree()
        tree = tree.with_fields(
            n_to_o=jnp.asarray(
                np.arange(CFG.max_nodes, dtype=np.int32)
            ),
            score=jnp.asarray(
                np.array([0, 10, 25, 40] + [0] * (CFG.max_nodes - 4), np.float32)
            ),
        )
        return tree

    def test_backup_matches_numpy_fresh(self):
        tree = self._hand_tree()
        trace = np.array([1, 2, 3], np.int32)
        padded = np.zeros(CFG.max_depth, np.int32)
        padded[:3] = trace
        out = T.backup(tree, jnp.asarray(padded), jnp.int32(3),
                       jnp.float32(100.0), jnp.float32(5.0), CFG)

        visit = np.zeros(CFG.max_obs, np.int64)
        value = np.zeros(CFG.max_obs, np.float64)
        variance = np.zeros(CFG.max_obs, np.float64)
        np_backup_trace_obs(
            trace, visit, value, variance,
            np.arange(CFG.max_nodes), np.asarray(tree.score, np.float64),
            100.0, 5.0, CFG.gamma,
        )
        np.testing.assert_allclose(np.asarray(out.obs_visit)[:8], visit[:8])
        np.testing.assert_allclose(
            np.asarray(out.obs_value)[:8], value[:8], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.obs_var)[:8], variance[:8], rtol=1e-5, atol=1e-5
        )

    def test_backup_matches_numpy_repeated(self):
        """Multiple backups through overlapping traces (Welford path)."""
        tree = self._hand_tree()
        visit = np.zeros(CFG.max_obs, np.int64)
        value = np.zeros(CFG.max_obs, np.float64)
        variance = np.zeros(CFG.max_obs, np.float64)
        score64 = np.asarray(tree.score, np.float64)

        rnd = np.random.RandomState(0)
        for k in range(10):
            trace = np.array([1, 2, 3], np.int32)[: rnd.randint(1, 4)]
            v = float(rnd.rand() * 100)
            var = float(rnd.rand() * 10)
            padded = np.zeros(CFG.max_depth, np.int32)
            padded[: len(trace)] = trace
            tree = T.backup(
                tree, jnp.asarray(padded), jnp.int32(len(trace)),
                jnp.float32(v), jnp.float32(var), CFG,
            )
            np_backup_trace_obs(
                trace, visit, value, variance,
                np.arange(CFG.max_nodes), score64, v, var, CFG.gamma,
            )
        np.testing.assert_allclose(np.asarray(tree.obs_visit)[:8], visit[:8])
        np.testing.assert_allclose(
            np.asarray(tree.obs_value)[:8], value[:8], rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(tree.obs_var)[:8], variance[:8], rtol=1e-3, atol=1e-3
        )

    def test_backup_lp_seeds_and_averages(self):
        """LP backup: fresh child obs get NN seeds; the trace receives the
        mean of score(c) + gamma * value(o) (core.h:338-367)."""
        tree, s = small_tree()
        tree, _ = T.expand(tree, s, tree.root, jnp.asarray(True), CFG)
        kids, obs, kept = T.unique_children(tree, tree.root)

        v_nn = jnp.arange(7, dtype=jnp.float32) + 1.0
        var_nn = jnp.full(7, 2.0, jnp.float32)
        padded = np.zeros(CFG.max_depth, np.int32)
        padded[0] = 1
        out = T.backup_leaf_parallel(
            tree, jnp.asarray(padded), jnp.int32(1), v_nn, var_nn,
            jnp.asarray(True), CFG,
        )

        kept_np = np.asarray(kept)
        obs_np = np.asarray(obs)
        kids_np = np.asarray(kids)
        # seeded children
        for i in range(7):
            if kept_np[i]:
                assert int(np.asarray(out.obs_visit)[obs_np[i]]) == 1
                np.testing.assert_allclose(
                    float(np.asarray(out.obs_value)[obs_np[i]]),
                    float(v_nn[i]), rtol=1e-6,
                )
        # averaged root update
        k = kept_np.sum()
        score = np.asarray(tree.score)
        v_mean = (
            score[kids_np[kept_np]] + CFG.gamma * np.asarray(v_nn)[kept_np]
        ).sum() / k
        root_obs = int(np.asarray(tree.n_to_o)[1])
        # root: visit 0 -> value = v_mean - score[root]
        np.testing.assert_allclose(
            float(np.asarray(out.obs_value)[root_obs]),
            v_mean - score[1], rtol=1e-5,
        )

    def test_terminal_leaf_backup(self):
        tree, s = small_tree()
        padded = np.zeros(CFG.max_depth, np.int32)
        padded[0] = 1
        out = T.backup_leaf_parallel(
            tree, jnp.asarray(padded), jnp.int32(1),
            jnp.zeros(7), jnp.zeros(7), jnp.asarray(False), CFG,
        )
        root_obs = int(np.asarray(tree.n_to_o)[1])
        # v = score(leaf) = 0 -> value[root_obs] = 0 - score[root] = 0
        assert int(np.asarray(out.obs_visit)[root_obs]) == 1
        np.testing.assert_allclose(float(np.asarray(out.obs_value)[root_obs]), 0.0)


class TestSelect:
    def test_select_unexpanded_root_returns_root(self):
        tree, _ = small_tree()
        trace, acts, length, _ = T.select(tree, jax.random.PRNGKey(0), CFG)
        assert int(length) == 1
        assert int(trace[0]) == 1

    def test_select_prefers_unvisited(self):
        tree, s = small_tree()
        tree, _ = T.expand(tree, s, tree.root, jnp.asarray(True), CFG)
        trace, acts, length, _ = T.select(tree, jax.random.PRNGKey(0), CFG)
        assert int(length) == 2
        leaf = int(trace[1])
        assert leaf in np.asarray(T.children_of(tree, 1)).tolist()
        assert int(tree.obs_visit[int(tree.n_to_o[leaf])]) == 0

    def test_select_clt_argmax_when_all_visited(self):
        tree, s = small_tree()
        tree, _ = T.expand(tree, s, tree.root, jnp.asarray(True), CFG)
        kids, obs, kept = T.unique_children(tree, tree.root)
        kids_np, obs_np, kept_np = map(np.asarray, (kids, obs, kept))

        # hand-assign stats to every kept obs
        rnd = np.random.RandomState(1)
        visit = np.asarray(tree.obs_visit).copy()
        value = np.asarray(tree.obs_value).copy()
        var = np.asarray(tree.obs_var).copy()
        for o in obs_np[kept_np]:
            visit[o] = rnd.randint(1, 10)
            value[o] = rnd.rand() * 50
            var[o] = rnd.rand() * 5
        tree = tree.with_fields(
            obs_visit=jnp.asarray(visit),
            obs_value=jnp.asarray(value),
            obs_var=jnp.asarray(var),
        )

        # numpy CLT policy over unique children (policy.py:8-14)
        score = np.asarray(tree.score)
        ks = kids_np[kept_np]
        os_ = obs_np[kept_np]
        n = visit[os_].sum()
        q = (
            value[os_] + score[ks] - score[1]
            + float(norm_quantile(n)) * np.sqrt(var[os_] / visit[os_])
        )
        want_next = ks[np.argmax(q)]

        trace, acts, length, _ = T.select(tree, jax.random.PRNGKey(0), CFG)
        assert int(trace[1]) == int(want_next)

    def test_select_bayes_argmax_when_all_visited(self):
        """Golden check of the XLA bayes branch (`select_index_bayes`,
        core.py:290-351): value + bayes_quantile(n-1, N)·sqrt(var/(n-1))."""
        cfg = CFG._replace(policy="bayes", low=0)
        tree, s = small_tree()
        tree, _ = T.expand(tree, s, tree.root, jnp.asarray(True), cfg)
        kids, obs, kept = T.unique_children(tree, tree.root)
        kids_np, obs_np, kept_np = map(np.asarray, (kids, obs, kept))

        rnd = np.random.RandomState(3)
        visit = np.asarray(tree.obs_visit).copy()
        value = np.asarray(tree.obs_value).copy()
        var = np.asarray(tree.obs_var).copy()
        for o in obs_np[kept_np]:
            visit[o] = rnd.randint(2, 12)
            value[o] = rnd.rand() * 50
            var[o] = rnd.rand() * 5
        tree = tree.with_fields(
            obs_visit=jnp.asarray(visit),
            obs_value=jnp.asarray(value),
            obs_var=jnp.asarray(var),
        )

        score = np.asarray(tree.score)
        ks = kids_np[kept_np]
        os_ = obs_np[kept_np]
        n = visit[os_].sum()
        q = np.array([
            value[o] + score[k] - score[1]
            + float(bayes_quantile(visit[o] - 1.0, n))
            * np.sqrt(var[o] / max(visit[o] - 1.0, 1.0))
            for k, o in zip(ks, os_)
        ])
        want_next = ks[np.argmax(q)]

        trace, acts, length, _ = T.select(tree, jax.random.PRNGKey(0), cfg)
        assert int(trace[1]) == int(want_next)

    def test_select_ucbv_argmax_when_all_visited(self):
        """Golden check of the ucbv branch (`select_index_3`,
        core.py:223-272): value + sqrt(var · log N_total)."""
        cfg = CFG._replace(policy="ucbv", low=0)
        tree, s = small_tree()
        tree, _ = T.expand(tree, s, tree.root, jnp.asarray(True), cfg)
        kids, obs, kept = T.unique_children(tree, tree.root)
        kids_np, obs_np, kept_np = map(np.asarray, (kids, obs, kept))

        rnd = np.random.RandomState(7)
        visit = np.asarray(tree.obs_visit).copy()
        value = np.asarray(tree.obs_value).copy()
        var = np.asarray(tree.obs_var).copy()
        for o in obs_np[kept_np]:
            visit[o] = rnd.randint(1, 10)
            value[o] = rnd.rand() * 50
            var[o] = rnd.rand() * 5
        tree = tree.with_fields(
            obs_visit=jnp.asarray(visit),
            obs_value=jnp.asarray(value),
            obs_var=jnp.asarray(var),
        )

        score = np.asarray(tree.score)
        ks = kids_np[kept_np]
        os_ = obs_np[kept_np]
        n = visit[os_].sum()
        q = (
            value[os_] + score[ks] - score[1]
            + np.sqrt(var[os_] * np.log(max(n, 2.0)))
        )
        want_next = ks[np.argmax(q)]

        trace, acts, length, _ = T.select(tree, jax.random.PRNGKey(0), cfg)
        assert int(trace[1]) == int(want_next)


class TestBatchedSimsAndMoves:
    def _const_apply(self, v=10.0, var=4.0):
        def apply_fn(params, ubound, x):
            n = x.shape[0]
            return jnp.full(n, v), jnp.full(n, var)
        return apply_fn

    def test_run_sims_accumulates_visits(self):
        scfg = M.SearchConfig(tree=CFG, sims=12, evaluator="lp")
        run = M.make_run_sims(M.nn_child_evaluator(self._const_apply()), scfg)
        trees, envs = M.init_batch(7, 4, scfg)
        trees = jax.jit(run)(None, None, trees, jax.random.PRNGKey(0))
        root_obs = M.bgather(trees.n_to_o, trees.root)
        visits = M.bgather(trees.obs_visit, root_obs)
        # every sim backs up through the root
        assert np.all(np.asarray(visits) == scfg.sims)
        assert np.all(np.asarray(trees.n_nodes) > 1)

    def test_move_fn_advances_env_and_root(self):
        scfg = M.SearchConfig(tree=CFG, sims=8, evaluator="lp")
        move = jax.jit(
            M.make_move_fn(M.nn_child_evaluator(self._const_apply()), scfg)
        )
        trees, envs = M.init_batch(3, 4, scfg)
        replay = M.init_replay(1024)
        trees, envs, replay, stats = move(
            None, None, trees, envs, replay, jax.random.PRNGKey(1)
        )
        assert stats.action.shape == (4,)
        assert np.all(np.asarray(stats.action) >= 0)
        assert np.all(np.asarray(stats.action) < 7)
        assert np.all(np.asarray(trees.root) > 0)
        # probs sum to 1 where visits exist
        np.testing.assert_allclose(np.asarray(stats.probs).sum(-1), 1.0, atol=1e-4)

    def test_many_moves_trigger_reset_and_replay(self):
        tcfg = TreeConfig(max_nodes=512, max_obs=512, table_size=1024,
                          max_depth=32, gamma=0.999)
        scfg = M.SearchConfig(tree=tcfg, sims=6, evaluator="lp")
        move = jax.jit(
            M.make_move_fn(
                M.nn_child_evaluator(self._const_apply()), scfg,
                min_visits_store=1,
            )
        )
        trees, envs = M.init_batch(11, 4, scfg)
        replay = M.init_replay(4096)
        key = jax.random.PRNGKey(2)
        any_reset = False
        for i in range(30):
            key, sub = jax.random.split(key)
            trees, envs, replay, stats = move(None, None, trees, envs, replay, sub)
            any_reset = any_reset or bool(np.asarray(stats.reset).any())
        assert any_reset
        assert int(replay.count) > 0
        # replay rows hold plausible data
        cnt = int(replay.count)
        vals = np.asarray(replay.value)[:cnt]
        assert np.all(np.isfinite(vals))
        ws = np.asarray(replay.weight)[:cnt]
        assert np.all(ws >= 1)

    def test_replay_add_overflow_is_latest_wins(self):
        """One replay_add call with more masked rows than capacity must keep
        exactly the NEWEST R rows: past the mod-R wrap, duplicate scatter
        indices would otherwise have an XLA-unspecified surviving writer."""
        R, n = 8, 21
        rep = M.init_replay(R)
        rep = rep._replace(idx=jnp.int32(3), count=jnp.int32(3),
                           total=jnp.int32(3))
        packed = (jnp.arange(n, dtype=jnp.uint32)[:, None]
                  * jnp.ones((1, 20), jnp.uint32))
        value = jnp.arange(n, dtype=jnp.float32)
        mask = jnp.ones(n, bool).at[5].set(False)  # one masked-out row
        rep = M.replay_add(rep, packed, value, value + 100.0, value, mask)
        kept = n - 1
        assert int(rep.count) == R and int(rep.total) == 3 + kept
        assert int(rep.idx) == (3 + kept) % R
        got = np.sort(np.asarray(rep.value))
        # the newest R surviving rows are values {20..13} minus the masked 5
        want = np.sort(np.asarray(
            [v for v in range(n - 1, -1, -1) if v != 5][:R], np.float32
        ))
        np.testing.assert_array_equal(got, want)
        # var column moved with the same rows
        np.testing.assert_array_equal(
            np.sort(np.asarray(rep.var)), want + 100.0
        )

    def test_rollout_evaluator_runs(self):
        scfg = M.SearchConfig(tree=CFG, sims=4, evaluator="rollout",
                              rollout_cap=64)
        run = M.make_run_sims(M.rollout_evaluator(scfg), scfg)
        trees, envs = M.init_batch(5, 2, scfg)
        trees = jax.jit(run)(None, None, trees, jax.random.PRNGKey(3))
        root_obs = M.bgather(trees.n_to_o, trees.root)
        visits = M.bgather(trees.obs_visit, root_obs)
        assert np.all(np.asarray(visits) == scfg.sims)


class TestReplay:
    def test_ring_wraps(self):
        rep = M.init_replay(8)
        imgs = jnp.ones((6, 20), jnp.uint32)
        rep = M.replay_add(rep, imgs, jnp.ones(6), jnp.ones(6), jnp.ones(6),
                           jnp.ones(6, bool))
        assert int(rep.count) == 6 and int(rep.idx) == 6
        rep = M.replay_add(rep, imgs * 2, jnp.full(6, 2.0), jnp.ones(6),
                           jnp.ones(6), jnp.ones(6, bool))
        assert int(rep.count) == 8
        assert int(rep.idx) == 4
        # wrapped rows carry the new value
        assert float(rep.value[0]) == 2.0
        assert float(rep.value[5]) == 1.0

    def test_mask_filters(self):
        rep = M.init_replay(8)
        mask = jnp.asarray([True, False, True, False])
        rep = M.replay_add(
            rep, jnp.zeros((4, 20), jnp.uint32),
            jnp.arange(4.0), jnp.zeros(4), jnp.zeros(4), mask,
        )
        assert int(rep.count) == 2
        np.testing.assert_allclose(np.asarray(rep.value[:2]), [0.0, 2.0])


class TestParallelObsInsert:
    """_insert_obs7 (the lockstep claim-based table insert) vs a dict oracle:
    equal packed observations must map to one obs id, distinct ones to
    distinct ids, including duplicates within one 7-group and across calls."""

    def test_matches_dict_oracle(self):
        rng = np.random.RandomState(42)
        tree, s = small_tree()
        oracle = {}
        # seed oracle with the root obs
        root_packed = tuple(np.asarray(engine.pack_obs(s)).tolist())
        oracle[root_packed] = 1

        insert7 = jax.jit(
            lambda tr, p, e: T._insert_obs7(
                tr, p, e, jnp.asarray(True), CFG
            )
        )
        pool = rng.randint(0, 2**20, size=(12, 20)).astype(np.uint32)
        for it in range(25):
            # draw 7 boards from a small pool to force heavy duplication
            pick = rng.randint(0, len(pool), size=7)
            packed7 = jnp.asarray(pool[pick])
            end7 = jnp.zeros(7, bool)
            tree, obs7 = insert7(tree, packed7, end7)
            obs7 = np.asarray(obs7)
            for i in range(7):
                key = tuple(pool[pick[i]].tolist())
                if key in oracle:
                    assert obs7[i] == oracle[key], (it, i)
                else:
                    oracle[key] = int(obs7[i])
            # all ids for distinct keys distinct
            assert len(set(oracle.values())) == len(oracle)
        assert int(tree.n_obs) == len(oracle) + 1  # ids are 1..len(oracle)

    def test_capacity_degrades_to_zero(self):
        tiny = TreeConfig(max_nodes=64, max_obs=4, table_size=64, max_depth=8)
        s = engine.reset(1, 2, tiny.env)
        tree = T.init_tree(s, tiny)
        rng = np.random.RandomState(0)
        packed7 = jnp.asarray(rng.randint(0, 2**20, (7, 20)).astype(np.uint32))
        tree, obs7 = T._insert_obs7(
            tree, packed7, jnp.zeros(7, bool), jnp.asarray(True), tiny
        )
        obs7 = np.asarray(obs7)
        # valid ids are 1..3; root took 1, so 2 fresh ids: rest must be 0
        assert (obs7 > 0).sum() == 2
        assert (obs7 == 0).sum() == 5
        assert int(tree.n_obs) == 4


class TestVectorizedBackup:
    """`backup_vectorized` (γ-power matmul + Chan merge) must match `backup`
    (the sequential reference transcription) — including traces that visit
    the same obs twice."""

    def _tree_with(self, n_to_o):
        tree, _ = small_tree()
        m = np.arange(CFG.max_nodes, dtype=np.int32)
        m[: len(n_to_o)] = n_to_o
        return tree.with_fields(
            n_to_o=jnp.asarray(m),
            score=jnp.asarray(
                np.array([0, 10, 25, 40, 55] + [0] * (CFG.max_nodes - 5),
                         np.float32)
            ),
        )

    def _compare(self, tree, traces):
        t_vec = tree
        t_seq = tree
        rnd = np.random.RandomState(7)
        for trace in traces:
            v = float(rnd.rand() * 100)
            var = float(rnd.rand() * 10)
            padded = np.zeros(CFG.max_depth, np.int32)
            padded[: len(trace)] = trace
            args = (jnp.asarray(padded), jnp.int32(len(trace)),
                    jnp.float32(v), jnp.float32(var), CFG)
            t_vec = T.backup_vectorized(t_vec, *args)
            t_seq = T.backup(t_seq, *args)
        np.testing.assert_array_equal(
            np.asarray(t_vec.obs_visit)[:8], np.asarray(t_seq.obs_visit)[:8]
        )
        np.testing.assert_allclose(
            np.asarray(t_vec.obs_value)[:8], np.asarray(t_seq.obs_value)[:8],
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(t_vec.obs_var)[:8], np.asarray(t_seq.obs_var)[:8],
            rtol=1e-3, atol=1e-3,
        )

    def test_distinct_obs(self):
        tree = self._tree_with([0, 1, 2, 3, 4])
        self._compare(tree, [[1], [1, 2], [1, 2, 3], [1, 2, 3, 4]] * 3)

    def test_duplicate_obs_in_trace(self):
        # nodes 2 and 4 share obs 2: one trace updates obs 2 twice
        tree = self._tree_with([0, 1, 2, 3, 2])
        self._compare(tree, [[1, 2, 3, 4], [1, 2], [1, 2, 3, 4]] * 2)


class TestBackupVariants:
    """EMA / mixture backup rules vs NumPy transcriptions of
    core_projection.py:150-162 and :182-200."""

    def _tree(self):
        tree, _ = small_tree()
        return tree.with_fields(
            n_to_o=jnp.asarray(np.arange(CFG.max_nodes, dtype=np.int32)),
            score=jnp.asarray(
                np.array([0, 10, 25, 40] + [0] * (CFG.max_nodes - 4),
                         np.float32)
            ),
        )

    def test_exp_moving_matches_numpy(self):
        tree = self._tree()
        score = np.asarray(tree.score, np.float64)
        visit = np.zeros(CFG.max_obs, np.int64)
        value = np.zeros(CFG.max_obs, np.float64)
        var = np.zeros(CFG.max_obs, np.float64)
        alpha, gamma = 0.1, CFG.gamma
        rnd = np.random.RandomState(3)
        for _ in range(6):
            trace = np.array([1, 2, 3], np.int32)[: rnd.randint(1, 4)]
            v0, s0 = float(rnd.rand() * 100), float(rnd.rand() * 10)
            padded = np.zeros(CFG.max_depth, np.int32)
            padded[: len(trace)] = trace
            tree = T.backup_exp_moving(
                tree, jnp.asarray(padded), jnp.int32(len(trace)),
                jnp.float32(v0), jnp.float32(s0), CFG, alpha=alpha,
            )
            v = v0
            for idx in trace[::-1]:
                v -= score[idx]
                o = idx
                if visit[o] == 0:
                    value[o] = v
                    var[o] = s0
                else:
                    d = v - value[o]
                    value[o] += alpha * d
                    var[o] = (1 - alpha) * (var[o] + alpha * d * d)
                visit[o] += 1
                v = gamma * v + score[idx]
        np.testing.assert_allclose(
            np.asarray(tree.obs_value)[:6], value[:6], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(tree.obs_var)[:6], var[:6], rtol=1e-3, atol=1e-3
        )

    def test_mixture_matches_numpy(self):
        tree = self._tree()
        score = np.asarray(tree.score, np.float64)
        visit = np.zeros(CFG.max_obs, np.int64)
        value = np.zeros(CFG.max_obs, np.float64)
        var = np.zeros(CFG.max_obs, np.float64)
        gamma = CFG.gamma
        rnd = np.random.RandomState(4)
        for _ in range(6):
            trace = np.array([1, 2, 3], np.int32)[: rnd.randint(1, 4)]
            v0, s0 = float(rnd.rand() * 100), float(rnd.rand() * 10)
            padded = np.zeros(CFG.max_depth, np.int32)
            padded[: len(trace)] = trace
            tree = T.backup_mixture(
                tree, jnp.asarray(padded), jnp.int32(len(trace)),
                jnp.float32(v0), jnp.float32(s0), CFG,
            )
            v, in_var = v0, s0
            for idx in trace[::-1]:
                v -= score[idx]
                o = idx
                visit[o] += 1
                v_diff = v - value[o]
                v_sq_diff = v * v - value[o] ** 2
                v_tmp = value[o]
                value[o] += v_diff / visit[o]
                var_diff = in_var - var[o]
                var[o] += (var_diff + v_sq_diff) / visit[o] - (
                    v_diff / visit[o]
                ) * (v_tmp + value[o])
                v = gamma * v + score[idx]
                in_var = gamma * in_var
        np.testing.assert_allclose(
            np.asarray(tree.obs_value)[:6], value[:6], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(tree.obs_var)[:6], var[:6], rtol=1e-3, atol=1e-2
        )


class TestBayesQuantileRegime:
    """The Koehler t-quantile approximation has a pole at small nu / large t
    (a regime the reference's min_n guard never evaluates); `bayes_quantile`
    must stay finite and non-negative there while matching the raw
    approximation in the valid regime."""

    def test_pole_regime_clipped(self):
        import math
        for nu, t in [(1.0, 150.0), (1.0, 200.0), (1.0, 500.0),
                      (1.0, 2000.0), (2.0, 1e6)]:
            q = float(bayes_quantile(nu, t))
            assert math.isfinite(q) and 0.0 <= q <= 1e3, (nu, t, q)

    def test_valid_regime_unclipped(self):
        from tetris_mcts_tpu.search.quantiles import std_quantile2
        for nu, t in [(9.0, 100.0), (9.0, 500.0), (24.0, 1e4), (4.0, 50.0)]:
            raw = float(std_quantile2(nu, t))
            assert 0.0 < raw < 1e3, (nu, t, raw)
            assert float(bayes_quantile(nu, t)) == raw


class TestSelectionPolicies:
    def test_all_policies_select_valid_children(self):
        for policy in ("clt", "bayes", "gauss", "ucbv", "max", "mc",
                       "random", "greedy"):
            cfg = CFG._replace(policy=policy, low=0)
            tree, s = small_tree()
            tree, _ = T.expand(tree, s, tree.root, jnp.asarray(True), cfg)
            # give children some visits so the low-rule doesn't mask policy
            tree = tree.with_fields(
                obs_visit=tree.obs_visit.at[1:9].set(3),
                obs_value=tree.obs_value.at[1:9].set(1.0),
                obs_var=tree.obs_var.at[1:9].set(2.0),
            )
            trace, acts, length, _ = T.select(
                tree, jax.random.PRNGKey(1), cfg
            )
            assert int(length) == 2, policy
            leaf = int(trace[1])
            assert leaf in np.asarray(T.children_of(tree, 1)).tolist(), policy


class TestBatchedBackupWalk:
    """`backup_batched` (hand-batched, one while_loop for all B trees) must be
    bit-exact vs vmapping the per-tree `backup` — including lanes of very
    different trace lengths and repeated obs within a lane."""

    def test_matches_vmapped_backup(self):
        B = 5
        scfg = M.SearchConfig(tree=CFG, sims=10, evaluator="lp")
        run = M.make_run_sims(
            M.nn_child_evaluator(
                lambda p, u, x: (jnp.full(x.shape[0], 7.0),
                                 jnp.full(x.shape[0], 3.0))
            ),
            scfg,
        )
        trees, envs = M.init_batch(13, B, scfg)
        trees = jax.jit(run)(None, None, trees, jax.random.PRNGKey(0))

        key = jax.random.PRNGKey(42)
        traces, acts, lengths, _ = jax.vmap(T.select, in_axes=(0, 0, None))(
            trees, jax.random.split(key, B), CFG
        )
        v0 = jnp.linspace(1.0, 90.0, B)
        var0 = jnp.linspace(0.5, 4.0, B)

        got = T.backup_batched(trees, traces, lengths, v0, var0, CFG)
        want = jax.vmap(T.backup, in_axes=(0, 0, 0, 0, 0, None))(
            trees, traces, lengths, v0, var0, CFG
        )
        np.testing.assert_array_equal(
            np.asarray(got.visits), np.asarray(want.visits)
        )
        np.testing.assert_array_equal(
            np.asarray(got.values), np.asarray(want.values)
        )
        np.testing.assert_array_equal(
            np.asarray(got.vars_), np.asarray(want.vars_)
        )


class TestPallasBackupWalk:
    """The Pallas backup kernel (interpreted on CPU) must be bit-exact vs
    `backup_batched` — the integration switches between them by platform."""

    def test_matches_backup_batched(self):
        from tetris_mcts_tpu.ops import tree_walk

        B = 4
        scfg = M.SearchConfig(tree=CFG, sims=8, evaluator="lp")
        run = M.make_run_sims(
            M.nn_child_evaluator(
                lambda p, u, x: (jnp.full(x.shape[0], 5.0),
                                 jnp.full(x.shape[0], 2.0))
            ),
            scfg,
        )
        trees, envs = M.init_batch(29, B, scfg)
        trees = jax.jit(run)(None, None, trees, jax.random.PRNGKey(1))

        traces, acts, lengths, _ = jax.vmap(T.select, in_axes=(0, 0, None))(
            trees, jax.random.split(jax.random.PRNGKey(7), B), CFG
        )
        v0 = jnp.linspace(3.0, 70.0, B)
        var0 = jnp.linspace(0.25, 2.0, B)

        got = tree_walk.backup_batched_pallas(trees, traces, lengths, v0, var0, CFG)
        want = T.backup_batched(trees, traces, lengths, v0, var0, CFG)
        np.testing.assert_array_equal(np.asarray(got.visits), np.asarray(want.visits))
        np.testing.assert_array_equal(np.asarray(got.values), np.asarray(want.values))
        np.testing.assert_array_equal(np.asarray(got.vars_), np.asarray(want.vars_))


class TestPallasSelectWalk:
    """The fused Pallas selection kernel (interpreted on CPU) vs a NumPy
    oracle of `select_trace_obs` driven by the same pre-drawn tie-break
    gumbels, and its in-kernel env carry vs the action-path replay."""

    def _grown_trees(self, B=3, sims=10, seed=5):
        scfg = M.SearchConfig(
            tree=CFG._replace(select_kernel=True), sims=sims, evaluator="lp"
        )
        run = M.make_run_sims(
            M.nn_child_evaluator(
                lambda p, u, x: (jnp.linspace(0.0, 9.0, x.shape[0]),
                                 jnp.full(x.shape[0], 2.0))
            ),
            scfg,
        )
        trees, envs = M.init_batch(seed, B, scfg)
        return jax.jit(run)(None, None, trees, jax.random.PRNGKey(seed))

    def _np_select(self, cbase, score, obs_row, visits, values, vars_np,
                   root, gumbels, low, D, policy="clt"):
        """Oracle transcription of select_trace_obs with pre-drawn gumbels."""
        trace, idx, sc_idx = [], int(root), float(score[int(root)])
        for depth in range(D):
            trace.append(idx)
            c = int(cbase[idx])
            kids = np.where(c != 0, c + np.arange(7), 0)
            uniq, uobs = np_unique_child_obs(kids, score, obs_row)
            if not uniq:
                break
            kept = [(k, o) for k, o in zip(uniq, uobs)]
            vis = {k: visits[o] for k, o in kept}
            low_kids = [k for k, o in kept if visits[o] < low]
            if low_kids:
                # gumbel argmax over the low slots (by action lane)
                lanes = [int(np.where(kids == k)[0][0]) for k in low_kids]
                # careful: a kid value appears once per lane; find lanes of
                # kept-and-low entries by matching node ids
                best = max(
                    zip(low_kids, lanes),
                    key=lambda kl: gumbels[depth, kl[1]],
                )
                nxt = best[0]
            else:
                n = sum(vis.values())
                q_best, nxt = -np.inf, None
                for k, o in kept:
                    nv = max(visits[o], 1.0)
                    if policy == "bayes":
                        bound = float(bayes_quantile(nv - 1.0, n)) * np.sqrt(
                            max(vars_np[o], 0.0) / max(nv - 1.0, 1.0)
                        )
                    elif policy == "ucbv":
                        bound = np.sqrt(
                            max(vars_np[o], 0.0) * np.log(max(n, 2.0))
                        )
                    else:
                        bound = float(norm_quantile(n)) * np.sqrt(
                            max(vars_np[o], 0.0) / nv
                        )
                    q = values[o] + score[k] - sc_idx + bound
                    if q > q_best:
                        q_best, nxt = q, k
            sc_idx = float(score[nxt])
            idx = nxt
        return trace

    def test_kernel_matches_numpy_oracle(self):
        from tetris_mcts_tpu.ops import tree_walk

        trees = self._grown_trees()
        B = int(trees.root.shape[0])
        D = CFG.max_depth
        key = jax.random.PRNGKey(11)
        k_low, _ = jax.random.split(key)
        gumbels = jax.random.gumbel(k_low, (B, D, 7))
        rnd = jnp.zeros((B, D, 7), jnp.float32)

        score = trees.nstat[:, 0, :]
        obs = trees.nstat[:, 1, :].astype(jnp.int32)
        rootsc = jax.vmap(lambda s, r: s[r])(score, trees.root)
        env0 = engine.pack_state(trees.root_state)
        traces, lengths, leafs, leaf_env, _, _, _ = tree_walk.select_walk(
            trees.cbase, score, obs, trees.visits, trees.values,
            trees.vars_, trees.root, rootsc, env0, gumbels, rnd,
            policy="clt", low=CFG.low, interpret=True, block=B,
        )

        for b in range(B):
            want = self._np_select(
                np.asarray(trees.cbase[b]), np.asarray(score[b]),
                np.asarray(obs[b]), np.asarray(trees.visits[b]),
                np.asarray(trees.values[b]), np.asarray(trees.vars_[b]),
                int(trees.root[b]), np.asarray(gumbels[b]), CFG.low, D,
            )
            L = int(lengths[b])
            assert L == len(want), (b, L, want)
            np.testing.assert_array_equal(
                np.asarray(traces[b])[:L], np.asarray(want, np.int32)
            )
            assert int(leafs[b]) == want[-1]

    def test_kernel_matches_numpy_oracle_bayes(self):
        """Same parity check under the Bayes-UCB policy — pins the
        t-quantile bound (`select_index_bayes`, core.py:290-351) in both
        the kernel and the oracle transcription."""
        from tetris_mcts_tpu.ops import tree_walk

        trees = self._grown_trees()
        B = int(trees.root.shape[0])
        D = CFG.max_depth
        gumbels = jax.random.gumbel(jax.random.PRNGKey(17), (B, D, 7))
        rnd = jnp.zeros((B, D, 7), jnp.float32)

        score = trees.nstat[:, 0, :]
        obs = trees.nstat[:, 1, :].astype(jnp.int32)
        rootsc = jax.vmap(lambda s, r: s[r])(score, trees.root)
        env0 = engine.pack_state(trees.root_state)
        traces, lengths, leafs, _, _, _, _ = tree_walk.select_walk(
            trees.cbase, score, obs, trees.visits, trees.values,
            trees.vars_, trees.root, rootsc, env0, gumbels, rnd,
            policy="bayes", low=CFG.low, interpret=True, block=B,
        )

        for b in range(B):
            want = self._np_select(
                np.asarray(trees.cbase[b]), np.asarray(score[b]),
                np.asarray(obs[b]), np.asarray(trees.visits[b]),
                np.asarray(trees.values[b]), np.asarray(trees.vars_[b]),
                int(trees.root[b]), np.asarray(gumbels[b]), CFG.low, D,
                policy="bayes",
            )
            L = int(lengths[b])
            assert L == len(want), (b, L, want)
            np.testing.assert_array_equal(
                np.asarray(traces[b])[:L], np.asarray(want, np.int32)
            )
            assert int(leafs[b]) == want[-1]

    def test_kernel_matches_numpy_oracle_ucbv(self):
        """Same parity check under the ucbv policy (`select_index_3`,
        core.py:223-272): sqrt(var · log N_total) bound."""
        from tetris_mcts_tpu.ops import tree_walk

        trees = self._grown_trees()
        B = int(trees.root.shape[0])
        D = CFG.max_depth
        gumbels = jax.random.gumbel(jax.random.PRNGKey(23), (B, D, 7))
        rnd = jnp.zeros((B, D, 7), jnp.float32)

        score = trees.nstat[:, 0, :]
        obs = trees.nstat[:, 1, :].astype(jnp.int32)
        rootsc = jax.vmap(lambda s, r: s[r])(score, trees.root)
        env0 = engine.pack_state(trees.root_state)
        traces, lengths, leafs, _, _, _, _ = tree_walk.select_walk(
            trees.cbase, score, obs, trees.visits, trees.values,
            trees.vars_, trees.root, rootsc, env0, gumbels, rnd,
            policy="ucbv", low=CFG.low, interpret=True, block=B,
        )

        for b in range(B):
            want = self._np_select(
                np.asarray(trees.cbase[b]), np.asarray(score[b]),
                np.asarray(obs[b]), np.asarray(trees.visits[b]),
                np.asarray(trees.values[b]), np.asarray(trees.vars_[b]),
                int(trees.root[b]), np.asarray(gumbels[b]), CFG.low, D,
                policy="ucbv",
            )
            L = int(lengths[b])
            assert L == len(want), (b, L, want)
            np.testing.assert_array_equal(
                np.asarray(traces[b])[:L], np.asarray(want, np.int32)
            )
            assert int(leafs[b]) == want[-1]

    def test_kernel_leaf_env_matches_replay(self):
        """The kernel's in-kernel env carry must equal replaying the
        kernel's own trace from the root state with `engine.step` (the
        action per level falls out of the contiguous-child encoding:
        action = trace[t+1] - cbase[trace[t]])."""
        from tetris_mcts_tpu.ops import tree_walk

        trees = self._grown_trees(B=4, sims=8, seed=9)
        B = 4
        traces, lengths, leafs, leaf_states, packed7, sc7, end7 = (
            tree_walk.select_batched_pallas(
                trees, jax.random.PRNGKey(3),
                CFG._replace(select_kernel=True),
            )
        )
        for b in range(B):
            L = int(lengths[b])
            st = jax.tree.map(lambda a: a[b], trees.root_state)
            cb = np.asarray(trees.cbase[b])
            tr = np.asarray(traces[b])
            for t in range(L - 1):
                act = int(tr[t + 1]) - int(cb[tr[t]])
                assert 0 <= act < 7, (b, t, act)
                st = engine.step(st, jnp.int32(act), CFG.env)
            for f in st._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(st, f)),
                    np.asarray(getattr(leaf_states, f))[b], err_msg=f,
                )
            # the kernel's child outputs must equal the XLA expansion
            # front half run from the same leaf state
            child_states, want_packed7 = T.expand_children(None, st, CFG)
            np.testing.assert_array_equal(
                np.asarray(packed7[b]), np.asarray(want_packed7)
            )
            np.testing.assert_array_equal(
                np.asarray(sc7[b]),
                np.asarray(child_states.score).astype(np.float32),
            )
            np.testing.assert_array_equal(
                np.asarray(end7[b]), np.asarray(child_states.end)
            )


class TestPallasInsert:
    """The Pallas obs-table insert kernel (interpreted on CPU) must be
    bit-exact vs the hand-batched XLA probe loop across repeated inserts
    with duplicate keys, hits, and pool exhaustion."""

    def test_matches_xla_insert(self):
        from tetris_mcts_tpu.ops import tree_walk

        B = 4
        cfg = CFG._replace(max_obs=64, table_size=128)
        envs = engine.reset_batch(11, B, cfg.env)
        tk = jax.vmap(T.init_tree, in_axes=(0, None))(envs, cfg)
        tx = jax.vmap(T.init_tree, in_axes=(0, None))(envs, cfg)

        key = jax.random.PRNGKey(5)
        for it in range(16):
            key, k1, k2, k3 = jax.random.split(key, 4)
            # small key space forces duplicates and repeat hits; later
            # rounds overflow max_obs and exercise the full-pool path
            packed7 = jax.random.randint(
                k1, (B, 7, 20), 0, 5
            ).astype(jnp.uint32)
            end7 = jax.random.bernoulli(k2, 0.2, (B, 7))
            ok = jax.random.bernoulli(k3, 0.9, (B,))
            tk, ok7 = tree_walk.insert_obs7_batched_pallas(
                tk, packed7, end7, ok, cfg
            )
            tx, ox7 = T.insert_obs7_batched(tx, packed7, end7, ok, cfg)
            np.testing.assert_array_equal(
                np.asarray(ok7), np.asarray(ox7), err_msg=f"iter {it}"
            )
            for f in ("tbl_h1", "tbl_h2", "tbl_obs", "n_obs", "obs_end",
                      "obs_bits"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(tk, f)), np.asarray(getattr(tx, f)),
                    err_msg=f"{f} iter {it}",
                )


class TestPallasLPBackup:
    """The fused seed+backup kernel (interpreted on CPU) vs the XLA
    pipeline (vmap(lp_seed) + backup_batched)."""

    def test_matches_xla_pipeline(self):
        from tetris_mcts_tpu.ops import tree_walk

        B = 4
        scfg = M.SearchConfig(tree=CFG, sims=9, evaluator="lp")
        run = M.make_run_sims(
            M.nn_child_evaluator(
                lambda p, u, x: (jnp.linspace(1.0, 8.0, x.shape[0]),
                                 jnp.full(x.shape[0], 2.5))
            ),
            scfg,
        )
        trees, envs = M.init_batch(17, B, scfg)
        trees = jax.jit(run)(None, None, trees, jax.random.PRNGKey(2))

        traces, acts, lengths, _ = jax.vmap(T.select, in_axes=(0, 0, None))(
            trees, jax.random.split(jax.random.PRNGKey(5), B), CFG
        )
        v_nn = jnp.tile(jnp.linspace(1.0, 7.0, 7), (B, 1))
        var_nn = jnp.full((B, 7), 3.0)
        can = jnp.asarray([True, True, False, True])

        got = tree_walk.lp_backup_batched_pallas(
            trees, traces, lengths, v_nn, var_nn, can, CFG
        )
        t2, v0, var0 = jax.vmap(T.lp_seed, in_axes=(0, 0, 0, 0, 0, 0, None))(
            trees, traces, lengths, v_nn, var_nn, can, CFG
        )
        want = T.backup_batched(t2, traces, lengths, v0, var0, CFG)
        np.testing.assert_array_equal(
            np.asarray(got.visits), np.asarray(want.visits)
        )
        np.testing.assert_allclose(
            np.asarray(got.values), np.asarray(want.values),
            rtol=1e-6, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got.vars_), np.asarray(want.vars_),
            rtol=1e-6, atol=1e-5,
        )


class TestBatchedInsert:
    """`insert_obs7_batched` (one probe loop for all B trees) must be
    bit-exact vs vmapping `_insert_obs7`."""

    def test_matches_vmapped_insert(self):
        B = 5
        rng = np.random.RandomState(11)
        s = engine.reset_batch(3, B, CFG.env)
        trees = jax.vmap(T.init_tree, in_axes=(0, None))(s, CFG)
        pool = rng.randint(0, 2**20, size=(10, 20)).astype(np.uint32)

        vins = jax.vmap(T._insert_obs7, in_axes=(0, 0, 0, 0, None))
        t_b, t_v = trees, trees
        for it in range(6):
            pick = rng.randint(0, len(pool), size=(B, 7))
            packed = jnp.asarray(pool[pick])           # (B, 7, 20)
            end7 = jnp.zeros((B, 7), bool)
            ok = jnp.asarray(rng.rand(B) > 0.2)
            t_b, o_b = T.insert_obs7_batched(t_b, packed, end7, ok, CFG)
            t_v, o_v = vins(t_v, packed, end7, ok, CFG)
            np.testing.assert_array_equal(np.asarray(o_b), np.asarray(o_v))
            for f in ("tbl_h1", "tbl_h2", "tbl_obs", "n_obs", "obs_end"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(t_b, f)),
                    np.asarray(getattr(t_v, f)), err_msg=f,
                )
            np.testing.assert_array_equal(
                np.asarray(t_b.obs_bits), np.asarray(t_v.obs_bits)
            )


class TestBatchedSelectWalk:
    """`select_batched` (one while_loop for all B trees) must be bit-exact
    vs vmapping `select` — same RNG stream, traces, lengths, leaf states."""

    def test_matches_vmapped_select(self):
        self._check_policy(CFG)

    def test_matches_vmapped_select_bayes(self):
        # the bayes branch shares everything but the bound — still must be
        # stream- and trace-exact between the two batching strategies
        self._check_policy(CFG._replace(policy="bayes"))

    def _check_policy(self, cfg):
        B = 5
        scfg = M.SearchConfig(tree=cfg, sims=11, evaluator="lp")
        run = M.make_run_sims(
            M.nn_child_evaluator(
                lambda p, u, x: (jnp.linspace(0.0, 6.0, x.shape[0]),
                                 jnp.full(x.shape[0], 1.5))
            ),
            scfg,
        )
        trees, envs = M.init_batch(23, B, scfg)
        trees = jax.jit(run)(None, None, trees, jax.random.PRNGKey(4))

        keys = jax.random.split(jax.random.PRNGKey(9), B)
        t_b, a_b, l_b, leafs_b, nokids_b, st_b = T.select_batched(trees, keys, cfg)
        t_v, a_v, l_v, st_v = jax.vmap(T.select, in_axes=(0, 0, None))(
            trees, keys, cfg
        )
        np.testing.assert_array_equal(np.asarray(l_b), np.asarray(l_v))
        np.testing.assert_array_equal(np.asarray(t_b), np.asarray(t_v))
        np.testing.assert_array_equal(np.asarray(a_b), np.asarray(a_v))
        leafs_v = M.bgather(t_v, jnp.maximum(l_v - 1, 0))
        np.testing.assert_array_equal(np.asarray(leafs_b), np.asarray(leafs_v))
        np.testing.assert_array_equal(
            np.asarray(nokids_b),
            np.asarray(M.bgather(trees.cbase, leafs_v) == 0),
        )
        for f in st_b._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(st_b, f)), np.asarray(getattr(st_v, f)),
                err_msg=f,
            )


class TestShardedKernels:
    """Every Pallas walk kernel entered through shard_map over the 8-device
    CPU mesh (the multi-chip path, `tree_walk.set_kernel_mesh`) must be
    bit-exact vs the direct single-device call — the kernels are purely
    batch-parallel and all their randomness is drawn outside at global
    batch shape."""

    def _grown(self, B):
        scfg = M.SearchConfig(tree=CFG, sims=9, evaluator="lp")
        run = M.make_run_sims(
            M.nn_child_evaluator(
                lambda p, u, x: (jnp.linspace(1.0, 8.0, x.shape[0]),
                                 jnp.full(x.shape[0], 2.5))
            ),
            scfg,
        )
        trees, envs = M.init_batch(31, B, scfg)
        return jax.jit(run)(None, None, trees, jax.random.PRNGKey(6))

    def test_sharded_matches_direct(self):
        from tetris_mcts_tpu.ops import tree_walk
        from tetris_mcts_tpu.parallel import mesh as PM

        B = 8
        trees = self._grown(B)
        traces, acts, lengths, _ = jax.vmap(T.select, in_axes=(0, 0, None))(
            trees, jax.random.split(jax.random.PRNGKey(3), B), CFG
        )
        v0 = jnp.linspace(2.0, 50.0, B)
        var0 = jnp.linspace(0.5, 3.0, B)
        v_nn = jnp.tile(jnp.linspace(1.0, 7.0, 7), (B, 1))
        var_nn = jnp.full((B, 7), 3.0)
        can = jnp.arange(B) % 3 != 0
        key = jax.random.PRNGKey(13)
        rng = np.random.RandomState(7)
        packed7 = jnp.asarray(
            rng.randint(0, 2**20, size=(B, 7, 20)).astype(np.uint32)
        )
        end7 = jnp.zeros((B, 7), bool)

        direct = {
            "backup": tree_walk.backup_batched_pallas(
                trees, traces, lengths, v0, var0, CFG
            ),
            "select": tree_walk.select_batched_pallas(trees, key, CFG),
            "insert": tree_walk.insert_obs7_batched_pallas(
                trees, packed7, end7, can, CFG
            ),
            "lp": tree_walk.lp_backup_batched_pallas(
                trees, traces, lengths, v_nn, var_nn, can, CFG
            ),
        }

        tree_walk.set_kernel_mesh(PM.make_mesh())
        try:
            sharded = {
                "backup": tree_walk.backup_batched_pallas(
                    trees, traces, lengths, v0, var0, CFG
                ),
                "select": tree_walk.select_batched_pallas(trees, key, CFG),
                "insert": tree_walk.insert_obs7_batched_pallas(
                    trees, packed7, end7, can, CFG
                ),
                "lp": tree_walk.lp_backup_batched_pallas(
                    trees, traces, lengths, v_nn, var_nn, can, CFG
                ),
            }
        finally:
            tree_walk.set_kernel_mesh(None)

        for name in direct:
            jax.tree.map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=name
                ),
                direct[name], sharded[name],
            )


class TestPolicyMaxFaithful:
    """`--policy max` golden vs the reference's `policy_max`
    (agents/policy.py:28-33): q = value + max(v_max) * sqrt(log(sum visit)
    / visit), with v_max the per-node max backed-up relative return
    (node_stats[4], agents/core.py:404-422) now tracked as Tree.vmax."""

    def test_select_matches_numpy_policy_max(self):
        cfg = CFG._replace(policy="max", low=0)
        tree, s = small_tree()
        tree, _ = T.expand(tree, s, tree.root, jnp.asarray(True), cfg)
        rng = np.random.RandomState(7)
        visits = rng.randint(1, 9, 8).astype(np.float32)
        values = rng.uniform(-2, 5, 8).astype(np.float32)
        vmaxs = rng.uniform(0, 10, 8).astype(np.float32)
        tree = tree.with_fields(
            obs_visit=tree.obs_visit.at[1:9].set(visits.astype(np.int32)),
            obs_value=tree.obs_value.at[1:9].set(values),
            obs_var=tree.obs_var.at[1:9].set(1.0),
        )._replace(vmax=tree.vmax.at[1:9].set(jnp.asarray(vmaxs)))

        trace, acts, length, _ = T.select(tree, jax.random.PRNGKey(3), cfg)
        leaf = int(trace[1])

        # numpy transcription over the leaf's unique children
        kids = np.asarray(T.children_of(tree, 1))
        obs = np.asarray(tree.n_to_o)[kids]
        sc = np.asarray(tree.score)[kids]
        # dedup by obs keeping max score (get_unique_child_obs semantics)
        kept = []
        for i, o in enumerate(obs):
            beat = all(
                not (obs[j] == o and (sc[j] > sc[i]
                                      or (sc[j] == sc[i] and j < i)))
                for j in range(len(kids)) if j != i
            )
            if beat:
                kept.append(i)
        vis = np.asarray(tree.obs_visit)[obs[kept]].astype(np.float64)
        val = np.asarray(tree.obs_value)[obs[kept]]
        vmx = np.asarray(tree.vmax)[obs[kept]]
        root_score = float(np.asarray(tree.score)[1])
        q_base = val + sc[kept] - root_score
        scale = vmx.max()  # policy.py:29 `_max = np.max(v_max)`
        q = q_base + scale * np.sqrt(
            np.log(max(vis.sum(), 2.0)) / np.maximum(vis, 1.0))
        want = kids[kept][int(np.argmax(q))]
        assert leaf == int(want)

    def test_backup_tracks_vmax_and_moves_run(self):
        cfg = CFG._replace(policy="max", low=1)
        scfg = M.SearchConfig(tree=cfg, sims=6, evaluator="lp")
        trees, envs = M.init_batch(5, 3, scfg)
        run = M.make_run_sims(
            M.nn_child_evaluator(
                lambda p, u, x: (jnp.full(x.shape[0], 4.0),
                                 jnp.full(x.shape[0], 2.0))
            ),
            scfg,
        )
        trees = jax.jit(run)(None, None, trees, jax.random.PRNGKey(0))
        vmax = np.asarray(trees.vmax)
        visits = np.asarray(trees.visits)
        assert (vmax > 0).any(), "backup never updated the max-return stat"
        # vmax only lives where backups visited
        assert (vmax[visits == 0] == 0).all()

    def test_other_policies_leave_vmax_untouched(self):
        scfg = M.SearchConfig(tree=CFG, sims=4, evaluator="lp")
        trees, envs = M.init_batch(5, 2, scfg)
        run = M.make_run_sims(
            M.nn_child_evaluator(
                lambda p, u, x: (jnp.full(x.shape[0], 4.0),
                                 jnp.full(x.shape[0], 2.0))
            ),
            scfg,
        )
        trees = jax.jit(run)(None, None, trees, jax.random.PRNGKey(0))
        assert (np.asarray(trees.vmax) == 0).all()


class TestNoAliasBranch:
    """Exercise the copy-inputs-to-fresh-outputs branch of the stat kernels
    off-TPU. `_use_aliases()` returns True in interpret mode, so the
    non-aliased branch — the one production TPU actually runs since the
    round-4 `input_output_aliases` miscompile fix — would otherwise have
    zero CPU test coverage (ADVICE r4). TMT_NO_ALIAS=1 forces it."""

    def test_backup_insert_lp_kernels_no_alias(self, monkeypatch):
        from tetris_mcts_tpu.ops import tree_walk

        monkeypatch.setenv("TMT_NO_ALIAS", "1")
        assert not tree_walk._use_aliases()
        TestPallasBackupWalk().test_matches_backup_batched()
        TestPallasInsert().test_matches_xla_insert()
        TestPallasLPBackup().test_matches_xla_pipeline()
