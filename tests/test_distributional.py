"""Distributional (C51) search tests: golden comparisons against NumPy
transcriptions of the reference `agents/core_distributional.py` (the
reference agent itself is broken — SURVEY.md Appendix A — so these pin the
reconstructed semantics) plus driver smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_mcts_tpu.search import distributional as DD
from tetris_mcts_tpu.search.mcts import SearchConfig
from tetris_mcts_tpu.search.tree import TreeConfig

DCFG = DD.DistConfig(atoms=16, vmax=160.0)


def np_shift_distribution(dist, x, vmin, vmax):
    """Transcription of shift_distribution (core_distributional.py:13-36)."""
    bins = len(dist)
    delta = (vmax - vmin) / bins
    result = np.zeros(bins, np.float32)
    bin_shift = x / delta
    fraction = bin_shift - np.floor(bin_shift)
    for b in range(bins):
        b_lb = int(b + bin_shift)
        if b_lb >= bins:
            b_lb = bins - 1
        b_ub = bins - 1 if b_lb + 1 >= bins else b_lb + 1
        result[b_lb] += dist[b] * (1 - fraction)
        result[b_ub] += dist[b] * fraction
    return result


class TestDistMath:
    def test_shift_matches_numpy(self):
        rng = np.random.RandomState(0)
        for x in (0.0, 3.3, 25.0, 155.0, 500.0):
            d = rng.dirichlet(np.ones(DCFG.atoms)).astype(np.float32)
            want = np_shift_distribution(d, x, 0.0, DCFG.vmax)
            got = np.asarray(DD.shift_distribution(jnp.asarray(d), x, DCFG))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_shift_conserves_mass(self):
        d = np.full(DCFG.atoms, 1.0 / DCFG.atoms, np.float32)
        out = np.asarray(DD.shift_distribution(jnp.asarray(d), 42.0, DCFG))
        assert out.sum() == pytest.approx(1.0, abs=1e-5)

    def test_mean_dist(self):
        d = np.zeros(DCFG.atoms, np.float32)
        d[3] = 1.0
        delta = DCFG.vmax / DCFG.atoms
        assert float(DD.mean_dist(jnp.asarray(d), DCFG)) == pytest.approx(
            (3 + 0.5) * delta
        )


def small_cfg(sims=4):
    return SearchConfig(
        tree=TreeConfig(max_nodes=512, max_obs=512, table_size=1024,
                        max_depth=24),
        sims=sims,
    )


class TestDistBackup:
    def test_backup_welford_matches_reference(self):
        """backup_trace_distributional scalar stats (core_distributional.py:
        110-125): x = mean(dist) + (r - score), welford over x."""
        from tetris_mcts_tpu.env import engine

        c = small_cfg()
        envs = engine.reset_batch(2, 1, c.tree.env)
        env0 = jax.tree.map(lambda leaf: leaf[0], envs)
        dt = DD.init_dist_tree(env0, c.tree, DCFG)

        d = np.zeros(DCFG.atoms, np.float32)
        d[2] = 1.0  # mean = 25.0 with atoms=16, vmax=160
        trace = jnp.zeros(c.tree.max_depth, jnp.int32).at[0].set(dt.base.root)

        dt = DD.backup(dt, trace, jnp.int32(1), 100.0, jnp.asarray(d),
                       c.tree, DCFG)
        o = int(dt.base.n_to_o[int(dt.base.root)])
        mean0 = float(DD.mean_dist(jnp.asarray(d), DCFG))
        assert int(dt.base.obs_visit[o]) == 1
        assert float(dt.base.obs_value[o]) == pytest.approx(mean0 + 100.0)

        dt = DD.backup(dt, trace, jnp.int32(1), 50.0, jnp.asarray(d),
                       c.tree, DCFG)
        x1, x2 = mean0 + 100.0, mean0 + 50.0
        assert float(dt.base.obs_value[o]) == pytest.approx((x1 + x2) / 2)
        # sample variance ns[3] = M2 / (n-1)
        m2 = (x1 - (x1 + x2) / 2) ** 2 + (x2 - (x1 + x2) / 2) ** 2
        assert float(dt.obs_m2[o]) == pytest.approx(m2, rel=1e-4)
        # node distribution = running mean of shifted leaf dists
        np.testing.assert_allclose(
            np.asarray(dt.obs_dist[:, o]),
            (np_shift_distribution(d, 100.0, 0, DCFG.vmax)
             + np_shift_distribution(d, 50.0, 0, DCFG.vmax)) / 2,
            rtol=1e-4, atol=1e-6,
        )


class TestDistMove:
    def test_move_runs(self):
        c = small_cfg()

        def apply_fn(params, imgs):
            B = imgs.shape[0]
            return jnp.full((B, DCFG.atoms), 1.0 / DCFG.atoms)

        move = jax.jit(DD.make_dist_move_fn(apply_fn, c, DCFG,
                                            min_visits_store=1))
        dtrees, envs = DD.init_dist_batch(0, 4, c, DCFG)
        replay = DD.init_dist_replay(512, DCFG.atoms)
        dtrees, envs, replay, stats = move(
            None, dtrees, envs, replay, jax.random.PRNGKey(0)
        )
        assert stats.action.shape == (4,)
        p = np.asarray(stats.probs)
        np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-4)


def test_dist_driver_trains():
    from tetris_mcts_tpu.runtime.selfplay import (
        DistSelfPlayDriver, SelfPlayConfig,
    )

    d = DistSelfPlayDriver(
        SelfPlayConfig(
            batch=4, sims=4, max_nodes=512, max_obs=512, table_size=1024,
            max_depth=24, min_visits_store=1, memory_size=2048,
            memory_growth=64, train_rows_trigger=64, train_batch=16,
            train_iters_per_val=5, train_max_iters=10, seed=21,
        ),
        atoms=16, vmax=160.0, log=lambda s: None,
    )
    d.run(25)
    assert d.moves == 25
    assert d.total_rows > 0
    assert d.n_trains >= 1
    # --low must reach the distributional select (it reads dcfg.low, not
    # TreeConfig.low; SelfPlayConfig's default low is what the CLI computed)
    assert d.dcfg.low == d.cfg.low
    # stored target distributions are normalized
    cnt = int(d.replay.count)
    sums = np.asarray(d.replay.dist)[:cnt].sum(axis=1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-3)


class TestDistSelect:
    def test_select_matches_policy_dist(self):
        """Golden check of the selection bonus (`policy_dist`,
        core_distributional.py:67-80): Q = mean + score delta +
        norm_quantile(N)·sqrt(ns[3]/(n+eps)) with ns[3] = M2/(n-1) — a
        standard-error term (the /n was once dropped; this pins it)."""
        from tetris_mcts_tpu.env import engine
        from tetris_mcts_tpu.search import tree as T
        from tetris_mcts_tpu.search.quantiles import norm_quantile

        c = small_cfg()
        envs = engine.reset_batch(5, 1, c.tree.env)
        env0 = jax.tree.map(lambda leaf: leaf[0], envs)
        dt = DD.init_dist_tree(env0, c.tree, DCFG)
        base, _ = T.expand(
            dt.base, env0, dt.base.root, jnp.asarray(True), c.tree
        )
        kids, obs, kept = T.unique_children(base, base.root)
        kids_np, obs_np, kept_np = map(np.asarray, (kids, obs, kept))

        rng = np.random.RandomState(7)
        visit = np.asarray(base.obs_visit).copy()
        value = np.asarray(base.obs_value).copy()
        m2 = np.asarray(dt.obs_m2).copy()
        for o in obs_np[kept_np]:
            visit[o] = rng.randint(6, 20)   # above low=5: policy path
            value[o] = rng.rand() * 50
            m2[o] = rng.rand() * 400
        base = base.with_fields(
            obs_visit=jnp.asarray(visit), obs_value=jnp.asarray(value)
        )
        dt = dt._replace(base=base, obs_m2=jnp.asarray(m2))

        score = np.asarray(base.score)
        root = int(base.root)
        ks, os_ = kids_np[kept_np], obs_np[kept_np]
        n = visit[os_].sum()
        eps = 1e-3
        q = (
            value[os_] + score[ks] - score[root]
            + float(norm_quantile(n))
            * np.sqrt(
                m2[os_] / ((visit[os_] - 1.0 + eps) * (visit[os_] + eps))
            )
        )
        want = ks[np.argmax(q)]
        trace, acts, length = DD.select(
            dt, jax.random.PRNGKey(0), c.tree, DCFG
        )
        assert int(length) == 2
        assert int(trace[1]) == int(want)


class TestBatchedDistSelect:
    """The hand-batched dist select must be bit-exact vs vmapping the
    per-tree walk — same draw stream, traces, lengths."""

    def _grown(self, B=5, sims=8, seed=4):
        c = small_cfg(sims=sims)

        def apply_fn(params, imgs):
            n = imgs.shape[0]
            return jnp.full((n, DCFG.atoms), 1.0 / DCFG.atoms)

        move = jax.jit(DD.make_dist_move_fn(apply_fn, c, DCFG,
                                            min_visits_store=1))
        dtrees, envs = DD.init_dist_batch(seed, B, c, DCFG)
        replay = DD.init_dist_replay(512, DCFG.atoms)
        key = jax.random.PRNGKey(seed)
        for _ in range(2):
            key, k = jax.random.split(key)
            dtrees, envs, replay, _ = move(None, dtrees, envs, replay, k)
        return c, dtrees

    def test_select_matches_vmapped(self):
        c, dtrees = self._grown()
        B = int(dtrees.base.root.shape[0])
        keys = jax.random.split(jax.random.PRNGKey(13), B)
        t_b, a_b, l_b = DD.select_batched(dtrees, keys, c.tree, DCFG)
        t_v, a_v, l_v = jax.vmap(DD.select, in_axes=(0, 0, None, None))(
            dtrees, keys, c.tree, DCFG
        )
        np.testing.assert_array_equal(np.asarray(l_b), np.asarray(l_v))
        np.testing.assert_array_equal(np.asarray(t_b), np.asarray(t_v))
        np.testing.assert_array_equal(np.asarray(a_b), np.asarray(a_v))

    def test_backup_matches_vmapped(self):
        """The hand-batched dist backup (visit/value/M2 scalars AND the
        running-mean distribution columns) must be bit-exact vs vmapping
        the per-tree walk, including lanes of different trace lengths."""
        c, dtrees = self._grown()
        B = int(dtrees.base.root.shape[0])
        keys = jax.random.split(jax.random.PRNGKey(29), B)
        traces, acts, lengths = DD.select_batched(dtrees, keys, c.tree, DCFG)
        rng = np.random.RandomState(5)
        r = jnp.asarray(rng.uniform(0, 200, B), jnp.float32)
        d = rng.rand(B, DCFG.atoms).astype(np.float32)
        dist = jnp.asarray(d / d.sum(axis=1, keepdims=True))

        got = DD.backup_batched(dtrees, traces, lengths, r, dist,
                                c.tree, DCFG)
        want = jax.vmap(
            DD.backup, in_axes=(0, 0, 0, 0, 0, None, None)
        )(dtrees, traces, lengths, r, dist, c.tree, DCFG)

        np.testing.assert_array_equal(np.asarray(got.base.visits),
                                      np.asarray(want.base.visits))
        np.testing.assert_array_equal(np.asarray(got.base.values),
                                      np.asarray(want.base.values))
        np.testing.assert_array_equal(np.asarray(got.obs_m2),
                                      np.asarray(want.obs_m2))
        np.testing.assert_array_equal(np.asarray(got.obs_dist),
                                      np.asarray(want.obs_dist))
