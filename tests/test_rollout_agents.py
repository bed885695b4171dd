"""Policy-guided playout agents — the legacy HybridSim/FiniteSim/FullSim
(`/root/reference/agents/HybridSim.py:26-57`, `FiniteSim.py:26-48`,
`FullSim.py:24-43`) rebuilt on the batched driver.

Semantics under test (vs an eager per-lane oracle over `engine.step`):
depth caps (30/50/to-end), end-of-game self-masking, and HybridSim's value
bootstrap (final score + NN value at the playout end, v=0 when the playout
died)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.search import mcts
from tetris_mcts_tpu.search.mcts import SearchConfig
from tetris_mcts_tpu.search.tree import TreeConfig

BOOT_V = 7.5
FORCED_ACTION = 4  # "down" — advances the game deterministically


def _stub_vp_apply(params, imgs):
    """Deterministic (v, logits): logits overwhelmingly favor FORCED_ACTION
    so `jax.random.categorical` picks it with probability ~1-1e-21, making
    the playout's action sequence deterministic for the oracle."""
    n = imgs.shape[0]
    v = jnp.full((n, 1), BOOT_V, jnp.float32)
    logits = jnp.full((n, 7), -50.0).at[:, FORCED_ACTION].set(50.0)
    return v, logits


def _oracle(leaf_states, depth, bootstrap, env_cfg):
    """Per-lane eager replication: step FORCED_ACTION `depth` times
    (engine.step self-masks ended lanes), value = final score
    (+ BOOT_V on non-ended lanes when bootstrap)."""
    B = leaf_states.score.shape[0]
    out = np.zeros(B, np.float32)
    for b in range(B):
        st = jax.tree.map(lambda a: a[b], leaf_states)
        for _ in range(depth):
            if bool(st.end):  # step() is a no-op at end; skip the dispatch
                break
            st = engine.step(st, FORCED_ACTION, env_cfg)
        v = float(st.score)
        if bootstrap and not bool(st.end):
            v += BOOT_V
        out[b] = v
    return out


@pytest.fixture(scope="module")
def leaf_states():
    cfg = engine.EnvConfig()
    envs = engine.reset_batch(123, 6, cfg)
    # advance a few moves so boards differ across lanes
    key = jax.random.PRNGKey(0)
    for _ in range(8):
        key, sub = jax.random.split(key)
        a = jax.random.randint(sub, (6,), 0, 7)
        envs = engine.step_batch(envs, a, cfg)
    return envs


@pytest.mark.parametrize("depth,bootstrap", [(5, False), (5, True), (64, False)])
def test_policy_rollout_matches_oracle(leaf_states, depth, bootstrap):
    cfg = SearchConfig(tree=TreeConfig(max_nodes=64, max_obs=64,
                                       table_size=128))
    ev = mcts.policy_rollout_evaluator(_stub_vp_apply, cfg, depth, bootstrap)
    v, var = jax.jit(ev)(None, None, None, leaf_states, jax.random.PRNGKey(7))
    expect = _oracle(leaf_states, depth, bootstrap, cfg.tree.env)
    np.testing.assert_allclose(np.asarray(v), expect, rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(var), np.full_like(expect, cfg.rollout_variance)
    )


def test_full_rollout_runs_to_game_end(leaf_states):
    """With depth >= any game length the playout ends every lane (FullSim's
    to-game-end contract): value equals the terminal score."""
    cfg = SearchConfig(tree=TreeConfig(max_nodes=64, max_obs=64,
                                       table_size=128))
    ev = mcts.policy_rollout_evaluator(_stub_vp_apply, cfg, 10_000, False)
    v, _ = jax.jit(ev)(None, None, None, leaf_states, jax.random.PRNGKey(3))
    # the oracle with a huge depth cap also terminates (step no-ops at end)
    expect = _oracle(leaf_states, 10_000, False, cfg.tree.env)
    np.testing.assert_allclose(np.asarray(v), expect)


@pytest.mark.parametrize("evaluator", ["hybrid", "finite", "full"])
def test_driver_end_to_end(evaluator):
    """SelfPlayDriver wires a VPModel by default and plays moves."""
    from tetris_mcts_tpu.runtime.selfplay import SelfPlayConfig, SelfPlayDriver
    from tetris_mcts_tpu.train.trainer import VPModel

    cfg = SelfPlayConfig(
        batch=4, sims=3, evaluator=evaluator, max_nodes=256, max_obs=256,
        table_size=512, max_depth=32, memory_size=512, benchmark=True,
        rollout_depth=4, seed=1,
    )
    d = SelfPlayDriver(cfg, log=lambda s: None)
    assert isinstance(d.model, VPModel)
    for _ in range(3):
        stats = d.step()
    assert np.isfinite(np.asarray(stats.root_value)).all()
    assert (np.asarray(stats.action) >= 0).all()


def test_cli_agent_types_dispatch(tmp_path):
    """`--agent_type FiniteSim` runs the batched driver on the VP net with
    no training (legacy agents never trained)."""
    from tetris_mcts_tpu.cli import play as cli_play

    d = cli_play.main([
        "--agent_type", "FiniteSim", "--batch", "2", "--mcts_sims", "2",
        "--ngames", "1", "--max_moves", "6", "--max_nodes", "128",
        "--max_obs", "128", "--rollout_depth", "3", "--seed", "2",
        "--checkpoint", str(tmp_path / "vp.msgpack"),
    ])
    assert d.cfg.evaluator == "finite"
    assert d.cfg.benchmark  # no online training for the legacy agents
    assert d.moves > 0
