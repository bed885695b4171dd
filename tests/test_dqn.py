"""Batched DQN agent tests (reference agents/DQN.py semantics)."""

import jax.numpy as jnp
import numpy as np

from tetris_mcts_tpu.runtime.dqn import DQNConfig, DQNDriver


def test_dqn_standard_trains():
    d = DQNDriver(
        DQNConfig(batch=4, memory_size=512, train_batch=8,
                  target_update_steps=5, seed=1),
        log=lambda s: None,
    )
    d.run(12)
    assert d.moves == 12
    assert int(d.replay.count) == 4 * 12
    assert d.updates == 12
    # target net synced at least twice
    assert d.updates // d.cfg.target_update_steps >= 2
    loss = float(d.step()["loss"])
    assert np.isfinite(loss)


def test_dqn_eps_anneals():
    d = DQNDriver(
        DQNConfig(batch=8, memory_size=64, train_batch=8, seed=2),
        log=lambda s: None,
    )
    e0 = d.eps
    d.run(10)  # fills the tiny memory completely
    assert d.eps < e0
    assert abs(d.eps - d.cfg.eps_final) < 1e-9


def test_dqn_distributional_trains():
    d = DQNDriver(
        DQNConfig(batch=4, memory_size=256, train_batch=8,
                  distributional=True, atoms=16, vmax=160.0, seed=3),
        log=lambda s: None,
    )
    d.run(6)
    loss = float(d.step()["loss"])
    assert np.isfinite(loss) and loss > 0


def test_dqn_benchmark_mode_plays_without_training():
    """--benchmark contract: greedy eval — no SGD, no replay writes, eps
    pinned to eps_final."""
    import jax

    d = DQNDriver(
        DQNConfig(batch=4, memory_size=512, train_batch=8, benchmark=True,
                  seed=3),
        log=lambda s: None,
    )
    p0 = jax.device_get(d.params)
    assert abs(d.eps - d.cfg.eps_final) < 1e-9
    d.run(6)
    assert int(d.replay.count) == 0
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(d.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dqn_save_load_roundtrip(tmp_path):
    import jax

    d = DQNDriver(
        DQNConfig(batch=4, memory_size=256, train_batch=8, seed=4),
        log=lambda s: None,
        checkpoint_path=str(tmp_path / "dqn.msgpack"),
    )
    d.run(4)
    d.save()
    d2 = DQNDriver(
        DQNConfig(batch=4, memory_size=256, train_batch=8, seed=99),
        log=lambda s: None,
        checkpoint_path=str(tmp_path / "dqn.msgpack"),
    )
    assert d2.load()
    for a, b in zip(jax.tree.leaves(d.params), jax.tree.leaves(d2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
