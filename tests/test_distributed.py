"""Multi-host runtime tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from tetris_mcts_tpu.runtime import distributed as D
from tetris_mcts_tpu.runtime.selfplay import SelfPlayConfig


def test_init_single_process_noop():
    assert D.init_distributed() == 0


def test_global_mesh_spans_devices():
    m = D.global_mesh()
    assert m.devices.size == len(jax.devices())


def test_host_fold_changes_key():
    k = jax.random.PRNGKey(0)
    assert not np.array_equal(np.asarray(k), np.asarray(D.host_fold(k)))


def test_local_batch():
    assert D.local_batch(64) == 64  # single process


def test_distributed_selfplay_steps_on_mesh():
    d = D.DistributedSelfPlay(
        SelfPlayConfig(
            batch=8, sims=3, max_nodes=256, max_obs=256, table_size=512,
            max_depth=16, benchmark=True, seed=5,
        ),
        log=lambda s: None,
    )
    d.run(3)
    assert d.driver.moves == 3
    # state is sharded over the full mesh
    shards = d.driver.envs.score.sharding.device_set
    assert len(shards) == len(jax.devices())
