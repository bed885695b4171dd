"""bfloat16 in-search inference path (`--bf16`).

The net's compute dtype is an inference-time override (`VVModel.apply_fn`):
training always runs float32 so loss trajectories stay comparable to the
reference's curves, while the move program's forward can run on the MXU's
native bfloat16 (bench.py measures this configuration). These tests pin the
contract: same params, dtype-only closure change, outputs within bf16
rounding of the f32 forward, heads still f32, and the driver runs end to end
with the flag on.
"""

import jax.numpy as jnp
import numpy as np

from tetris_mcts_tpu.runtime.selfplay import SelfPlayConfig, SelfPlayDriver
from tetris_mcts_tpu.train.trainer import DistModel, VPModel, VVModel


def _boards(n, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, 2, size=(n, 20, 10, 1)), jnp.float32)


def test_vv_bf16_close_to_f32():
    m = VVModel(seed=5)
    x = _boards(32)
    v32, var32 = m.apply_fn()(m.params, m.ubound, x)
    v16, var16 = m.apply_fn(jnp.bfloat16)(m.params, m.ubound, x)
    assert v16.dtype == jnp.float32 and var16.dtype == jnp.float32
    # outputs are sigmoid-bounded to [0, 1e2] / [eps, 1e3]: bf16's ~3
    # significant digits through 4 layers lands well inside 1% of scale
    np.testing.assert_allclose(v16, v32, atol=1.0)
    np.testing.assert_allclose(var16, var32, atol=10.0)
    assert not np.allclose(v16, v32)  # genuinely a different compute path


def test_vp_dist_bf16_close_to_f32():
    x = _boards(16, seed=1)
    vp = VPModel(seed=5)
    v32, l32 = vp.apply_fn()(vp.params, x)
    v16, l16 = vp.apply_fn(jnp.bfloat16)(vp.params, x)
    np.testing.assert_allclose(v16, v32, rtol=0.05, atol=2.0)
    np.testing.assert_allclose(l16, l32, atol=0.1)

    dm = DistModel(seed=5, atoms=11)
    p32 = dm.apply_fn()(dm.params, x)
    p16 = dm.apply_fn(jnp.bfloat16)(dm.params, x)
    assert p16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.sum(np.asarray(p16), axis=-1), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(p16, p32, atol=0.02)


def test_driver_runs_with_bf16():
    cfg = SelfPlayConfig(
        batch=4, sims=3, evaluator="lp",
        max_nodes=256, max_obs=256, table_size=512, max_depth=16,
        min_visits_store=1, memory_size=512, memory_growth=64,
        train_rows_trigger=64, train_batch=16,
        train_iters_per_val=2, train_max_iters=4,
        seed=9, bf16=True,
    )
    d = SelfPlayDriver(cfg, log=lambda s: None)
    d.run(6)
    assert d.moves == 6
    # training (if triggered) ran f32 regardless of the inference override
    assert d.model.net.compute_dtype == jnp.float32
