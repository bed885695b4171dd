"""ops/vv_forward: the fused packed-input VV forward must match the flax
net (CPU runs the jnp path; the pallas path is validated on TPU manually —
see the module docstring for the measured verdict)."""

import jax.numpy as jnp
import numpy as np

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.ops.vv_forward import unpack_pm1, vv_forward_packed
from tetris_mcts_tpu.train.trainer import VVModel


def test_unpack_pm1_matches_engine():
    rng = np.random.RandomState(0)
    packed = jnp.asarray(rng.randint(0, 2**20, (16, 20)).astype(np.uint32))
    want = np.asarray(engine.unpack_obs(packed), np.float32)
    got = np.asarray(unpack_pm1(packed))
    np.testing.assert_array_equal(got, want)


def test_fused_forward_matches_flax():
    model = VVModel(seed=3)
    rng = np.random.RandomState(1)
    packed = jnp.asarray(rng.randint(0, 2**20, (64, 20)).astype(np.uint32))
    imgs = engine.unpack_obs(packed)[..., None].astype(jnp.float32)
    v_ref, var_ref = model._infer(model.params, model.ubound, imgs)
    v, var = vv_forward_packed(
        model.params, model.ubound, model.lbound, packed, use_pallas=False
    )
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-4, atol=1e-2)
