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


class TestPackedStepParity:
    """ops/env_packed.packed_step must be bit-exact vs engine.step across
    every config combination — the fused selection kernel steps env state
    with packed_step, so a drift here silently corrupts the search."""

    def _fuzz(self, app, scoring, randomizer, steps=120, B=32):
        import jax
        from tetris_mcts_tpu.env.engine import (
            EnvConfig, pack_state, reset_batch, step_batch,
        )
        from tetris_mcts_tpu.ops.env_packed import packed_step

        cfg = EnvConfig(actions_per_drop=app, scoring=scoring,
                        randomizer=randomizer)
        s = reset_batch(911 + app, B, cfg)
        rng = np.random.RandomState(app * 10 + scoring * 2 + randomizer)
        packed = pack_state(s)
        stepf = jax.jit(lambda st, a: step_batch(st, a, cfg))
        pstepf = jax.jit(
            lambda e, a: packed_step(
                e, a, actions_per_drop=app, scoring=scoring,
                randomizer=randomizer,
            )
        )
        for t in range(steps):
            acts = jnp.asarray(rng.randint(0, 7, (B,)), jnp.int32)
            s = stepf(s, acts)
            packed = pstepf(packed, acts[:, None])
            if t % 30 == 29:
                np.testing.assert_array_equal(
                    np.asarray(packed), np.asarray(pack_state(s)),
                    err_msg=f"packed_step drift at t={t} "
                            f"(app={app} scoring={scoring} rnd={randomizer})",
                )
        np.testing.assert_array_equal(
            np.asarray(packed), np.asarray(pack_state(s)))

    def test_guideline_bag_gravity_off(self):
        self._fuzz(app=0, scoring=0, randomizer=0)

    def test_guideline_bag_gravity_1(self):
        self._fuzz(app=1, scoring=0, randomizer=0)

    def test_raw_uniform_gravity_2(self):
        self._fuzz(app=2, scoring=1, randomizer=1)


def test_xla_im2col_forward_matches_flax():
    from tetris_mcts_tpu.ops.vv_forward import vv_forward_xla_im2col

    model = VVModel(seed=5)
    rng = np.random.RandomState(2)
    packed = jnp.asarray(rng.randint(0, 2**20, (48, 20)).astype(np.uint32))
    imgs = engine.unpack_obs(packed)[..., None].astype(jnp.float32)
    v_ref, var_ref = model._infer(model.params, model.ubound, imgs)
    v, var = vv_forward_xla_im2col(
        model.params, model.ubound, model.lbound, imgs)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-4, atol=1e-2)


def test_select_kernel_config_guard(monkeypatch):
    # On real TPU, configs outside the verified region (pools <= 2048,
    # depth <= 64 — any batch since the round-4 aliasing fix; the round-3
    # small-batch failure mode was the backup kernels' input_output_aliases
    # miscompiling, ops/tree_walk.py KNOWN ISSUE) must auto-route to the
    # XLA walk without a manual --select_kernel 0.
    from tetris_mcts_tpu.ops import tree_walk
    from tetris_mcts_tpu.search.tree import TreeConfig

    good = TreeConfig(max_nodes=2048, max_obs=2048, max_depth=64)
    campaign = TreeConfig(max_nodes=3584, max_obs=3584, max_depth=96)
    huge = TreeConfig(max_nodes=16384, max_obs=16384, max_depth=192)

    # off-TPU (the interpreter path) every config is fine
    assert tree_walk.select_kernel_config_ok(good, 64)
    assert tree_walk.select_kernel_config_ok(huge, 256)

    monkeypatch.setattr(tree_walk, "on_tpu", lambda: True)
    assert tree_walk.select_kernel_config_ok(good, 256)
    assert tree_walk.select_kernel_config_ok(good, 64)       # small batch ok
    assert tree_walk.select_kernel_config_ok(campaign, 256)  # 3584:96 ok
    assert not tree_walk.select_kernel_config_ok(huge, 256)  # beyond envelope
    # sub-32 batches are outside the round-4 verification matrix (B=32..256)
    assert not tree_walk.select_kernel_config_ok(good, 8)
    assert tree_walk.select_kernel_config_ok(good, 32)
    # the bisect harness can force the kernel back on
    monkeypatch.setenv("TMT_FORCE_SELECT_KERNEL", "1")
    assert tree_walk.select_kernel_config_ok(huge, 64)
    monkeypatch.delenv("TMT_FORCE_SELECT_KERNEL")

    # the legacy shape-only guard mirrors the pool/depth part of the region
    assert tree_walk.select_kernel_shape_ok(good)
    assert tree_walk.select_kernel_shape_ok(campaign)
    assert not tree_walk.select_kernel_shape_ok(huge)


def test_insert_kernel_config_guard():
    """The insert kernel's minimum block is bg=8 (sublane tile), so beyond
    a table size no block fits the 64 MB scoped-VMEM ceiling (measured:
    T=131072 at bg=8 = 76.05 MB stack, compile rejected — round-5 bisect
    launch). The guard must reject exactly those shapes; every config any
    campaign actually ran stays allowed."""
    from tetris_mcts_tpu.ops import tree_walk

    ok = tree_walk.insert_kernel_config_ok
    assert ok(256, 4096)        # campaign2 (3584 pools, default table)
    assert ok(256, 16384)       # campaign3 (8192 pools)
    assert ok(64, 16384)        # benchmark twin
    assert not ok(8, 131072)    # bisect: 65536 pools -> table 131072
    assert not ok(256, 131072)  # same table at any batch: bg floors at 8
