"""SPMD correctness on the virtual 8-device CPU mesh (conftest.py).

The reference has no distributed layer (SURVEY.md §2.7); these tests pin the
new framework's sharding story: the same program, sharded over the mesh, must
produce the same numbers as the single-device run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_mcts_tpu.parallel import mesh as M
from tetris_mcts_tpu.search import mcts
from tetris_mcts_tpu.search.mcts import SearchConfig
from tetris_mcts_tpu.search.tree import TreeConfig
from tetris_mcts_tpu.train.trainer import VVModel


def small_search_cfg():
    return SearchConfig(
        tree=TreeConfig(max_nodes=256, max_obs=256, table_size=512, max_depth=16),
        sims=3,
        evaluator="lp",
    )


def test_mesh_shapes():
    m = M.make_mesh(8)
    assert m.devices.shape == (8,)
    m2 = M.make_mesh(8, model_parallel=2)
    assert m2.devices.shape == (4, 2)
    assert m2.axis_names == (M.DATA_AXIS, M.MODEL_AXIS)


def test_sharded_move_matches_single_device():
    cfg = small_search_cfg()
    model = VVModel(seed=0)
    ev = mcts.nn_child_evaluator(model.apply_fn())
    move = mcts.make_move_fn(ev, cfg, min_visits_store=1)

    trees, envs = mcts.init_batch(7, 8, cfg)
    replay = mcts.init_replay(256)
    key = jax.random.PRNGKey(5)

    ref = jax.jit(move)(model.params, model.ubound, trees, envs, replay, key)

    m = M.make_mesh(8)
    smove = M.sharded_move_fn(move, m)
    got = smove(model.params, model.ubound, trees, envs, replay, key)

    for a, b, name in zip(
        jax.tree.leaves(ref), jax.tree.leaves(got),
        [str(p) for p, _ in jax.tree_util.tree_leaves_with_path(ref)],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5, err_msg=name
        )


def test_sharded_vp_move_matches_single_device():
    """The VP (ApproxPolicyIter) move program under batch sharding: same
    numbers as single-device — covers the policy-prior gathers and the
    improvement-count 3-index scatters under SPMD."""
    from tetris_mcts_tpu.search import vp as VP
    from tetris_mcts_tpu.train.trainer import VPModel

    cfg = small_search_cfg()
    model = VPModel(seed=0)
    move = VP.make_vp_move_fn(model.apply_fn(), cfg, min_visits_store=1)
    vts, envs = VP.init_vp_batch(3, 8, cfg)
    rep = VP.init_vp_replay(256)
    key = jax.random.PRNGKey(2)

    ref = jax.jit(move)(model.params, vts, envs, rep, key)
    m = M.make_mesh(8)
    got = jax.jit(move)(
        M.replicate(m, model.params), M.shard_batch(m, vts),
        M.shard_batch(m, envs), M.replicate(m, rep), key,
    )
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(ref), jax.tree.leaves(got)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
            err_msg=str(path),
        )


def test_sharded_s2_move_matches_single_device():
    """The ValueSim2 move program under batch sharding: covers the
    (B, 7, C, M) edge-table gathers/scatters under SPMD."""
    from tetris_mcts_tpu.search import stochastic as S2

    cfg = small_search_cfg()

    def apply_fn(params, ubound, imgs):
        n = imgs.shape[0]
        v = jnp.sum(imgs.reshape(n, -1), 1) * 0.01 + 1.0
        return v, jnp.ones(n)

    move = S2.make_s2_move_fn(apply_fn, cfg, min_visits_store=1)
    vts, envs = S2.init_s2_batch(5, 8, cfg)
    rep = mcts.init_replay(256)
    key = jax.random.PRNGKey(4)

    ref = jax.jit(move)(None, None, vts, envs, rep, key)
    m = M.make_mesh(8)
    got = jax.jit(move)(
        None, None, M.shard_batch(m, vts), M.shard_batch(m, envs),
        M.replicate(m, rep), key,
    )
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(ref), jax.tree.leaves(got)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
            err_msg=str(path),
        )


def test_dp_train_step_matches_single_device():
    model = VVModel(seed=1)
    n = 64
    rng = np.random.RandomState(0)
    data = (
        jnp.asarray(rng.randint(0, 2, (n, 20, 10, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 50, n), jnp.float32),
        jnp.asarray(rng.uniform(1, 10, n), jnp.float32),
        jnp.ones(n, jnp.float32),
    )
    key = jax.random.PRNGKey(2)
    args = (model.fisher, model.p0, jnp.float32(0.0), 32)

    p_ref, _, m_ref, _ = model._train_step(
        model.params, model.opt_state, model.ubound, data, key, *args
    )

    m = M.make_mesh(8)
    step = M.sharded_train_step(model, m)
    p_got, _, m_got, _ = step(
        model.params, model.opt_state, model.ubound, data, key, *args
    )

    assert np.allclose(float(m_ref["loss"]), float(m_got["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_got)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_scaling_bench_script_runs():
    """scripts/scaling_bench.py (the BASELINE scaling-row measurement
    harness) produces per-mesh-size rate rows plus a weak-scaling summary
    on virtual CPU devices."""
    import json
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(root / "scripts" / "scaling_bench.py"),
         "--virtual", "2", "--sizes", "1,2", "--reps", "1",
         "--batch_per_device", "8", "--env_batch_per_device", "64",
         "--sims", "3", "--moves", "1"],
        capture_output=True, text=True, timeout=900, cwd=str(root),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(l) for l in proc.stdout.strip().splitlines()]
    assert [r.get("devices") for r in rows[:-1]] == [1, 2]
    assert all(r["sims_per_s"] > 0 and r["env_steps_per_s"] > 0
               and r["train_rows_per_s"] > 0 for r in rows[:-1])
    summary = rows[-1]
    assert summary["metric"] == "weak_scaling_efficiency"
    assert summary["sims_efficiency"][0] == 1.0


def test_tp_train_step_runs():
    """2D (data x model) mesh: megatron-split FC block compiles and matches."""
    model = VVModel(seed=1)
    n = 32
    rng = np.random.RandomState(1)
    data = (
        jnp.asarray(rng.randint(0, 2, (n, 20, 10, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 50, n), jnp.float32),
        jnp.asarray(rng.uniform(1, 10, n), jnp.float32),
        jnp.ones(n, jnp.float32),
    )
    key = jax.random.PRNGKey(3)
    args = (model.fisher, model.p0, jnp.float32(0.0), 16)

    p_ref, _, m_ref, _ = model._train_step(
        model.params, model.opt_state, model.ubound, data, key, *args
    )
    m2 = M.make_mesh(8, model_parallel=2)
    step = M.sharded_train_step(model, m2)
    p_got, _, m_got, _ = step(
        model.params, model.opt_state, model.ubound, data, key, *args
    )
    assert np.allclose(float(m_ref["loss"]), float(m_got["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_got)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_sharded_learner_matches_and_donates():
    """make_sharded_learner: persistent mesh state, donated steps, results
    equal to the single-device train step; the model's own arrays survive
    the donation (the state owns private buffers)."""
    model = VVModel(seed=4)
    n = 64
    rng = np.random.RandomState(5)
    data = (
        jnp.asarray(rng.randint(0, 2, (n, 20, 10, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 50, n), jnp.float32),
        jnp.asarray(rng.uniform(1, 10, n), jnp.float32),
        jnp.ones(n, jnp.float32),
    )
    key = jax.random.PRNGKey(6)

    p_ref, o_ref, m_ref, _ = model._train_step(
        model.params, model.opt_state, model.ubound, data, key,
        model.fisher, model.p0, jnp.float32(0.0), 32,
    )
    p_ref2, _, m_ref2, _ = model._train_step(
        p_ref, o_ref, model.ubound, data, jax.random.PRNGKey(7),
        model.fisher, model.p0, jnp.float32(0.0), 32,
    )

    m = M.make_mesh(8)
    state, step = M.make_sharded_learner(model, m)
    state, m_got, _ = step(state, model.ubound, data, key,
                           jnp.float32(0.0), 32)
    assert np.allclose(float(m_ref["loss"]), float(m_got["loss"]), rtol=1e-5)
    # second (steady-state, donated) step
    state, m_got2, _ = step(state, model.ubound, data, jax.random.PRNGKey(7),
                            jnp.float32(0.0), 32)
    assert np.allclose(float(m_ref2["loss"]), float(m_got2["loss"]),
                       rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p_ref2), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # donation must not have clobbered the model's own arrays
    for leaf in jax.tree.leaves(model.params) + jax.tree.leaves(
            model.opt_state) + jax.tree.leaves(model.fisher):
        np.asarray(leaf)  # raises if the buffer was deleted
