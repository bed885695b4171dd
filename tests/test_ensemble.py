"""EnsembleVVModel — the reference's broken `model_vv.Ensemble`
(`/root/reference/model/model_vv.py:55-72`) rebuilt working
(train/ensemble.py). Tests: stacked-member init, law-of-total-variance
combination, inherited train_data session, checkpoint roundtrip, and the
ensemble as an in-search evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_mcts_tpu.train.ensemble import EnsembleVVModel


@pytest.fixture(scope="module")
def model():
    return EnsembleVVModel(n_models=3, seed=0)


def _boards(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(-1, 2, (n, 20, 10)).astype(np.int8)


def test_members_are_stacked_and_distinct(model):
    leaves = jax.tree.leaves(model.params)
    assert all(l.shape[0] == 3 for l in leaves)
    # different init seeds -> different member weights (biases init to the
    # same zeros; some kernel leaf must differ)
    assert any(
        not np.allclose(np.asarray(l[0]), np.asarray(l[1])) for l in leaves
    )


def test_combination_is_law_of_total_variance(model):
    boards = _boards(5)
    v, var = model.inference(boards)           # combined (N,1), (N,1)
    mv, mvar = model.member_inference(boards)  # per-member (K,N)
    np.testing.assert_allclose(v[:, 0], mv.mean(0), rtol=1e-5)
    np.testing.assert_allclose(
        var[:, 0], mvar.mean(0) + mv.var(0), rtol=1e-5
    )
    # epistemic spread makes the ensemble variance exceed the member mean
    assert (var[:, 0] >= mvar.mean(0) - 1e-5).all()


def test_train_data_session_runs_and_learns(tmp_path):
    m = EnsembleVVModel(n_models=2, seed=1)
    rng = np.random.RandomState(3)
    n = 256
    boards = rng.randint(-1, 2, (n, 20, 10)).astype(np.int8)
    value = boards.reshape(n, -1).sum(1).astype(np.float32) + 50.0
    var = np.full(n, 4.0, np.float32)
    w = np.ones(n, np.float32)
    # dump_dir redirected: the grad watchdog fires on random-data sessions
    # and must not overwrite the repo's tracked data/dump_grad.npz
    hist = m.train_data(
        [boards, value, var, w], batch_size=32, iters_per_val=20,
        max_iters=60, early_stopping=False, log=lambda s: None,
        dump_dir=str(tmp_path),
    )
    assert len(hist) == 3
    assert np.isfinite(hist[-1][1]) and np.isfinite(hist[-1][2])


def test_checkpoint_roundtrip(tmp_path, model):
    path = str(tmp_path / "ens.msgpack")
    model.save(path)
    m2 = EnsembleVVModel(n_models=3, seed=9)
    assert m2.load(path)
    a = jax.tree.leaves(model.params)
    b = jax.tree.leaves(m2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    v1, _ = model.inference(_boards(3))
    v2, _ = m2.inference(_boards(3))
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_ensemble_drives_search():
    from tetris_mcts_tpu.runtime.selfplay import SelfPlayConfig, SelfPlayDriver

    m = EnsembleVVModel(n_models=2, seed=2)
    cfg = SelfPlayConfig(
        batch=4, sims=3, evaluator="lp", max_nodes=256, max_obs=256,
        table_size=512, max_depth=32, memory_size=512, benchmark=True,
        seed=3,
    )
    d = SelfPlayDriver(cfg, model=m, log=lambda s: None)
    for _ in range(2):
        stats = d.step()
    assert np.isfinite(np.asarray(stats.root_value)).all()


def test_ensemble_ewc_fisher_and_anchored_training(tmp_path):
    # VERDICT r2 item 8: --ensemble + EWC. compute_fisher must produce one
    # per-member diagonal Fisher (leading K axis, finite, non-negative) and
    # a subsequent anchored session must still train.
    m = EnsembleVVModel(n_models=2, seed=4, ewc=True, ewc_lambda=10.0)
    rng = np.random.RandomState(7)
    n = 64
    boards = rng.randint(-1, 2, (n, 20, 10)).astype(np.int8)
    value = boards.reshape(n, -1).sum(1).astype(np.float32) + 50.0
    var = np.full(n, 4.0, np.float32)
    w = np.ones(n, np.float32)
    m.compute_fisher([boards, value, var, w])
    for f, p in zip(jax.tree.leaves(m.fisher), jax.tree.leaves(m.params)):
        assert f.shape == p.shape and f.shape[0] == 2
        fn = np.asarray(f)
        assert np.isfinite(fn).all() and (fn >= 0).all()
    # members see the same anchor data but anchor to their own params, so
    # the two Fishers must differ
    assert any(
        not np.allclose(np.asarray(f[0]), np.asarray(f[1]))
        for f in jax.tree.leaves(m.fisher)
    )
    hist = m.train_data(
        [boards, value, var, w], batch_size=16, iters_per_val=5,
        max_iters=10, early_stopping=False, log=lambda s: None,
        dump_dir=str(tmp_path),
    )
    assert np.isfinite(hist[-1][1])
