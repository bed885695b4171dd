"""Bayes-by-backprop VV model tests (reference model/bbb.py capability)."""

import numpy as np

from tetris_mcts_tpu.train.bayesian import BBBVVModel


def _data(n=64, seed=0):
    rng = np.random.RandomState(seed)
    return [
        rng.randint(0, 2, (n, 20, 10)).astype(np.int8),
        rng.uniform(0, 50, n).astype(np.float32),
        rng.uniform(1, 10, n).astype(np.float32),
        np.ones(n, np.float32),
    ]


def test_bbb_trains_and_loss_falls():
    m = BBBVVModel(mc_iters=2, seed=1)
    data = _data()
    h = m.train_data(data, batch_size=32, iters=200, log=lambda s: None)
    assert len(h) == 2
    assert h[-1][1] < h[0][1] * 1.5  # not diverging
    v, var = m.inference(data[0][:4])
    assert v.shape == (4, 1) and np.isfinite(v).all()


def test_bgd_method_trains_and_keeps_sigma_positive():
    """The reference's closed-form BGD update (model/bgd_optimizer.py:
    96-113): mu moves by -eta sigma^2 E[g], sigma contracts but stays
    strictly positive."""
    import jax
    import jax.numpy as jnp

    m = BBBVVModel(mc_iters=2, seed=3, method="bgd", mean_eta=1.0)
    data = _data()
    mu_before = jax.tree.leaves(m.params["mu"])[1].copy()
    h = m.train_data(data, batch_size=32, iters=200, log=lambda s: None)
    assert len(h) == 2 and np.isfinite(h[-1][1])
    assert h[-1][1] < h[0][1] * 1.5  # not diverging
    mu_after = jax.tree.leaves(m.params["mu"])[1]
    assert not np.allclose(np.asarray(mu_before), np.asarray(mu_after))
    for r in jax.tree.leaves(m.params["rho"]):
        sig = np.asarray(jnp.logaddexp(r, 0.0))
        assert (sig > 0).all() and np.isfinite(sig).all()
    v, var = m.inference(data[0][:4])
    assert np.isfinite(v).all() and np.isfinite(var).all()


def test_bgd_survives_huge_gradients():
    """One large-gradient minibatch must not zero a sigma: the subtractive
    s·sqrt(1+x²) - s·x form cancels to exactly 0 in float32 at x ≳ 4096,
    then the inverse softplus maps it to -inf and the weight freezes.
    Targets far outside the output bound force huge value-loss gradients."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(9)
    n = 64
    data = [
        rng.randint(0, 2, (n, 20, 10)).astype(np.int8),
        np.full(n, 1e7, np.float32),   # absurd targets -> huge E[g·eps]
        np.full(n, 1e-3, np.float32),  # tiny variance target sharpens it
        np.ones(n, np.float32),
    ]
    m = BBBVVModel(mc_iters=2, seed=5, method="bgd", mean_eta=1.0)
    m.train_data(data, batch_size=64, iters=50, log=lambda s: None)
    for r in jax.tree.leaves(m.params["rho"]):
        sig = np.asarray(jnp.logaddexp(r, 0.0))
        assert np.isfinite(np.asarray(r)).all()
        assert (sig > 0).all() and np.isfinite(sig).all()
    for mu in jax.tree.leaves(m.params["mu"]):
        assert np.isfinite(np.asarray(mu)).all()


def test_bbb_stochastic_inference_varies():
    m = BBBVVModel(mc_iters=1, seed=2)
    boards = _data(4)[0][:4]
    v1, _ = m.inference_stochastic(boards)
    v2, _ = m.inference_stochastic(boards)
    assert not np.allclose(v1, v2)  # sampled weights differ
    vm, _ = m.inference(boards)
    assert np.isfinite(vm).all()
