"""Loss functions (TPU-native equivalents of `model/model_vv.py:75-123` and
`model/model_vp.py:69-101`). All return per-sample losses (B,) — reduction and
sample weighting happen in the trainer so weighted/unweighted and
mean/std bookkeeping (reference `compute_loss`, `model/model.py:53-85`) stay in
one place.
"""

import jax
import jax.numpy as jnp

VARIANCE_BOUND = 1e-1  # reference `variance_bound`, model_vv.py:10


def gaussian_ll(var_pred, mean_pred, var, mean):
    """Gaussian KL divergence between target N(mean, var) and prediction
    N(mean_pred, var_pred) up to constants (reference GaussianLL,
    model_vv.py:94-101): log v_p + ((mu - mu_p)^2 + v) / v_p - log v - 1."""
    return (
        jnp.log(var_pred)
        + ((mean - mean_pred) ** 2 + var) / var_pred
        - jnp.log(var)
        - 1.0
    )


def weak_gaussian_ll(var_pred, mean_pred, var, mean, sigma=3.0):
    """Huberized Gaussian LL (reference WeakGaussianLL, model_vv.py:75-91):
    squared error within sigma·std of the prediction, linear beyond."""
    diff = jnp.abs(mean - mean_pred)
    threshold = sigma * jnp.sqrt(var_pred)
    vloss = jnp.where(
        diff < threshold, diff**2, 2.0 * threshold * diff - threshold**2
    )
    return jnp.log(var_pred) + (var + vloss) / var_pred - jnp.log(var) - 1.0


def mle_approx(var_pred, mean_pred, var, mean):
    """Reference 'mle_approx' (model_vv.py:123)."""
    return (1.0 - var_pred / var) ** 2 + 2.0 * (mean - mean_pred) ** 2 / var


def mae(pred, target):
    return jnp.abs(pred - target)


def mse(pred, target):
    return (pred - target) ** 2


def smooth_l1(pred, target, beta=1.0):
    """Value loss of the VP model (reference SmoothL1Loss, model_vp.py:72)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


def kl_div_policy(logits, target_probs, label_smoothing=0.1):
    """Policy loss: KL(target || softmax(logits)) with label smoothing
    (reference model_vp.py:90-101). Per-sample (B,)."""
    n = logits.shape[-1]
    t = target_probs * (1.0 - label_smoothing) + label_smoothing / n
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.sum(t * (jnp.log(jnp.clip(t, 1e-12)) - logp), axis=-1)


def categorical_ce(pred_probs, target_probs):
    """Distributional (C51) loss: cross-entropy between distributions
    (reference model_distributional.py:81-93). Per-sample (B,)."""
    return -jnp.sum(target_probs * jnp.log(jnp.clip(pred_probs, 1e-12)), axis=-1)


def vv_loss(loss_type: str):
    """Resolve a VV-family loss by name (reference Model_VV.__init__,
    model_vv.py:105-123). Returns f(var_pred, mean_pred, var, mean) -> (B,)."""
    if loss_type in ("kldiv", "mle"):
        return gaussian_ll
    if loss_type == "weak":
        return weak_gaussian_ll
    if loss_type == "mle_approx":
        return mle_approx
    if loss_type == "mae":
        return lambda vp, mp, v, m: mae(mp, m) + mae(vp, v)
    if loss_type == "mse":
        return lambda vp, mp, v, m: mse(mp, m) + mse(vp, v)
    raise ValueError(f"unknown loss_type {loss_type!r}")
