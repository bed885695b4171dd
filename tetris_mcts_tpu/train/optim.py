"""Optimizers (optax), covering the reference's optimizer inventory
(SURVEY.md §2.4): Yogi (ACTIVE, `model/yogi.py` — used by Model_VV), Adam
amsgrad (`model/model_vp.py:82`), RAdam (`model/radam.py`), and the
normalized-gradient SGD variants (`model/nsgd.py`, `model/sngd.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def yogi(lr: float = 1e-3, eps: float = 1e-3, weight_decay: float = 1e-3):
    """Yogi with decoupled-as-L2 weight decay, matching the reference's
    defaults (`model/model_vv.py:132`: Yogi(lr=1e-3, eps=1e-3, wd=1e-3);
    the reference adds wd*p to the gradient before the moment updates)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.yogi(learning_rate=lr, eps=eps),
    )


def adam_amsgrad(lr: float = 1e-4):
    """VP model's optimizer (`model/model_vp.py:82`)."""
    return optax.amsgrad(learning_rate=lr)


def radam(lr: float = 1e-3):
    return optax.radam(learning_rate=lr)


def nsgd(lr: float = 1e-3, eps: float = 1e-8):
    """Normalized-gradient SGD: update = lr * g / ||g||_2 (global norm),
    the capability of the reference's `model/nsgd.py`."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        gnorm = optax.global_norm(updates)
        scale = lr / (gnorm + eps)
        return jax.tree.map(lambda g: -scale * g, updates), state

    return optax.GradientTransformation(init, update)


def sngd(lr: float = 1e-3, eps: float = 1e-8):
    """Sign/normalized variant (`model/sngd.py` capability): per-leaf
    normalization instead of global."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        def _norm(g):
            return -lr * g / (jnp.linalg.norm(g.ravel()) + eps)

        return jax.tree.map(_norm, updates), state

    return optax.GradientTransformation(init, update)


def make(name: str, **kw):
    return {
        "yogi": yogi,
        "adam_amsgrad": adam_amsgrad,
        "radam": radam,
        "nsgd": nsgd,
        "sngd": sngd,
    }[name](**kw)
