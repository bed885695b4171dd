"""Bayes-by-backprop VV model — the reference's Bayesian family
(`model/model_bayesian.py` + `model/bbb.py` + `model/bgd_optimizer.py`,
SURVEY.md §2.4, LEGACY) reproduced in spirit, working:

- every weight carries a variational posterior (mu, rho) with
  sigma = softplus(rho) (`bbb.py:50-126`);
- a training step reparameterization-samples weights, accumulates the
  gradient of the data loss over `mc_iters` Monte-Carlo draws
  (`model_bayesian.py:197-213`), and updates the posterior by one of two
  methods:
  * `method="adam"` (default): Adam on (mu, rho) of the variational
    objective (data loss + KL to prior) — the BBB capability with a
    standard optimizer;
  * `method="bgd"`: the reference's closed-form Bayesian-gradient-descent
    update (`model/bgd_optimizer.py:96-113`, Zeno et al. '18):
        mu    <- mu − eta·sigma²·E[g]
        sigma <- sigma·sqrt(1 + (sigma·E[g·eps]/2)²) − sigma²·E[g·eps]/2
    computed from the MC expectations E[g] and E[g·eps] — no KL term (the
    implicit prior lives in the update itself), no optimizer state;
- `inference` uses posterior means; `inference_stochastic` samples weights
  (Thompson exploration, the role the Bayesian net played in
  `ValueSimBayes`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tetris_mcts_tpu.models import losses as L
from tetris_mcts_tpu.models.nets import VVNet, boards_to_input


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


class BBBVVModel:
    """Variational VV net: params are {mu, rho} pytrees over VVNet weights."""

    def __init__(self, lr: float = 1e-3, mc_iters: int = 5,
                 prior_sigma: float = 0.1, kl_weight: float = 1e-4,
                 seed: int = 0, compute_dtype: Any = jnp.float32,
                 method: str = "adam", mean_eta: float = 1.0):
        self.net = VVNet(compute_dtype=compute_dtype)
        self.mc_iters = mc_iters
        key = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, 20, 10, 1), jnp.float32)
        self.ubound = jnp.asarray([1e2, 1e3], jnp.float32)
        self.lbound = jnp.asarray([0.0, L.VARIANCE_BOUND], jnp.float32)
        mu = self.net.init(key, dummy, self.ubound, self.lbound)
        # rho init so sigma ~ prior_sigma/10 (small initial uncertainty)
        rho0 = float(np.log(np.expm1(prior_sigma / 10.0)))
        self.params = {
            "mu": mu,
            "rho": jax.tree.map(lambda p: jnp.full_like(p, rho0), mu),
        }
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self._rng = np.random.RandomState(seed + 1)

        net, tx = self.net, self.tx
        lbound = self.lbound
        prior_var = prior_sigma**2
        mc = mc_iters

        def sample_weights(params, key):
            leaves, treedef = jax.tree.flatten(params["mu"])
            keys = jax.random.split(key, len(leaves))
            rhos = jax.tree.leaves(params["rho"])
            sampled = [
                m + _softplus(r) * jax.random.normal(k, m.shape)
                for m, r, k in zip(leaves, rhos, keys)
            ]
            return jax.tree.unflatten(treedef, sampled)

        def data_loss(w, ubound, states, value, variance, weight):
            out = net.apply(w, states, ubound, lbound)
            variance = jnp.maximum(variance, L.VARIANCE_BOUND)
            per = weight * L.gaussian_ll(out[:, 1], out[:, 0], variance, value)
            return jnp.mean(per)

        def kl_to_prior(params):
            # KL(N(mu, sigma^2) || N(0, prior_var)) summed over weights
            def kl(m, r):
                s2 = _softplus(r) ** 2
                return 0.5 * jnp.sum(
                    s2 / prior_var + m * m / prior_var - 1.0
                    - jnp.log(s2 / prior_var)
                )
            return sum(
                kl(m, r)
                for m, r in zip(
                    jax.tree.leaves(params["mu"]),
                    jax.tree.leaves(params["rho"]),
                )
            )

        def loss_fn(params, ubound, batch, key):
            def one(k):
                w = sample_weights(params, k)
                return data_loss(w, ubound, *batch)

            keys = jax.random.split(key, mc)
            mc_loss = jnp.mean(jax.vmap(one)(keys))
            return mc_loss + kl_weight * kl_to_prior(params)

        def train_step(params, opt_state, ubound, data, key, bs):
            states, value, variance, weight = data
            key, k_idx, k_mc = jax.random.split(key, 3)
            idx = jax.random.randint(k_idx, (bs,), 0, states.shape[0])
            batch = tuple(d[idx] for d in data)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, ubound, batch, k_mc
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        def bgd_step(params, opt_state, ubound, data, key, bs):
            """Closed-form BGD update (bgd_optimizer.py:96-113) from the MC
            expectations E[g] and E[g·eps] over reparameterized draws."""
            key, k_idx, k_mc = jax.random.split(key, 3)
            idx = jax.random.randint(k_idx, (bs,), 0, data[0].shape[0])
            batch = tuple(d[idx] for d in data)
            mu_leaves, treedef = jax.tree.flatten(params["mu"])
            sigma = [_softplus(r) for r in jax.tree.leaves(params["rho"])]

            def one(k):
                keys = jax.random.split(k, len(mu_leaves))
                eps = [jax.random.normal(kk, m.shape)
                       for kk, m in zip(keys, mu_leaves)]
                w = jax.tree.unflatten(
                    treedef,
                    [m + s * e for m, s, e in zip(mu_leaves, sigma, eps)],
                )
                loss, g = jax.value_and_grad(data_loss)(w, ubound, *batch)
                return loss, jax.tree.leaves(g), eps

            losses, gs, epss = jax.vmap(one)(jax.random.split(k_mc, mc))
            # Non-finite guard (the BGD analog of the VV trainer's grad-norm
            # watchdog): one overflowed f32 gradient would write NaN into mu
            # AND rho and corrupt those weights permanently — skip the update
            # for the affected entries instead.
            fin = lambda a: jnp.where(jnp.isfinite(a), a, 0.0)
            e_g = [fin(jnp.mean(g, 0)) for g in gs]
            e_ge = [fin(jnp.mean(g * e, 0)) for g, e in zip(gs, epss)]
            mu_new = [m - mean_eta * s**2 * g
                      for m, s, g in zip(mu_leaves, sigma, e_g)]
            # s·(sqrt(1+x²) - x) with x = s·ge/2. The subtractive form
            # cancels to exactly 0 in float32 once x ≳ 4096 (one
            # large-gradient minibatch) and a zero sigma would freeze the
            # weight permanently below — for x > 0 use the equivalent
            # s/(sqrt(1+x²)+x); for x ≤ 0 both terms add and the direct
            # form is exact.
            def _sig(s, ge):
                x = s * ge / 2.0
                r = jnp.sqrt(1.0 + x * x)
                return jnp.where(x > 0, s / (r + x), s * (r - x))

            sig_new = [_sig(s, ge) for s, ge in zip(sigma, e_ge)]
            # back to the rho parametrization (inverse softplus; the BGD
            # update keeps sigma strictly positive). The floor must sit
            # above f32 resolution: exp(-s) rounds to 1.0 for s ≲ 6e-8 and
            # log1p(-1) = -inf would zero sigma for good.
            rho_new = [
                jnp.maximum(s, 1e-6) + jnp.log1p(-jnp.exp(-jnp.maximum(s, 1e-6)))
                for s in sig_new
            ]
            params = {
                "mu": jax.tree.unflatten(treedef, mu_new),
                "rho": jax.tree.unflatten(treedef, rho_new),
            }
            return params, opt_state, jnp.mean(losses)

        def infer_mean(params, ubound, states):
            out = net.apply(params["mu"], states, ubound, lbound)
            return out[:, 0], out[:, 1]

        def infer_sampled(params, ubound, states, key):
            w = sample_weights(params, key)
            out = net.apply(w, states, ubound, lbound)
            return out[:, 0], out[:, 1]

        if method not in ("adam", "bgd"):
            raise ValueError(f"unknown method {method!r}")
        self.method = method
        self._train_step = jax.jit(
            bgd_step if method == "bgd" else train_step, static_argnums=(5,)
        )
        self._infer = jax.jit(infer_mean)
        self._infer_sampled = jax.jit(infer_sampled)

    def inference(self, boards):
        states = boards_to_input(jnp.asarray(boards).reshape(-1, 20, 10))
        v, var = self._infer(self.params, self.ubound, states)
        return np.asarray(v)[:, None], np.asarray(var)[:, None]

    def inference_stochastic(self, boards):
        """Thompson sampling over weight posteriors (the exploration role of
        the reference's Bayesian net in ValueSimBayes)."""
        states = boards_to_input(jnp.asarray(boards).reshape(-1, 20, 10))
        key = jax.random.PRNGKey(self._rng.randint(2**31))
        v, var = self._infer_sampled(self.params, self.ubound, states, key)
        return np.asarray(v)[:, None], np.asarray(var)[:, None]

    def train_data(self, data, batch_size=128, iters=500, log=print):
        states = boards_to_input(jnp.asarray(data[0]).reshape(-1, 20, 10))
        value = jnp.asarray(data[1], jnp.float32).reshape(-1)
        variance = jnp.asarray(data[2], jnp.float32).reshape(-1)
        weight = jnp.asarray(data[3], jnp.float32).reshape(-1)
        weight = weight / jnp.mean(weight)
        self.ubound = jnp.asarray(
            [jnp.max(value), jnp.maximum(jnp.max(variance), L.VARIANCE_BOUND)],
            jnp.float32,
        )
        key = jax.random.PRNGKey(self._rng.randint(2**31))
        hist = []
        for it in range(iters):
            key, sub = jax.random.split(key)
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, self.ubound,
                (states, value, variance, weight), sub, batch_size,
            )
            if (it + 1) % 100 == 0:
                log(f"Iteration:{it + 1:6d}  loss:{float(loss):8.4f}")
                hist.append((it + 1, float(loss)))
        return hist
