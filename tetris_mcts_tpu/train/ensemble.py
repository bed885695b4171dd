"""Deep-ensemble VV model — the reference's `Ensemble` made to work.

The reference ships an `Ensemble(nn.Module)` around K value/variance nets
(`/root/reference/model/model_vv.py:55-72`) that is broken twice over: its
forward indexes `self.nets[n]` with an undefined name, and its eval path
`torch.mean(torch.stack(r))` collapses the (value, variance) pairs of all
members into one scalar. PARITY.md used to drop it for that reason; this is
the working TPU-native rebuild.

Design (idiomatic JAX, not a translation):
- K member param trees live STACKED along a leading axis (`jax.vmap` over
  `net.init`); one jitted program trains/evaluates all members at once —
  K copies of a 0.5M-param CNN are still one small MXU workload.
- Training: the reference picks one random member per minibatch (a
  bootstrap-by-batches scheme). Here every member trains each step on its
  OWN independently sampled minibatch (per-member fold of the step key) —
  the same batch-bootstrap decorrelation, K× fewer host iterations.
- Inference combines by the law of total variance:
      value    = mean_k v_k
      variance = mean_k var_k + Var_k(v_k)
  i.e. expected intrinsic variance plus epistemic spread — the principled
  version of what the reference's collapsed mean threw away. The combined
  (v, var) is a drop-in for every VV consumer (search evaluators,
  `inference_stochastic` Thompson sampling, the CLT tree policy).

`EnsembleVVModel` subclasses `VVModel`: the host-side `train_data` loop
(weight normalization, bound rescaling, early stopping, watchdog —
`model/model.py:176-249` semantics) is inherited unchanged; only the three
jitted programs are replaced with member-axis versions. The grad-norm
watchdog reports the WORST member (max norm) and dumps that member's batch.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from tetris_mcts_tpu.train.trainer import VVModel


class EnsembleVVModel(VVModel):
    """K-member deep ensemble with the VVModel API (train_data / inference /
    apply_fn / save / load)."""

    def __init__(self, n_models: int = 5, seed: int = 0, **kw):
        super().__init__(seed=seed, **kw)
        if n_models < 2:
            raise ValueError("an ensemble needs n_models >= 2")
        self.n_models = n_models

        keys = jax.random.split(jax.random.PRNGKey(seed), n_models)
        dummy = jnp.zeros((1, 20, 10, 1), jnp.float32)
        net, tx = self.net, self.tx
        ub, lb = self.ubound, self.lbound
        self.params = jax.vmap(lambda k: net.init(k, dummy, ub, lb))(keys)
        self.opt_state = jax.vmap(tx.init)(self.params)
        self.fisher = jax.tree.map(jnp.zeros_like, self.params)
        self.p0 = self.params

        base_step = self.train_step_fn    # single-model closures from VVModel
        base_eval = self.eval_loss_fn
        base_infer = self.infer_fn
        K = n_models

        def ens_train_step(params, opt_state, ubound, data, key, fisher, p0,
                           lam, bs):
            keys = jax.random.split(key, K)
            params, opt_state, metrics, batches = jax.vmap(
                base_step, in_axes=(0, 0, None, None, 0, 0, 0, None, None)
            )(params, opt_state, ubound, data, keys, fisher, p0, lam, bs)
            worst = jnp.argmax(metrics["grad_norm"])
            out = {
                "loss": jnp.mean(metrics["loss"]),
                "loss_std": jnp.mean(metrics["loss_std"]),
                "grad_norm": metrics["grad_norm"][worst],
            }
            batch = jax.tree.map(lambda b: b[worst], batches)
            return params, opt_state, out, batch

        def ens_eval_loss(params, ubound, data):
            mean, std = jax.vmap(base_eval, in_axes=(0, None, None))(
                params, ubound, data
            )
            return jnp.mean(mean), jnp.mean(std)

        def combine(v, var):
            return jnp.mean(v, 0), jnp.mean(var, 0) + jnp.var(v, 0)

        def ens_infer(params, ubound, states):
            v, var = jax.vmap(base_infer, in_axes=(0, None, None))(
                params, ubound, states
            )
            return combine(v, var)

        self._train_step = jax.jit(ens_train_step, static_argnums=(8,))
        self._eval_loss = jax.jit(ens_eval_loss)
        self._infer = jax.jit(ens_infer)
        self._combine = combine
        self.train_step_fn = ens_train_step
        self.eval_loss_fn = ens_eval_loss
        self.infer_fn = ens_infer

    def apply_fn(self, compute_dtype=None):
        """(params, ubound, states_nhwc) -> combined (v, var) — same
        signature as `VVModel.apply_fn`, usable by every search evaluator."""
        single = super().apply_fn(compute_dtype)
        combine = self._combine

        def f(params, ubound, states):
            v, var = jax.vmap(single, in_axes=(0, None, None))(
                params, ubound, states
            )
            return combine(v, var)

        return f

    def member_inference(self, boards):
        """Per-member (value (K, N), variance (K, N)) numpy — the ensemble
        diagnostic the reference's tools/test.py-style scripts inspect."""
        import numpy as np

        from tetris_mcts_tpu.train.trainer import _boards

        states = _boards(boards)
        out = jax.vmap(
            lambda p: self.net.apply(p, states, self.ubound, self.lbound)
        )(self.params)
        return np.asarray(out[..., 0]), np.asarray(out[..., 1])

    def compute_fisher(self, data):
        """Per-member empirical Fisher (VERDICT r2 item 8): each member
        anchors EWC to its OWN params with its own diagonal Fisher over the
        shared anchor set — `ens_train_step` already vmaps the penalty with
        fisher/p0 on the member axis, so this closes the --ensemble + EWC
        combination the base class supports (reference `compute_fisher`,
        model_vv.py:188-208)."""
        from tetris_mcts_tpu.train.trainer import _boards, _col

        states = _boards(data[0])
        value, variance, weight = map(_col, data[1:4])

        def member_fisher(p):
            def per_example_loss(pp, s, v, var, w):
                return self._per_sample_loss(
                    pp, self.ubound, s[None], v[None], var[None], w[None]
                )[0]

            grads = jax.vmap(
                lambda s, v, var, w: jax.grad(per_example_loss)(
                    p, s, v, var, w
                )
            )(states, value, variance, weight)
            return jax.tree.map(lambda g: jnp.mean(g**2, axis=0), grads)

        self.fisher = jax.jit(jax.vmap(member_fisher))(self.params)
        self.p0 = self.params
