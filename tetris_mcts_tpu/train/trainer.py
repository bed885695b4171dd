"""Model wrapper + training loops — the L3 capability of the reference
(`model/model.py`, `model/model_vv.py`) rebuilt for TPU.

Everything hot is jitted and stays on device:
- `train_step` samples its own minibatch from the device-resident training
  arrays (one fused XLA program: sample -> forward -> loss -> grad -> yogi),
- validation loss runs as one jitted program over the whole split,
- inference is a jitted pure function, also usable inside the MCTS program.

Host Python only does the loop/early-stopping bookkeeping, mirroring the
reference's `train_data` semantics (`model/model.py:176-249`): weight
normalization, 90/10 tail split, random minibatches with replacement,
validate every `iters_per_val`, early stop when the val loss stops improving
by more than `threshold * std`, keep/restore the best params, plus the
grad-norm watchdog that dumps offending batches (`model/model.py:97-118`).

The jitted functions are built once in __init__ as closures over immutable
config; all mutable state (params, opt state, bounds, EWC anchors) is passed
explicitly, so there are no stale-trace hazards.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

from tetris_mcts_tpu.models import losses as L
from tetris_mcts_tpu.models.nets import VVNet, boards_to_input
from tetris_mcts_tpu.train import optim

DEFAULT_CKPT = "./checkpoints/model_vv.msgpack"


def _atomic_pickle(path: str, blob):
    """Write-then-fsync-then-rename so a kill mid-write (timeout SIGKILL,
    tunnel drop) or host crash never leaves a truncated checkpoint behind.
    The tmp name is unique per writer so two processes saving to the same
    path cannot interleave into one tmp file."""
    import tempfile

    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(path) or ".", prefix=os.path.basename(path),
        suffix=".tmp",
    )
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(blob, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _with_dtype(net, compute_dtype):
    """Inference-time compute-dtype override (dtype-only clone; params and
    the training closures bound at __init__ stay untouched)."""
    if compute_dtype is None:
        return net
    return net.clone(compute_dtype=compute_dtype)


def _col(x):
    """Accept (N,), (N,1) or (N,1,...) columns, return (N,) float32."""
    x = jnp.asarray(x, jnp.float32)
    return x.reshape(x.shape[0])


def _boards(x):
    """Accept (N,20,10) or (N,1,20,10) boards, return (N,20,10,1) float."""
    x = jnp.asarray(x)
    if x.ndim == 4:  # NCHW from reference-style callers
        x = x[:, 0]
    return boards_to_input(x)


def _zeros_like_tree(tree):
    return jax.tree.map(jnp.zeros_like, tree)


class VVModel:
    """Value/variance model (reference `Model_VV`, model_vv.py:104-231).

    `weighted` semantics are carried by the weight column itself: pass ones to
    train unweighted (the reference's boolean flag multiplies by the weight
    column, `model_vv.py:146-152`).
    """

    def __init__(
        self,
        loss_type: str = "kldiv",
        weighted: bool = True,
        lr: float = 1e-3,
        weight_decay: float = 1e-3,
        seed: int = 0,
        compute_dtype: Any = jnp.float32,
        ewc: bool = False,
        ewc_lambda: float = 1.0,
        checkpoint_path: str = DEFAULT_CKPT,
    ):
        self.net = VVNet(compute_dtype=compute_dtype)
        self.loss_type = loss_type
        self.weighted = weighted
        self.ewc = ewc
        self.ewc_lambda = float(ewc_lambda)
        self.checkpoint_path = checkpoint_path

        key = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, 20, 10, 1), jnp.float32)
        # Reference output bounds: out_ubound=[1e2,1e3], lbound=[0, eps]
        # (model_vv.py:45-46), rescaled to the data max before each training
        # session (model_vv.py:227-231).
        self.ubound = jnp.asarray([1e2, 1e3], jnp.float32)
        self.lbound = jnp.asarray([0.0, L.VARIANCE_BOUND], jnp.float32)
        self.params = self.net.init(key, dummy, self.ubound, self.lbound)

        self.tx = optim.yogi(lr=lr, weight_decay=weight_decay)
        self.opt_state = self.tx.init(self.params)

        self.fisher = _zeros_like_tree(self.params)
        self.p0 = self.params
        self._rng = np.random.RandomState(seed + 1)

        net, tx = self.net, self.tx
        loss_fn = L.vv_loss(loss_type)
        lbound = self.lbound

        def per_sample_loss(params, ubound, states, value, variance, weight):
            out = net.apply(params, states, ubound, lbound)
            v_pred, var_pred = out[:, 0], out[:, 1]
            variance = jnp.maximum(variance, L.VARIANCE_BOUND)
            return weight * loss_fn(var_pred, v_pred, variance, value)

        def train_step(params, opt_state, ubound, data, key, fisher, p0, lam, bs):
            states, value, variance, weight = data
            n = states.shape[0]
            idx = jax.random.randint(key, (bs,), 0, n)
            batch = tuple(d[idx] for d in (states, value, variance, weight))

            def total_loss(p):
                per = per_sample_loss(p, ubound, *batch)
                penalty = sum(
                    jnp.sum(f * (a - b) ** 2)
                    for f, a, b in zip(
                        jax.tree.leaves(fisher),
                        jax.tree.leaves(p),
                        jax.tree.leaves(p0),
                    )
                )
                return jnp.mean(per) + 0.5 * lam * penalty, per

            (loss, per), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
            gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads)))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            metrics = {"loss": loss, "loss_std": jnp.std(per), "grad_norm": gnorm}
            return params, opt_state, metrics, batch

        def eval_loss(params, ubound, data):
            per = per_sample_loss(params, ubound, *data)
            return jnp.mean(per), jnp.std(per)

        def infer(params, ubound, states):
            out = net.apply(params, states, ubound, lbound)
            return out[:, 0], out[:, 1]

        def nth_iter_batch(train_data, key, n, bs):
            """Recompute iteration n's minibatch from the chunk's start key
            (the batch is a pure function of the n-th subkey) — lets the
            grad-norm watchdog dump the exact offending batch without the
            scan carrying every batch."""
            def step(_, k):
                return jax.random.split(k)[0]

            key = jax.lax.fori_loop(0, n, step, key)
            sub = jax.random.split(key)[1]
            nrows = train_data[0].shape[0]
            idx = jax.random.randint(sub, (bs,), 0, nrows)
            return tuple(d[idx] for d in train_data)

        self._train_step = jax.jit(train_step, static_argnums=(8,))
        self._nth_iter_batch = jax.jit(nth_iter_batch, static_argnums=(3,))
        self._eval_loss = jax.jit(eval_loss)
        self._infer = jax.jit(infer)
        self._per_sample_loss = per_sample_loss
        # raw (unjitted) functions, re-jittable under explicit mesh shardings
        # by tetris_mcts_tpu.parallel (SURVEY.md §2.7 actor-learner design)
        self.train_step_fn = train_step
        self.eval_loss_fn = eval_loss
        self.infer_fn = infer

    # ------------------------------------------------------------- public API
    def inference(self, boards):
        """boards: (N,20,10) or (N,1,20,10) -> (value (N,1), variance (N,1))
        numpy arrays (reference `Model.inference`, model/model.py:127-134)."""
        v, var = self._infer(self.params, self.ubound, _boards(boards))
        return np.asarray(v)[:, None], np.asarray(var)[:, None]

    def inference_stochastic(self, boards):
        """Thompson-style sample (reference model_vv.py:219-225)."""
        v, var = self.inference(boards)
        return [self._rng.normal(v, np.sqrt(var)), var]

    def apply_fn(self, compute_dtype=None):
        """(params, ubound, states_nhwc) -> (v, var) for use inside other jits
        (the MCTS evaluator). `compute_dtype` overrides the net's compute
        dtype for THIS closure only (params and training stay untouched) —
        `jnp.bfloat16` halves the MXU cost of the in-search forward without
        perturbing the f32 loss trajectory the reference's curves are
        compared against."""
        net, lbound = _with_dtype(self.net, compute_dtype), self.lbound

        def f(params, ubound, states):
            out = net.apply(params, states, ubound, lbound)
            return out[:, 0], out[:, 1]

        return f

    def train_data(
        self,
        data,
        batch_size: int = 128,
        iters_per_val: int = 500,
        validation_fraction: float = 0.1,
        validation_rows: int | None = None,
        weighted: bool | None = None,
        early_stopping: bool = True,
        early_stopping_patience: int = 10,
        early_stopping_threshold: float = 1.0,
        shuffle: bool = False,
        min_iters: int = 0,
        max_iters: int = 100000,
        grad_norm_warn: float = 1e3,
        dump_dir: str = "./data",
        log=print,
    ):
        """Full training session over `data = [states, values, variance,
        weights]` with reference semantics (see module docstring). Returns the
        (iter, train_loss, val_loss, val_std) history."""
        if weighted is not None:
            self.weighted = weighted
        states = _boards(data[0])
        value = _col(data[1])
        variance = _col(data[2])
        weight = _col(data[3])
        if self.weighted:
            weight = weight / jnp.mean(weight)
        else:
            weight = jnp.ones_like(weight)

        n = states.shape[0]
        # validation_rows pins the tail exactly (the CLI's episodic split
        # arranges held-out episodes at the tail; a fraction-derived count
        # would slice through the episode boundary)
        n_val = (validation_rows if validation_rows is not None
                 else max(int(n * validation_fraction), 1))
        if shuffle:
            perm = self._rng.permutation(n)
            states, value, variance, weight = (
                d[perm] for d in (states, value, variance, weight)
            )

        # Rescale output bounds to the data max (model_vv.py:227-231).
        # For a net RESUMED from a checkpoint the rescale is monotone: the
        # first sessions after a relaunch see only fresh early-game rows
        # whose max is far below the scale the loaded net was trained
        # against, and an unconditional down-rescale reinterprets every
        # sigmoid output on a smaller range — thrashing the value function
        # at every restart (and feeding the exact-saturation freeze, see
        # the zero-gradient guard below). The reference never relaunches
        # mid-run (its process keeps its full memory), so its unconditional
        # rescale never faces this; fresh nets here still rescale freely.
        floor = getattr(self, "_ubound_floor", None)
        vmax = jnp.max(value)
        varmax = jnp.maximum(jnp.max(variance), L.VARIANCE_BOUND)
        if floor is not None:
            vmax = jnp.maximum(vmax, floor[0])
            varmax = jnp.maximum(varmax, floor[1])
            # advance the floor to the new bound: once a session raises
            # ubound past the checkpoint-load value, a later small-scale
            # session must not shrink it back (that would re-thrash the
            # sigmoid reinterpretation the floor exists to prevent)
            self._ubound_floor = (vmax, varmax)
        self.ubound = jnp.asarray([vmax, varmax], jnp.float32)

        train = tuple(d[:-n_val] for d in (states, value, variance, weight))
        val = tuple(d[-n_val:] for d in (states, value, variance, weight))

        log(f"Training data size: {n - n_val}    Validation data size: {n_val}")

        lam = jnp.float32(self.ewc_lambda if self.ewc else 0.0)
        fails = 0
        best_val = float("inf")
        best_params = self.params
        loss_avg = gnorm_avg = 0.0
        key = jax.random.PRNGKey(self._rng.randint(2**31))
        history = []

        # One device call per VALIDATION WINDOW, not per iteration: each
        # window runs as a jitted scan chunk whose per-iteration key chain
        # (key, sub = split(key)) is bit-identical to the eager loop — the
        # eager form paid a ~25 ms tunnel round trip per iteration (15
        # iters/s against the chunked loop's hundreds). Built lazily from
        # self.train_step_fn so subclasses that swap the step (the ensemble)
        # get their own chunk.
        if not hasattr(self, "_train_chunk"):
            step_fn, eval_fn = self.train_step_fn, self.eval_loss_fn

            def train_chunk(params, opt_state, ubound, train_d, val_d, key,
                            fisher, p0, lam_, bs, k_iters):
                def body(carry, _):
                    params, opt_state, key = carry
                    key, sub = jax.random.split(key)
                    params, opt_state, m, _ = step_fn(
                        params, opt_state, ubound, train_d, sub,
                        fisher, p0, lam_, bs,
                    )
                    return (params, opt_state, key), (m["loss"],
                                                      m["grad_norm"])

                (params, opt_state, key), (losses, gnorms) = jax.lax.scan(
                    body, (params, opt_state, key), None, length=k_iters
                )
                vmean, vstd = eval_fn(params, ubound, val_d)
                return params, opt_state, key, losses, gnorms, vmean, vstd

            self._train_chunk = jax.jit(train_chunk, static_argnums=(9, 10))

        it = 0
        while it < max_iters:
            k_iters = min(iters_per_val, max_iters - it)
            chunk_key = key
            (self.params, self.opt_state, key, losses, gnorms, vmean,
             vstd) = self._train_chunk(
                self.params, self.opt_state, self.ubound, train, val,
                chunk_key, self.fisher, self.p0, lam, batch_size, k_iters,
            )
            losses = np.asarray(losses)
            gnorms = np.asarray(gnorms)
            it += k_iters
            loss_avg = float(losses.mean())
            gnorm_avg = float(gnorms.mean())

            bad = np.nonzero(gnorms > grad_norm_warn)[0]
            for n in bad[:4]:  # watchdog (model/model.py:105-109)
                log(f"Large gradient ({float(gnorms[n])}) detected")
                batch = self._nth_iter_batch(
                    train, chunk_key, int(n), batch_size)
                self._dump_grad_batch(batch, dump_dir)

            vmean = float(vmean)
            vstd = float(vstd) / n_val**0.5
            suffix = ""
            stop = False
            if early_stopping:
                if vmean - best_val < vstd * early_stopping_threshold:
                    fails = 0
                    if vmean < best_val:
                        suffix = "*"
                        best_val = vmean
                        best_params = self.params
                else:
                    fails += 1
                    # --min_iters (reference train.py:25): never stop
                    # before the floor
                    stop = fails >= early_stopping_patience and it >= min_iters
            log(
                f"Iteration:{it:7d}  training loss:{loss_avg:6.4f}  "
                f"validation loss:{vmean:6.4f}±{vstd:6.4f}  "
                f"gradient norm:{gnorm_avg:6.3f}    {suffix}"
            )
            history.append((it, loss_avg, vmean, vstd, gnorm_avg))
            if stop:
                break
            # Saturation guard (round 4): a whole window of EXACTLY zero
            # gradients means the bounded sigmoid heads are saturated on
            # every sampled row (f32 sigmoid(x) == 1.0 for x >~ 17 — seen
            # on out-of-distribution early-game rows after the ubound
            # rescale, runs/ab_cadence). The loss is then constant, the
            # frozen val loss keeps resetting the patience counter
            # (a frozen loss counts as within-noise, the reference's own
            # rule), and the session would spin to max_iters doing
            # nothing. No reference counterpart: the reference never
            # retargets a trained net onto a rescaled bound. End the
            # session; later sessions see richer data and recover.
            if gnorm_avg == 0.0:
                log(f"Zero-gradient window at iteration {it} — output "
                    "heads saturated on this data; ending session")
                break

        if early_stopping:
            self.params = best_params
        return history

    # ------------------------------------------------------------------- EWC
    def compute_fisher(self, data):
        """Empirical Fisher from per-example gradients (reference
        `compute_fisher`, model_vv.py:188-208) — vmapped instead of a Python
        loop over samples."""
        states = _boards(data[0])
        value, variance, weight = map(_col, data[1:4])

        def per_example_loss(p, s, v, var, w):
            per = self._per_sample_loss(
                p, self.ubound, s[None], v[None], var[None], w[None]
            )
            return per[0]

        grads = jax.vmap(
            lambda s, v, var, w: jax.grad(per_example_loss)(
                self.params, s, v, var, w
            )
        )(states, value, variance, weight)
        self.fisher = jax.tree.map(lambda g: jnp.mean(g**2, axis=0), grads)
        self.p0 = self.params

    # ---------------------------------------------------------- persistence
    def save(self, path: str | None = None, verbose: bool = False):
        """Checkpoint params + optimizer state + bounds (reference
        `Model.save`, model/model.py:143-160)."""
        path = path or self.checkpoint_path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = {
            "params": flax.serialization.to_bytes(self.params),
            "opt_state": flax.serialization.to_bytes(self.opt_state),
            "ubound": np.asarray(self.ubound),
            "lbound": np.asarray(self.lbound),
        }
        _atomic_pickle(path, blob)
        if verbose:
            print("Saving model...", flush=True)

    def load(self, path: str | None = None):
        path = path or self.checkpoint_path
        if not os.path.isfile(path):
            print("Checkpoint not found, using default model", flush=True)
            return False
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.params = flax.serialization.from_bytes(self.params, blob["params"])
        self.opt_state = flax.serialization.from_bytes(
            self.opt_state, blob["opt_state"]
        )
        self.ubound = jnp.asarray(blob["ubound"])
        self.lbound = jnp.asarray(blob["lbound"])
        # Resumed nets were TRAINED against this output scale: the
        # per-session rescale must never shrink below it (see train_data)
        self._ubound_floor = self.ubound
        self.p0 = self.params
        return True

    def _dump_grad_batch(self, batch, dump_dir):
        """Grad-norm watchdog artifact (reference model/model.py:105-109)."""
        os.makedirs(dump_dir, exist_ok=True)
        states, value, variance, weight = (np.asarray(b) for b in batch)
        v, var = self._infer(self.params, self.ubound, jnp.asarray(states))
        np.savez(
            os.path.join(dump_dir, "dump_grad"),
            states=states, value=value, variance=variance, weight=weight,
            pred_value=np.asarray(v), pred_variance=np.asarray(var),
        )


def _early_stop_fit(model, data_cols, batch_size, iters_per_val,
                    validation_fraction, early_stopping,
                    early_stopping_patience, early_stopping_threshold,
                    shuffle, max_iters, log, validation_rows=None,
                    min_iters=0):
    """Shared minibatch-SGD session with tail-validation early stopping (the
    reference `Model.train_data` loop, model/model.py:176-249) for models
    whose jitted step is (params, opt_state, data, key, bs) -> (params,
    opt_state, metrics) and whose eval is (params, data) -> (mean, std).
    `data_cols`: tuple of equal-length device arrays, states first."""
    n = data_cols[0].shape[0]
    n_val = (validation_rows if validation_rows is not None
             else max(int(n * validation_fraction), 1))
    if shuffle:
        perm = model._rng.permutation(n)
        data_cols = tuple(d[perm] for d in data_cols)
    train = tuple(d[:-n_val] for d in data_cols)
    val = tuple(d[-n_val:] for d in data_cols)
    log(f"Training data size: {n - n_val}    Validation data size: {n_val}")

    fails, best_val, best_params = 0, float("inf"), model.params
    key = jax.random.PRNGKey(model._rng.randint(2**31))
    history = []

    # one device call per validation window (see VVModel._train_chunk: the
    # eager loop pays a ~25 ms tunnel round trip per iteration); the key
    # chain is identical to the eager form
    if not hasattr(model, "_fit_chunk"):
        step_fn, eval_fn = model._train_step, model._eval_loss

        def chunk(params, opt_state, train_d, val_d, key, bs, k):
            def body(c, _):
                params, opt_state, key = c
                key, sub = jax.random.split(key)
                params, opt_state, m = step_fn(
                    params, opt_state, train_d, sub, bs)
                return (params, opt_state, key), m["loss"]

            (params, opt_state, key), losses = jax.lax.scan(
                body, (params, opt_state, key), None, length=k)
            vmean, vstd = eval_fn(params, val_d)
            return params, opt_state, key, losses, vmean, vstd

        model._fit_chunk = jax.jit(chunk, static_argnums=(5, 6))

    it = 0
    while it < max_iters:
        k_iters = min(iters_per_val, max_iters - it)
        model.params, model.opt_state, key, losses, vmean, vstd = (
            model._fit_chunk(model.params, model.opt_state, train, val, key,
                             batch_size, k_iters)
        )
        it += k_iters
        loss_avg = float(np.asarray(losses).mean())
        vmean, vstd = float(vmean), float(vstd) / n_val**0.5
        stop = False
        if early_stopping:
            if vmean - best_val < vstd * early_stopping_threshold:
                fails = 0
                if vmean < best_val:
                    best_val, best_params = vmean, model.params
            else:
                fails += 1
                # --min_iters (reference train.py:25): never stop early
                # before the floor
                stop = fails >= early_stopping_patience and it >= min_iters
        log(
            f"Iteration:{it:7d}  training loss:{loss_avg:6.4f}  "
            f"validation loss:{vmean:6.4f}±{vstd:6.4f}"
        )
        history.append((it, loss_avg, vmean, vstd))
        if stop:
            break
    if early_stopping:
        model.params = best_params
    return history


class VPModel:
    """Value+policy model (reference `Model_VP`, model/model_vp.py:104-101 +
    the shared `Model` loop, model/model.py:176-249): SmoothL1 value loss +
    label-smoothed KL policy loss, Adam-amsgrad lr=1e-4."""

    def __init__(self, lr: float = 1e-4, weighted: bool = True, seed: int = 0,
                 compute_dtype: Any = jnp.float32,
                 checkpoint_path: str = "./checkpoints/model_vp.msgpack"):
        from tetris_mcts_tpu.models.nets import VPNet

        self.net = VPNet(compute_dtype=compute_dtype)
        self.weighted = weighted
        self.checkpoint_path = checkpoint_path
        key = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, 20, 10, 1), jnp.float32)
        self.params = self.net.init(key, dummy)
        self.tx = optim.adam_amsgrad(lr=lr)
        self.opt_state = self.tx.init(self.params)
        self._rng = np.random.RandomState(seed + 1)

        net, tx = self.net, self.tx

        def per_sample_loss(params, states, value, policy, weight):
            v, logits = net.apply(params, states)
            vloss = L.smooth_l1(v.reshape(-1), value)
            ploss = L.kl_div_policy(logits, policy)
            return weight * (vloss + ploss)

        def train_step(params, opt_state, data, key, bs):
            states, value, policy, weight = data
            n = states.shape[0]
            idx = jax.random.randint(key, (bs,), 0, n)
            batch = tuple(d[idx] for d in data)

            def total(p):
                per = per_sample_loss(p, *batch)
                return jnp.mean(per), per

            (loss, per), grads = jax.value_and_grad(total, has_aux=True)(params)
            gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads)))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, {
                "loss": loss, "loss_std": jnp.std(per), "grad_norm": gnorm
            }

        def eval_loss(params, data):
            per = per_sample_loss(params, *data)
            return jnp.mean(per), jnp.std(per)

        def infer(params, states):
            v, logits = net.apply(params, states)
            return v.reshape(-1), jax.nn.softmax(logits, axis=-1)

        self._train_step = jax.jit(train_step, static_argnums=(4,))
        self._eval_loss = jax.jit(eval_loss)
        self._infer = jax.jit(infer)
        self.train_step_fn = train_step
        self.infer_fn = infer

    def inference(self, boards):
        """(N,20,10)-ish boards -> (value (N,1), policy (N,7)) numpy."""
        v, p = self._infer(self.params, _boards(boards))
        return np.asarray(v)[:, None], np.asarray(p)

    def apply_fn(self, compute_dtype=None):
        """(params, states_nhwc) -> (v, logits) for the fused VP search.
        `compute_dtype` overrides the forward's compute dtype (see
        `VVModel.apply_fn`)."""
        net = _with_dtype(self.net, compute_dtype)

        def f(params, states):
            return net.apply(params, states)

        return f

    def train_data(self, data, batch_size: int = 128, iters_per_val: int = 500,
                   validation_fraction: float = 0.1, early_stopping: bool = True,
                   early_stopping_patience: int = 10,
                   early_stopping_threshold: float = 1.0,
                   shuffle: bool = False, min_iters: int = 0,
                   max_iters: int = 100000, log=print,
                   validation_rows: int | None = None):
        """data = [states, values, policy(7), weights]."""
        weight = _col(data[3])
        weight = weight / jnp.mean(weight) if self.weighted else jnp.ones_like(weight)
        cols = (
            _boards(data[0]), _col(data[1]),
            jnp.asarray(data[2], jnp.float32).reshape(-1, 7), weight,
        )
        return _early_stop_fit(
            self, cols, batch_size, iters_per_val, validation_fraction,
            early_stopping, early_stopping_patience, early_stopping_threshold,
            shuffle, max_iters, log, validation_rows=validation_rows,
            min_iters=min_iters,
        )

    def save(self, path: str | None = None, verbose: bool = False):
        path = path or self.checkpoint_path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = {
            "params": flax.serialization.to_bytes(self.params),
            "opt_state": flax.serialization.to_bytes(self.opt_state),
        }
        _atomic_pickle(path, blob)
        if verbose:
            print("Saving model...", flush=True)

    def load(self, path: str | None = None):
        path = path or self.checkpoint_path
        if not os.path.isfile(path):
            print("Checkpoint not found, using default model", flush=True)
            return False
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.params = flax.serialization.from_bytes(self.params, blob["params"])
        self.opt_state = flax.serialization.from_bytes(
            self.opt_state, blob["opt_state"]
        )
        return True


class DistModel:
    """C51 value-distribution model (reference `model/model_distributional.py`:
    softmax over `atoms` bins, cross-entropy vs target distributions,
    `:81-93`)."""

    def __init__(self, atoms: int = 50, lr: float = 1e-3, weighted: bool = True,
                 seed: int = 0, compute_dtype: Any = jnp.float32,
                 checkpoint_path: str = "./checkpoints/model_dist.msgpack"):
        from tetris_mcts_tpu.models.nets import DistNet

        self.net = DistNet(atoms=atoms, compute_dtype=compute_dtype)
        self.atoms = atoms
        self.weighted = weighted
        self.checkpoint_path = checkpoint_path
        key = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, 20, 10, 1), jnp.float32)
        self.params = self.net.init(key, dummy)
        self.tx = optim.yogi(lr=lr)
        self.opt_state = self.tx.init(self.params)
        self._rng = np.random.RandomState(seed + 1)

        net, tx = self.net, self.tx

        def per_sample_loss(params, states, target, weight):
            pred = net.apply(params, states)
            return weight * L.categorical_ce(pred, target)

        def train_step(params, opt_state, data, key, bs):
            states, target, weight = data
            n = states.shape[0]
            idx = jax.random.randint(key, (bs,), 0, n)
            batch = tuple(d[idx] for d in data)

            def total(p):
                per = per_sample_loss(p, *batch)
                return jnp.mean(per), per

            (loss, per), grads = jax.value_and_grad(total, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, {"loss": loss, "loss_std": jnp.std(per)}

        def eval_loss(params, data):
            per = per_sample_loss(params, *data)
            return jnp.mean(per), jnp.std(per)

        def infer(params, states):
            return net.apply(params, states)

        self._train_step = jax.jit(train_step, static_argnums=(4,))
        self._eval_loss = jax.jit(eval_loss)
        self._infer = jax.jit(infer)
        self.infer_fn = infer

    def inference(self, boards):
        """boards -> (N, atoms) distribution."""
        return np.asarray(self._infer(self.params, _boards(boards)))

    def apply_fn(self, compute_dtype=None):
        net = _with_dtype(self.net, compute_dtype)

        def f(params, states):
            return net.apply(params, states)

        return f

    def train_data(self, data, batch_size: int = 128, iters_per_val: int = 500,
                   validation_fraction: float = 0.1, early_stopping: bool = True,
                   early_stopping_patience: int = 10,
                   early_stopping_threshold: float = 1.0,
                   shuffle: bool = False, min_iters: int = 0,
                   max_iters: int = 100000, log=print,
                   validation_rows: int | None = None):
        """data = [states, target_dists (N, atoms), weights]."""
        weight = _col(data[2])
        weight = weight / jnp.mean(weight) if self.weighted else jnp.ones_like(weight)
        cols = (_boards(data[0]), jnp.asarray(data[1], jnp.float32), weight)
        return _early_stop_fit(
            self, cols, batch_size, iters_per_val, validation_fraction,
            early_stopping, early_stopping_patience, early_stopping_threshold,
            shuffle, max_iters, log, validation_rows=validation_rows,
            min_iters=min_iters,
        )

    def save(self, path: str | None = None, verbose: bool = False):
        path = path or self.checkpoint_path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = {
            "params": flax.serialization.to_bytes(self.params),
            "opt_state": flax.serialization.to_bytes(self.opt_state),
        }
        _atomic_pickle(path, blob)
        if verbose:
            print("Saving model...", flush=True)

    def load(self, path: str | None = None):
        path = path or self.checkpoint_path
        if not os.path.isfile(path):
            print("Checkpoint not found, using default model", flush=True)
            return False
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.params = flax.serialization.from_bytes(self.params, blob["params"])
        self.opt_state = flax.serialization.from_bytes(
            self.opt_state, blob["opt_state"]
        )
        return True
