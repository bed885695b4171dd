"""Device-mesh sharding — the framework's single collectives module.

The reference has NO distributed communication at all (SURVEY.md §2.7: its
only "parallelism" is `cycle.sh` forking independent processes that share
files). The TPU-native design replaces that with SPMD over a
`jax.sharding.Mesh`:

- **data axis**: self-play game batch and training minibatch are sharded over
  `"data"`; gradient all-reduce rides ICI inside the compiled train step
  (XLA inserts the psum from sharding propagation — no hand-written NCCL/MPI
  analog anywhere).
- **model axis** (optional): the FC block of the VV net can be tensor-split
  over `"model"` — not needed for capacity at 0.5M params, but it keeps the
  whole TP story in this one module and is exercised by the multi-chip dryrun.

All cross-device traffic in the framework flows through shardings declared
here; nothing else communicates.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1D data mesh, or 2D (data × model) when model_parallel > 1."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if model_parallel > 1:
        assert n % model_parallel == 0, (n, model_parallel)
        grid = np.array(devs).reshape(n // model_parallel, model_parallel)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    return Mesh(np.array(devs), (DATA_AXIS,))


# ---------------------------------------------------------------------------
# placement helpers
# ---------------------------------------------------------------------------

def batch_spec(leaf_ndim: int) -> P:
    """Shard the leading (batch) axis over data, replicate the rest."""
    return P(DATA_AXIS, *([None] * (leaf_ndim - 1)))


def shard_batch(mesh: Mesh, tree):
    """Place a pytree whose every leaf has a leading batch axis: batch over
    `"data"`. Scalars (ndim 0) are replicated. Single-process form —
    `device_put` of a full global value requires every process to hold the
    identical value; on a multi-process mesh use `shard_batch_from_local`."""

    def put(leaf):
        leaf = jnp.asarray(leaf)
        spec = batch_spec(leaf.ndim) if leaf.ndim >= 1 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def shard_batch_from_local(mesh: Mesh, tree, global_batch: int):
    """Assemble GLOBAL batch-sharded arrays from each process's LOCAL rows:
    every process passes a pytree holding its own `global_batch /
    process_count` rows (e.g. its own-seeded env/tree shard), and the result
    is one global array per leaf, batch over `"data"`. This is the
    multi-controller-correct form of `shard_batch` — hosts' rows may differ
    by construction. Degenerates to a plain sharded placement on one
    process."""

    def put(leaf):
        leaf = np.asarray(jnp.asarray(leaf))
        sharding = NamedSharding(mesh, batch_spec(leaf.ndim))
        return jax.make_array_from_process_local_data(
            sharding, leaf, (global_batch,) + leaf.shape[1:]
        )

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (params, opt state, scalars)."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda leaf: jax.device_put(jnp.asarray(leaf), s), tree)


def vv_param_specs(mesh: Mesh, params):
    """Tensor-parallel sharding tree for the VV net when the mesh has a model
    axis: fc1 kernel column-split (output features), fc_out kernel row-split
    (input features) — the classic megatron pair; XLA inserts the single
    all-reduce between them. Everything else (convs, biases) is replicated.
    With a 1D mesh this replicates everything (pure DP)."""
    has_model = MODEL_AXIS in mesh.axis_names

    def spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        s = P()
        if has_model and leaf.ndim == 2:
            if "fc1" in names and names[-1] == "kernel":
                s = P(None, MODEL_AXIS)
            elif "fc_out" in names and names[-1] == "kernel":
                s = P(MODEL_AXIS, None)
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, params)


def vv_param_shardings(mesh: Mesh, params):
    """Place VV params per `vv_param_specs` (one-time placement helper)."""
    return jax.tree.map(jax.device_put, params, vv_param_specs(mesh, params))


# ---------------------------------------------------------------------------
# sharded programs
# ---------------------------------------------------------------------------

class LearnerState(NamedTuple):
    """Persistent mesh-resident learner state: placed ONCE at construction,
    then threaded through donated train steps — zero per-call host placement
    (the reference's single `train_nodes()` call as a long-lived SPMD
    learner)."""

    params: object
    opt_state: object
    fisher: object
    p0: object


def make_sharded_learner(model, mesh: Mesh):
    """The learner half of the actor-learner loop (SURVEY.md §2.7): returns
    `(state, step)` where `state` is a `LearnerState` placed on the mesh once
    (params/fisher per `vv_param_specs`, opt state replicated) and

        step(state, ubound, data, key, lam, bs) -> (state, metrics, batch)

    runs one data-parallel (and, on a 2D mesh, tensor-parallel) training
    step with the WHOLE state donated — XLA aliases the old parameter
    buffers into the new ones, so the steady-state loop does no host-side
    placement or copies at all. `data` is auto-placed batch-over-"data" by
    the declared in_shardings (one reshard on entry; resident training
    arrays can be pre-placed with `shard_batch` to make that free)."""
    pspec = vv_param_specs(mesh, model.params)
    fspec = vv_param_specs(mesh, model.fisher)
    repl = NamedSharding(mesh, P())
    repl_of = lambda tree: jax.tree.map(lambda _: repl, tree)
    dsh = NamedSharding(mesh, P(DATA_AXIS))

    # The state is donated every step, so it must own its buffers outright:
    # device_put avoids copies where it can (sharing the underlying buffer
    # with model.params/opt_state — and p0 aliases params at init), and
    # donating a shared buffer deletes it under the model object too. `+ 0`
    # forces a private copy of every leaf.
    copy_put = lambda leaf, s: jax.device_put(jnp.asarray(leaf) + 0, s)
    state = LearnerState(
        params=jax.tree.map(copy_put, model.params, pspec),
        opt_state=jax.tree.map(lambda leaf: copy_put(leaf, repl),
                               model.opt_state),
        fisher=jax.tree.map(copy_put, model.fisher, fspec),
        p0=jax.tree.map(copy_put, model.p0, fspec),
    )
    state_sh = LearnerState(
        params=pspec, opt_state=repl_of(model.opt_state),
        fisher=fspec, p0=fspec,
    )

    def _step(state: LearnerState, ubound, data, key, lam, bs):
        params, opt_state, metrics, batch = model.train_step_fn(
            state.params, state.opt_state, ubound, data, key,
            state.fisher, state.p0, lam, bs,
        )
        return state._replace(params=params, opt_state=opt_state), \
            metrics, batch

    step = jax.jit(
        _step,
        static_argnums=(5,),
        in_shardings=(state_sh, repl, dsh, repl, repl),
        # pin the state's output shardings to its input shardings — without
        # this XLA's propagation may pick a different layout for some leaf
        # (e.g. tp-shard a bias) and the next call's declared in_shardings
        # would reject the committed arrays
        out_shardings=(state_sh, repl_of({"loss": 0, "loss_std": 0,
                                          "grad_norm": 0}), dsh),
        donate_argnums=(0,),
    )
    return state, step


def sharded_train_step(model, mesh: Mesh):
    """Data-parallel (optionally TP) train step with the
    `VVModel.train_step_fn` signature:

        step(params, opt_state, ubound, data, key, fisher, p0, lam, bs)

    Shardings are DECLARED on the jit (in_shardings) instead of device_put
    per call — placement happens on first use and committed inputs stay put.
    No donation here: the signature passes `p0` (which aliases `params` at
    init) alongside `params`, and callers reuse their param trees. For a
    long-lived learner loop prefer `make_sharded_learner` (state placed once,
    donated steps, fisher/p0 resident)."""
    pspec = vv_param_specs(mesh, model.params)
    fspec = vv_param_specs(mesh, model.fisher)
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    opt_sh = jax.tree.map(lambda _: repl, model.opt_state)
    return jax.jit(
        model.train_step_fn,
        static_argnums=(8,),
        in_shardings=(pspec, opt_sh, repl, dsh, repl, fspec, fspec, repl),
    )


def sharded_move_fn(move_fn, mesh: Mesh):
    """Shard a `mcts.make_move_fn` program over the mesh: trees/envs batch
    over `"data"`, params/replay replicated — all declared as jit
    in_shardings (no per-call device_put; uncommitted inputs place on first
    use, committed ones stay put). The whole move (selection, 7-way
    expansion, NN forward over B×7 children, backup, env step, harvest)
    compiles into one SPMD program; the only collective is the replay ring's
    cross-shard cumsum, inserted by XLA. No donation: trees.root_state and
    envs alias the same output buffers (see SelfPlayDriver)."""
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    cache = {}

    def move(params, ubound, trees, envs, replay, key):
        if "fn" not in cache:  # in_shardings need the arg pytree structures
            in_sh = (
                jax.tree.map(lambda _: repl, params),
                repl,
                jax.tree.map(lambda _: dsh, trees),
                jax.tree.map(lambda _: dsh, envs),
                jax.tree.map(lambda _: repl, replay),
                repl,
            )
            cache["fn"] = jax.jit(move_fn, in_shardings=in_sh)
        return cache["fn"](params, jnp.asarray(ubound), trees, envs, replay,
                           key)

    return move
