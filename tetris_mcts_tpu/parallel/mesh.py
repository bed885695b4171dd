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

from typing import Optional, Sequence

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


def vv_param_shardings(mesh: Mesh, params):
    """Tensor-parallel placement for the VV net when the mesh has a model
    axis: fc1 kernel column-split (output features), fc_out kernel row-split
    (input features) — the classic megatron pair; XLA inserts the single
    all-reduce between them. Everything else (convs, biases) is replicated.
    With a 1D mesh this replicates everything (pure DP)."""
    has_model = MODEL_AXIS in mesh.axis_names

    def put(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        spec = P()
        if has_model and leaf.ndim == 2:
            if "fc1" in names and names[-1] == "kernel":
                spec = P(None, MODEL_AXIS)
            elif "fc_out" in names and names[-1] == "kernel":
                spec = P(MODEL_AXIS, None)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


# ---------------------------------------------------------------------------
# sharded programs
# ---------------------------------------------------------------------------

def sharded_train_step(model, mesh: Mesh):
    """Data-parallel (optionally TP) train step: params/opt-state placed per
    `vv_param_shardings`, training arrays sharded over data. Returns
    step(params, opt_state, ubound, data, key, fisher, p0, lam, bs) — same
    signature as `VVModel.train_step_fn`. Gradient reduction is compiled in
    by XLA from the shardings (the reference's single-device
    `Model.train`, model/model.py:97-118, made SPMD)."""
    jitted = jax.jit(model.train_step_fn, static_argnums=(8,))

    def step(params, opt_state, ubound, data, key, fisher, p0, lam, bs):
        params = vv_param_shardings(mesh, params)
        opt_state = jax.tree.map(
            lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), opt_state
        )
        data = shard_batch(mesh, data)
        fisher = replicate(mesh, fisher)
        p0 = replicate(mesh, p0)
        return jitted(params, opt_state, ubound, data, key, fisher, p0, lam, bs)

    return step


def sharded_move_fn(move_fn, mesh: Mesh):
    """Shard a `mcts.make_move_fn` program over the mesh: trees/envs batch
    over `"data"`, params/replay replicated. The whole move (selection,
    7-way expansion, NN forward over B×7 children, backup, env step, harvest)
    compiles into one SPMD program; the only collective is the replay ring's
    cross-shard cumsum, inserted by XLA."""
    jitted = jax.jit(move_fn)

    def move(params, ubound, trees, envs, replay, key):
        params = replicate(mesh, params)
        trees = shard_batch(mesh, trees)
        envs = shard_batch(mesh, envs)
        replay = replicate(mesh, replay)
        return jitted(params, jnp.asarray(ubound), trees, envs, replay, key)

    return move
