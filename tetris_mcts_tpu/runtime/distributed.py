"""Multi-host runtime: process groups, global meshes, per-host RNG, and the
sharded actor-learner step.

The reference has NO distributed layer (SURVEY.md §2.7: `cycle.sh` forks
processes that share files). Here scale-out is SPMD:

- `init_distributed()` wraps `jax.distributed.initialize` (one process per
  host; env-driven coordinator discovery — the standard TPU pod setup);
- `global_mesh()` builds a Mesh over ALL devices (local + remote) with the
  data axis spanning hosts: gradient all-reduce rides ICI within a slice and
  DCN across slices, compiled by XLA from the shardings declared in
  `parallel/mesh.py` — there is no hand-written communication anywhere;
- per-host game diversity comes from seeding each host's shard of the
  env/tree init with a process-offset seed (SURVEY.md §2.7 'per-host unique
  RNG folds'); everything fed to the global-mesh program itself (driver key,
  params) stays bit-identical across processes — a multi-controller
  requirement for replicated inputs;
- `DistributedSelfPlay` runs the actor-learner loop: each host steps its
  local shard of the global env/tree batch; training samples ride the same
  mesh so the learner's gradient psum is the only cross-host traffic.

Weight distribution needs no checkpoint-reload handoff (the reference's
`save / load` dance, `agents/ValueSimOnline.py:205-212`): params live
replicated on the mesh and every actor reads the post-update values in the
next move program.

Testable without a pod: `XLA_FLAGS=--xla_force_host_platform_device_count=N`
gives N virtual devices in one process (tests/conftest.py), and
`jax.distributed.initialize` accepts num_processes=1.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from tetris_mcts_tpu.parallel import mesh as M


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize the multi-host process group. No-ops for single-process
    runs (the common 1-host case and all tests). Returns the process index.

    Coordinator discovery: explicit args, else JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars, else TPU-pod metadata
    (jax.distributed.initialize() with no args)."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator is None and num_processes in (None, 1):
        return 0  # single process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def global_mesh(model_parallel: int = 1):
    """Mesh over every device of every process (data axis spans hosts)."""
    return M.make_mesh(devices=jax.devices(), model_parallel=model_parallel)


def host_fold(key, axis: str = "host"):
    """Fold the process index into an RNG key, for HOST-LOCAL streams
    (e.g. seeding this host's shard of the global env batch). Never feed a
    host-folded key into a jitted program over the global mesh: replicated
    inputs must be bit-identical on every process in multi-controller JAX —
    host-divergent values are undefined behavior."""
    return jax.random.fold_in(key, jax.process_index())


def local_batch(global_batch: int) -> int:
    """Games this process owns under even sharding of the global batch."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


class DistributedSelfPlay:
    """Actor-learner over a global mesh: a thin composition of the
    single-host driver pieces with mesh-sharded state. Each host constructs
    this with the same config; per-host RNG folding diversifies games.

    On a real pod, `jax.make_array_from_single_device_arrays` assembles the
    global (trees, envs) from each host's local shard; on one host this
    degenerates to `parallel.mesh.shard_batch`."""

    def __init__(self, cfg, model=None, model_parallel: int = 1, **driver_kw):
        from tetris_mcts_tpu.ops import tree_walk
        from tetris_mcts_tpu.runtime.selfplay import SelfPlayDriver

        self.process_index = jax.process_index()
        self.mesh = global_mesh(model_parallel)
        # registered BEFORE the driver traces its move program, so on TPU
        # the Pallas walk kernels stay on (entered through shard_map over
        # the data axis) instead of falling back to the XLA walks; off-TPU
        # the kernels are never taken and registering would only leak the
        # mesh into unrelated later traces
        if tree_walk.on_tpu():
            tree_walk.set_kernel_mesh(self.mesh)
        assert driver_kw.get("saver") is None and \
            driver_kw.get("status") is None, (
                "saver/status channels are single-process (every host "
                "would write identical rows to the same file)"
            )
        self.driver = SelfPlayDriver(cfg, model=model, **driver_kw)
        # Per-host game diversity comes from the env/tree INIT: each host
        # seeds ITS OWN local_batch rows of the global batch and the global
        # arrays are assembled from those local shards (device_put of a
        # full host-divergent value is rejected by multi-controller JAX).
        # The driver's RNG key and params stay at the shared base seed —
        # they are REPLICATED inputs and must be bit-identical on every
        # process; per-lane draw streams inside the program already differ
        # per game.
        from tetris_mcts_tpu.search import mcts
        local_b = local_batch(cfg.batch)
        local_seed = cfg.seed + 7919 * self.process_index
        ltrees, lenvs = mcts.init_batch(
            local_seed, local_b, self.driver.search_cfg
        )
        self.driver.trees = M.shard_batch_from_local(
            self.mesh, ltrees, cfg.batch
        )
        self.driver.envs = M.shard_batch_from_local(
            self.mesh, lenvs, cfg.batch
        )
        self.driver.replay = M.replicate(self.mesh, self.driver.replay)

    def close(self):
        """Unregister the kernel mesh so later programs in this process
        (e.g. a single-device bench) trace without it."""
        from tetris_mcts_tpu.ops import tree_walk

        tree_walk.set_kernel_mesh(None)

    def step(self):
        return self.driver.step()

    def run(self, n_moves: int):
        self.driver.run(n_moves)

    def run_episodes(self, n: int, **kw):
        self.driver.run_episodes(n, **kw)
