"""Scaling benchmark: env-steps/s and MCTS sims/s across device-mesh sizes.

BASELINE.md's scaling target row asks for throughput "measured at 1 chip,
1 host, and >= 2 hosts". This harness measures weak scaling (fixed
per-device batch) of the two headline rates over `jax.sharding.Mesh` sizes:

- on real multi-chip hardware it measures actual ICI scaling;
- with `--virtual N` it bootstraps N virtual CPU devices
  (`xla_force_host_platform_device_count` — the standard JAX trick for
  validating pod code without a pod, SURVEY.md §4) so the sharded programs
  and their collectives are exercised and timed end-to-end on any box.
  Virtual-device numbers validate the SPMD program shape, not hardware.

Usage:
  python scripts/scaling_bench.py --virtual 8 --sizes 1,2,4,8
  python scripts/scaling_bench.py --sizes 1,4 --batch_per_device 256  # real chips

Prints one JSON line per mesh size plus a summary line with weak-scaling
efficiency (rate(n) / (n * rate(1))).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="1,2,4,8",
                   help="comma-separated mesh sizes to measure")
    p.add_argument("--virtual", type=int, default=0,
                   help="bootstrap N virtual CPU devices (0 = use real "
                        "devices as-is)")
    p.add_argument("--batch_per_device", type=int, default=0,
                   help="games per device (0 = auto: 256 TPU / 16 CPU)")
    p.add_argument("--env_batch_per_device", type=int, default=0,
                   help="env-bench boards per device (0 = auto)")
    p.add_argument("--sims", type=int, default=0,
                   help="sims per move (0 = auto: 100 TPU / 8 CPU)")
    p.add_argument("--moves", type=int, default=0,
                   help="moves per timed rep (0 = auto)")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default="", help="also append JSONL here")
    return p.parse_args()


ARGS = parse_args()

if ARGS.virtual:
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={ARGS.virtual}"
    )

import jax  # noqa: E402  (after XLA_FLAGS)
import jax.numpy as jnp  # noqa: E402

if ARGS.virtual:
    # the env var alone is ignored once the axon TPU plugin loads (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")


def bench_env_sharded(mesh, batch: int, steps: int, reps: int, seed: int = 0):
    from tetris_mcts_tpu.env import engine
    from tetris_mcts_tpu.parallel import mesh as M

    cfg = engine.EnvConfig()
    envs = M.shard_batch(mesh, engine.reset_batch(seed, batch, cfg))
    vreset = jax.vmap(lambda s: engine.soft_reset(s, cfg))

    def body(carry, _):
        s, key = carry
        key, sub = jax.random.split(key)
        a = jax.random.randint(sub, (batch,), 0, 7)
        s = engine.step_batch(s, a, cfg)
        fresh = vreset(s)
        s = jax.tree.map(
            lambda f, t: jnp.where(
                s.end.reshape((-1,) + (1,) * (f.ndim - 1)), f, t
            ),
            fresh, s,
        )
        return (s, key), None

    @jax.jit
    def run(envs, key):
        (envs, _), _ = jax.lax.scan(body, (envs, key), length=steps)
        return envs

    key = jax.random.PRNGKey(seed)
    envs = run(envs, key)
    jax.block_until_ready(envs.rows)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        envs = run(envs, key)
        jax.block_until_ready(envs.rows)
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best


def bench_mcts_sharded(mesh, batch: int, sims: int, moves: int, reps: int,
                       seed: int = 0):
    from tetris_mcts_tpu.ops import tree_walk
    from tetris_mcts_tpu.parallel import mesh as M
    from tetris_mcts_tpu.search import mcts
    from tetris_mcts_tpu.search.tree import TreeConfig
    from tetris_mcts_tpu.train.trainer import VVModel

    tree_walk.set_kernel_mesh(mesh)  # walk kernels enter via shard_map
    cfg = mcts.SearchConfig(
        tree=TreeConfig(max_nodes=2048, max_obs=2048, table_size=4096,
                        max_depth=64),
        sims=sims,
        evaluator="lp",
    )
    model = VVModel(seed=seed)
    move = mcts.make_move_fn(
        mcts.nn_child_evaluator(model.apply_fn(jnp.bfloat16)), cfg,
        min_visits_store=25,
    )

    def body(carry, _):
        trees, envs, replay, key = carry
        key, sub = jax.random.split(key)
        trees, envs, replay, stats = move(
            model.params, model.ubound, trees, envs, replay, sub
        )
        return (trees, envs, replay, key), stats.lines

    @jax.jit
    def run(trees, envs, replay, key):
        (trees, envs, replay, _), lines = jax.lax.scan(
            body, (trees, envs, replay, key), length=moves
        )
        return trees, envs, replay, lines

    trees, envs = mcts.init_batch(seed, batch, cfg)
    trees = M.shard_batch(mesh, trees)
    envs = M.shard_batch(mesh, envs)
    replay = M.replicate(mesh, mcts.init_replay(100_000))
    params = M.replicate(mesh, model.params)
    model.params = params
    key = jax.random.PRNGKey(seed)

    trees, envs, replay, lines = run(trees, envs, replay, key)
    jax.block_until_ready(lines)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        trees, envs, replay, lines = run(trees, envs, replay, key)
        jax.block_until_ready(lines)
        best = min(best, time.perf_counter() - t0)
    tree_walk.set_kernel_mesh(None)
    return batch * sims * moves / best


def bench_train_sharded(mesh, rows: int, batch_size: int, steps: int,
                        reps: int, seed: int = 0):
    """Data-parallel SGD throughput (training rows/s): the learner half of
    the actor-learner design (SURVEY.md §2.7) — params replicated (or TP
    via vv_param_shardings on a 2D mesh), training arrays sharded over
    "data", gradient psum compiled in by XLA."""
    import numpy as np

    from tetris_mcts_tpu.parallel import mesh as M
    from tetris_mcts_tpu.train.trainer import VVModel

    model = VVModel(seed=seed)
    rng = np.random.RandomState(seed)
    data = (
        jnp.asarray(rng.randint(0, 2, (rows, 20, 10, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 50, rows), jnp.float32),
        jnp.asarray(rng.uniform(1, 10, rows), jnp.float32),
        jnp.ones(rows, jnp.float32),
    )
    data = M.shard_batch(mesh, data)
    params = M.vv_param_shardings(mesh, model.params)
    opt_state = M.replicate(mesh, model.opt_state)
    fisher = M.replicate(mesh, model.fisher)
    p0 = M.replicate(mesh, model.p0)
    lam = jnp.float32(0.0)
    step = jax.jit(model.train_step_fn, static_argnums=(8,))

    def body(carry, _):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)
        params, opt_state, m, _ = step(
            params, opt_state, model.ubound, data, sub, fisher, p0, lam,
            batch_size,
        )
        return (params, opt_state, key), m["loss"]

    @jax.jit
    def run(params, opt_state, key):
        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, key), length=steps
        )
        return params, opt_state, losses

    key = jax.random.PRNGKey(seed)
    params, opt_state, losses = run(params, opt_state, key)
    jax.block_until_ready(losses)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        params, opt_state, losses = run(params, opt_state, key)
        jax.block_until_ready(losses)
        best = min(best, time.perf_counter() - t0)
    return batch_size * steps / best


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tetris_mcts_tpu.parallel import mesh as M

    devs = jax.devices()
    on_tpu = devs[0].platform == "tpu"
    bpd = ARGS.batch_per_device or (256 if on_tpu else 16)
    ebpd = ARGS.env_batch_per_device or (8192 if on_tpu else 512)
    sims = ARGS.sims or (100 if on_tpu else 8)
    moves = ARGS.moves or (8 if on_tpu else 2)
    env_steps = 512 if on_tpu else 64

    sizes = [int(s) for s in ARGS.sizes.split(",") if s]
    sizes = [n for n in sizes if n <= len(devs)]
    if not sizes:
        print(json.dumps({"error": "no mesh size fits device count",
                          "devices": len(devs)}))
        return 1

    train_bs = 512 if on_tpu else 64
    train_steps = 64 if on_tpu else 8

    rows = []
    for n in sizes:
        mesh = M.make_mesh(n)
        env_rate = bench_env_sharded(mesh, n * ebpd, env_steps, ARGS.reps)
        sims_rate = bench_mcts_sharded(mesh, n * bpd, sims, moves, ARGS.reps)
        train_rate = bench_train_sharded(
            mesh, rows=max(4 * train_bs, n * train_bs),
            batch_size=n * train_bs, steps=train_steps, reps=ARGS.reps,
        )
        row = {
            "devices": n,
            "platform": devs[0].platform,
            "device_kind": devs[0].device_kind,
            "virtual": bool(ARGS.virtual),
            "batch": n * bpd,
            "sims_per_s": round(sims_rate, 1),
            "sims_per_s_per_device": round(sims_rate / n, 1),
            "env_steps_per_s": round(env_rate, 1),
            "env_steps_per_s_per_device": round(env_rate / n, 1),
            "train_rows_per_s": round(train_rate, 1),
            "train_rows_per_s_per_device": round(train_rate / n, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = rows[0]
    scale = base["devices"]
    summary = {
        "metric": "weak_scaling_efficiency",
        "sizes": [r["devices"] for r in rows],
        "sims_efficiency": [
            round(r["sims_per_s"] * scale
                  / (base["sims_per_s"] * r["devices"]), 3)
            for r in rows
        ],
        "env_efficiency": [
            round(r["env_steps_per_s"] * scale
                  / (base["env_steps_per_s"] * r["devices"]), 3)
            for r in rows
        ],
        "train_efficiency": [
            round(r["train_rows_per_s"] * scale
                  / (base["train_rows_per_s"] * r["devices"]), 3)
            for r in rows
        ],
    }
    print(json.dumps(summary), flush=True)
    if ARGS.out:
        with open(ARGS.out, "a") as f:
            for r in rows + [summary]:
                f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
