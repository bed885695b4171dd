"""Isolate the select-path costs: fused Pallas kernel walk vs XLA walk."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.ops import tree_walk
from tetris_mcts_tpu.search import mcts as M
from tetris_mcts_tpu.search import tree as T
from tetris_mcts_tpu.search.tree import TreeConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
POOL = 2048
ITERS = 64
CFG = TreeConfig(max_nodes=POOL, max_obs=POOL, table_size=2 * POOL,
                 max_depth=64, select_kernel=True)
SCFG = M.SearchConfig(tree=CFG, sims=64, evaluator="lp")

ev = M.nn_child_evaluator(
    lambda p, u, x: (jnp.linspace(0.0, 9.0, x.shape[0]),
                     jnp.full(x.shape[0], 2.0)))
run_sims = M.make_run_sims(ev, SCFG)
trees, envs = M.init_batch(0, B, SCFG)
trees = jax.jit(run_sims)(None, None, trees, jax.random.PRNGKey(1))
jax.block_until_ready(trees.n_nodes)


def timed(name, fn, *args):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jitted(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"phase": name, "us_per_sim": round(best / ITERS * 1e6, 1)}),
          flush=True)


key = jax.random.PRNGKey(2)


def loop_kernel(trees, key):
    def body(i, c):
        trees, key, acc = c
        key, sub = jax.random.split(key)
        traces, lengths, leafs, leaf_states = tree_walk.select_batched_pallas(
            trees, sub, CFG)
        return trees, key, acc + jnp.sum(lengths) + jnp.sum(leaf_states.score)
    return jax.lax.fori_loop(0, ITERS, body, (trees, key, jnp.int32(0)))[2]


def loop_xla(trees, key):
    def body(i, c):
        trees, key, acc = c
        key, sub = jax.random.split(key)
        traces, actions, lengths, leafs, childless, leaf_states = (
            T.select_batched(trees, jax.random.split(sub, trees.root.shape[0]),
                             CFG))
        return trees, key, acc + jnp.sum(lengths) + jnp.sum(leaf_states.score)
    return jax.lax.fori_loop(0, ITERS, body, (trees, key, jnp.int32(0)))[2]


timed("select_kernel", loop_kernel, trees, key)
timed("select_xla", loop_xla, trees, key)
