"""Insert-phase timing only: XLA probe while_loop vs the Pallas insert
kernel, at bench shapes, timed inside a fori loop (axon latency rule)."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.ops import tree_walk
from tetris_mcts_tpu.search import tree as T
from tetris_mcts_tpu.search.tree import TreeConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
POOL = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
ITERS = 64
CFG = TreeConfig(max_nodes=POOL, max_obs=POOL, table_size=2 * POOL,
                 max_depth=64)

envs = engine.reset_batch(0, B, CFG.env)
trees = jax.vmap(T.init_tree, in_axes=(0, None))(envs, CFG)
key = jax.random.PRNGKey(2)


def timed(name, fn):
    jitted = jax.jit(fn)
    out = jitted(trees, key)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jitted(trees, key)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"phase": name,
                      "us_per_call": round(best / ITERS * 1e6, 1)}),
          flush=True)


def loop(body):
    def outer(trees, key):
        def f(i, c):
            trees, key, acc = c
            key, sub = jax.random.split(key)
            trees, acc2 = body(trees, sub)
            return trees, key, acc + acc2
        return jax.lax.fori_loop(
            0, ITERS, f, (trees, key, jnp.float32(0)))[2]
    return outer


def b_xla(trees, sub):
    pk = jax.random.randint(sub, (B, 7, 20), 0, 1 << 20).astype(jnp.uint32)
    t2, obs7 = T.insert_obs7_batched(
        trees, pk, jnp.zeros((B, 7), bool), jnp.ones((B,), bool), CFG)
    return t2, jnp.sum(obs7).astype(jnp.float32)


def b_pallas(trees, sub):
    pk = jax.random.randint(sub, (B, 7, 20), 0, 1 << 20).astype(jnp.uint32)
    t2, obs7 = tree_walk.insert_obs7_batched_pallas(
        trees, pk, jnp.zeros((B, 7), bool), jnp.ones((B,), bool), CFG)
    return t2, jnp.sum(obs7).astype(jnp.float32)


which = sys.argv[3] if len(sys.argv) > 3 else "both"
if which in ("both", "xla"):
    timed("insert_xla", loop(b_xla))
if which in ("both", "pallas"):
    timed("insert_pallas", loop(b_pallas))
