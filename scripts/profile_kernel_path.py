"""Per-phase timing of the kernel-path simulation (select+expand kernel,
obs insert, commit, NN forward, fused LP backup)."""
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
from tetris_mcts_tpu.train.trainer import VVModel

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
POOL = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
ITERS = 64
CFG = TreeConfig(max_nodes=POOL, max_obs=POOL, table_size=2 * POOL,
                 max_depth=64)
SCFG = M.SearchConfig(tree=CFG, sims=64, evaluator="lp")

model = VVModel(seed=0, compute_dtype=jnp.bfloat16)
apply_fn = model.apply_fn()
ev = M.nn_child_evaluator(apply_fn)
run_sims = M.make_run_sims(ev, SCFG)
trees, envs = M.init_batch(0, B, SCFG)
trees = jax.jit(run_sims)(model.params, model.ubound, trees,
                          jax.random.PRNGKey(1))
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
    print(json.dumps({"phase": name,
                      "us_per_sim": round(best / ITERS * 1e6, 1)}),
          flush=True)
    return out


key = jax.random.PRNGKey(2)
vexpand_commit = jax.vmap(T.expand_commit, in_axes=(0, 0, 0, 0, 0, 0, None))


def loop(body):
    def outer(trees, key):
        def f(i, c):
            trees, key, acc = c
            key, sub = jax.random.split(key)
            acc2 = body(trees, sub)
            return trees, key, acc + acc2
        return jax.lax.fori_loop(0, ITERS, f, (trees, key, jnp.float32(0)))[2]
    return outer


def b_kernel(trees, sub):
    tr, ln, lf, ls, pk, sc7, e7 = tree_walk.select_batched_pallas(trees, sub, CFG)
    return jnp.sum(ln).astype(jnp.float32) + jnp.sum(sc7)


def b_insert(trees, sub):
    pk = jax.random.randint(sub, (B, 7, 20), 0, 1 << 20).astype(jnp.uint32)
    t2, obs7 = T.insert_obs7_batched(
        trees, pk, jnp.zeros((B, 7), bool), jnp.ones((B,), bool), CFG)
    return jnp.sum(obs7).astype(jnp.float32)


def b_insert_pallas(trees, sub):
    pk = jax.random.randint(sub, (B, 7, 20), 0, 1 << 20).astype(jnp.uint32)
    t2, obs7 = tree_walk.insert_obs7_batched_pallas(
        trees, pk, jnp.zeros((B, 7), bool), jnp.ones((B,), bool), CFG)
    return jnp.sum(obs7).astype(jnp.float32)


def b_commit(trees, sub):
    sc7 = jax.random.uniform(sub, (B, 7))
    obs7 = jax.random.randint(sub, (B, 7), 1, POOL)
    leafs = jax.random.randint(sub, (B,), 1, POOL)
    t2 = vexpand_commit(trees, sc7, jnp.zeros((B, 7), bool), obs7, leafs,
                        jnp.ones((B,), bool), CFG)
    return jnp.sum(t2.cbase).astype(jnp.float32)


def b_nn(trees, sub):
    pk = jax.random.randint(sub, (B, 7, 20), 0, 1 << 20).astype(jnp.uint32)
    imgs = engine.unpack_obs(pk)
    v, var = ev(model.params, model.ubound, imgs, None, sub)
    return jnp.sum(v)


def b_lp_backup(trees, sub):
    tr = jax.random.randint(sub, (B, CFG.max_depth), 1, POOL)
    ln = jax.random.randint(sub, (B,), 2, 16)
    v = jax.random.uniform(sub, (B, 7)) * 10
    var = jax.random.uniform(sub, (B, 7))
    t2 = tree_walk.lp_backup_batched_pallas(
        trees, tr, ln, v, var, jnp.ones((B,), bool), CFG)
    return jnp.sum(t2.visits)


timed("select+expand kernel", loop(b_kernel), trees, key)
timed("insert_obs7", loop(b_insert), trees, key)
timed("insert_obs7_pallas", loop(b_insert_pallas), trees, key)
timed("expand_commit", loop(b_commit), trees, key)
timed("nn_forward(unpack+conv)", loop(b_nn), trees, key)
timed("lp_backup kernel", loop(b_lp_backup), trees, key)
