"""Per-phase timing of the MCTS simulation on the current backend.

Times select / select+replay / NN forward / backup in isolation (each as one
jitted fori program over `iters` repetitions, outputs threaded through the
carry to defeat DCE) plus the full sim loop; expand+glue is the residual.
"""

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.search import mcts as M
from tetris_mcts_tpu.search import tree as T
from tetris_mcts_tpu.search.tree import TreeConfig
from tetris_mcts_tpu.train.trainer import VVModel

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
POOL = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
SIMS = 64
CFG = M.SearchConfig(
    tree=TreeConfig(max_nodes=POOL, max_obs=POOL, table_size=2 * POOL,
                    max_depth=64),
    sims=SIMS,
    evaluator="lp",
)

model = VVModel(seed=0, compute_dtype=jnp.bfloat16)
apply_fn = model.apply_fn()
ev = M.nn_child_evaluator(apply_fn)
run_sims = M.make_run_sims(ev, CFG)

trees, envs = M.init_batch(0, B, CFG)
key = jax.random.PRNGKey(1)

# populate trees with real content first (depth > 1)
trees = jax.jit(run_sims)(model.params, model.ubound, trees, key)
jax.block_until_ready(trees.n_nodes)

vselect = jax.vmap(T.select, in_axes=(0, 0, None))  # fused select+replay
vbackup = jax.vmap(T.backup, in_axes=(0, 0, 0, 0, 0, None))


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
    per_sim = best / SIMS
    print(json.dumps({"phase": name, "total_s": round(best, 4),
                      "us_per_sim": round(per_sim * 1e6, 1)}), flush=True)
    return best


def loop_select(trees, key):
    """select now carries the env state inline (leaf replay fused in)."""
    def body(i, carry):
        acc, key = carry
        key, sub = jax.random.split(key)
        traces, acts, lengths, states = vselect(
            trees, jax.random.split(sub, B), CFG.tree
        )
        return acc + jnp.sum(lengths) + jnp.sum(states.score).astype(jnp.int32), key

    return jax.lax.fori_loop(0, SIMS, body, (jnp.int32(0), key))


def loop_nn(params, ubound, key):
    imgs0 = jnp.zeros((B * 7, 20, 10, 1), jnp.float32)

    def body(i, carry):
        acc = carry
        v, var = apply_fn(params, ubound, imgs0 + acc * 0)
        return acc + jnp.sum(v)

    return jax.lax.fori_loop(0, SIMS, body, jnp.float32(0))


def loop_backup(trees, key):
    traces, acts, lengths, _ = vselect(trees, jax.random.split(key, B), CFG.tree)
    v0 = jnp.full(B, 10.0)
    var0 = jnp.full(B, 1.0)

    def body(i, trees):
        return vbackup(trees, traces, lengths, v0, var0, CFG.tree)

    return jax.lax.fori_loop(0, SIMS, body, trees)


def loop_full(params, ubound, trees, key):
    return run_sims(params, ubound, trees, key)


print(json.dumps({"batch": B, "sims": SIMS,
                  "device": str(jax.devices()[0])}), flush=True)
t_selrep = timed("select(+replay fused)", loop_select, trees, key)
t_nn = timed("nn_forward", loop_nn, model.params, model.ubound, key)
t_back = timed("backup", loop_backup, trees, key)
t_full = timed("full_sim", loop_full, model.params, model.ubound, trees, key)
resid = t_full - t_selrep - t_nn - t_back
print(json.dumps({"phase": "expand+glue(residual)",
                  "total_s": round(resid, 4),
                  "us_per_sim": round(resid / SIMS * 1e6, 1)}), flush=True)
print(json.dumps({"sims_per_s": round(B * SIMS / t_full, 1)}), flush=True)


# ---- expand subphases -------------------------------------------------------
from tetris_mcts_tpu.env.engine import EnvState  # noqa: E402

A7 = jnp.arange(7, dtype=jnp.int32)
envs0 = envs


def loop_childstep(envs0, key):
    """7-child engine.step from B env states (the expansion's env work)."""
    def body(i, carry):
        acc = carry
        kids = jax.vmap(
            lambda s: jax.vmap(lambda a: engine.step(s, a, CFG.tree.env))(A7)
        )(envs0)
        return acc + jnp.sum(kids.score)

    return jax.lax.fori_loop(0, SIMS, body, jnp.float32(0))


def loop_pack_insert(trees, envs0, key):
    """pack_obs + parallel table insert on 7 children per tree."""
    kids = jax.vmap(
        lambda s: jax.vmap(lambda a: engine.step(s, a, CFG.tree.env))(A7)
    )(envs0)
    packed = jax.vmap(jax.vmap(engine.pack_obs))(kids)  # (B,7,20)
    vins = jax.vmap(T._insert_obs7, in_axes=(0, 0, 0, None, None))

    def body(i, carry):
        trees, acc = carry
        trees2, obs7 = vins(trees, packed, kids.end, jnp.asarray(True),
                            CFG.tree)
        return trees, acc + jnp.sum(obs7)  # discard tree growth: same work

    return jax.lax.fori_loop(0, SIMS, body, (trees, jnp.int32(0)))


def loop_render(envs0, key):
    """image render of 7 children (evaluator input prep)."""
    kids = jax.vmap(
        lambda s: jax.vmap(lambda a: engine.step(s, a, CFG.tree.env))(A7)
    )(envs0)

    def body(i, acc):
        imgs = jax.vmap(jax.vmap(engine.get_state))(kids)
        return acc + jnp.sum(imgs.astype(jnp.float32)) * 0 + acc * 0 + jnp.float32(i)

    return jax.lax.fori_loop(0, SIMS, body, jnp.float32(0))


t_step = timed("expand:7xstep", loop_childstep, envs0, key)
t_ins = timed("expand:pack+insert", loop_pack_insert, trees, envs0, key)
t_rend = timed("expand:render", loop_render, envs0, key)
