"""Direct arbitration on a dumped state: whose level-0 choice is right?

Runs, on the CURRENT backend, for the same dumped tree state + key:
  A. T.select_batched          (the hand-batched production XLA walk)
  B. jax.vmap(T.select)        (the per-tree reference walk, vmapped)
  C. tree_walk.select_walk     (the Pallas kernel, compiled when on TPU)
and compares leafs/traces/lengths pairwise. Run on TPU and on CPU and
compare verdicts: the implementation that changes its answer across
backends at fixed input is the miscompiled one.

Usage: [JAX_PLATFORMS=cpu] python scripts/probe_walk_vs.py [state.pkl]
"""
import os
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("TMT_FORCE_SELECT_KERNEL", "1")
from tetris_mcts_tpu import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_want = os.environ.get("JAX_PLATFORMS")
if _want:
    jax.config.update("jax_platforms", _want)

from tetris_mcts_tpu.env import engine  # noqa: E402
from tetris_mcts_tpu.ops import tree_walk  # noqa: E402
from tetris_mcts_tpu.search import tree as T  # noqa: E402


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "runs/r4probe/state_m0_s1.pkl"
    with open(path, "rb") as f:
        blob = pickle.load(f)
    trees = jax.tree.map(jnp.asarray, blob["trees"])
    key = jnp.asarray(blob["key"])
    tcfg = blob["tcfg"]
    B = trees.root.shape[0]
    print(f"device={jax.devices()[0].platform} B={B} "
          f"N={tcfg.max_nodes} D={tcfg.max_depth}")

    @jax.jit
    def batched(trees, key):
        tr, _a, ln, lf, _cl, st = T.select_batched(
            trees, jax.random.split(key, B), tcfg)
        return tr, ln, lf

    @jax.jit
    def vmapped(trees, key):
        def one(tree, k):
            tr, _a, ln, st = T.select(tree, k, tcfg)
            return tr, ln, tr[jnp.maximum(ln - 1, 0)]
        return jax.vmap(one, in_axes=(0, 0))(
            trees, jax.random.split(key, B))

    def select_ins(trees, key, tcfg):
        D = tcfg.max_depth
        k_low, k_pol = jax.random.split(key)
        gumbels = jax.random.gumbel(k_low, (B, D, 7))
        rnd = jnp.zeros((B, D, 7), jnp.float32)
        score = trees.nstat[:, 0, :]
        obs = trees.nstat[:, 1, :].astype(jnp.int32)
        rootsc = jax.vmap(lambda s, r: s[r])(score, trees.root)
        env0 = engine.pack_state(trees.root_state)
        return (trees.cbase, score, obs, trees.visits, trees.values,
                trees.vars_, trees.root, rootsc, env0, gumbels, rnd)

    @jax.jit
    def kernel(trees, key):
        ins = select_ins(trees, key, tcfg)
        out = tree_walk.select_walk(
            *ins, policy=tcfg.policy, low=tcfg.low,
            app=tcfg.env.actions_per_drop, scoring=tcfg.env.scoring,
            randomizer=tcfg.env.randomizer,
            interpret=not tree_walk.on_tpu())
        return out[0], out[1], out[2]

    outs = {}
    for name, fn in (("batched", batched), ("vmapped", vmapped),
                     ("kernel", kernel)):
        tr, ln, lf = jax.device_get(fn(trees, key))
        outs[name] = (np.asarray(tr), np.asarray(ln).reshape(-1),
                      np.asarray(lf).reshape(-1))
        print(f"{name:8s} lengths[:8]={outs[name][1][:8].tolist()} "
              f"leafs[:8]={outs[name][2][:8].tolist()}")
    for a, b in (("batched", "vmapped"), ("batched", "kernel"),
                 ("vmapped", "kernel")):
        dl = int((outs[a][2] != outs[b][2]).sum())
        dn = int((outs[a][1] != outs[b][1]).sum())
        dt = int((outs[a][0] != outs[b][0]).any(1).sum())
        print(f"{a} vs {b}: leaf diff {dl}/{B}  len diff {dn}/{B}  "
              f"trace diff {dt}/{B}")


if __name__ == "__main__":
    main()
