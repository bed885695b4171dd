"""Autopsy of a single-lane select divergence (mode 2): on the dumped
state, run the compiled kernel and the XLA walk, find the divergent lane
and the first level where their traces split, then recompute that level's
selection inputs in float64 NumPy from the dumped stats and print the
per-child q values + gaps — distinguishing an ulp-scale tie break from a
real logic difference.

Usage: python scripts/probe_trace_diff.py runs/r4probe/state_m0_s93.pkl
"""
import os
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("TMT_FORCE_SELECT_KERNEL", "1")
from tetris_mcts_tpu import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_want = os.environ.get("JAX_PLATFORMS")
if _want:
    jax.config.update("jax_platforms", _want)

from tetris_mcts_tpu.env import engine  # noqa: E402
from tetris_mcts_tpu.ops import tree_walk  # noqa: E402
from tetris_mcts_tpu.search import tree as T  # noqa: E402


def np_level(blob, lane, node, dtype):
    """One selection level recomputed in NumPy at the given precision."""
    t = blob["trees"]
    cb = np.asarray(t.cbase)[lane]
    ns = np.asarray(t.nstat)[lane]
    vis = np.asarray(t.visits)[lane].astype(dtype)
    val = np.asarray(t.values)[lane].astype(dtype)
    var = np.asarray(t.vars_)[lane].astype(dtype)
    c = cb[node]
    if c == 0:
        return None
    kids = c + np.arange(7)
    sc = ns[0, kids].astype(dtype)
    obs = ns[1, kids].astype(int)
    # unique-by-obs keep max score, earliest ties
    kept = np.ones(7, bool)
    for i in range(7):
        for j in range(7):
            if i != j and obs[i] == obs[j]:
                if (sc[j] > sc[i]) or (sc[j] == sc[i] and j < i):
                    kept[i] = False
    v = np.where(kept, vis[obs], 0.0)
    n_total = v.sum()
    q_base = val[obs] + sc - dtype(ns[0, node])
    vr = np.maximum(var[obs], 0.0)
    nv = np.maximum(v, 1.0)
    # norm_quantile transcription (quantiles.py)
    log2, log22, log41 = np.log(2.0), np.log(22.0), np.log(41.0)
    alpha = 1.0 / np.maximum(n_total, dtype(2.0))
    nq = -np.sqrt(log22 * 1.4) * np.log(
        1.0 - np.log(-np.log(alpha) / log2) / log22)
    del log41
    q = q_base + nq * np.sqrt(vr / nv)
    return {"kids": kids, "obs": obs, "kept": kept, "visits": v,
            "q": q, "cand": np.where(kept, q, -np.inf)}


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "runs/r4probe/state_m0_s93.pkl"
    with open(path, "rb") as f:
        blob = pickle.load(f)
    trees = jax.tree.map(jnp.asarray, blob["trees"])
    key = jnp.asarray(blob["key"])
    tcfg = blob["tcfg"]
    B = trees.root.shape[0]
    print(f"device={jax.devices()[0].platform} B={B} N={tcfg.max_nodes}")

    def select_ins(trees, key):
        D = tcfg.max_depth
        k_low, _ = jax.random.split(key)
        gumbels = jax.random.gumbel(k_low, (B, D, 7))
        rnd = jnp.zeros((B, D, 7), jnp.float32)
        score = trees.nstat[:, 0, :]
        obs = trees.nstat[:, 1, :].astype(jnp.int32)
        rootsc = jax.vmap(lambda s, r: s[r])(score, trees.root)
        env0 = engine.pack_state(trees.root_state)
        return (trees.cbase, score, obs, trees.visits, trees.values,
                trees.vars_, trees.root, rootsc, env0, gumbels, rnd)

    @jax.jit
    def both(trees, key):
        ins = select_ins(trees, key)
        k = tree_walk.select_walk(
            *ins, policy=tcfg.policy, low=tcfg.low,
            app=tcfg.env.actions_per_drop, scoring=tcfg.env.scoring,
            randomizer=tcfg.env.randomizer,
            interpret=not tree_walk.on_tpu())
        x = T.select_batched(trees, jax.random.split(key, B), tcfg)
        return (k[0], k[1]), (x[0], x[2])

    (ktr, klen), (xtr, xlen) = jax.device_get(both(trees, key))
    ktr, xtr = np.asarray(ktr), np.asarray(xtr)
    klen = np.asarray(klen).reshape(-1)
    xlen = np.asarray(xlen).reshape(-1)
    bad = np.nonzero((ktr != xtr).any(1))[0]
    print(f"divergent lanes: {bad.tolist()}")
    for lane in bad.tolist()[:3]:
        lvl = int(np.argmax(ktr[lane] != xtr[lane]))
        print(f"lane {lane}: len k/x {klen[lane]}/{xlen[lane]} "
              f"first trace diff at level {lvl}")
        print(f"  k trace {ktr[lane][:max(klen[lane], lvl+2)].tolist()}")
        print(f"  x trace {xtr[lane][:max(xlen[lane], lvl+2)].tolist()}")
        node = int(ktr[lane][lvl - 1]) if lvl > 0 else int(
            np.asarray(blob["trees"].root)[lane])
        for dt, nm in ((np.float64, "f64"), (np.float32, "f32")):
            r = np_level(blob, lane, node, dt)
            if r is None:
                print(f"  node {node} has no children!?")
                break
            order = np.argsort(-r["cand"])
            print(f"  {nm} node {node}: kept={r['kept'].astype(int)} "
                  f"visits={r['visits']}")
            with np.printoptions(precision=10, suppress=False):
                print(f"     q    = {r['q']}")
            print(f"     best two: a{order[0]} vs a{order[1]}  gap = "
                  f"{r['cand'][order[0]] - r['cand'][order[1]]:.3e}")


if __name__ == "__main__":
    main()
