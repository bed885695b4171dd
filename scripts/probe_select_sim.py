"""Sim-level localization of the select-kernel miscompile (ops/tree_walk.py
KNOWN ISSUE): drive the move program ONE SIMULATION AT A TIME, and at every
sim compare the COMPILED select kernel against the INTERPRETED same kernel
(Pallas interpreter on the same device — identical semantics, no Mosaic) on
the identical tree state + key. First mismatch reports which OUTPUT field
diverges (walk trace vs leaf env vs in-kernel child expansion) on how many
lanes, and dumps the exact offending state for a standalone repro.

The state advances through the INTERPRETED path (no-Mosaic ground truth).

Usage (chip):
  python scripts/probe_select_sim.py --batch 64 --pool 2048 --depth 64 \
      --sims 64 --moves 6                        # mode-1 hunt
  python scripts/probe_select_sim.py --batch 256 --pool 3584 --depth 96 \
      --sims 500 --moves 8                       # mode-2 hunt
  python scripts/probe_select_sim.py --replay runs/r4probe/state.pkl
"""
import argparse
import os
import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ["TMT_FORCE_SELECT_KERNEL"] = "1"
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
from tetris_mcts_tpu.search import mcts, tree as T  # noqa: E402
from tetris_mcts_tpu.search.tree import TreeConfig  # noqa: E402
from tetris_mcts_tpu.train.trainer import VVModel  # noqa: E402

OUT_NAMES = ("traces", "lengths", "leafs", "leaf_env", "chpk", "chsc",
             "chend")


def select_ins(trees, key, tcfg):
    """The exact input prep of tree_walk.select_batched_pallas."""
    B = trees.root.shape[0]
    D = tcfg.max_depth
    k_low, k_pol = jax.random.split(key)
    gumbels = jax.random.gumbel(k_low, (B, D, 7))
    rnd = jnp.zeros((B, D, 7), jnp.float32)
    score = trees.nstat[:, 0, :]
    obs = trees.nstat[:, 1, :].astype(jnp.int32)
    rootsc = jax.vmap(lambda s, r: s[r])(score, trees.root)
    env0 = engine.pack_state(trees.root_state)
    return (trees.cbase, score, obs, trees.visits, trees.values, trees.vars_,
            trees.root, rootsc, env0, gumbels, rnd)


def make_cmp(tcfg):
    kw = dict(policy=tcfg.policy, low=tcfg.low,
              app=tcfg.env.actions_per_drop, scoring=tcfg.env.scoring,
              randomizer=tcfg.env.randomizer)

    # off-TPU both sides interpret (plumbing sanity only — the Mosaic
    # compile this probe exists to test needs the chip)
    compiled_interp = not tree_walk.on_tpu()
    no_interp = os.environ.get("TMT_PROBE_NO_INTERP") == "1"
    vexpand_ch = jax.vmap(T.expand_children, in_axes=(0, 0, None))

    def lanes(a, b):
        neq = a != b
        while neq.ndim > 1:
            neq = neq.any(-1)
        return jnp.sum(neq.astype(jnp.int32))

    @jax.jit
    def cmp(trees, key):
        B = trees.root.shape[0]
        ins = select_ins(trees, key, tcfg)
        c = tree_walk.select_walk(*ins, interpret=compiled_interp, **kw)
        if no_interp:
            mism = {}
            i = c
        else:
            i = tree_walk.select_walk(*ins, interpret=True, **kw)
            # compiled-vs-interpreted: pure Mosaic-codegen isolation
            mism = {f"M_{n}": lanes(a, b)
                    for n, a, b in zip(OUT_NAMES, c, i)}
        # interpreted-kernel vs the hand-batched XLA walk + XLA child
        # expansion: pure SEMANTIC difference between the two paths
        # (valid while the low-visit gumbel branch is dead — LP seeding)
        xtr, _xact, xlen, xleaf, _xcl, xstates = T.select_batched(
            trees, jax.random.split(key, B), tcfg)
        xchild, xpk7 = vexpand_ch(trees, xstates, tcfg)
        itr, ilen, ileaf, ienv, ipk, isc, iend = i
        mism["S_traces"] = lanes(itr, xtr)
        mism["S_lengths"] = lanes(ilen, xlen)
        mism["S_leafs"] = lanes(ileaf, xleaf)
        mism["S_leaf_env"] = lanes(ienv, engine.pack_state(xstates))
        mism["S_chpk"] = lanes(ipk.reshape(B, -1), xpk7.reshape(B, -1))
        mism["S_chsc"] = lanes(isc.astype(jnp.float32),
                               xchild.score.astype(jnp.float32))
        mism["S_chend"] = lanes(iend != 0, xchild.end)
        return mism

    return cmp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--pool", type=int, default=2048)
    ap.add_argument("--depth", type=int, default=64)
    ap.add_argument("--sims", type=int, default=64)
    ap.add_argument("--moves", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="runs/r4probe")
    ap.add_argument("--keep_going", action="store_true",
                    help="report every divergent sim, not just the first")
    ap.add_argument("--pure_xla", action="store_true",
                    help="advance state with a NO-Pallas sim_once (XLA "
                         "walks + XLA seed/backup) as ground truth")
    ap.add_argument("--no_interp", action="store_true",
                    help="skip the interpreted-kernel comparison (compiled "
                         "kernel vs XLA walk only; interpret compiles of "
                         "big shapes are very slow)")
    ap.add_argument("--replay", default="",
                    help="re-run compiled-vs-interp on a dumped state.pkl")
    args = ap.parse_args()

    if args.replay:
        with open(args.replay, "rb") as f:
            blob = pickle.load(f)
        trees = jax.tree.map(jnp.asarray, blob["trees"])
        tcfg = blob["tcfg"]
        cmp = make_cmp(tcfg)
        for rep in range(3):
            mism = jax.device_get(cmp(trees, jnp.asarray(blob["key"])))
            print(f"replay rep {rep}: " + "  ".join(
                f"{k}={int(v)}" for k, v in mism.items()), flush=True)
        return

    cfg = mcts.SearchConfig(
        tree=TreeConfig(
            max_nodes=args.pool, max_obs=args.pool,
            table_size=1 << (2 * args.pool - 1).bit_length(),
            max_depth=args.depth, select_kernel=True,
        ),
        sims=args.sims, evaluator="lp",
    )
    tcfg = cfg.tree
    model = VVModel(seed=args.seed)
    evaluator = mcts.nn_child_evaluator(model.apply_fn(jnp.bfloat16))

    if args.no_interp:
        os.environ["TMT_PROBE_NO_INTERP"] = "1"
    if args.pure_xla:
        # ground truth advance: NO Pallas anywhere (XLA select walk + XLA
        # lp_seed + XLA backup)
        saved = tree_walk.use_walk_kernels
        tree_walk.use_walk_kernels = lambda: False
        try:
            run = mcts.make_run_sims(evaluator, cfg._replace(
                tree=tcfg._replace(select_kernel=False)))
        finally:
            tree_walk.use_walk_kernels = saved
    else:
        # advance through the interpreted-select kernel path
        os.environ["TMT_SELECT_INTERPRET"] = "1"
        run = mcts.make_run_sims(evaluator, cfg)
    sim_once = jax.jit(run.sim_once)

    cmp = make_cmp(tcfg)

    vbest = jax.vmap(T.best_action, in_axes=(0, None))
    vadvance = jax.vmap(T.advance_root, in_axes=(0, 0, 0, None))
    vharvest = jax.vmap(T.harvest, in_axes=(0, None, None))
    vinit = jax.vmap(T.init_tree, in_axes=(0, None))
    vsoft_reset = jax.vmap(engine.soft_reset, in_axes=(0, None))
    guard = mcts.capacity_guard_for(cfg.sims, tcfg, False)

    @jax.jit
    def post_move(trees, envs):
        """The move program's post-sims phase (mcts.make_move_fn), minus
        replay storage (replay never feeds back into the trees)."""
        action = vbest(trees, tcfg)
        envs2 = engine.step_batch(envs, action, tcfg.env)
        trees2 = vadvance(trees, action, envs2, tcfg)
        done = envs2.end
        full = (trees2.n_nodes + guard > tcfg.max_nodes) | (
            trees2.n_obs + guard > tcfg.max_obs)
        trigger = done | full | (trees2.root == 0)
        envs3 = jax.tree.map(
            lambda a, b: jnp.where(
                done.reshape((-1,) + (1,) * (a.ndim - 1)), a, b),
            vsoft_reset(envs2, tcfg.env), envs2)
        fresh = vinit(envs3, tcfg)
        trees3 = jax.tree.map(
            lambda f, t: jnp.where(
                trigger.reshape((-1,) + (1,) * (f.ndim - 1)), f, t),
            fresh, trees2)
        return trees3, envs3

    trees, envs = mcts.init_batch(args.seed, args.batch, cfg)
    key = jax.random.PRNGKey(args.seed)
    os.makedirs(args.out, exist_ok=True)

    print(f"device={jax.devices()[0].platform} B={args.batch} "
          f"pool={args.pool} depth={args.depth} sims={args.sims} "
          f"moves={args.moves}", flush=True)
    t0 = time.time()
    n_bad = 0
    for mv in range(args.moves):
        for s in range(args.sims):
            _, k_sel, _ = jax.random.split(key, 3)
            mism = jax.device_get(cmp(trees, k_sel))
            bad = {k: int(v) for k, v in mism.items() if int(v)}
            if bad:
                n_bad += 1
                print(f"MISMATCH move {mv} sim {s}: {bad}", flush=True)
                if n_bad == 1:
                    path = os.path.join(args.out,
                                        f"state_m{mv}_s{s}.pkl")
                    with open(path, "wb") as f:
                        pickle.dump(
                            {"trees": jax.device_get(trees),
                             "key": np.asarray(k_sel), "tcfg": tcfg}, f)
                    print(f"state dumped to {path}", flush=True)
                if not args.keep_going:
                    return
            trees, key = sim_once(model.params, model.ubound, trees, key)
        trees, envs = post_move(trees, envs)
        print(f"move {mv} clean so far  [{time.time() - t0:.0f}s]",
              flush=True)
    if n_bad:
        print(f"{n_bad} divergent sims over {args.moves}x{args.sims} "
              f"[{time.time() - t0:.0f}s]", flush=True)
    else:
        print(f"NO divergence over {args.moves}x{args.sims} sims "
              f"[{time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
