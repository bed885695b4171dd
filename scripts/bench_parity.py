"""Measure the move program at the learning-parity campaign configuration
(B=256, 500 sims, 3584 pools, depth 96 — scripts/campaign2.sh) the same way
bench.py measures the headline config. Prints one JSON line.

Usage: [TMT_LP_BLOCK=32] python scripts/bench_parity.py [--select_kernel 0]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tetris_mcts_tpu import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tetris_mcts_tpu.search import mcts  # noqa: E402
from tetris_mcts_tpu.search.tree import TreeConfig  # noqa: E402
from tetris_mcts_tpu.train.trainer import VVModel  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--select_kernel", type=int, default=1)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--sims", type=int, default=500)
    ap.add_argument("--pool", type=int, default=3584)
    ap.add_argument("--depth", type=int, default=96)
    ap.add_argument("--moves", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import os
    cfg = mcts.SearchConfig(
        tree=TreeConfig(
            max_nodes=args.pool, max_obs=args.pool,
            table_size=1 << (2 * args.pool - 1).bit_length(),
            max_depth=args.depth,
            select_kernel=bool(args.select_kernel),
            insert_kernel=os.environ.get("TMT_INSERT_KERNEL", "1") == "1",
        ),
        sims=args.sims, evaluator="lp",
    )
    model = VVModel(seed=0)
    move = mcts.make_move_fn(
        mcts.nn_child_evaluator(model.apply_fn(jnp.bfloat16)), cfg,
        min_visits_store=25)

    def body(carry, _):
        trees, envs, replay, key = carry
        key, sub = jax.random.split(key)
        trees, envs, replay, stats = move(
            model.params, model.ubound, trees, envs, replay, sub)
        return (trees, envs, replay, key), stats.lines

    @jax.jit
    def run(trees, envs, replay, key):
        (trees, envs, replay, _), lines = jax.lax.scan(
            body, (trees, envs, replay, key), length=args.moves)
        return trees, envs, replay, lines

    trees, envs = mcts.init_batch(0, args.batch, cfg)
    replay = mcts.init_replay(100_000)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    trees, envs, replay, lines = run(trees, envs, replay, key)
    jax.block_until_ready(lines)
    compile_s = time.time() - t0

    rates = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        trees, envs, replay, lines = run(trees, envs, replay, key)
        jax.block_until_ready(lines)
        rates.append(args.batch * args.sims * args.moves
                     / (time.perf_counter() - t0))
    print(json.dumps({
        "metric": "parity_sims_per_s",
        "select_kernel": bool(args.select_kernel),
        "batch": args.batch, "sims": args.sims, "pool": args.pool,
        "depth": args.depth,
        "value": round(max(rates), 1),
        "reps": [round(r, 1) for r in rates],
        "compile_s": round(compile_s, 1),
        "device": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
