"""A/B: end-to-end bench_mcts with the Pallas select kernel on vs off."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from tetris_mcts_tpu.search import mcts
from tetris_mcts_tpu.search.tree import TreeConfig
from tetris_mcts_tpu.train.trainer import VVModel
import time


def bench(select_kernel: bool, batch=256, sims=100, moves=8, reps=3, seed=0):
    cfg = mcts.SearchConfig(
        tree=TreeConfig(max_nodes=2048, max_obs=2048, table_size=4096,
                        max_depth=64, select_kernel=select_kernel),
        sims=sims, evaluator="lp",
    )
    model = VVModel(seed=seed, compute_dtype=jnp.bfloat16)
    move = mcts.make_move_fn(
        mcts.nn_child_evaluator(model.apply_fn()), cfg, min_visits_store=25
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
    replay = mcts.init_replay(100_000)
    key = jax.random.PRNGKey(seed)
    trees, envs, replay, lines = run(trees, envs, replay, key)
    jax.block_until_ready(lines)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        trees, envs, replay, lines = run(trees, envs, replay, key)
        jax.block_until_ready(lines)
        best = min(best, time.perf_counter() - t0)
    return batch * sims * moves / best


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("kernel", "both"):
        r = bench(True)
        print(json.dumps({"select_kernel": True, "sims_per_s": round(r, 1)}),
              flush=True)
    if which in ("xla", "both"):
        r = bench(False)
        print(json.dumps({"select_kernel": False, "sims_per_s": round(r, 1)}),
              flush=True)
