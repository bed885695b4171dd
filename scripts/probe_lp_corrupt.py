"""Isolate the LP-backup-kernel stat corruption (round-4 discovery: after
one sim at B=64 on TPU, trees.visits == trees.values == trees.vars_ — the
three aliased outputs hold the same buffer contents; visits are then < low
and the select gumbel branch goes live, which is what every kernel-vs-XLA
"select miscompile" comparison was actually seeing — the LP kernel runs in
BOTH arms of those comparisons).

Runs ONE sim_once from fresh trees per variant and reports whether the
three stat arrays are pairwise identical (they must differ: visits counts,
values, variances) plus agreement with the XLA seed+backup control.

Usage: python scripts/probe_lp_corrupt.py [--batches 32,64,128,256]
"""
import argparse
import os
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

from tetris_mcts_tpu.search import mcts  # noqa: E402
from tetris_mcts_tpu.search.tree import TreeConfig  # noqa: E402
from tetris_mcts_tpu.train.trainer import VVModel  # noqa: E402


def one_sim(batch, pool, depth, select_kernel, model, seed=0,
            interp_select=False, n_sims=1):
    os.environ["TMT_SELECT_INTERPRET"] = "1" if interp_select else "0"
    cfg = mcts.SearchConfig(
        tree=TreeConfig(
            max_nodes=pool, max_obs=pool,
            table_size=1 << (2 * pool - 1).bit_length(),
            max_depth=depth, select_kernel=select_kernel,
        ),
        sims=1, evaluator="lp",
    )
    run = mcts.make_run_sims(
        mcts.nn_child_evaluator(model.apply_fn(jnp.bfloat16)), cfg)
    sim = jax.jit(run.sim_once)
    trees, _ = mcts.init_batch(seed, batch, cfg)
    key = jax.random.PRNGKey(seed)
    for _ in range(n_sims):
        trees, key = sim(model.params, model.ubound, trees, key)
    return jax.device_get((trees.visits, trees.values, trees.vars_))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128,256")
    ap.add_argument("--pool", type=int, default=2048)
    ap.add_argument("--depth", type=int, default=64)
    args = ap.parse_args()
    ap2 = args
    model = VVModel(seed=0)
    print(f"device={jax.devices()[0].platform}")
    variants = (
        ("sel-kernel", dict(select_kernel=True)),
        ("sel-interp", dict(select_kernel=True, interp_select=True)),
        ("sel-xla   ", dict(select_kernel=False)),
        ("kernel x3 ", dict(select_kernel=True, n_sims=3)),
        ("interp x3 ", dict(select_kernel=True, interp_select=True,
                            n_sims=3)),
    )
    for name, kw in variants:
        for b in map(int, ap2.batches.split(",")):
            vi, va, vr = one_sim(b, ap2.pool, ap2.depth, model=model, **kw)
            vi_va = bool((vi == va).all())
            va_vr = bool((va == vr).all())
            seeded = vi[:, 2:9]
            ints = bool((seeded == np.round(seeded)).all()
                        and (seeded >= 0).all())
            print(f"{name} B={b:4d}: visits==values {vi_va}  "
                  f"values==vars {va_vr}  visits integral&nonneg {ints}  "
                  f"visits[0,1:9]={np.round(vi[0, 1:9], 4).tolist()}",
                  flush=True)


if __name__ == "__main__":
    main()
