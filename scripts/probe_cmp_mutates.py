"""Does a jitted program that CALLS the Pallas select kernel mutate its
input trees in place on TPU? (jax pure semantics say impossible; a custom
-call aliasing bug would say otherwise — and would explain the corrupted
state probe_select_sim dumped.)

Runs one clean sim to build a state, snapshots stats to host, runs the
three-way compare program from probe_select_sim (compiled + interpreted
select + XLA walk + expansion), then re-fetches the SAME device arrays and
diffs against the snapshot.

Usage: python scripts/probe_cmp_mutates.py [--batch 64]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--pool", type=int, default=2048)
    ap.add_argument("--depth", type=int, default=64)
    ap.add_argument("--interp_advance", action="store_true",
                    help="advance with TMT_SELECT_INTERPRET=1 sim_once and "
                         "run cmp BEFORE the advance (probe_select_sim's "
                         "exact sim-0 sequence)")
    args = ap.parse_args()
    if args.interp_advance:
        os.environ["TMT_SELECT_INTERPRET"] = "1"

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "pss", Path(__file__).with_name("probe_select_sim.py"))
    pss = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pss)

    cfg = mcts.SearchConfig(
        tree=TreeConfig(
            max_nodes=args.pool, max_obs=args.pool,
            table_size=1 << (2 * args.pool - 1).bit_length(),
            max_depth=args.depth, select_kernel=True,
        ),
        sims=1, evaluator="lp",
    )
    model = VVModel(seed=0)
    run = mcts.make_run_sims(
        mcts.nn_child_evaluator(model.apply_fn(jnp.bfloat16)), cfg)
    sim = jax.jit(run.sim_once)
    trees, _ = mcts.init_batch(0, args.batch, cfg)
    cmp = pss.make_cmp(cfg.tree)
    key0 = jax.random.PRNGKey(0)
    if args.interp_advance:
        # probe_select_sim's sim-0 sequence: cmp first, then interp advance
        _, k0_sel, _ = jax.random.split(key0, 3)
        m0 = jax.device_get(cmp(trees, k0_sel))
        print("sim0 cmp mismatches:",
              {k: int(v) for k, v in m0.items() if int(v)})
    trees, key = sim(model.params, model.ubound, trees, key0)
    jax.block_until_ready(trees.visits)

    before = {n: np.array(jax.device_get(getattr(trees, n)))
              for n in ("visits", "values", "vars_", "cbase", "nstat")}
    print("visits==values after advance:",
          bool((before["visits"] == before["values"]).all()))
    _, k_sel, _ = jax.random.split(key, 3)
    mism = jax.device_get(cmp(trees, k_sel))
    after = {n: np.asarray(jax.device_get(getattr(trees, n)))
             for n in before}
    print(f"device={jax.devices()[0].platform} B={args.batch}")
    print("cmp mismatches:",
          {k: int(v) for k, v in mism.items() if int(v)})
    for n in before:
        same = bool((before[n] == after[n]).all())
        print(f"  {n:7s} unchanged by cmp: {same}")
    vi, va = after["visits"], after["values"]
    print("  visits==values after cmp:", bool((vi == va).all()))


if __name__ == "__main__":
    main()
