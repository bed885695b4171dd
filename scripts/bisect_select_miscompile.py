"""Bisect the select-kernel miscompile (ops/tree_walk.py KNOWN ISSUE).

Round-2 symptom: at M=N=3584/D=96 (the 500-sim campaign pools) the fused
Pallas SELECT kernel composed into the full move program returns garbage
walks on the real chip — zero obs accumulate min_visits, actions look
random — while the SAME kernel at the same shapes is bit-exact standalone,
and the same program at M=N=2048/D=64 (bench shapes) is bit-exact
in-composition.

This harness runs the COMPLETE move program twice from identical state —
select kernel ON vs OFF (the hand-batched XLA walk, the kernel's bit-exact
golden twin) — and compares actions, stored-row counts, and root stats per
move, sweeping the pool/depth shape grid between the known-good and
known-bad corners to find the boundary. Small sims/batch keep each compile
cheap; pass --sims/--batch to probe whether the corruption needs the full
campaign program size.

Usage (chip): python scripts/bisect_select_miscompile.py
        (CPU): JAX_PLATFORMS=cpu ... --shapes 2048:64   (interpret-mode sanity)

The select-kernel shape guard is bypassed via TMT_FORCE_SELECT_KERNEL=1
(set below) — that is this harness's job.
"""
import argparse
import os
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

# honor JAX_PLATFORMS even under the axon plugin (which ignores the env var
# once loaded — CLAUDE.md): a CPU sanity run must NEVER touch the chip, which
# is single-tenant and usually busy with a campaign.
_want = os.environ.get("JAX_PLATFORMS")
if _want:
    jax.config.update("jax_platforms", _want)

from tetris_mcts_tpu.search import mcts  # noqa: E402
from tetris_mcts_tpu.search.tree import TreeConfig  # noqa: E402
from tetris_mcts_tpu.train.trainer import VVModel  # noqa: E402


def run_moves(select_kernel, pool, depth, batch, sims, moves, model, seed,
              interpret=False, insert_kernel=None):
    os.environ["TMT_SELECT_INTERPRET"] = "1" if interpret else "0"
    if insert_kernel is None:
        insert_kernel = os.environ.get("TMT_INSERT_KERNEL", "1") == "1"
    cfg = mcts.SearchConfig(
        tree=TreeConfig(
            max_nodes=pool, max_obs=pool,
            table_size=1 << (2 * pool - 1).bit_length(),
            max_depth=depth, select_kernel=select_kernel,
            insert_kernel=insert_kernel,
        ),
        sims=sims, evaluator="lp",
    )
    move = jax.jit(mcts.make_move_fn(
        mcts.nn_child_evaluator(model.apply_fn(jnp.bfloat16)), cfg,
        min_visits_store=25,
    ))
    trees, envs = mcts.init_batch(seed, batch, cfg)
    replay = mcts.init_replay(100_000)
    key = jax.random.PRNGKey(seed)
    actions, totals, roots = [], [], []
    for _ in range(moves):
        key, sub = jax.random.split(key)
        trees, envs, replay, stats = move(
            model.params, model.ubound, trees, envs, replay, sub
        )
        a, t, rv = jax.device_get(
            (stats.action, replay.total, stats.root_value))
        actions.append(np.asarray(a))
        totals.append(int(t))
        roots.append(np.asarray(rv))
    return np.stack(actions), np.array(totals), np.stack(roots)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="2048:64,2560:64,3072:64,3584:64,"
                                        "2048:96,3584:96",
                    help="comma list of pool:depth pairs, good->bad corners")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--sims", type=int, default=64,
                    help="sims/move — small keeps compiles cheap; raise "
                         "toward 500 if small programs do not reproduce")
    ap.add_argument("--moves", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--copy", action="store_true",
                    help="set TMT_SELECT_COPY=1: optimization-barrier the "
                         "kernel inputs (aliasing/layout hypothesis)")
    ap.add_argument("--block", type=int, default=0,
                    help="force TMT_SELECT_BLOCK (0 = auto; probe whether "
                         "the bg=64 auto-block at 3584 pools is the trigger)")
    ap.add_argument("--pad", type=int, default=0,
                    help="set TMT_SELECT_PAD: pad the kernel batch to this "
                         "many lanes by tiling lane 0 (small-batch dodge)")
    ap.add_argument("--mode", choices=["xla", "interp"], default="xla",
                    help="xla: kernel vs the XLA walk twin (default). "
                         "interp: COMPILED kernel vs the INTERPRETED kernel "
                         "in the same program on the same device — isolates "
                         "Mosaic codegen with no cross-path differences")
    ap.add_argument("--toggle", choices=["select", "insert"],
                    default="select",
                    help="which feature differs between the two compared "
                         "programs. 'insert': arm1 = insert KERNEL, arm0 = "
                         "XLA insert, select kernel ON in both — verifies "
                         "the obs-table insert kernel itself (the LP-kernel "
                         "lesson: a kernel shared by both arms is invisible "
                         "to the comparison)")
    args = ap.parse_args()
    if args.copy:
        os.environ["TMT_SELECT_COPY"] = "1"
    if args.block:
        os.environ["TMT_SELECT_BLOCK"] = str(args.block)
    if args.pad:
        os.environ["TMT_SELECT_PAD"] = str(args.pad)

    model = VVModel(seed=args.seed)
    print(f"device={jax.devices()[0].platform} batch={args.batch} "
          f"sims={args.sims} moves={args.moves}", flush=True)
    for spec in args.shapes.split(","):
        pool, depth = map(int, spec.split(":"))
        t0 = time.time()
        if args.toggle == "insert":
            a1, t1, r1 = run_moves(True, pool, depth, args.batch,
                                   args.sims, args.moves, model, args.seed,
                                   insert_kernel=True)
            a0, t0s, r0 = run_moves(True, pool, depth, args.batch,
                                    args.sims, args.moves, model, args.seed,
                                    insert_kernel=False)
        else:
            a1, t1, r1 = run_moves(True, pool, depth, args.batch,
                                   args.sims, args.moves, model, args.seed)
            a0, t0s, r0 = run_moves(args.mode == "interp", pool, depth,
                                    args.batch, args.sims, args.moves,
                                    model, args.seed,
                                    interpret=args.mode == "interp")
        same_a = bool((a1 == a0).all())
        same_t = bool((t1 == t0s).all())
        # root values: bf16 forward is identical either path; exact compare
        same_r = bool(np.array_equal(r1, r0))
        verdict = "OK " if (same_a and same_t and same_r) else "BAD"
        detail = ""
        if not same_a:
            m = int(np.argmax((a1 != a0).any(1)))
            detail += (f" first action divergence at move {m} "
                       f"({int((a1[m] != a0[m]).sum())}/{a1.shape[1]} lanes)")
        if not same_t:
            detail += f" stored rows kernel={t1.tolist()} xla={t0s.tolist()}"
        if not same_r:
            m = int(np.argmax([not np.array_equal(x, y)
                               for x, y in zip(r1, r0)]))
            detail += f" root stats diverge at move {m}"
        print(f"M=N={pool:5d} D={depth:3d}: {verdict}"
              f"  [{time.time() - t0:.0f}s]{detail}", flush=True)


if __name__ == "__main__":
    main()
