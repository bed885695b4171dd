"""`cycle` entrypoint — the offline train/self-play alternation.

The reference's `cycle.sh` (`/root/reference/cycle.sh:53-74`): per iteration,
(1) train on all accumulated data, (2) fan out N self-play workers writing
separate files, (3) one benchmark run; `-c` clears, `-r` resumes from the
last finished cycle found in the data dir. The workers run SEQUENTIALLY
here: a TPU chip is single-tenant, and one batched worker already plays
`--batch` games concurrently — the reference forked parallel processes only
because its env was single-game (SURVEY.md §2.7). Resume scans the same
data-dir layout.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import shutil
import subprocess
import sys


def build_parser():
    p = argparse.ArgumentParser(prog="tetris-tpu cycle")
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--n_workers", type=int, default=1,
                   help="self-play processes per cycle (cycle.sh:69-71)")
    p.add_argument("--ngames", type=int, default=100)
    p.add_argument("--train_sims", type=int, default=300)
    p.add_argument("--bench_sims", type=int, default=1000)
    p.add_argument("--bench_games", type=int, default=4)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--agent_type", default="ValueSimLP")
    p.add_argument("--model", default="",
                   help="net trained each cycle (cli.train --model). "
                        "Default: vp for the VP-net agents, else vv")
    p.add_argument("--clear", "-c", action="store_true")
    p.add_argument("--resume", "-r", action="store_true")
    p.add_argument("--checkpoint", default="./checkpoints/model_vv.msgpack")
    p.add_argument("--dry_run", action="store_true",
                   help="print the commands without running them")
    return p


def last_cycle(data_dir: str) -> int:
    """Largest cycle number present in the data dir (`cycle.sh:31-35`)."""
    best = -1
    for f in glob.glob(os.path.join(data_dir, "self*/data*.h5")):
        m = re.search(r"data(\d+)\.h5$", f)
        if m:
            best = max(best, int(m.group(1)))
    return best


def run(cmd, dry):
    print("+", " ".join(cmd), flush=True)
    if not dry:
        subprocess.run(cmd, check=True)


def main(argv=None):
    args = build_parser().parse_args(argv)
    py = sys.executable

    if args.clear and os.path.isdir(args.data_dir):
        shutil.rmtree(args.data_dir)
    os.makedirs(args.data_dir, exist_ok=True)

    start = last_cycle(args.data_dir) + 1 if args.resume else 0

    from tetris_mcts_tpu.cli.play import _VP_EVALUATORS, AGENT_TYPES

    ev = AGENT_TYPES.get(args.agent_type, ("lp", True))[0]
    if ev == "dqn":
        # DQN trains per env step inside its own driver and play.py's
        # DQN branch saves no HDF5 — a cycle would self-play forever
        # while the offline-train phase never fires
        print("cycle: DQN agents train online per step and produce no "
              "self-play HDF5; use `play --agent_type DQN --online` "
              "instead", file=sys.stderr)
        return 2
    if not args.model:
        args.model = (
            "vp" if ev in _VP_EVALUATORS
            else "dist" if ev == "dist"
            else "vv"
        )

    for cycle in range(start, args.iters):
        print(f"=== cycle {cycle} ===", flush=True)
        have_data = bool(glob.glob(os.path.join(args.data_dir, "self*/data*.h5")))
        if have_data:
            run([
                py, "-m", "tetris_mcts_tpu.cli.train",
                "--data", os.path.join(args.data_dir, "self*/data*.h5"),
                "--td", "--weighted", "--weighted_mode", "1",
                "--model", args.model,
                "--early_stopping", "--validation",
                "--cycle", str(cycle),
                "--save_loss", os.path.join(args.data_dir, "loss"),
                "--checkpoint", args.checkpoint,
                "--load_model",
            ], args.dry_run)

        for w in range(args.n_workers):
            run([
                py, "-m", "tetris_mcts_tpu.cli.play",
                "--agent_type", args.agent_type,
                "--mcts_sims", str(args.train_sims),
                "--ngames", str(args.ngames),
                "--batch", str(args.batch),
                "--save",
                "--save_dir", os.path.join(args.data_dir, f"self{w}"),
                "--cycle", str(cycle),
                "--checkpoint", args.checkpoint,
                "--load_model", "--benchmark",
            ], args.dry_run)

        run([
            py, "-m", "tetris_mcts_tpu.cli.play",
            "--agent_type", args.agent_type,
            "--mcts_sims", str(args.bench_sims),
            "--ngames", str(args.bench_games),
            "--batch", str(max(args.bench_games, 1)),
            "--benchmark",
            "--checkpoint", args.checkpoint,
            "--load_model",
            "--metrics", os.path.join(args.data_dir, "bench_metrics.jsonl"),
        ], args.dry_run)


if __name__ == "__main__":
    main()
