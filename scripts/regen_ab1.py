"""Regenerate the runs/ab1 A/B evidence cited by RESULTS.md / tree.py /
bench.py (VERDICT r3 weak 4: the original directory was never committed).

Chip-only; produces:
  runs/ab1/bench_base.json    headline config (bf16, insert kernel off)
  runs/ab1/bench_f32.json     TMT_NN_F32=1 in-search forward
  runs/ab1/bench_insert.json  TMT_INSERT_KERNEL=1 obs-table insert kernel
  runs/ab1/batch_sweep.jsonl  B=64/256/512 at the headline sims/moves

Usage: python scripts/regen_ab1.py [--out runs/ab1]
"""
import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run_variant(name, env, out_dir):
    """bench_mcts in a subprocess so each variant's env knobs apply at
    module import (bench.py parses them once at import time)."""
    import subprocess

    code = (
        "import json\n"
        "from bench import bench_mcts, bench_env\n"
        "best, reps = bench_mcts(batch=256, sims=100, moves=8)\n"
        "print(json.dumps({'variant': %r, 'sims_per_s': round(best, 1),"
        " 'reps': [round(r, 1) for r in reps]}))\n" % name
    )
    e = dict(os.environ, **env)
    r = subprocess.run([sys.executable, "-c", code], env=e,
                       capture_output=True, text=True, timeout=1800)
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    if not line:
        print(f"{name}: FAILED\n{r.stderr[-2000:]}", file=sys.stderr)
        return None
    d = json.loads(line)
    with open(os.path.join(out_dir, f"bench_{name}.json"), "w") as f:
        json.dump(d, f)
    print(line, flush=True)
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/ab1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    run_variant("base", {}, args.out)
    run_variant("f32", {"TMT_NN_F32": "1"}, args.out)
    run_variant("insert", {"TMT_INSERT_KERNEL": "1"}, args.out)

    import subprocess
    sweep_path = os.path.join(args.out, "batch_sweep.jsonl")
    with open(sweep_path, "w") as f:
        for b in (64, 256, 512):
            code = (
                "import json\n"
                "from bench import bench_mcts\n"
                "best, reps = bench_mcts(batch=%d, sims=100, moves=8)\n"
                "print(json.dumps({'batch': %d, 'sims_per_s':"
                " round(best, 1), 'reps': [round(r, 1) for r in reps]}))\n"
                % (b, b)
            )
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=1800)
            line = (r.stdout.strip().splitlines()[-1]
                    if r.stdout.strip() else "")
            if line:
                f.write(line + "\n")
                print(line, flush=True)
            else:
                print(f"batch {b}: FAILED\n{r.stderr[-1500:]}",
                      file=sys.stderr)


if __name__ == "__main__":
    main()
