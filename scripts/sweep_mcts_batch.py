"""Batch sweep of bench_mcts to diagnose latency- vs bandwidth-bound MCTS."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from bench import bench_mcts

for b in (64, 256, 1024):
    r = bench_mcts(batch=b, sims=32, moves=2, reps=2)
    print(json.dumps({"batch": b, "sims_per_s": round(r, 1)}), flush=True)
