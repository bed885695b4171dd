"""Per-agent-tier throughput rows (VERDICT r1 item 8): measure what sims/s
(steps/s for DQN) the capability-tier drivers actually reach on the current
backend, so the documented rule-6 slow paths (distributional / stochastic
edge scatters) become numbers and regressions become visible.

One JSON line per agent:
  {"agent": "...", "moves_per_s": N, "sims_per_s": N, ...}

Timings are loop-amortized driver steps (first step = compile, excluded).
Run on the real chip: `python scripts/agent_bench.py [--agents vv,vp,...]`.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def _time_steps(driver, n):
    driver.step()  # compile
    jax.block_until_ready(driver.envs.score)
    t0 = time.perf_counter()
    for _ in range(n):
        driver.step()
    jax.block_until_ready(driver.envs.score)
    return (time.perf_counter() - t0) / n


def bench_mcts_driver(name, cls, batch, sims, nodes, n_moves, **kw):
    from tetris_mcts_tpu.runtime.selfplay import SelfPlayConfig

    cfg = SelfPlayConfig(
        batch=batch, sims=sims, max_nodes=nodes, max_obs=nodes,
        table_size=max(1 << (2 * nodes - 1).bit_length(), 16),
        max_depth=64, min_visits_store=25, memory_size=100_000,
        train_rows_trigger=10**9, bf16=True, seed=0, **kw,
    )
    d = cls(cfg, log=lambda s: None)
    dt = _time_steps(d, n_moves)
    return {
        "agent": name, "batch": batch, "sims": sims, "nodes": nodes,
        "ms_per_move": round(dt * 1e3, 1),
        "moves_per_s": round(batch / dt, 1),
        "sims_per_s": round(batch * sims / dt, 1),
    }


def bench_dqn(name, distributional, batch, n_moves):
    from tetris_mcts_tpu.runtime.dqn import DQNConfig, DQNDriver

    cfg = DQNConfig(batch=batch, seed=0, distributional=distributional,
                    memory_size=100_000)
    d = DQNDriver(cfg, log=lambda s: None)
    dt = _time_steps(d, n_moves)
    return {
        "agent": name, "batch": batch,
        "ms_per_step": round(dt * 1e3, 2),
        "env_steps_per_s": round(batch / dt, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", default="vv,vp,dist,s2,dqn,distdqn")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--nodes", type=int, default=2048)
    ap.add_argument("--moves", type=int, default=8)
    args = ap.parse_args()
    want = set(args.agents.split(","))

    from tetris_mcts_tpu.runtime import selfplay as sp

    b, s, n, m = args.batch, args.sims, args.nodes, args.moves
    if "vv" in want:  # the flagship (bench.py headline path), for context
        print(json.dumps(bench_mcts_driver(
            "ValueSimLP", sp.SelfPlayDriver, b, s, n, m, evaluator="lp")),
            flush=True)
    if "vp" in want:
        print(json.dumps(bench_mcts_driver(
            "ApproxPolicyIter", sp.VPSelfPlayDriver, b, s, n, m)), flush=True)
    if "dist" in want:
        print(json.dumps(bench_mcts_driver(
            "DistValueSim", sp.DistSelfPlayDriver, b, s, n, m)), flush=True)
    if "s2" in want:
        print(json.dumps(bench_mcts_driver(
            "ValueSim2", sp.S2SelfPlayDriver, b, s, n, m)), flush=True)
    if "dqn" in want:
        print(json.dumps(bench_dqn("DQN", False, 1024, 64)), flush=True)
    if "distdqn" in want:
        print(json.dumps(bench_dqn("DistDQN", True, 1024, 64)), flush=True)


if __name__ == "__main__":
    main()
