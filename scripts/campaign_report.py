"""Summarize a campaign metrics JSONL (runs/campaignN/m.jsonl) for RESULTS.md:
decile table of lines/score over main episodes, the benchmark-game rounds
(the reference's parity curve), training-session stats, and throughput.

Usage: python scripts/campaign_report.py runs/campaign2/m.jsonl [--deciles N]
"""
import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics")
    ap.add_argument("--deciles", type=int, default=10)
    args = ap.parse_args()

    eps, bench, sessions, tps = [], [], [], []
    for line in open(args.metrics):
        d = json.loads(line)
        k = d["kind"]
        if k == "episode" and not d.get("benchmark"):
            eps.append(d)
        elif k == "benchmark":
            bench.append(d)
        elif k == "train_session":
            sessions.append(d)
        elif k == "throughput":
            tps.append(d)

    L = np.array([e["lines"] for e in eps], np.float64)
    S = np.array([e["score"] for e in eps], np.float64)
    n = len(L)
    print(f"main episodes: {n}   lines total {int(L.sum())}   "
          f"best episode {int(L.max()) if n else 0} lines / "
          f"{int(S[L.argmax()]) if n else 0} points")
    D = args.deciles
    if n >= D:
        print(f"| {'decile':>6} |" + "".join(
            f" {i+1} |" for i in range(D)))
        print("|---" * (D + 1) + "|")
        row = "| lines  |"
        for i in range(D):
            lo, hi = n * i // D, n * (i + 1) // D
            row += f" {L[lo:hi].mean():.2f} |"
        print(row)
        row = "| score  |"
        for i in range(D):
            lo, hi = n * i // D, n * (i + 1) // D
            row += f" {S[lo:hi].mean():.0f} |"
        print(row)
    if n >= 50:
        print(f"last-50: lines {L[-50:].mean():.2f}  score {S[-50:].mean():.0f}")

    if bench:
        # events carry a monotone per-launch `run` id (MetricsWriter), so
        # (run, round) orders relaunches unambiguously; legacy events
        # without it fall back to timestamp order. Report the CUMULATIVE
        # main-episode count at each benchmark — the x-axis of the
        # reference's parity curve.
        bench.sort(key=lambda b: (b.get("run", 0), b["t"]))
        print("\nbenchmark rounds (training+storage off):")
        for i, b in enumerate(bench):
            cum_ep = sum(1 for e in eps if e["t"] < b["t"])
            tag = (f"run {b['run']}.{b['round']}" if "run" in b
                   else f"round {i + 1:3d}")
            snap = f"  [{b['snapshot']}]" if b.get("snapshot") else ""
            print(f"  {tag:>9} @cum-ep {cum_ep:6d} "
                  f"({b['games']} games, {b['sims']} sims): "
                  f"lines {b['lines_mean']:.2f}±{b['lines_std']:.2f} "
                  f"(max {b['lines_max']:.0f})  score {b['score_mean']:.0f}"
                  f"{snap}")

    if sessions:
        t = sum(s["seconds"] for s in sessions)
        print(f"\ntraining sessions: {len(sessions)}  total {t/60:.1f} min  "
              f"last val-loss {sessions[-1]['loss_val']:.4f}")

    # per-run (relaunch) breakdown from the monotone run ids
    runs = {}
    for e in eps:
        r = e.get("run")
        if r is not None:
            runs.setdefault(r, []).append(e)
    if runs:
        print("\nper-run (run-id-tagged events only):")
        for r, es in sorted(runs.items()):
            dt = es[-1]["t"] - es[0]["t"]
            rate = len(es) / dt * 3600 if dt > 60 else float("nan")
            ln = np.array([e["lines"] for e in es], np.float64)
            print(f"  run {r}: {len(es)} episodes in {dt/3600:.2f} h "
                  f"({rate:.0f} eps/h)  lines mean {ln.mean():.2f} "
                  f"last-50 {ln[-50:].mean():.2f}  max {int(ln.max())}")
    if tps:
        sp = [t["sims_per_s"] for t in tps if t.get("sims_per_s")]
        print(f"throughput windows: median {np.median(sp):.0f} sims/s "
              f"(n={len(sp)})")
        # config-tagged windows (post-r3 streams) broken out per config,
        # so one shared stream can't blend workloads into one median
        cfgs = {}
        for t in tps:
            if "sims" in t and t.get("sims_per_s"):
                cfgs.setdefault((t["sims"], t["batch"]), []).append(
                    t["sims_per_s"])
        for (sims, batch), v in sorted(cfgs.items()):
            print(f"  config sims={sims} batch={batch}: median "
                  f"{np.median(v):.0f} sims/s (n={len(v)})")


if __name__ == "__main__":
    main()
