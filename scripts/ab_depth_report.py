#!/usr/bin/env python
"""Report the round-5 tree-accumulation-depth A/B (runs/ab_depth).

Both arms play the FROZEN runs/campaign2/model.msgpack net (no training,
benchmark channel) at 150 sims/move, batch 256, seed 42:
  arm b: max_nodes 65536, max_depth 128, --episode_reuse 1 (deep pools,
         cross-episode accumulated statistics; XLA walks — outside the
         select/insert kernel envelopes)
  arm a: max_nodes 8192, max_depth 96, no reuse (the campaign3 status quo,
         select kernel on)
  arm c: max_nodes 8192, max_depth 96, --episode_reuse 1 (isolates the
         cross-episode-reuse component at ZERO throughput cost — fully
         inside the kernel envelope)

If deep accumulated trees clear significantly more lines at EQUAL sims and
an IDENTICAL net, per-sim search strength — and therefore the quality of
the value targets harvested from those trees — is confirmed as the
learning-gap bottleneck (VERDICT.md r4 "What's missing" #1; hypothesis
named in the campaign3 final-artifacts commit).

Primary metric: `live_lines_mean` (mean lines of the CURRENT episode
across all 256 lanes) at a MATCHED cumulative batch-move index — the
censoring-free comparison, since arm b's slower XLA-walk move rate
completes few episodes inside its window and completed-episode means
would undercount exactly the long episodes the treatment produces.
Completed-episode stats are reported where available.

Usage: python scripts/ab_depth_report.py [runs/ab_depth]
"""
import bisect
import json
import math
import sys


def arm_stats(path):
    eps, tps = [], []
    try:
        with open(path) as f:
            for line in f:
                e = json.loads(line)
                if e.get("kind") == "episode":
                    eps.append(e)
                elif e.get("kind") == "throughput":
                    tps.append(e)
    except FileNotFoundError:
        return None
    if not tps:
        return None
    # throughput windows carry CUMULATIVE batch-move counts
    moves = [t["moves"] for t in tps]
    live = [t["live_lines_mean"] for t in tps]
    out = {
        "batch_moves": moves[-1],
        "live_lines_trajectory": [
            (m, l) for m, l in zip(moves, live)],
        "live_lines_final": live[-1],
        "live_lines_max_final": tps[-1]["live_lines_max"],
        "sims_per_s_median": sorted(t["sims_per_s"] for t in tps)
                             [len(tps) // 2],
        "episodes_completed": len(eps),
    }
    if eps:
        lines = [e["lines"] for e in eps]
        n = len(lines)
        mean = sum(lines) / n
        var = sum((x - mean) ** 2 for x in lines) / max(n - 1, 1)
        out.update(ep_lines_mean=round(mean, 3),
                   ep_lines_se=round(math.sqrt(var / n), 3),
                   ep_lines_max=max(lines))
    return out


def live_at(stats, m):
    """live_lines_mean at the last window with cumulative moves <= m."""
    moves = [x[0] for x in stats["live_lines_trajectory"]]
    i = bisect.bisect_right(moves, m) - 1
    return stats["live_lines_trajectory"][i][1] if i >= 0 else None


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "runs/ab_depth"
    out = {}
    for arm in ("a", "b", "c"):
        s = arm_stats(f"{root}/{arm}/m.jsonl")
        if s:
            out[arm] = s
    arms = [k for k in ("a", "b", "c") if k in out]
    if len(arms) > 1:
        m = min(out[k]["batch_moves"] for k in arms)
        out["matched_move_index"] = m
        out["live_lines_at_match"] = {k: live_at(out[k], m) for k in arms}
        la = out["live_lines_at_match"].get("a")
        if la:
            for k in arms:
                if k != "a":
                    out[f"{k}_over_a_live"] = round(
                        out["live_lines_at_match"][k] / la, 3)
    # trajectories are long; compress to every 4th point for the report
    for arm in arms:
        if arm in out:
            tr = out[arm]["live_lines_trajectory"]
            out[arm]["live_lines_trajectory"] = tr[::4] + tr[-1:]
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
